"""Metric-PROTOCOL parity against the reference eval math (VERDICT r4 #5).

The torch-parity suite pins activation-level conversion
(test_torch_convert.py); this file pins the last untested links: the
metric suite itself plus the CLI's padding/averaging semantics. A
reference-format ``.ckpt`` (built from tests/torch_ref.py) is evaluated two
ways on the same tiny synthetic test split:

  torch oracle    the reference's own eval math transcribed verbatim --
                  pose_3d_mvf_ex.py:317-333 evaluate_pose (per-sample
                  numpy-SVD similarity transform, cm->mm, PCK/AUC x100),
                  heatmap_mvf_ex.py:263-316 evaluate (per-view L1 sums,
                  MSELoss, get_max_preds argmax decode at threshold 1.0),
                  aggregated as Lightning does (per-batch means weighted by
                  batch size == global sample mean, utils/loss.py:9-48).
  run.py test     the real CLI on CPU with --ckpt_path <torch .ckpt>
                  (on-the-fly conversion), batch 4 over a 6-sample split so
                  the final batch is PARTIAL -- the padded-batch masking in
                  trainer.evaluate is load-bearing, not incidental.

The asserted equality is on the final printed metric NUMBERS.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))


# ---------------------------------------------------------------------------
# Reference eval math, transcribed (NOT imported -- the point is an
# independent oracle in torch/numpy semantics).
# ---------------------------------------------------------------------------

def _similarity_transform_np(S1, S2):
    """compute_similarity_transform (models/utils/pose_metric.py:119-167)."""
    S1, S2 = S1.T, S2.T  # (3, N)
    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = np.sum(X1 ** 2)
    K = X1.dot(X2.T)
    U, _s, Vh = np.linalg.svd(K)
    V = Vh.T
    Z = np.eye(U.shape[0])
    Z[-1, -1] *= np.sign(np.linalg.det(U.dot(V.T)))
    R = V.dot(Z.dot(U.T))
    scale = np.trace(R.dot(K)) / var1
    t = mu2 - scale * (R.dot(mu1))
    return (scale * R.dot(S1) + t).T


def _pose_metrics_per_sample(pred, gt, cm2mm=10.0):
    """evaluate_pose (pose_3d_mvf_ex.py:317-333) -> per-sample vectors."""
    pred = np.asarray(pred, np.float32)
    gt = np.asarray(gt, np.float32)
    aligned = np.stack([_similarity_transform_np(p, g)
                        for p, g in zip(pred, gt)])
    mpjpe = np.linalg.norm(pred - gt, axis=-1).mean(axis=1) * cm2mm
    pa = np.linalg.norm(aligned - gt, axis=-1).mean(axis=1) * cm2mm
    d_mm = np.linalg.norm((pred - gt) * cm2mm, axis=-1)  # (B, J)
    pck = (d_mm <= 150).mean(axis=1) * 100.0
    thresholds = np.linspace(0, 150, 31)
    auc = np.stack([(d_mm <= t).mean(axis=1) for t in thresholds],
                   -1).mean(axis=1) * 100.0
    return {"mpjpe": mpjpe, "pa_mpjpe": pa, "pck_3d": pck, "auc_3d": auc}


def _get_max_preds_torch(heatmaps, threshold=1.0):
    """get_max_preds (utils/loss.py:126-147), torch tie-breaking."""
    B, J, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, J, -1)
    maxvals, idx = torch.max(flat, dim=2, keepdim=True)
    preds = torch.tile(idx, (1, 1, 2)).float()
    preds[:, :, 0] = preds[:, :, 0] % W
    preds[:, :, 1] = torch.div(preds[:, :, 1], W, rounding_mode="floor")
    valid = (maxvals >= threshold).squeeze(-1)
    return preds, maxvals.squeeze(-1), valid


def _heatmap_metrics_ref(pred, gt):
    """evaluate (heatmap_mvf_ex.py:263-316) -> {metric: (per-sample vec |
    batch scalar)}; scalars are what Lightning batch-weights."""
    B, V, C, H, W = pred.shape
    p = pred.reshape(B, V, -1)
    g = gt.reshape(B, V, -1)
    l1 = torch.abs(p - g).sum(dim=2).sum(dim=1)  # (B,)
    pos = (g > 0).float()
    pos_l1 = (torch.abs(p - g) * pos).sum(dim=2).sum(dim=1)  # (B,)
    mse_heatmap = torch.mean((pred - gt) ** 2)  # batch scalar (MSELoss)

    def decode(hm):
        pts, mx, valid = _get_max_preds_torch(
            hm.reshape(B * V, C, H, W), threshold=1.0)
        return (pts.reshape(B, V, C, 2), valid.reshape(B, V, C))

    ppts, _ = decode(pred)
    gpts, gvalid = decode(gt)
    m = gvalid.unsqueeze(-1).float()
    mse_pts2d = torch.mean((ppts * m - gpts * m) ** 2)  # batch scalar
    return {"l1_error_heatmap": l1, "pos_l1_error_heatmap": pos_l1,
            "mse_heatmap": mse_heatmap, "mse_pts2d": mse_pts2d}


class _LightningMean:
    """self.log(..., v.mean(), sync_dist=True) epoch aggregation: running
    mean of per-batch means weighted by batch size."""

    def __init__(self):
        self.acc = {}

    def log_batch(self, metrics, batch_size):
        for k, v in metrics.items():
            val = float(v.mean()) if hasattr(v, "mean") else float(v)
            s, n = self.acc.get(k, (0.0, 0))
            self.acc[k] = (s + val * batch_size, n + batch_size)

    def result(self):
        return {k: s / n for k, (s, n) in self.acc.items()}


# ---------------------------------------------------------------------------
# Shared harness
# ---------------------------------------------------------------------------

def _make_eval_set(tmp_path, n_eval=6):
    from egorear_tpu.data.synthetic import make_synthetic_dataset

    return make_synthetic_dataset(
        str(tmp_path / "syn"), "syn", num_chars=1, num_seqs=1,
        frames_per_seq=2, image_size=256, write_heatmaps=True,
        eval_frames_per_seq=n_eval,
    )


def _collect_split(root, dataset_type, keys):
    from egorear_tpu.data.datasets import get_dataset

    # Same kwargs the configs pass (dataset_kwargs: camera_pos: all).
    ds = get_dataset(dataset_type, root, "test", camera_pos="all")
    out = {k: [] for k in keys}
    for i in range(len(ds)):
        s = ds[i]
        for k in keys:
            out[k].append(np.asarray(s[k]))
    return {k: np.stack(v) for k, v in out.items()}


def _run_cli_test(config, ckpt, root, batch_size, extra=()):
    env = dict(os.environ, EGOREAR_PLATFORM="cpu")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    argv = [
        sys.executable, os.path.join(REPO, "run.py"), "test",
        "--config", os.path.join(REPO, "configs", config),
        "--model.data_root", root,
        "--model.batch_size", str(batch_size),
        "--model.workers", "0",
        "--ckpt_path", ckpt,
    ] + list(extra)
    proc = subprocess.run(argv, capture_output=True, text=True,
                          timeout=3600, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-4000:]
    m = re.search(r"\{[^{}]*\"test/[^{}]*\}", proc.stdout, re.S)
    assert m, f"no metric json in output:\n{proc.stdout[-2000:]}"
    return json.loads(m.group(0))


def _seeded_torch_model(cls, *args, seed=3, **kwargs):
    torch.manual_seed(seed)
    model = cls(*args, **kwargs).eval()
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.7, 1.4)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "pos_embed" in name:
                p.normal_(0, 0.02)
    return model


def _save_lightning_ckpt(model, path):
    sd = {"network." + k: v for k, v in model.state_dict().items()}
    torch.save({"state_dict": sd}, str(path))


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_pose3d_metric_protocol_parity(tmp_path):
    """run.py test == reference evaluate_pose numbers on the same ckpt+data."""
    from torch_ref import EgoRearTorch

    from egorear_tpu.ops.camera import default_calib_path

    with open(default_calib_path()) as f:
        calibs = json.load(f)["cameras"]

    root = _make_eval_set(tmp_path)
    model = _seeded_torch_model(EgoRearTorch, calibs, feat=64)
    ckpt = tmp_path / "pose3d.ckpt"
    _save_lightning_ckpt(model, ckpt)

    data = _collect_split(root, "ego4view_syn_pose3d", ["img", "gt_pose"])
    n = data["img"].shape[0]

    # Torch oracle with Lightning's batch-weighted aggregation over the SAME
    # batching the CLI will use (4 + 2: partial final batch).
    agg = _LightningMean()
    with torch.no_grad():
        for lo in range(0, n, 4):
            img = torch.from_numpy(data["img"][lo:lo + 4]).float()
            gt = data["gt_pose"][lo:lo + 4]
            preds, _hms = model(img)
            for prefix, pred in (("proposal", preds[0]), ("final", preds[-1])):
                per = _pose_metrics_per_sample(pred.numpy(), gt)
                agg.log_batch({f"{prefix}_{k}": v for k, v in per.items()},
                              img.shape[0])
    want = agg.result()

    got = _run_cli_test(
        "ego4view_syn_pose3d.yaml", str(ckpt), root, 4,
        extra=["--model.network_pretrained", "null",
               "--model.heatmap_estimator_mvf_pretrained", "null",
               "--model.model_cfg.heatmap_mvf_cfg.encoder_cfg.resnet_cfg"
               ".use_imagenet_pretrain", "false",
               # torch_ref implements the 1x1-conv head variant.
               "--model.model_cfg.heatmap_mvf_cfg.mvf_cfg.use_1by1_conv",
               "true"])

    for k, w in want.items():
        g = got[f"test/{k}"]
        np.testing.assert_allclose(
            g, w, rtol=2e-3, atol=2e-3,
            err_msg=f"test/{k}: cli={g} vs torch-protocol={w}")


def test_mvfex_heatmap_metric_protocol_parity(tmp_path):
    """run.py test == reference MVFex evaluate() numbers (argmax decode,
    L1/MSE suites, per-pair split) on the same ckpt+data."""
    from torch_ref import MVFEXTorch

    root = _make_eval_set(tmp_path)
    model = _seeded_torch_model(MVFEXTorch, feat=64, seed=5)
    ckpt = tmp_path / "mvfex.ckpt"
    _save_lightning_ckpt(model, ckpt)

    data = _collect_split(root, "ego4view_syn_heatmap_mvf",
                          ["img", "gt_heatmap"])
    n = data["img"].shape[0]

    agg = _LightningMean()
    with torch.no_grad():
        for lo in range(0, n, 4):
            img = torch.from_numpy(data["img"][lo:lo + 4]).float()
            gt = torch.from_numpy(data["gt_heatmap"][lo:lo + 4]).float()
            hms, _feats = model(img)
            for prefix, hm in (("proposal", hms[0]), ("final", hms[-1])):
                for pair, sl in (("stereo_front", slice(0, 2)),
                                 ("stereo_back", slice(2, None))):
                    per = _heatmap_metrics_ref(hm[:, sl], gt[:, sl])
                    agg.log_batch(
                        {f"{prefix}_{pair}_{k}": v for k, v in per.items()},
                        img.shape[0])
    want = agg.result()

    got = _run_cli_test(
        "ego4view_syn_heatmap_mvfex-n1_jqa.yaml", str(ckpt), root, 4,
        extra=["--model.network_pretrained", "null",
               "--model.heatmap_estimator_pretrained_stereo_front", "null",
               "--model.heatmap_estimator_pretrained_stereo_back", "null",
               "--model.model_cfg.encoder_cfg.resnet_cfg"
               ".use_imagenet_pretrain", "false",
               "--model.model_cfg.mvf_cfg.use_1by1_conv", "true"])

    for k, w in want.items():
        g = got[f"test/{k}"]
        np.testing.assert_allclose(
            g, w, rtol=2e-3, atol=2e-3,
            err_msg=f"test/{k}: cli={g} vs torch-protocol={w}")

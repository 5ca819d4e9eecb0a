"""Auxiliary trainer subsystems (SURVEY.md section 5): auto-resume failure
recovery, the non-finite-loss guard with state dump, and the jax.profiler
trace hook. The reference has none of these (Lightning only resumes via an
explicit --ckpt_path)."""

import csv
import glob
import os

import numpy as np
import pytest

from egorear_tpu.data.datasets import get_dataset
from egorear_tpu.data.synthetic import make_synthetic_dataset
from egorear_tpu.train.tasks import HeatmapTask
from egorear_tpu.train.trainer import Trainer, TrainerConfig

# Multi-minute e2e tier: deselect with -m 'not slow' for fast CI.
pytestmark = pytest.mark.slow

ENCODER_CFG = {
    "resnet_cfg": {"model_name": "resnet18", "out_stride": 4,
                   "use_imagenet_pretrain": False},
    "neck_cfg": {"in_channels": [64, 128, 256, 512], "out_channels": 128},
}


@pytest.fixture(scope="module")
def syn_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ego4view_syn_aux")
    return make_synthetic_dataset(
        str(root), "syn", num_chars=1, num_seqs=1, frames_per_seq=8,
        image_size=64, write_heatmaps=True,
    )


def _task():
    return HeatmapTask(
        model_cfg={"num_heatmap": 15, "encoder_cfg": ENCODER_CFG},
        w_heatmap=10.0,
    )


def _trainer(tmp_path, **cfg_kw):
    cfg = TrainerConfig(
        check_val_every_n_epoch=100, log_every_n_steps=1,
        gradient_clip_val=5.0, seed=0, save_dir=str(tmp_path / "logs"),
        **cfg_kw,
    )
    return Trainer(_task(), cfg, lr=1e-3, weight_decay=5e-3,
                   lr_decay_epochs=(), warmup_iters=2, batch_size=8,
                   workers=0)


def test_auto_resume_restores_latest_checkpoint(syn_root, tmp_path):
    train_ds = get_dataset("ego4view_syn_heatmap_mvf", syn_root, "train",
                           camera_pos="front")
    _trainer(tmp_path, max_epochs=2).fit(train_ds)

    # Fresh Trainer, same save_dir: auto_resume must pick up the epoch-1
    # checkpoint and train only epochs 2..3.
    t2 = _trainer(tmp_path, max_epochs=4, auto_resume=True)
    t2.fit(train_ds)

    csvs = sorted(glob.glob(
        os.path.join(tmp_path, "logs", "lightning_logs", "version_*",
                     "metrics.csv")))
    assert len(csvs) >= 2
    with open(csvs[-1]) as f:
        epochs = [int(r["epoch"]) for r in csv.DictReader(f)
                  if r.get("epoch") and r.get("train/heatmap_loss")]
    assert epochs, "resumed run logged no train metrics"
    assert min(epochs) >= 2, f"resume re-ran earlier epochs: {sorted(set(epochs))}"
    assert max(epochs) == 3


def test_debug_nans_raises_and_dumps_state(syn_root, tmp_path):
    class Poisoned:
        """GT heatmaps turn NaN -- the loss must go non-finite."""

        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            s = dict(self.ds[i])
            s["gt_heatmap"] = np.full_like(s["gt_heatmap"], np.nan)
            return s

    train_ds = Poisoned(get_dataset("ego4view_syn_heatmap_mvf", syn_root,
                                    "train", camera_pos="front"))
    t = _trainer(tmp_path, max_epochs=1, debug_nans=True)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        t.fit(train_ds)
    dumps = glob.glob(os.path.join(
        tmp_path, "logs", "lightning_logs", "version_*", "checkpoints-nan"))
    assert dumps and os.listdir(dumps[0]), "nan guard saved no state dump"


def test_profile_steps_captures_trace(syn_root, tmp_path):
    train_ds = get_dataset("ego4view_syn_heatmap_mvf", syn_root, "train",
                           camera_pos="front")
    t = _trainer(tmp_path, max_epochs=1, profile_steps=1)
    t.fit(train_ds)
    traces = glob.glob(os.path.join(
        tmp_path, "logs", "lightning_logs", "version_*", "profile", "**",
        "*.trace.json.gz"), recursive=True)
    assert traces, "profiler captured no trace"


def test_restore_missing_pkl_raises_file_not_found(tmp_path):
    """An explicit .pkl path that doesn't exist must fail with a clean
    FileNotFoundError, not fall through to a confusing orbax error
    (ADVICE r3)."""
    from egorear_tpu.train import checkpoint as ckpt_lib

    with pytest.raises(FileNotFoundError, match="checkpoint not found"):
        ckpt_lib.restore(str(tmp_path / "nope.pkl"))


def test_tp_shard_stacked_notes(tmp_path, caplog):
    """tp_shard_stacked with model_parallel > 1 logs a pointer to its
    correctness record (ADVICE r3 asked for a loud warning while the XLA
    SPMD backward discrepancy was live; resolved in round 4 -- view-major
    layout + float64 diagnostic, see parallel/mesh.leaf_sharding -- so the
    config is now validated-by-default and the log is informational)."""
    import jax
    import logging

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 (virtual) devices")
    cfg = TrainerConfig(save_dir=str(tmp_path / "logs"), model_parallel=2,
                        tp_shard_stacked=True)
    # The egorear root logger sets propagate=False; attach the capture
    # handler to it directly.
    logging.getLogger("egorear").addHandler(caplog.handler)
    try:
        with caplog.at_level(logging.INFO, logger="egorear"):
            Trainer(_task(), cfg, lr=1e-3, weight_decay=0.0,
                    lr_decay_epochs=(), warmup_iters=1, batch_size=8,
                    workers=0)
    finally:
        logging.getLogger("egorear").removeHandler(caplog.handler)
    assert any("tp_shard_stacked" in r.message for r in caplog.records)

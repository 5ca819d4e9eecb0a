"""Checkpoint-converter parity: convert torch state dicts (reference key
layout, see tests/torch_ref.py) and check the flax forward matches the torch
forward numerically -- validating conv padding, BN stats, linear transposes,
bilinear align-corners upsampling and the key grammar end to end."""

import numpy as np
import pytest
import torch

import jax

from egorear_tpu.models.heatmap_net import HeatmapNet
from egorear_tpu.train.torch_convert import (
    convert_state_dict,
    strip_prefixes,
    verify_against,
)

from torch_ref import FFN as TorchFFN
from torch_ref import HeatmapModel, SpatialMHA


@pytest.fixture(scope="module")
def torch_heatmap_model():
    torch.manual_seed(0)
    m = HeatmapModel(num_heatmap=15).eval()
    # Randomize BN running stats so eval-mode conversion is actually tested.
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.7, 1.4)
    return m


def test_heatmap_net_conversion_numeric_parity(torch_heatmap_model):
    m = torch_heatmap_model
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    variables = convert_state_dict(sd, "heatmap", num_views=2)

    net = HeatmapNet(num_heatmap=15)
    x = np.random.default_rng(0).normal(size=(2, 1, 3, 64, 64)).astype(np.float32)

    # Structure matches a fresh init exactly.
    ref_vars = net.init(jax.random.PRNGKey(0), x)
    errs = verify_against(variables, jax.device_get(ref_vars))
    assert not errs, errs[:10]

    with torch.no_grad():
        want_hm, want_feat, want_pyr = m(torch.from_numpy(x[:, 0]))

    got_hm, got_feat, got_pyr = net.apply(variables, x, train=False,
                                          return_feat=True)
    np.testing.assert_allclose(
        np.asarray(got_hm[:, 0]), want_hm.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_feat[:, 0]).transpose(0, 3, 1, 2), want_feat.numpy(),
        atol=2e-4, rtol=1e-3,
    )
    for got_p, want_p in zip(got_pyr, want_pyr):
        np.testing.assert_allclose(
            np.asarray(got_p[:, 0]).transpose(0, 3, 1, 2), want_p.numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_strip_prefixes():
    sd = {
        "network._orig_mod.conv_heatmap.weight": 1,
        "network.encoder.backbone.layer_s2.0.weight": 2,
        "module.foo": 3,
    }
    out = strip_prefixes(sd)
    assert set(out) == {
        "conv_heatmap.weight", "encoder.backbone.layer_s2.0.weight", "foo"
    }


def test_ffn_and_mha_parity():
    """Linear-transpose conventions through real forwards."""
    from egorear_tpu.models.layers import FFN as FlaxFFN
    from egorear_tpu.models.layers import MultiheadAttention

    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 15, 64)).astype(np.float32)

    tffn = TorchFFN(64, 128).eval()
    fffn = FlaxFFN(embed_dims=64, feedforward_dims=128)
    vars0 = fffn.init(jax.random.PRNGKey(0), x)
    params = {
        "Dense_0": {
            "kernel": tffn.layers[0][0].weight.detach().numpy().T,
            "bias": tffn.layers[0][0].bias.detach().numpy(),
        },
        "Dense_1": {
            "kernel": tffn.layers[1].weight.detach().numpy().T,
            "bias": tffn.layers[1].bias.detach().numpy(),
        },
    }
    assert not verify_against({"params": params}, jax.device_get(vars0))
    got = fffn.apply({"params": params}, x)
    with torch.no_grad():
        want = tffn(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)

    tmha = SpatialMHA(64, 4).eval()
    fmha = MultiheadAttention(embed_dim=64, num_heads=4)
    mparams = {
        name: {
            "kernel": getattr(tmha, name).weight.detach().numpy().T,
            "bias": getattr(tmha, name).bias.detach().numpy(),
        }
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }
    got, _ = fmha.apply({"params": mparams}, x, x, x)
    with torch.no_grad():
        want = tmha(torch.from_numpy(x), torch.from_numpy(x),
                    torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_upsample_matches_torch_align_corners():
    from egorear_tpu.models.layers import upsample2x_align_corners

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    got = np.asarray(upsample2x_align_corners(x))
    with torch.no_grad():
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
            mode="bilinear", align_corners=True,
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_deform_attn_module_matches_torch_heads():
    """MSDeformAttn linear heads + softmax + sampling vs a torch transcription
    of deform_attn.py:90-162 (sampling via the naive bilinear oracle)."""
    from egorear_tpu.models.layers import MSDeformAttn
    from torch_ref import DeformHeads

    torch.manual_seed(2)
    rng = np.random.default_rng(2)
    B, Q, C, H, W, nh, P = 2, 15, 64, 8, 8, 4, 16
    query = rng.normal(size=(B, Q, C)).astype(np.float32)
    ref_pts = rng.uniform(0.1, 0.9, size=(B, Q, 2)).astype(np.float32)
    value = rng.normal(size=(B, H * W, C)).astype(np.float32)

    heads = DeformHeads(d_model=C, n_heads=nh, n_points=P).eval()
    params = {
        name: {
            "kernel": getattr(heads, name).weight.detach().numpy().T,
            "bias": getattr(heads, name).bias.detach().numpy(),
        }
        for name in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj")
    }
    attn = MSDeformAttn(d_model=C, n_heads=nh, n_points=P, impl="gather")
    got = attn.apply({"params": params}, query, ref_pts, value, (H, W))

    # Torch transcription of the reference forward (single level).
    with torch.no_grad():
        q = torch.from_numpy(query)
        v = heads.value_proj(torch.from_numpy(value)).reshape(B, H * W, nh, C // nh)
        off = heads.sampling_offsets(q).reshape(B, Q, nh, P, 2)
        w = heads.attention_weights(q).reshape(B, Q, nh, P).softmax(-1)
        loc = torch.from_numpy(ref_pts)[:, :, None, None, :] + off / torch.tensor(
            [W, H], dtype=torch.float32
        )
        # naive bilinear at loc, zero padding, align_corners=False mapping
        out = torch.zeros(B, Q, nh, C // nh)
        vmap = v.permute(0, 2, 1, 3).reshape(B, nh, H, W, C // nh)
        for b in range(B):
            for qq in range(Q):
                for h in range(nh):
                    for p in range(P):
                        x = float(loc[b, qq, h, p, 0]) * W - 0.5
                        y = float(loc[b, qq, h, p, 1]) * H - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        lx, ly = x - x0, y - y0
                        acc = torch.zeros(C // nh)
                        for dy, wy in ((0, 1 - ly), (1, ly)):
                            for dx, wx in ((0, 1 - lx), (1, lx)):
                                xx, yy = x0 + dx, y0 + dy
                                if 0 <= xx < W and 0 <= yy < H:
                                    acc += wy * wx * vmap[b, h, yy, xx]
                        out[b, qq, h] += w[b, qq, h, p] * acc
        want = heads.output_proj(out.reshape(B, Q, C)).numpy()

    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_full_cascade_conversion_numeric_parity():
    """Convert a full EgoRearTorch (MVFex + Pose3D) state dict and check the
    end-to-end flax forward matches torch to float tolerance -- the converter
    contract that makes reference checkpoints consumable."""
    import json

    from egorear_tpu.models.configs import EgoRearNetCfg
    from egorear_tpu.models.pose3d import EgoRearNet
    from egorear_tpu.ops.camera import CameraRig, default_calib_path
    from torch_ref import EgoRearTorch

    with open(default_calib_path()) as f:
        calibs = json.load(f)["cameras"]

    torch.manual_seed(3)
    tmodel = EgoRearTorch(calibs, feat=64).eval()
    for mod in tmodel.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.7, 1.4)
    # Make pos embeds nonzero so their conversion is actually checked.
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "pos_embed" in name:
                p.normal_(0, 0.02)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    from egorear_tpu.train.torch_convert import convert_state_dict, verify_against

    variables = convert_state_dict(sd, "pose_3d_mvf_ex", num_views=4)

    cfg = EgoRearNetCfg.from_dict({
        "num_views": 4, "image_size": [256, 256], "camera_model": "ego4view_syn",
        "pose3d_cfg": {
            "num_joints": 16, "input_dims": 128, "embed_dims": 128,
            "mlp_dims": 1024, "mlp_dropout": 0.0, "num_mlp_layers": 2,
            "num_former_layers": 3, "num_pred_mlp_layers": 2,
            "feat_down_stride": 4,
            "transformer_cfg": {
                "cross_attn_cfg": {"num_heads": 4},
                "spatial_attn_cfg": {"num_heads": 4},
                "ffn_cfg": {"feedforward_dims": 512, "num_fcs": 2,
                            "ffn_drop": 0.0},
            },
        },
        "heatmap_mvf_cfg": {
            "num_heatmap": 15, "feat_down_stride": 4, "heatmap_threshold": 0.5,
            "full_training": False, "detach_heatmap_feat": True,
            "detach_heatmap_feat_init": False, "use_pred_heatmap_init": True,
            "encoder_cfg": {
                "resnet_cfg": {"model_name": "resnet18", "out_stride": 4,
                               "use_imagenet_pretrain": False},
                "neck_cfg": {"in_channels": [64, 128, 256, 512],
                             "out_channels": 128},
            },
            "mvf_cfg": {
                "input_dims": 128, "embed_dims": 256, "num_former_layers": 1,
                "joint_query_adaptation": True, "use_1by1_conv": True,
                "mvf_transformer_cfg": {
                    "cross_attn_cfg": {"num_heads": 4},
                    "spatial_attn_cfg": {"num_heads": 4},
                    "ffn_cfg": {"feedforward_dims": 512, "num_fcs": 2,
                                "ffn_drop": 0.0},
                },
            },
        },
    })
    net = EgoRearNet(cfg=cfg)
    rig = CameraRig.from_calib_file("ego4view_syn")

    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 4, 3, 256, 256)).astype(np.float32)

    ref_vars = jax.device_get(net.init(jax.random.PRNGKey(0), img, rig))
    errs = verify_against(variables, ref_vars)
    assert not errs, errs[:20]

    got_preds, got_hms = net.apply(variables, img, rig, train=False)
    with torch.no_grad():
        want_preds, want_hms = tmodel(torch.from_numpy(img))

    # ---- per-stage divergence quantification (VERDICT r1 item 6) ----
    # Print a table of max-abs divergences at every cascade boundary and
    # assert per-stage atols ~3x the measured envelope (PARITY.md table).
    def maxdiff(g, w):
        return float(np.abs(np.asarray(g, np.float64)
                            - w.numpy().astype(np.float64)).max())

    report = {}
    for i, (g, w) in enumerate(zip(got_hms, want_hms)):
        report[f"heatmap_stage{i}"] = maxdiff(g, w)
    for i, (g, w) in enumerate(zip(got_preds, want_preds)):
        report[f"pose3d_stage{i}"] = maxdiff(g, w)

    # Anchor agreement: the 2D argmax indices must match EXACTLY, otherwise
    # downstream parity is coincidental (a one-pixel anchor shift moves every
    # deformable sampling window).
    from egorear_tpu.ops.heatmap import argmax_2d

    g_pts, _, g_valid = argmax_2d(np.asarray(got_hms[0]), threshold=0.5,
                                  normalize=True)
    w_pts, w_valid = tmodel.heatmap_estimator._anchors(want_hms[0], 0.5)
    anchors_equal = np.array_equal(np.asarray(g_pts), w_pts.numpy())
    report["anchors_bitwise_equal"] = anchors_equal
    print("per-stage cascade divergence:",
          {k: (v if isinstance(v, bool) else round(v, 7))
           for k, v in report.items()})

    assert anchors_equal, "anchor argmax indices diverged"
    # Measured envelope (fp32, CPU, random weights, B=1):
    #   heatmap stages <= 4e-7 -- the heatmap cascade is numerically exact
    #   to fp32 round-off.
    #   pose3d stages ~2.9e-3, ALL of it entering at the MLP proposal
    #   (stage0) and carried additively through the refinement layers
    #   (offsets add to detached anchors): the proposal flattens
    #   V*128*8*8 = 32768 features into one fp32 contraction, where ~1e-5
    #   feature-level round-off amplifies by ~sqrt(K). In metric units
    #   that is 2.9e-3 cm = 0.03 mm -- four orders below the 1% MPJPE
    #   parity target (~0.5 mm). Bounds are ~3x the envelope.
    bounds = {"heatmap_stage0": 2e-6, "heatmap_stage1": 2e-6,
              "pose3d_stage0": 9e-3, "pose3d_stage1": 9e-3,
              "pose3d_stage2": 9e-3, "pose3d_stage3": 9e-3}
    for k, bound in bounds.items():
        assert report[k] <= bound, (k, report[k], bound)


def test_torch_ckpt_graft_into_mvfex(tmp_path):
    """Stage-1 torch .ckpt grafts into the MVFex front estimator through the
    checkpoint library (the reference's staged-pretraining surgery,
    heatmap_mvf_ex.py:93-102) and changes the converted subtree only."""
    import jax.numpy as jnp

    from egorear_tpu.models.configs import MVFCfg, MVFexNetCfg
    from egorear_tpu.models.mvfex import HeatmapMVFexNet
    from egorear_tpu.train import checkpoint as ckpt_lib
    from torch_ref import HeatmapModel

    torch.manual_seed(5)
    tmodel = HeatmapModel(15)
    sd = {"network._orig_mod." + k: v for k, v in tmodel.state_dict().items()}
    ckpt_path = str(tmp_path / "stage1.ckpt")
    torch.save({"state_dict": sd}, ckpt_path)

    cfg = MVFexNetCfg(
        num_views=2, image_size=(64, 64), num_heatmap=15,
        camera_model="ego4view_syn_stereo_front",
        mvf=MVFCfg(joint_query_adaptation=True, use_1by1_conv=True),
    )
    net = HeatmapMVFexNet(cfg=cfg)
    img = jnp.zeros((1, 2, 3, 64, 64))
    vs = jax.device_get(net.init(jax.random.PRNGKey(0), img))

    sub = "heatmap_estimator_stereo_front"
    loaded = ckpt_lib.load_pretrained(
        ckpt_path,
        {"params": vs["params"][sub], "batch_stats": vs["batch_stats"][sub]},
        "heatmap",
    )
    params = ckpt_lib.graft(vs["params"], sub, loaded["params"])
    # Grafted conv matches the torch weights (OIHW -> HWIO).
    want = tmodel.conv_heatmap.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(params[sub]["conv_heatmap"]["kernel"]), want, atol=1e-6
    )
    # Other subtrees untouched.
    a = jax.tree.leaves(vs["params"]["refiners"])[0]
    b = jax.tree.leaves(params["refiners"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Model-family shape/structure tests (V in {2, 3, 4}), gradient-flow checks
for the staged-training detach policies, and small invariants.

Output-list contracts follow the reference: MVFex emits
[init, layer_1..layer_N] heatmap stages (egoposeformer_heatmap_mvf_ex.py:
290-437); the pose head emits [mlp_proposal, refine_1..refine_K]
(egoposeformer_mvf_ex.py:448-452).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egorear_tpu.models.configs import (
    EgoRearNetCfg,
    MVFCfg,
    MVFexNetCfg,
    Pose3DCfg,
)
from egorear_tpu.models.heatmap_net import HeatmapNet
from egorear_tpu.models.mvfex import HeatmapMVFexNet
from egorear_tpu.models.pose3d import EgoRearNet
from egorear_tpu.ops.camera import CameraRig

IMG = 64  # small image => 16x16 feature maps, fast CPU tests
HM = IMG // 4


def _mvfex_cfg(num_views, **kw):
    base = dict(
        num_views=num_views,
        image_size=(IMG, IMG),
        num_heatmap=15,
        feat_down_stride=4,
        heatmap_threshold=0.5,
        camera_model="ego4view_syn",
        mvf=MVFCfg(joint_query_adaptation=True, use_1by1_conv=True),
    )
    base.update(kw)
    return MVFexNetCfg(**base)


def test_fold_views_auto_layout():
    """auto layout: channel axis detection must not mis-route an NHWC batch
    whose HEIGHT happens to be 3 (ADVICE r3); the true 3x3 tie stays NCHW."""
    from egorear_tpu.models.heatmap_net import fold_views

    # Unambiguous NCHW / NHWC.
    nchw = jnp.arange(2 * 2 * 3 * 4 * 5).reshape(2, 2, 3, 4, 5)
    assert fold_views(nchw).shape == (4, 4, 5, 3)
    nhwc = jnp.transpose(nchw, (0, 1, 3, 4, 2))
    np.testing.assert_array_equal(fold_views(nchw), fold_views(nhwc))

    # NHWC with H == 3 (shape (B, V, 3, W, 3), W != 3): channel-last wins
    # only when channel-first doesn't also look plausible -- here BOTH axes
    # are 3-sized only in the last dim? No: shape[2] == 3 AND shape[-1] == 3
    # => documented NCHW tie-break. But (B, V, 5, W, 3) must be NHWC:
    tall_nhwc = jnp.arange(2 * 2 * 5 * 4 * 3).reshape(2, 2, 5, 4, 3)
    assert fold_views(tall_nhwc).shape == (4, 5, 4, 3)

    # The genuine (B, V, 3, W, 3) tie resolves to NCHW (the reference
    # contract); an explicit layout overrides.
    tie = jnp.arange(2 * 2 * 3 * 4 * 3).reshape(2, 2, 3, 4, 3)
    np.testing.assert_array_equal(fold_views(tie), fold_views(tie, "nchw"))
    assert fold_views(tie, "nhwc").shape == (4, 3, 4, 3)

    # Neither axis is 3: loud failure, not a silent mis-transpose.
    with pytest.raises(AssertionError):
        fold_views(jnp.zeros((2, 2, 5, 4, 7)))


def test_heatmap_net_shapes():
    net = HeatmapNet(num_heatmap=15)
    img = jnp.zeros((2, 2, 3, IMG, IMG))
    vs = net.init(jax.random.PRNGKey(0), img)
    hm, feat, pyr = net.apply(vs, img, return_feat=True)
    assert hm.shape == (2, 2, 15, HM, HM)
    assert feat.shape == (2, 2, HM, HM, 128)
    assert [p.shape for p in pyr] == [
        (2, 2, HM, HM, 64),
        (2, 2, HM // 2, HM // 2, 128),
        (2, 2, HM // 4, HM // 4, 256),
        (2, 2, HM // 8, HM // 8, 512),
    ]


def test_heatmap_net_view_major_parity():
    """view_major=True must be a pure layout change: same per-sample
    heatmaps/features/pyramid as the batch-major path (the (V, B)
    permutation rides fold_views' input transpose -- r5 b64-trace fix)."""
    net = HeatmapNet(num_heatmap=15)
    img = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 2, 3, IMG, IMG)),
        jnp.float32,
    )
    vs = net.init(jax.random.PRNGKey(0), img)
    hm, feat, pyr = net.apply(vs, img, return_feat=True)
    hm_v, feat_v, pyr_v = net.apply(
        vs, img, return_feat=True, view_major=True
    )
    np.testing.assert_allclose(hm_v, hm, rtol=0, atol=0)  # both batch-major
    np.testing.assert_allclose(
        feat_v, feat.transpose(1, 0, 2, 3, 4), rtol=0, atol=0
    )
    for pv, p in zip(pyr_v, pyr):
        np.testing.assert_allclose(pv, p.transpose(1, 0, 2, 3, 4))

    # NHWC input too (the uint8 device-preprocess path feeds channel-last).
    img_nhwc = jnp.transpose(img, (0, 1, 3, 4, 2))
    hm_n, feat_n, _ = net.apply(
        vs, img_nhwc, return_feat=True, view_major=True
    )
    np.testing.assert_allclose(hm_n, hm, rtol=0, atol=0)
    np.testing.assert_allclose(feat_n, feat_v, rtol=0, atol=0)


@pytest.mark.parametrize("num_views", [2, 3, 4])
def test_mvfex_shapes_all_view_layouts(num_views):
    cfg = _mvfex_cfg(num_views)
    net = HeatmapMVFexNet(cfg=cfg)
    img = jnp.zeros((1, num_views, 3, IMG, IMG))
    vs = net.init(jax.random.PRNGKey(0), img)
    hms, feats = net.apply(vs, img)
    assert len(hms) == 1 + cfg.mvf.num_former_layers
    for hm in hms:
        assert hm.shape == (1, num_views, 15, HM, HM)
    for f in feats:
        # Frame-feature stages are VIEW-MAJOR (V, B, h, w, C) -- the
        # internal layout contract (HeatmapMVFexNet docstring).
        assert f.shape == (num_views, 1, HM, HM, 128)
    # V refiners with independent weights stacked along axis 0.
    ref_params = vs["params"]["refiners"]
    leaf = jax.tree.leaves(ref_params)[0]
    assert leaf.shape[0] == num_views


def test_mvfex_conv_stack_head():
    cfg = _mvfex_cfg(2, mvf=MVFCfg(joint_query_adaptation=True, use_1by1_conv=False))
    net = HeatmapMVFexNet(cfg=cfg)
    img = jnp.zeros((1, 2, 3, IMG, IMG))
    vs = net.init(jax.random.PRNGKey(0), img)
    hms, _ = net.apply(vs, img)
    assert hms[0].shape == (1, 2, 15, HM, HM)


def test_stage1_frozen_unless_full_training():
    """full_training=False must stop gradients into the stage-1 encoders."""
    img = jnp.ones((1, 2, 3, IMG, IMG)) * 0.1
    for full_training, expect_grad in [(False, False), (True, True)]:
        cfg = _mvfex_cfg(2, full_training=full_training)
        net = HeatmapMVFexNet(cfg=cfg)
        vs = net.init(jax.random.PRNGKey(0), img)

        def loss(params):
            hms, _ = net.apply(
                {"params": params, "batch_stats": vs.get("batch_stats", {})}, img
            )
            return sum((h**2).mean() for h in hms[1:])  # refined stages only

        g = jax.grad(loss)(vs["params"])
        enc_norm = sum(
            float(jnp.abs(x).sum())
            for x in jax.tree.leaves(g["heatmap_estimator_stereo_front"])
        )
        assert (enc_norm > 0) == expect_grad, (full_training, enc_norm)


def _egorear_cfg(num_views=4, camera_model="ego4view_syn"):
    return EgoRearNetCfg(
        num_views=num_views,
        image_size=(IMG, IMG),
        camera_model=camera_model,
        heatmap_mvf=_mvfex_cfg(
            num_views,
            camera_model=camera_model,
            full_training=True,
            detach_heatmap_feat=True,
            detach_heatmap_feat_init=True,
            use_pred_heatmap_init=True,
        ),
        pose3d=Pose3DCfg(),
    )


def test_egorear_full_forward_syn():
    cfg = _egorear_cfg()
    net = EgoRearNet(cfg=cfg)
    rig = CameraRig.from_calib_file("ego4view_syn")
    img = jnp.zeros((1, 4, 3, IMG, IMG))
    vs = net.init(jax.random.PRNGKey(0), img, rig)
    preds, hms = net.apply(vs, img, rig)
    assert len(preds) == 1 + cfg.pose3d.num_former_layers
    for p in preds:
        assert p.shape == (1, 16, 3)
    assert len(hms) == 2


def test_egorear_full_forward_rw():
    cfg = _egorear_cfg(camera_model="ego4view_rw")
    net = EgoRearNet(cfg=cfg)
    rig = CameraRig.from_calib_file("ego4view_rw")
    img = jnp.zeros((1, 4, 3, IMG, IMG))
    mats = jnp.tile(jnp.eye(4), (1, 4, 1, 1))
    vs = net.init(jax.random.PRNGKey(0), img, rig, mats)
    preds, _ = net.apply(vs, img, rig, mats)
    assert preds[0].shape == (1, 16, 3)


def test_refined_heatmaps_depend_on_other_views():
    """The MVFex refiner must exchange information across views: perturbing
    view 1's input image must change view 0's refined heatmap."""
    cfg = _mvfex_cfg(2, full_training=True)
    net = HeatmapMVFexNet(cfg=cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 2, 3, IMG, IMG)).astype(np.float32))
    vs = net.init(jax.random.PRNGKey(1), img)
    hms_a, _ = net.apply(vs, img)
    img_b = img.at[:, 1].add(0.5)
    hms_b, _ = net.apply(vs, img_b)
    refined_delta = float(jnp.abs(hms_a[1][:, 0] - hms_b[1][:, 0]).max())
    assert refined_delta > 1e-6


def test_dense_cross_attention_option():
    """use_normal_cross_attn replaces deformable sampling with full attention
    (reference egoposeformer_heatmap_mvf_ex.py:840-842, 887-902)."""
    from egorear_tpu.models.configs import TransformerLayerCfg

    cfg = _mvfex_cfg(
        2,
        mvf=MVFCfg(
            joint_query_adaptation=True,
            use_1by1_conv=True,
            transformer=TransformerLayerCfg(use_normal_cross_attn=True),
        ),
    )
    net = HeatmapMVFexNet(cfg=cfg)
    img = jnp.zeros((1, 2, 3, IMG, IMG))
    vs = net.init(jax.random.PRNGKey(0), img)
    hms, _ = net.apply(vs, img)
    assert hms[1].shape == (1, 2, 15, HM, HM)
    # The dense path has its own attention params, not the deformable heads.
    ref = vs["params"]["refiners"]["transformer_0"]
    assert "cross_attn_dense" in ref and "cross_attn" not in ref

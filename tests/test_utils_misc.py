"""Tests for skeleton/viz utilities and auxiliary losses."""

import numpy as np

from egorear_tpu.ops.losses import (
    joints_coordinate_loss,
    joints_mse_loss,
    joints_ohkm_mse_loss,
    wing_loss,
)
from egorear_tpu.utils.image import (
    RunningAverageDict,
    compute_accel,
    compute_error_accel,
    denormalize,
    draw_2d_joints,
    pelvis_aligned_error,
    tensor2im,
)
from egorear_tpu.utils.skeleton import (
    BONES,
    PARENTS,
    bone_lengths,
    decode_heatmaps_np,
    export_pose_obj,
    renormalize_bone_lengths,
    skeleton_mesh,
    smooth_temporal,
)


def _rand_pose(rng, scale=30.0):
    return rng.normal(scale=scale, size=(16, 3)).astype(np.float32)


def test_kinematic_tree_is_valid():
    assert len(PARENTS) == 16
    assert PARENTS.count(-1) == 1
    assert len(BONES) == 15
    # Every non-root joint is reachable from the root.
    root = PARENTS.index(-1)
    for j in range(16):
        seen = set()
        while j != root:
            assert j not in seen, "cycle"
            seen.add(j)
            j = PARENTS[j]


def test_bone_renormalization():
    rng = np.random.default_rng(0)
    template = _rand_pose(rng)
    pose = _rand_pose(rng)
    out = renormalize_bone_lengths(pose, template)
    np.testing.assert_allclose(
        bone_lengths(out), bone_lengths(template), rtol=1e-5, atol=1e-5
    )


def test_temporal_smoothing_reduces_accel():
    rng = np.random.default_rng(1)
    seq = np.cumsum(rng.normal(size=(30, 16, 3)), axis=0).astype(np.float32)
    sm = smooth_temporal(seq, sigma=2.0)
    assert sm.shape == seq.shape
    assert compute_accel(sm).mean() < compute_accel(seq).mean()


def test_mesh_export(tmp_path):
    rng = np.random.default_rng(2)
    verts, faces = skeleton_mesh(_rand_pose(rng))
    assert len(verts) > 16 and len(faces) > 0
    assert faces.max() < len(verts)
    p = export_pose_obj(str(tmp_path / "pose.obj"), _rand_pose(rng))
    text = open(p).read()
    assert text.startswith("v ") and "\nf " in text


def test_decode_heatmaps_np():
    hm = np.zeros((2, 16, 16), np.float32)
    hm[0, 3, 7] = 1.0
    hm[1, 10, 2] = 0.3
    pts, maxv, valid = decode_heatmaps_np(hm, threshold=0.5)
    assert tuple(pts[0]) == (7, 3)
    assert tuple(pts[1]) == (2, 10)
    assert valid[0] and not valid[1]


def test_tensor_roundtrip_and_draw():
    rng = np.random.default_rng(3)
    raw = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    from egorear_tpu.utils.image import IMAGENET_MEAN, IMAGENET_STD

    norm = (raw - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
    np.testing.assert_allclose(denormalize(norm), raw, atol=1e-5)
    img = tensor2im(norm)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    pts = rng.uniform(2, 30, size=(16, 2))
    out = draw_2d_joints(img, pts)
    assert out.shape == img.shape and (out != img).any()


def test_accel_metrics_and_running_avg():
    t = np.arange(10, dtype=np.float32)
    seq = np.zeros((10, 16, 3), np.float32)
    seq[:, :, 0] = t[:, None] ** 2  # constant accel = 2
    np.testing.assert_allclose(compute_accel(seq), 2.0, atol=1e-5)
    np.testing.assert_allclose(compute_error_accel(seq, seq), 0.0, atol=1e-6)

    ra = RunningAverageDict()
    ra.update({"a": 1.0}, n=1)
    ra.update({"a": 3.0}, n=3)
    np.testing.assert_allclose(ra.averages()["a"], 2.5)

    pose = np.zeros((2, 16, 3), np.float32)
    shifted = pose + 5.0
    np.testing.assert_allclose(pelvis_aligned_error(shifted, pose), 0.0)


def test_aux_losses_finite_and_ordered():
    rng = np.random.default_rng(4)
    gt = rng.uniform(size=(2, 15, 16, 16)).astype(np.float32)
    good = gt + 0.01 * rng.normal(size=gt.shape).astype(np.float32)
    bad = rng.uniform(size=gt.shape).astype(np.float32)

    for fn in (joints_mse_loss, lambda p, t: joints_ohkm_mse_loss(p, t, topk=5)):
        lg, lb = float(fn(good, gt)), float(fn(bad, gt))
        assert np.isfinite(lg) and np.isfinite(lb) and lg < lb

    pts = rng.uniform(2, 14, size=(2, 15, 2)).astype(np.float32)
    for fn in (joints_coordinate_loss, wing_loss):
        v = float(fn(gt * 10, pts, image_size=(16, 16)))
        assert np.isfinite(v)


def test_unrealego_projection_and_dispatch():
    from egorear_tpu.ops.camera import projection_funcs, unrealego_project

    rng = np.random.default_rng(5)
    pts = rng.uniform([-50, -50, -150], [50, 50, -20], size=(2, 16, 3)).astype(
        np.float32
    )
    pts2d, fov = unrealego_project(pts)
    assert pts2d.shape == (2, 2, 16, 2) and fov.shape == (2, 2, 16)
    assert (np.asarray(pts2d) >= 0).all() and (np.asarray(pts2d) <= 1).all()
    # Stereo baseline: the two views project the same point differently.
    assert np.abs(np.asarray(pts2d)[:, 0] - np.asarray(pts2d)[:, 1]).max() > 1e-4
    assert projection_funcs["unrealego"] is unrealego_project

    # Scalar transcription check for one point, camera 0 (-6 cm x offset).
    from egorear_tpu.ops.camera import (
        _UNREALEGO_CENTER, _UNREALEGO_POLY_W2C, _UNREALEGO_SIZE,
    )
    p = pts[0, 0] + np.array([-6.0, 0, 0])
    r = np.sqrt(p[0] ** 2 + p[1] ** 2)
    th = np.arctan(-p[2] / r)
    rho = sum(a * th**i for i, a in enumerate(_UNREALEGO_POLY_W2C))
    u = np.clip((p[0] / r * rho + _UNREALEGO_CENTER[0]) / _UNREALEGO_SIZE[1], 0, 1)
    np.testing.assert_allclose(float(pts2d[0, 0, 0, 0]), u, atol=5e-4)


def test_blender_opencv_roundtrip():
    from egorear_tpu.ops.camera import (
        blender_to_opencv_extrinsics, opencv_to_blender_extrinsics,
    )

    rng = np.random.default_rng(6)
    m = np.eye(4)
    m[:3, 3] = rng.normal(size=3)
    out = opencv_to_blender_extrinsics(blender_to_opencv_extrinsics(m))
    np.testing.assert_allclose(out, m, atol=1e-12)


def test_egoglass_limb_masks():
    from egorear_tpu.utils.image import egoglass_limb_masks

    rng = np.random.default_rng(7)
    joints = rng.uniform(20, 230, size=(16, 2))
    masks = egoglass_limb_masks(joints, (256, 256))
    assert masks.shape == (5, 256, 256)
    assert all(m.max() == 255 for m in masks)


def test_patch_embed():
    import jax
    from egorear_tpu.models.layers import PatchEmbed

    m = PatchEmbed(patch_size=(4, 4), embed_dim=32)
    x = np.zeros((2, 16, 16, 8), np.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    out, h, w = m.apply(vs, x)
    assert out.shape == (2, 16, 32) and (h, w) == (4, 4)


def test_conv3x3s2_matmul_parity():
    import jax
    import flax.linen as nn
    from egorear_tpu.models.layers import (
        Conv3x3S2Matmul,
        Conv3x3S2Patches,
        Conv3x3S2SpaceToDepth,
    )

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    m1 = Conv3x3S2Matmul(12)
    m2 = nn.Conv(12, (3, 3), strides=2, padding=((1, 1), (1, 1)))
    m3 = Conv3x3S2Patches(12)
    m4 = Conv3x3S2SpaceToDepth(12)
    vs = m1.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m2.apply(vs, x))
    np.testing.assert_allclose(np.asarray(m1.apply(vs, x)), ref, atol=1e-5)
    # Same params drop into the other forms too (identical pytree).
    np.testing.assert_allclose(np.asarray(m3.apply(vs, x)), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m4.apply(vs, x)), ref, atol=1e-5)
    from egorear_tpu.models.layers import Conv3x3S2Unroll

    m5 = Conv3x3S2Unroll(12)
    np.testing.assert_allclose(np.asarray(m5.apply(vs, x)), ref, atol=1e-5)


def test_conv3x3s2_unroll_vmap_and_grad_parity():
    """The custom_vmap unroll must be EXACT vs the grouped-conv lowering,
    both forward and through grad-of-vmap (the training path)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from egorear_tpu.models.layers import Conv3x3S2Unroll

    V, B, H, W, Cin, F = 3, 2, 8, 8, 5, 7
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(V, B, H, W, Cin)), jnp.float32)

    ref_m = nn.vmap(
        nn.Conv, in_axes=0, out_axes=0,
        variable_axes={"params": 0}, split_rngs={"params": True},
    )(F, (3, 3), strides=2, padding=((1, 1), (1, 1)))
    unr_m = nn.vmap(
        Conv3x3S2Unroll, in_axes=0, out_axes=0,
        variable_axes={"params": 0}, split_rngs={"params": True},
    )(F)

    vs = ref_m.init(jax.random.PRNGKey(1), x)  # stacked (V, 3, 3, Cin, F)
    ref = ref_m.apply(vs, x)
    got = unr_m.apply(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x) ** 2)

    g_ref = jax.grad(loss(ref_m))(vs)
    g_unr = jax.grad(loss(unr_m))(vs)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4),
        g_ref, g_unr,
    )

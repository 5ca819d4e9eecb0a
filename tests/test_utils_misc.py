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

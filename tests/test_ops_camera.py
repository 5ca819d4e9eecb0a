"""Tests for the calibrated fisheye rig.

Expected projections come from an independent per-point numpy transcription of
the documented contract (utils/camera_models.py:70-104), including the
sequential in-place offset chaining the reference performs across cameras
(camera_models.py:57-63 + egoposeformer_mvf_ex.py:342-348).
"""

import json

import numpy as np
import pytest

from egorear_tpu.ops.camera import CameraRig, apply_se3, default_calib_path


def _load_calib():
    with open(default_calib_path()) as f:
        return json.load(f)["cameras"]


def _project_one(p, calib):
    x, y, z = p
    r = np.sqrt(x * x + y * y)
    theta = np.arctan(-z / r)
    rho = sum(a * theta**i for i, a in enumerate(calib["poly_world2cam"]))
    u = x / r * rho + calib["center_xy"][0]
    v = y / r * rho + calib["center_xy"][1]
    u /= calib["image_size_hw"][1]
    v /= calib["image_size_hw"][0]
    in_fov = (0 < u < 1) and (0 < v < 1)
    return np.clip([u, v], 0.0, 1.0), in_fov


_SYN_CHAIN = [  # (name, flip_xy, offset) applied sequentially in place
    ("camera_front_left", False, (6.0, 0.0, 0.0)),
    ("camera_front_right", False, (-6.0, 0.0, 0.0)),
    ("camera_back_left", True, (-6.0, 37.0, 0.0)),
    ("camera_back_right", True, (6.0, 37.0, 0.0)),
]


def _reference_chained_projection(points):
    """Sequential in-place semantics of the reference syn camera stack."""
    calib = _load_calib()
    state = np.array(points, np.float64)  # mutated across cameras
    pts2d, fovs = [], []
    for name, flip, off in _SYN_CHAIN:
        if flip:
            state[..., 0:2] *= -1
        state = state + np.asarray(off)
        uv = np.zeros(state.shape[:-1] + (2,))
        fov = np.zeros(state.shape[:-1], bool)
        for idx in np.ndindex(state.shape[:-1]):
            uv[idx], fov[idx] = _project_one(state[idx], calib[name])
        pts2d.append(uv)
        fovs.append(fov)
    return np.stack(pts2d, 0), np.stack(fovs, 0), state


@pytest.fixture(scope="module")
def sample_points():
    rng = np.random.default_rng(7)
    # Plausible body-joint cloud relative to the head-mounted device (cm).
    return rng.uniform([-60, -40, -170], [60, 80, 10], size=(3, 16, 3)).astype(
        np.float32
    )


def test_syn_chained_projection_matches_reference_semantics(sample_points):
    rig = CameraRig.from_calib_file("ego4view_syn")
    got2d, gotfov, got_anchor = rig.project(sample_points)
    want2d, wantfov, want_state = _reference_chained_projection(sample_points)
    # want arrays are (V, B, J, ...) -> transpose to (B, V, J, ...)
    np.testing.assert_allclose(
        np.asarray(got2d), want2d.transpose(1, 0, 2, 3), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(gotfov), wantfov.transpose(1, 0, 2))
    # Mutated end state (what the reference regresses 3D offsets against).
    np.testing.assert_allclose(np.asarray(got_anchor), want_state, atol=1e-4)
    # 4-view chain ends at a + (12, 0, 0).
    np.testing.assert_allclose(
        np.asarray(got_anchor) - sample_points, np.broadcast_to([12.0, 0.0, 0.0], sample_points.shape), atol=1e-5
    )


def test_syn_geometric_mode_is_independent(sample_points):
    rig = CameraRig.from_calib_file("ego4view_syn", chained=False)
    _, _, anchors = rig.project(sample_points)
    np.testing.assert_allclose(np.asarray(anchors), sample_points, atol=0)
    # front-left view must equal single-camera projection of a + (6,0,0).
    calib = _load_calib()["camera_front_left"]
    got2d, _, _ = rig.project(sample_points)
    p = sample_points[0, 0] + np.array([6.0, 0.0, 0.0])
    want, _ = _project_one(p, calib)
    np.testing.assert_allclose(np.asarray(got2d[0, 0, 0]), want, atol=1e-4)


def test_stereo_subrigs(sample_points):
    front = CameraRig.from_calib_file("ego4view_syn_stereo_front")
    back = CameraRig.from_calib_file("ego4view_syn_stereo_back")
    assert front.num_views == 2 and back.num_views == 2
    _, _, af = front.project(sample_points)
    _, _, ab = back.project(sample_points)
    # FL then FR chain restores the original points; BL then BR ends at +12x.
    np.testing.assert_allclose(np.asarray(af), sample_points, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ab) - sample_points,
        np.broadcast_to([12.0, 0.0, 0.0], sample_points.shape),
        atol=1e-5,
    )


def test_rw_rig_uses_per_sample_transforms(sample_points):
    rig = CameraRig.from_calib_file("ego4view_rw")
    B = sample_points.shape[0]
    rng = np.random.default_rng(3)
    # Random rigid transforms per (sample, view).
    mats = np.tile(np.eye(4, dtype=np.float32), (B, 4, 1, 1))
    mats[..., :3, 3] = rng.uniform(-0.2, 0.2, size=(B, 4, 3))
    got2d, gotfov, anchors = rig.project(sample_points, coord_trans_mat=mats)
    np.testing.assert_allclose(np.asarray(anchors), sample_points, atol=0)

    calib = _load_calib()
    names = list(calib)
    # Check one (b, v, j) against the scalar path: cm->m, transform, m->cm.
    for b, v, j in [(0, 0, 0), (1, 2, 5), (2, 3, 15)]:
        p = sample_points[b, j] * 0.01
        p = mats[b, v, :3, :3] @ p + mats[b, v, :3, 3]
        want, wfov = _project_one(p * 100.0, calib[names[v]])
        # fp32 Horner vs f64 power-sum polynomial evaluation: sub-pixel slack
        # in FOV; out-of-FOV points are masked downstream, loose check only.
        atol = 5e-4 if wfov else 5e-3
        np.testing.assert_allclose(np.asarray(got2d[b, v, j]), want, atol=atol)
        if wfov:
            assert bool(gotfov[b, v, j]) == wfov


def test_apply_se3_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 5, 3)).astype(np.float32)
    mats = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    mats[:, :3, 3] = [[1, 2, 3], [-1, 0, 4]]
    out = np.asarray(apply_se3(mats, pts))
    np.testing.assert_allclose(out, pts + mats[:, None, :3, 3], atol=1e-6)

"""Golden tests for the Blender<->OpenCV extrinsics converter family
(reference utils/util.py:300-471) against scipy.spatial.transform.Rotation
(the library the reference itself uses) and against direct transcriptions of
the reference's formulas."""

import numpy as np
import pytest

from egorear_tpu.ops import extrinsics as ex

scipy_rot = pytest.importorskip("scipy.spatial.transform")
Rotation = scipy_rot.Rotation

RNG = np.random.default_rng(7)


def rand_quat(n=None):
    q = RNG.normal(size=(4,) if n is None else (n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def rand_cam(n=None):
    return ex.trans_qrot_to_matrix(
        RNG.normal(size=(3,) if n is None else (n, 3)), rand_quat(n)
    )


def test_quat_to_matrix_matches_scipy():
    q = rand_quat(32)
    np.testing.assert_allclose(
        ex.quat_to_matrix(q), Rotation.from_quat(q).as_matrix(), atol=1e-12
    )


def test_euler_xyz_roundtrip_matches_scipy():
    angles = RNG.uniform(-np.pi, np.pi, size=(64, 3))
    angles[:, 1] *= 0.49  # stay off the gimbal lock for as_euler comparison
    m = ex.euler_xyz_to_matrix(angles)
    np.testing.assert_allclose(
        m, Rotation.from_euler("xyz", angles).as_matrix(), atol=1e-12
    )
    np.testing.assert_allclose(
        ex.matrix_to_euler_xyz(m),
        Rotation.from_matrix(m).as_euler("xyz"),
        atol=1e-9,
    )


def test_trans_qrot_to_matrix_reference_layout():
    t, q = RNG.normal(size=3), rand_quat()
    mat = ex.trans_qrot_to_matrix(t, q)
    # Reference (util.py:300-308): rows = [R_row | t_i], bottom [0,0,0,1].
    rot = Rotation.from_quat(q).as_matrix()
    expected = np.array([
        np.concatenate([rot[0], [t[0]]]),
        np.concatenate([rot[1], [t[1]]]),
        np.concatenate([rot[2], [t[2]]]),
        [0, 0, 0, 1],
    ])
    np.testing.assert_allclose(mat, expected, atol=1e-12)


def test_transform_pose_matches_reference_loop():
    pose = RNG.normal(size=(16, 3))
    mat = rand_cam()
    # util.py:324-328 transcription:
    homo = np.concatenate([pose, np.ones((16, 1))], axis=1)
    expected = (mat @ homo.T).T[:, :3]
    np.testing.assert_allclose(ex.transform_pose(pose, mat), expected,
                               atol=1e-12)


def test_global_skeleton_2_local_skeleton_is_homogeneous():
    pose = RNG.normal(size=(16, 3))
    w2c = rand_cam()
    out = ex.global_skeleton_2_local_skeleton(pose, w2c)
    assert out.shape == (16, 4)  # reference returns un-truncated homo rows
    np.testing.assert_allclose(out[:, :3], ex.transform_pose(pose, w2c),
                               atol=1e-12)
    np.testing.assert_allclose(out[:, 3], 1.0, atol=1e-12)


def test_get_concecutive_global_cam_rebases_first_frame():
    seq = rand_cam(8)
    last = rand_cam()
    out = ex.get_concecutive_global_cam(seq, last)
    np.testing.assert_allclose(out[0], last, atol=1e-10)
    # Relative motion within the sequence is preserved.
    rel_in = np.linalg.inv(seq[0]) @ seq[3]
    rel_out = np.linalg.inv(out[0]) @ out[3]
    np.testing.assert_allclose(rel_in, rel_out, atol=1e-10)


def test_relative_global_pose_roundtrip():
    T = 6
    local = RNG.normal(size=(T, 16, 3))
    cams = rand_cam(T)
    rel = ex.get_relative_global_pose_with_camera_matrix(local, cams)
    # Frame 0 is its own reference.
    np.testing.assert_allclose(rel[0], local[0], atol=1e-10)
    # Reference per-frame loop (util.py:360-372) transcription:
    cam0_inv = np.linalg.inv(cams[0])
    for i in range(T):
        expected = ex.transform_pose(local[i], cam0_inv @ cams[i])
        np.testing.assert_allclose(rel[i], expected, atol=1e-10)
    # Round-trip back to global (util.py:374-379).
    glob = ex.get_global_pose_from_relative_global_pose(rel, cams[0])
    for i in range(T):
        np.testing.assert_allclose(
            glob[i], ex.transform_pose(local[i], cams[i]), atol=1e-10
        )


def test_relative_global_pose_dict_interface():
    T = 4
    local = [RNG.normal(size=(16, 3)) for _ in range(T)]
    cams = [{"loc": RNG.normal(size=3), "rot": rand_quat()} for _ in range(T)]
    rel = ex.get_relative_global_pose(local, cams)
    assert len(rel) == T
    mats = np.stack([ex.trans_qrot_to_matrix(c["loc"], c["rot"])
                     for c in cams])
    expected = ex.get_relative_global_pose_with_camera_matrix(
        np.stack(local), mats)
    np.testing.assert_allclose(np.stack(rel), expected, atol=1e-10)


def test_get_relative_camera_matrix():
    c1, c2 = rand_cam(), rand_cam()
    np.testing.assert_allclose(
        ex.get_relative_camera_matrix(c1, c2), np.linalg.inv(c1) @ c2,
        atol=1e-12,
    )


def test_get_cv_rt_from_blender_reference_formula():
    loc = RNG.normal(size=3)
    rot = RNG.uniform(-np.pi, np.pi, size=3)
    T, R, mat = ex.get_cv_rt_from_blender(loc, rot)
    # util.py:440-459 transcription with scipy:
    R_bcam2cv = np.diag([1.0, -1.0, -1.0])
    R_world2bcam = Rotation.from_euler("xyz", rot).as_matrix().T
    T_world2bcam = -R_world2bcam @ loc
    np.testing.assert_allclose(R, R_bcam2cv @ R_world2bcam, atol=1e-12)
    np.testing.assert_allclose(T, R_bcam2cv @ T_world2bcam, atol=1e-12)
    np.testing.assert_allclose(mat[:3, :3], R, atol=1e-12)
    np.testing.assert_allclose(mat[:3, 3], T, atol=1e-12)
    np.testing.assert_allclose(mat[3], [0, 0, 0, 1], atol=1e-12)
    # A world point in front of the Blender camera (-Z in cam frame) maps
    # to +Z in the OpenCV frame.
    cam_pose = np.eye(4)
    cam_pose[:3, :3] = Rotation.from_euler("xyz", rot).as_matrix()
    cam_pose[:3, 3] = loc
    ahead_world = ex.transform_pose(np.array([[0.0, 0.0, -2.0]]), cam_pose)
    in_cv = ex.transform_pose(ahead_world, mat)
    assert in_cv[0, 2] > 0


def test_get_cv_rt_from_cv_inverts_pose():
    loc = RNG.normal(size=3)
    rot = RNG.uniform(-np.pi, np.pi, size=3)
    _, _, mat = ex.get_cv_rt_from_cv(loc, rot)
    pose = np.eye(4)
    pose[:3, :3] = Rotation.from_euler("xyz", rot).as_matrix()
    pose[:3, 3] = loc
    np.testing.assert_allclose(mat @ pose, np.eye(4), atol=1e-10)


def test_get_relative_transform_consistency():
    l1, l2 = RNG.normal(size=3), RNG.normal(size=3)
    r1, r2 = RNG.uniform(-np.pi, np.pi, size=3), RNG.uniform(-np.pi, np.pi, size=3)
    rotation, translation, mat_cv2_to_cv1 = ex.get_relative_transform(
        l1, r1, l2, r2)
    _, _, m1 = ex.get_cv_rt_from_blender(l1, r1)
    _, _, m2 = ex.get_cv_rt_from_blender(l2, r2)
    np.testing.assert_allclose(
        mat_cv2_to_cv1, np.linalg.inv(np.linalg.inv(m1) @ m2), atol=1e-10
    )
    np.testing.assert_allclose(
        ex.euler_xyz_to_matrix(rotation), mat_cv2_to_cv1[:3, :3], atol=1e-9
    )
    np.testing.assert_allclose(translation, mat_cv2_to_cv1[:3, 3], atol=1e-10)


def test_transformation_matrix_roundtrip():
    mat = rand_cam()
    eul, t = ex.transformation_matrix_to_translation_and_rotation(mat)
    np.testing.assert_allclose(
        eul, Rotation.from_matrix(mat[:3, :3]).as_euler("xyz"), atol=1e-9
    )
    np.testing.assert_allclose(t, mat[:3, 3], atol=1e-12)


def test_get_transform_relative_to_base_cv_reference_formula():
    bl, bb = RNG.normal(size=3), RNG.uniform(-np.pi, np.pi, size=3)
    l, r = RNG.normal(size=3), RNG.uniform(-np.pi, np.pi, size=3)
    new_loc, new_rot = ex.get_transform_relative_to_base_cv(bl, bb, l, r)
    # util.py:412-424 transcription:
    _, R_base, mat_base = ex.get_cv_rt_from_cv(bl, bb)
    _, R2, _ = ex.get_cv_rt_from_cv(l, r)
    loc_homo = np.concatenate([l, np.ones(1)])
    np.testing.assert_allclose(new_loc, (mat_base @ loc_homo)[:3], atol=1e-10)
    np.testing.assert_allclose(
        ex.euler_xyz_to_matrix(new_rot), R2.T @ R_base, atol=1e-9
    )

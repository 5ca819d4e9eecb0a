"""Metric tests: PA-MPJPE against a per-sample numpy Procrustes solver
(independent transcription of the classic similarity-transform solution used
by the reference, pose_metric.py:119-167), plus invariance properties."""

import numpy as np

from egorear_tpu.ops.metrics import (
    auc_3d,
    mpjpe,
    mpjpe_loss,
    pa_mpjpe,
    pck_3d,
    procrustes_align,
)


def _np_similarity_align(S1, S2):
    S1, S2 = S1.T, S2.T  # 3 x J
    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = np.sum(X1**2)
    K = X1 @ X2.T
    U, _, Vh = np.linalg.svd(K)
    V = Vh.T
    Z = np.eye(3)
    Z[-1, -1] = np.sign(np.linalg.det(U @ V.T))
    R = V @ Z @ U.T
    scale = np.trace(R @ K) / var1
    t = mu2 - scale * (R @ mu1)
    return (scale * R @ S1 + t).T


def _random_pose(rng, B=4, J=16):
    return rng.normal(scale=40.0, size=(B, J, 3)).astype(np.float32)


def test_mpjpe_basic():
    gt = np.zeros((2, 4, 3), np.float32)
    pred = gt.copy()
    pred[..., 0] = 3.0
    np.testing.assert_allclose(np.asarray(mpjpe(pred, gt)), [3.0, 3.0])
    np.testing.assert_allclose(float(mpjpe_loss(pred, gt)), 3.0)


def test_procrustes_matches_numpy():
    rng = np.random.default_rng(0)
    pred, gt = _random_pose(rng), _random_pose(rng)
    got = np.asarray(procrustes_align(pred, gt))
    want = np.stack([_np_similarity_align(pred[i], gt[i]) for i in range(len(pred))])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_pa_mpjpe_invariant_to_similarity_transform():
    rng = np.random.default_rng(1)
    gt = _random_pose(rng)
    pred = gt + rng.normal(scale=2.0, size=gt.shape).astype(np.float32)
    base = np.asarray(pa_mpjpe(pred, gt))

    # Apply a random rotation + scale + translation to pred: PA-MPJPE fixed.
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    pred2 = 1.6 * pred @ R.T + np.array([10.0, -4.0, 2.0], np.float32)
    np.testing.assert_allclose(np.asarray(pa_mpjpe(pred2, gt)), base, atol=1e-2)
    # And PA-MPJPE <= MPJPE up to numerics.
    assert (base <= np.asarray(mpjpe(pred, gt)) + 1e-3).all()


def test_pck_and_auc():
    gt = np.zeros((1, 4, 3), np.float32)
    pred = np.zeros((1, 4, 3), np.float32)
    pred[0, 0, 0] = 100.0  # within 150mm
    pred[0, 1, 0] = 200.0  # outside
    np.testing.assert_allclose(np.asarray(pck_3d(pred, gt)), [0.75])
    auc = float(auc_3d(pred, gt)[0])
    # Joints 2,3 are exact (all thresholds), joint 0 passes for thr>=100
    # (11 of 31), joint 1 never.
    want = (31 + 31 + 11 + 0) / (4 * 31)
    np.testing.assert_allclose(auc, want, atol=1e-6)


def test_per_view_mse_sum_matches_slice_loop_reference():
    """The fused per-view heatmap loss must equal the reference's per-view
    Python loop (heatmap.py:103-105). The fused form is load-bearing beyond
    style: the slice-loop form (V separate reductions over pred[:, i] of
    the stacked refiner outputs) triggers a genuine XLA SPMD backward
    miscompilation under stacked tensor sharding -- see
    train/tasks._per_view_mse_sum and tools/tp_trainer_f64_check.py."""
    from egorear_tpu.train.tasks import _per_view_mse_sum

    rng = np.random.RandomState(3)
    pred = rng.randn(2, 4, 15, 8, 8).astype(np.float32)
    gt = rng.randn(2, 4, 15, 8, 8).astype(np.float32)
    ref = sum(((pred[:, i] - gt[:, i]) ** 2).mean() for i in range(4))
    np.testing.assert_allclose(
        float(_per_view_mse_sum(pred, gt)), ref, rtol=1e-6)

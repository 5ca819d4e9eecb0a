"""3D pose metrics: MPJPE, Procrustes-aligned MPJPE, PCK3D, AUC3D.

Behavioral contract:
  * MPJPE: mean per-joint L2 (reference pose_estimation/utils/loss.py:9-12,
    pose_estimation/models/utils/pose_metric.py:10-16).
  * PA-MPJPE: similarity-transform (scale + rotation + translation) alignment
    solved per sample via SVD (reference pose_metric.py:119-167). The
    reference round-trips every sample through host numpy
    (pose_metric.py:104-116); here the whole batch is a single vmapped
    jnp.linalg.svd on device.
  * PCK3D @ 150mm and AUC3D over 31 thresholds in [0, 150] mm
    (reference loss.py:32-48).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(..., J, 3) -> (...,) mean per-joint L2 error."""
    return jnp.linalg.norm(gt - pred, axis=-1).mean(axis=-1)


def mpjpe_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Scalar mean L2 distance (reference MpjpeLoss, pose_metric.py:10-16)."""
    return jnp.linalg.norm(gt - pred, axis=-1).mean()


def _similarity_align_single(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Optimal similarity transform (sR, t) mapping S1 (J, 3) onto S2 (J, 3).

    Mirrors the classic orthogonal-Procrustes solution the reference computes
    per sample in numpy (pose_metric.py:119-167), operating on 3xJ internally.
    """
    X1 = (S1 - S1.mean(axis=0, keepdims=True)).T  # (3, J)
    X2 = (S2 - S2.mean(axis=0, keepdims=True)).T
    mu1 = S1.mean(axis=0)[:, None]
    mu2 = S2.mean(axis=0)[:, None]

    hp = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hp)
    var1 = jnp.sum(X1**2)
    K = mm(X1, X2.T)  # (3, 3)
    U, _, Vh = jnp.linalg.svd(K)
    V = Vh.T
    det = jnp.linalg.det(mm(U, V.T))
    Z = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=S1.dtype)).at[-1, -1].set(jnp.sign(det))
    R = mm(mm(V, Z), U.T)
    scale = jnp.trace(mm(R, K)) / jnp.maximum(var1, 1e-12)
    t = mu2 - scale * mm(R, mu1)
    S1_hat = scale * mm(R, S1.T) + t
    return S1_hat.T


def procrustes_align(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Batched similarity alignment: (B, J, 3) x (B, J, 3) -> (B, J, 3)."""
    return jax.vmap(_similarity_align_single)(pred, gt)


def pa_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(B, J, 3) -> (B,) Procrustes-aligned MPJPE."""
    return mpjpe(procrustes_align(pred, gt), gt)


def pck_3d(pred: jnp.ndarray, gt: jnp.ndarray, threshold: float = 150.0) -> jnp.ndarray:
    """(B, J, 3) -> (B,) fraction of joints within ``threshold`` (mm inputs)."""
    dist = jnp.linalg.norm(gt - pred, axis=-1)
    return (dist <= threshold).mean(axis=-1)


def auc_3d(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    thresholds=tuple(np.linspace(0.0, 150.0, 31).tolist()),
) -> jnp.ndarray:
    """(B, J, 3) -> (B,) mean PCK over the reference's 31 thresholds."""
    dist = jnp.linalg.norm(gt - pred, axis=-1)  # (B, J)
    th = jnp.asarray(thresholds, dtype=dist.dtype)  # (T,)
    pck = (dist[..., None] <= th).mean(axis=-2)  # (B, T)
    return pck.mean(axis=-1)

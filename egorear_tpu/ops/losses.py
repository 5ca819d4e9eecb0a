"""Auxiliary heatmap/keypoint losses.

Behavioral contract (reference pose_estimation/utils/loss.py:51-226): the
configs train with plain MSE, but the reference ships these alternatives and
they are part of the component inventory:
  * JointsMSELoss (:51-75) -- 0.5 x per-joint MSE mean, optional per-joint
    target weights.
  * JointsOHKMMSELoss (:78-120) -- online hard keypoint mining: keep the
    top-k per-sample joint losses.
  * JointsCoordinateLoss (:180-200) -- smooth-L1 on soft-argmax coordinates.
  * WingLoss (:202-226) -- log-shaped loss on soft-argmax coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from egorear_tpu.ops.heatmap import soft_argmax_2d


def joints_mse_loss(pred, target, target_weight=None):
    """(B, J, H, W) heatmaps -> scalar. 0.5 x mean MSE per joint, averaged."""
    B, J = pred.shape[:2]
    p = pred.reshape(B, J, -1)
    t = target.reshape(B, J, -1)
    if target_weight is not None:
        w = target_weight.reshape(B, J, 1)
        p = p * w
        t = t * w
    per_joint = 0.5 * ((p - t) ** 2).mean(axis=(0, 2))  # (J,)
    return per_joint.mean()


def joints_ohkm_mse_loss(pred, target, target_weight=None, topk: int = 8):
    """Online hard keypoint mining: mean of the top-k per-joint losses."""
    B, J = pred.shape[:2]
    p = pred.reshape(B, J, -1)
    t = target.reshape(B, J, -1)
    if target_weight is not None:
        w = target_weight.reshape(B, J, 1)
        p = p * w
        t = t * w
    per = 0.5 * ((p - t) ** 2).mean(axis=2)  # (B, J)
    top, _ = jax.lax.top_k(per, topk)
    return top.sum(axis=1).mean() / topk


def joints_coordinate_loss(pred_hm, target_pts, image_size=(64, 64)):
    """Smooth-L1 between soft-argmax decode and target points (normalized)."""
    pts, _ = soft_argmax_2d(pred_hm)
    size = jnp.asarray([image_size[1], image_size[0]], dtype=pts.dtype)
    pts = pts / size
    tgt = target_pts / size
    d = pts - tgt
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d**2, ad - 0.5).mean()


def wing_loss(pred_hm, target_pts, width=5.0, curvature=0.5,
              image_size=(64, 64)):
    """Wing loss on soft-argmax coordinates (loss.py:202-226)."""
    pts, _ = soft_argmax_2d(pred_hm)
    size = jnp.asarray([image_size[1], image_size[0]], dtype=pts.dtype)
    diff = jnp.abs(target_pts / size - pts / size)
    C = width - width * np.log(1.0 + width / curvature)
    loss = jnp.where(
        diff < width,
        width * jnp.log(1.0 + diff / curvature),
        diff - C,
    )
    return loss.mean()

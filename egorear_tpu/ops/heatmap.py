"""Gaussian joint-heatmap rendering and decoding.

Behavioral contract (verified against the reference implementation):
  * rendering: /root/reference/generate_heatmap.py:10-48 -- integer-rounded
    joint center on the heatmap grid, a (6*sigma+1)^2 Gaussian stamp that is
    exactly zero outside the stamp box, and a zero target-weight when the stamp
    box lies fully outside the heatmap.
  * decoding: /root/reference/pose_estimation/utils/loss.py:122-177 -- flat
    argmax (first max wins), x = idx % W, y = idx // W, optional [0,1]
    normalization, validity = maxval >= threshold; plus the softmax-weighted
    soft-argmax variant.

The renderer here is a single vectorized jnp program (vmapped over joints and
any leading batch/view axes) so heatmap-target generation can run fused
on-device as part of the input pipeline instead of the reference's offline
NPY precompute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _trunc_round_half_up(x: jnp.ndarray) -> jnp.ndarray:
    # Python ``int(v + 0.5)`` truncates toward zero; for the (rare) negative
    # out-of-view joints this differs from floor, and the reference uses it.
    return jnp.trunc(x + 0.5).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("image_size", "heatmap_size", "sigma")
)
def render_gaussian_targets(
    joints_2d: jnp.ndarray,
    image_size: int = 872,
    heatmap_size: int = 64,
    sigma: float = 1.0,
):
    """Render per-joint Gaussian target heatmaps.

    Args:
      joints_2d: (..., J, 2) pixel coordinates in the original image frame.
      image_size / heatmap_size / sigma: grid geometry; stride is
        image_size / heatmap_size.

    Returns:
      targets: (..., J, heatmap_size, heatmap_size) float32.
      weights: (..., J) float32 in {0, 1}; 0 when the Gaussian stamp box lies
        fully outside the heatmap (such joints render as all-zeros).
    """
    stride = image_size / heatmap_size
    tmp = int(sigma * 3)

    mu = _trunc_round_half_up(joints_2d / stride)  # (..., J, 2) int32
    mu_x, mu_y = mu[..., 0], mu[..., 1]

    # Stamp box [mu - tmp, mu + tmp]; invalid if entirely off-grid.
    ul_x, ul_y = mu_x - tmp, mu_y - tmp
    br_x, br_y = mu_x + tmp + 1, mu_y + tmp + 1
    valid = ~(
        (ul_x >= heatmap_size)
        | (ul_y >= heatmap_size)
        | (br_x < 0)
        | (br_y < 0)
    )

    xs = jnp.arange(heatmap_size, dtype=jnp.int32)
    dx = xs - mu_x[..., None]  # (..., J, W)
    dy = xs - mu_y[..., None]  # (..., J, H)

    gx = jnp.exp(-(dx.astype(jnp.float32) ** 2) / (2.0 * sigma**2))
    gy = jnp.exp(-(dy.astype(jnp.float32) ** 2) / (2.0 * sigma**2))
    # Zero outside the stamp box (the reference never writes there).
    gx = jnp.where(jnp.abs(dx) <= tmp, gx, 0.0)
    gy = jnp.where(jnp.abs(dy) <= tmp, gy, 0.0)

    target = gy[..., :, None] * gx[..., None, :]  # (..., J, H, W)
    weights = valid.astype(jnp.float32)
    target = target * weights[..., None, None]
    return target, weights


def render_gaussian_targets_np(joints_2d, image_size=872, heatmap_size=64, sigma=1.0):
    """NumPy twin of :func:`render_gaussian_targets` for offline tools."""
    t, w = render_gaussian_targets(
        jnp.asarray(joints_2d, dtype=jnp.float32),
        image_size=image_size,
        heatmap_size=heatmap_size,
        sigma=sigma,
    )
    return np.asarray(t), np.asarray(w)


def argmax_2d(heatmaps: jnp.ndarray, threshold: float = 0.5, normalize: bool = False):
    """Decode per-channel peak locations from heatmaps.

    Args:
      heatmaps: (..., H, W).
      threshold: validity threshold on the peak value.
      normalize: divide x by W and y by H.

    Returns:
      pts2d: (..., 2) float32 (x, y) -- ties broken toward the first
        (row-major) maximum, matching the reference flat-argmax decode.
      maxvals: (...,) float32 peak values.
      valid: (...,) bool, maxvals >= threshold.
    """
    *lead, H, W = heatmaps.shape
    flat = heatmaps.reshape(*lead, H * W)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    if normalize:
        x = x / W
        y = y / H
    pts2d = jnp.stack([x, y], axis=-1)
    valid = maxvals >= threshold
    return pts2d, maxvals, valid


def soft_argmax_2d(heatmaps: jnp.ndarray, normalize: bool = False):
    """Softmax-weighted expected peak location (differentiable decode)."""
    *lead, H, W = heatmaps.shape
    flat = heatmaps.reshape(*lead, H * W)
    maxvals = jnp.max(flat, axis=-1)
    p = jax.nn.softmax(flat, axis=-1).reshape(*lead, H, W)
    px = p.sum(axis=-2)  # marginal over y -> (..., W)
    py = p.sum(axis=-1)  # marginal over x -> (..., H)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    x = (px * xs).sum(axis=-1)
    y = (py * ys).sum(axis=-1)
    if normalize:
        x = x / W
        y = y / H
    return jnp.stack([x, y], axis=-1), maxvals

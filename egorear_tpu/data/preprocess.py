"""Fused on-device preprocessing (the BASELINE.json north-star path).

Host workers only decode JPEG/PNG bytes to raw uint8; everything after --
antialiased bicubic 872->256 resize, ImageNet normalization, and Gaussian
GT-heatmap rendering from 2D joints -- runs as one jitted XLA program on the
TPU, feeding HBM-resident multi-view batches:

  * the resize is expressed as two MXU matmuls with precomputed
    PIL-equivalent filter matrices (separable Keys bicubic a=-0.5,
    support scaled by the downscale ratio -- the same coefficient scheme
    PIL's ImagingResample uses), so "decode on host, everything else on
    device" needs no gather/scatter;
  * heatmap targets come from egorear_tpu.ops.heatmap.render_gaussian_targets
    (bit-identical to the offline generate_heatmap.py precompute), so the
    NPY files become optional.

This replaces the reference's host-side torchvision transform stack
(datasets/*: PIL BICUBIC resize + ToTensor + Normalize) and its offline NPY
heatmap precompute for the training hot path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_FILTER_CACHE = {}


def pil_bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) resampling matrix equal to PIL's antialiased
    BICUBIC coefficients (Keys a=-0.5, support 2*max(in/out, 1))."""
    key = (in_size, out_size)
    if key in _FILTER_CACHE:
        return _FILTER_CACHE[key]

    def keys(x):
        a = -0.5
        x = np.abs(x)
        return np.where(
            x < 1.0,
            ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
        )

    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    m = np.zeros((out_size, in_size), np.float32)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        xs = np.arange(xmin, xmax)
        w = keys((xs - center + 0.5) / filterscale)
        s = w.sum()
        if s != 0:
            w = w / s
        m[xx, xmin:xmax] = w
    _FILTER_CACHE[key] = m
    return m


@functools.partial(jax.jit, static_argnames=("out_size",))
def resize_bicubic_device(images_u8: jnp.ndarray, out_size: int = 256):
    """uint8 (..., H, W, 3) -> float32 (..., out, out, 3) in [0, 1].

    Two MXU matmuls per image; matches PIL Image.resize(BICUBIC) with a
    float intermediate (PIL's own 8-bit intermediate differs by <= 1 LSB).
    """
    *lead, H, W, C = images_u8.shape
    My = jnp.asarray(pil_bicubic_matrix(H, out_size))
    Mx = jnp.asarray(pil_bicubic_matrix(W, out_size))
    x = images_u8.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,...hwc->...owc", My, x, precision=hp)
    x = jnp.einsum("pw,...owc->...opc", Mx, x, precision=hp)
    # PIL clips + rounds to uint8 after resampling; reproduce, then scale.
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    return x / 255.0


@functools.partial(jax.jit, static_argnames=("out_size",))
def preprocess_images_device(images_u8: jnp.ndarray, out_size: int = 256):
    """uint8 (B, V, H, W, 3) -> normalized float32 (B, V, 3, out, out)."""
    x = resize_bicubic_device(images_u8, out_size)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (x - mean) / std
    return jnp.moveaxis(x, -1, -3)


@functools.partial(
    jax.jit, static_argnames=("image_size", "heatmap_size", "sigma", "drop_head")
)
def preprocess_batch_device(
    images_u8: jnp.ndarray,  # (B, V, H, W, 3) uint8
    joints_2d: Optional[jnp.ndarray] = None,  # (B, V, J, 2) px in source frame
    image_size: int = 872,
    heatmap_size: int = 64,
    sigma: float = 1.0,
    drop_head: bool = True,
) -> dict:
    """The fused north-star kernel: images + (optional) GT heatmaps on device.

    Returns {"img": (B, V, 3, 256, 256) f32, "gt_heatmap": (B, V, J', 64, 64)}
    with J' = J-1 when drop_head (the reference drops the Head channel,
    ego4view_syn_heatmap.py:109).
    """
    from egorear_tpu.ops.heatmap import render_gaussian_targets

    out = {"img": preprocess_images_device(images_u8, 256)}
    if joints_2d is not None:
        targets, _ = render_gaussian_targets(
            joints_2d, image_size=image_size, heatmap_size=heatmap_size,
            sigma=sigma,
        )
        if drop_head:
            targets = targets[..., 1:, :, :]
        out["gt_heatmap"] = targets
    return out

"""Deformable attention sampling -- the TPU-native replacement for the
reference's only native kernel (mmcv's CUDA ``MultiScaleDeformableAttnFunction``,
invoked at /root/reference/pose_estimation/models/utils/deform_attn.py:155-162).

Semantics (matching the CUDA kernel / ``grid_sample(align_corners=False,
padding_mode='zeros')``): for each (query q, head h, point p) with a sampling
location ``loc`` normalized to [0, 1],

    y = loc_y * H - 0.5,  x = loc_x * W - 0.5
    out[q, h] = sum_p w[q, h, p] * bilinear(value[:, :, h], y, x)

where bilinear corners falling outside the grid contribute zero.

The model family only ever uses a single 64x64 level with 16 points and <= 16
queries (deform_attn.py:30, egoposeformer_heatmap_mvf_ex.py:772), so the
multi-level machinery collapses to one level; views are folded into the batch
axis by the callers.

Implementations, one contract (all cross-tested against a scalar oracle):
  * ``gather``  -- XLA take_along_axis oracle; reference for correctness.
  * ``onehot``  -- bilinear sample as two interpolation matmuls (MXU work
                   instead of scatter/gather units). Differentiable.
  * ``smatrix`` -- points, corners and attention weights folded into one
                   (Q, H*W) sampling operator + a single matmul (~13x less
                   matmul work than onehot at these shapes). Differentiable.
  * ``pallas``  -- TPU kernel building the S operator in VMEM (zero HBM
                   traffic for it) + one MXU matmul; smatrix/onehot VJPs.

On top of these, the *lazy* variants (``deformable_sampling_shared``,
``lazy_deform_sample``) sample RAW memory shared across heads -- the memory
and value projections commute with attention-weighted bilinear interpolation
and run post-sampling on ~Q*heads vectors instead of the grid (see
models/layers.py MSDeformAttnLazy). The fused lazy Pallas kernel additionally
keeps batch-independent position tables VMEM-resident across grid steps and
derives the border-correction ones-sample from S row sums.
"""

from __future__ import annotations

import functools
import os
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Impl = Literal["auto", "gather", "onehot", "pallas"]


def deformable_sampling(
    value: jnp.ndarray,
    loc: jnp.ndarray,
    attn_w: jnp.ndarray,
    impl: Impl = "auto",
) -> jnp.ndarray:
    """Attention-weighted bilinear sampling.

    Args:
      value: (B, H, W, nh, ch) per-head value maps.
      loc: (B, Q, nh, P, 2) sampling locations in [0, 1], (x, y) order.
      attn_w: (B, Q, nh, P) attention weights (softmaxed by the caller).
      impl: implementation selector; see the measured defaults below.

    Returns:
      (B, Q, nh * ch) sampled features.
    """
    if impl == "auto":
        import os

        # Measured inside the full model on v5e (B=16, bf16): onehot
        # 44.7 ms/batch, pallas 46.5, gather 54.8 -- and standalone
        # (B=32): onehot 932us, pallas 1495us, gather 2502us. onehot is the
        # default; override with EGOREAR_DEFORM_IMPL={gather,onehot,pallas}.
        impl = os.environ.get("EGOREAR_DEFORM_IMPL", "onehot")
    if impl == "gather":
        return _sample_gather(value, loc, attn_w)
    if impl == "onehot":
        return _sample_onehot(value, loc, attn_w)
    if impl == "smatrix":
        return _sample_smatrix(value, loc, attn_w)
    if impl == "pallas":
        return _sample_pallas_vjp(value, loc, attn_w)
    raise ValueError(f"unknown impl {impl!r}")


def _corner_weights(loc, H, W):
    """Shared corner/weight computation.

    Returns x0, y0 (int32 floors), lx, ly (fractional parts), with
    ``loc`` -> pixel mapping x = loc_x * W - 0.5 (align_corners=False).
    """
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    return x0.astype(jnp.int32), y0.astype(jnp.int32), lx, ly


def _sample_gather(value, loc, attn_w):
    B, H, W, nh, ch = value.shape
    Q, P = loc.shape[1], loc.shape[3]

    # (B, nh, HW, ch) / (B, nh, Q, P, ...)
    v = value.transpose(0, 3, 1, 2, 4).reshape(B, nh, H * W, ch)
    loc = loc.transpose(0, 2, 1, 3, 4)  # (B, nh, Q, P, 2)
    w = attn_w.transpose(0, 2, 1, 3)  # (B, nh, Q, P)

    x0, y0, lx, ly = _corner_weights(loc, H, W)

    out = jnp.zeros((B, nh, Q, ch), dtype=value.dtype)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xc = x0 + dx
        yc = y0 + dy
        wt = jnp.where(dx == 1, lx, 1.0 - lx) * jnp.where(dy == 1, ly, 1.0 - ly)
        ok = (xc >= 0) & (xc < W) & (yc >= 0) & (yc < H)
        idx = jnp.clip(yc, 0, H - 1) * W + jnp.clip(xc, 0, W - 1)  # (B,nh,Q,P)
        g = jnp.take_along_axis(
            v, idx.reshape(B, nh, Q * P)[..., None], axis=2
        ).reshape(B, nh, Q, P, ch)
        out = out + jnp.sum(
            g * (wt * ok.astype(wt.dtype) * w)[..., None], axis=3
        )
    return out.transpose(0, 2, 1, 3).reshape(B, Q, nh * ch)


def _interp_matrix(c0, frac, n):
    """Rows of a linear-interpolation matrix: (..., K) indices/fracs -> (..., K, n).

    Each row holds (1-frac) at c0 and frac at c0+1, with out-of-range corners
    dropped (zero padding).
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, frac.shape + (n,), frac.ndim)
    c0e = c0[..., None]
    m0 = (iota == c0e) & (c0e >= 0) & (c0e < n)
    m1 = (iota == c0e + 1) & (c0e + 1 >= 0) & (c0e + 1 < n)
    return (
        m0.astype(frac.dtype) * (1.0 - frac[..., None])
        + m1.astype(frac.dtype) * frac[..., None]
    )


def _sample_onehot(value, loc, attn_w):
    B, H, W, nh, ch = value.shape
    Q, P = loc.shape[1], loc.shape[3]

    loc = loc.transpose(0, 2, 1, 3, 4).reshape(B, nh, Q * P, 2)
    w = attn_w.transpose(0, 2, 1, 3).reshape(B, nh, Q * P)
    x0, y0, lx, ly = _corner_weights(loc, H, W)

    ry = _interp_matrix(y0, ly, H)  # (B, nh, QP, H)
    cx = _interp_matrix(x0, lx, W)  # (B, nh, QP, W)

    v = value.transpose(0, 3, 1, 2, 4)  # (B, nh, H, W, ch)
    # Row interpolation on the MXU: (QP, H) @ (H, W*ch).
    rows = jnp.einsum(
        "bnph,bnhwc->bnpwc", ry, v, preferred_element_type=jnp.float32
    )
    # Column interpolation + attention-weighted reduction over points.
    samp = jnp.einsum("bnpwc,bnpw->bnpc", rows, cx)
    samp = samp * w[..., None]
    out = samp.reshape(B, nh, Q, P, ch).sum(axis=3)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, nh * ch).astype(value.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _make_deform_kernel(H: int, W: int, P: int):
    """Build the kernel for a static (H, W, points-per-query) geometry.

    One (batch * head) program. Strategy: accumulate the full bilinear
    sampling operator S of shape (Q, H*W) -- for each of the P points per
    query, scatter its 4 corner weights (bilinear x attention weight) into the
    query's row via lane-dimension iota comparisons -- then emit the sample as
    ONE MXU matmul S @ value_flat. Everything stays 2-D, so no Mosaic-hostile
    lane/sublane reshapes.

    VMEM working set (64x64 map, Q=16, ch=64, f32): value 1 MB + S 0.25 MB.
    """

    def kernel(value_ref, locx_ref, locy_ref, w_ref, out_ref):
        # value_ref: (1, H*W, ch); locx/locy/w: (1, Q, P); out: (1, Q, ch).
        Q = out_ref.shape[1]
        HW = H * W

        iota = jax.lax.broadcasted_iota(jnp.int32, (Q, HW), 1)
        S = jnp.zeros((Q, HW), jnp.float32)

        for p in range(P):
            x = locx_ref[0, :, p : p + 1] * W - 0.5  # (Q, 1)
            y = locy_ref[0, :, p : p + 1] * H - 0.5
            aw = w_ref[0, :, p : p + 1]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            lx = x - x0
            ly = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            for dy in (0, 1):
                for dx in (0, 1):
                    xc = x0i + dx
                    yc = y0i + dy
                    ok = (xc >= 0) & (xc < W) & (yc >= 0) & (yc < H)
                    flat = jnp.where(ok, yc * W + xc, -1)  # (Q, 1)
                    wt = (
                        (lx if dx else 1.0 - lx)
                        * (ly if dy else 1.0 - ly)
                        * aw
                    )
                    S = S + jnp.where(iota == flat, wt, 0.0)

        out_ref[0] = jnp.dot(
            S.astype(value_ref.dtype), value_ref[0],
            preferred_element_type=jnp.float32,
        )

    return kernel


def _sample_pallas_fwd(value, loc, attn_w):
    B, H, W, nh, ch = value.shape
    Q, P = loc.shape[1], loc.shape[3]
    G = B * nh

    # The value block stays in the input dtype (bf16 halves VMEM and doubles
    # DMA bandwidth; the S operator and the matmul accumulate in f32).
    # Locations/weights are always f32: bf16 would quantize sampling
    # positions to ~0.25 px on a 64-wide map.
    v = value.transpose(0, 3, 1, 2, 4).reshape(G, H * W, ch)
    loc_t = loc.transpose(0, 2, 1, 3, 4).reshape(G, Q, P, 2).astype(jnp.float32)
    locx = loc_t[..., 0]
    locy = loc_t[..., 1]
    w = attn_w.transpose(0, 2, 1, 3).reshape(G, Q, P).astype(jnp.float32)

    out = pl.pallas_call(
        _make_deform_kernel(H, W, P),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, H * W, ch), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, P), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, P), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, P), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, ch), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Q, ch), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Q * H * W * ch,
            bytes_accessed=G * (H * W * ch + 3 * Q * P + Q * ch) * 4,
            transcendentals=0,
        ),
    )(v, locx, locy, w)
    out = out.reshape(B, nh, Q, ch)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, nh * ch).astype(value.dtype)


@jax.custom_vjp
def _sample_pallas_vjp(value, loc, attn_w):
    return _sample_pallas_fwd(value, loc, attn_w)


def _pallas_fwd_rule(value, loc, attn_w):
    return _sample_pallas_fwd(value, loc, attn_w), (value, loc, attn_w)


def _pallas_bwd_rule(res, g):
    value, loc, attn_w = res
    _, vjp = jax.vjp(_sample_onehot, value, loc, attn_w)
    return vjp(g)


_sample_pallas_vjp.defvjp(_pallas_fwd_rule, _pallas_bwd_rule)


# ---------------------------------------------------------------------------
# Shared-value sampling: one value map sampled by every head (used by the
# "lazy" deformable attention, which samples RAW memory once and applies the
# memory/value projections to the ~Q*P sampled vectors afterwards -- linear
# maps commute with attention-weighted bilinear interpolation).
# ---------------------------------------------------------------------------


def deformable_sampling_shared(
    value: jnp.ndarray,  # (B, H, W, Cs) -- shared across heads
    loc: jnp.ndarray,  # (B, Q, nh, P, 2)
    attn_w: jnp.ndarray,  # (B, Q, nh, P)
    impl: Impl = "auto",
) -> jnp.ndarray:
    """Attention-weighted bilinear sampling of a head-shared value map.

    Returns (B, Q, nh, Cs). NOTE: zero padding means constants do NOT sample
    to themselves at borders; callers handling additive biases should append
    a ones channel and rescale.
    """
    if impl == "auto":
        import os

        # pallas by default for bf16: measured in the full model on v5e
        # (B=16, bf16) the lazy path runs 20.3 ms/batch with the Pallas
        # kernel (S operator built in VMEM, zero S HBM traffic) vs 21.1
        # smatrix, 48.8 gather; the onehot rows formulation OOMs at model
        # scale. f32 value blocks exceed the 16M scoped-VMEM budget, so f32
        # dispatches to the differentiable smatrix path (also the backward
        # for pallas). Override with
        # EGOREAR_DEFORM_SHARED_IMPL={gather,onehot,smatrix,pallas}.
        default = "pallas" if value.dtype == jnp.bfloat16 else "smatrix"
        impl = os.environ.get("EGOREAR_DEFORM_SHARED_IMPL", default)
    if impl == "pallas":
        return _sample_shared_pallas(value, loc, attn_w)
    if impl == "onehot":
        return _sample_shared_onehot(value, loc, attn_w)
    if impl == "smatrix":
        return _sample_shared_smatrix(value, loc, attn_w)
    return _sample_shared_gather(value, loc, attn_w)


def _sample_shared_gather(value, loc, attn_w):
    B, H, W, Cs = value.shape
    Q, nh, P = loc.shape[1], loc.shape[2], loc.shape[3]
    v = value.reshape(B, H * W, Cs)
    x0, y0, lx, ly = _corner_weights(loc, H, W)  # (B, Q, nh, P)
    out = jnp.zeros((B, Q, nh, Cs), dtype=value.dtype)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xc = x0 + dx
        yc = y0 + dy
        wt = jnp.where(dx == 1, lx, 1.0 - lx) * jnp.where(dy == 1, ly, 1.0 - ly)
        ok = (xc >= 0) & (xc < W) & (yc >= 0) & (yc < H)
        idx = jnp.clip(yc, 0, H - 1) * W + jnp.clip(xc, 0, W - 1)
        g = jnp.take_along_axis(
            v, idx.reshape(B, Q * nh * P)[..., None], axis=1
        ).reshape(B, Q, nh, P, Cs)
        out = out + jnp.sum(
            g * (wt * ok.astype(wt.dtype) * attn_w)[..., None], axis=3
        )
    return out


def _sample_shared_onehot(value, loc, attn_w):
    B, H, W, Cs = value.shape
    Q, nh, P = loc.shape[1], loc.shape[2], loc.shape[3]
    l = loc.reshape(B, Q * nh * P, 2)
    x0, y0, lx, ly = _corner_weights(l, H, W)
    ry = _interp_matrix(y0, ly, H)  # (B, QnP, H)
    cx = _interp_matrix(x0, lx, W)  # (B, QnP, W)
    rows = jnp.einsum(
        "bph,bhwc->bpwc", ry, value, preferred_element_type=jnp.float32
    )
    samp = jnp.einsum("bpwc,bpw->bpc", rows, cx)
    samp = samp.reshape(B, Q, nh, P, Cs) * attn_w[..., None]
    return samp.sum(axis=3).astype(value.dtype)


def _sample_shared_pallas_fwd_impl(value, loc, attn_w):
    value, loc, attn_w = map(jnp.asarray, (value, loc, attn_w))
    B, H, W, Cs = value.shape
    Q, nh, P = loc.shape[1], loc.shape[2], loc.shape[3]
    # Treat heads as extra queries against one value map per batch element.
    locf = loc.transpose(0, 2, 1, 3, 4).reshape(B, nh * Q, 1, P, 2)
    wf = attn_w.transpose(0, 2, 1, 3).reshape(B, nh * Q, 1, P)
    v = value.reshape(B, H, W, 1, Cs)
    out = _sample_pallas_fwd(v, locf, wf)  # (B, nh*Q, Cs)
    return out.reshape(B, nh, Q, Cs).transpose(0, 2, 1, 3)


@jax.custom_vjp
def _sample_shared_pallas(value, loc, attn_w):
    return _sample_shared_pallas_fwd_impl(value, loc, attn_w)


def _shared_pallas_fwd_rule(value, loc, attn_w):
    return _sample_shared_pallas_fwd_impl(value, loc, attn_w), (value, loc, attn_w)


def _shared_pallas_bwd_rule(res, g):
    # Backward through the differentiable smatrix formulation (the onehot
    # rows intermediate would OOM at the lazy path's channel counts).
    value, loc, attn_w = res
    _, vjp = jax.vjp(_sample_shared_smatrix, value, loc, attn_w)
    return vjp(g)


_sample_shared_pallas.defvjp(_shared_pallas_fwd_rule, _shared_pallas_bwd_rule)


def _sample_smatrix(value, loc, attn_w):
    """Q-granular sampling operator: fold the P points, bilinear corners and
    attention weights into one S (Q, H*W) matrix per (batch, head), then emit
    the sample as a single S @ value matmul. ~13x less matmul work than the
    rows formulation (_sample_onehot) at this model's shapes."""
    B, H, W, nh, ch = value.shape
    Q, P = loc.shape[1], loc.shape[3]

    loc = loc.transpose(0, 2, 1, 3, 4)  # (B, nh, Q, P, 2)
    w = attn_w.transpose(0, 2, 1, 3)  # (B, nh, Q, P)
    x0, y0, lx, ly = _corner_weights(loc, H, W)

    ry = _interp_matrix(y0, ly, H)  # (B, nh, Q, P, H)
    cx = _interp_matrix(x0, lx, W)  # (B, nh, Q, P, W)
    ry = ry * w[..., None]  # fold attention weights once
    S = jnp.einsum("bnqph,bnqpw->bnqhw", ry, cx,
                   preferred_element_type=jnp.float32)
    S = S.reshape(B, nh, Q, H * W).astype(value.dtype)

    v = value.transpose(0, 3, 1, 2, 4).reshape(B, nh, H * W, ch)
    out = jnp.einsum("bnqs,bnsc->bnqc", S, v,
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, nh * ch).astype(value.dtype)


def _sample_shared_smatrix(value, loc, attn_w):
    """Shared-value variant of the S-matrix formulation."""
    B, H, W, Cs = value.shape
    Q, nh, P = loc.shape[1], loc.shape[2], loc.shape[3]
    l = loc.transpose(0, 2, 1, 3, 4)  # (B, nh, Q, P, 2)
    w = attn_w.transpose(0, 2, 1, 3)
    x0, y0, lx, ly = _corner_weights(l, H, W)
    ry = _interp_matrix(y0, ly, H) * w[..., None]
    cx = _interp_matrix(x0, lx, W)
    S = jnp.einsum("bnqph,bnqpw->bnqhw", ry, cx,
                   preferred_element_type=jnp.float32)
    S = S.reshape(B, nh * Q, H * W).astype(value.dtype)
    out = jnp.einsum("bqs,bsc->bqc", S, value.reshape(B, H * W, Cs),
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, nh, Q, Cs).transpose(0, 2, 1, 3)
    return out.astype(value.dtype)


# ---------------------------------------------------------------------------
# Fused lazy sampling: a Pallas kernel builds the full bilinear sampling
# operator S (rows = nh*Q queries, cols = H*W grid cells) ON THE MXU -- per
# query S_q = Ry_q^T @ Cx_q, where Ry/Cx are the tiny per-axis interpolation
# factors (attention weights folded into Ry) -- and streams it to HBM; the
# actual sampling contractions (S @ feat, S @ pos) then run as large XLA
# batched matmuls. Compared to building S via iota-compares over the full
# (NQ, HW) grid per point (round-1 kernel), the per-point work drops from
# O(NQ*HW) VPU selects to O(NQ*(H+W)) compares plus one MXU dot; in the full
# model this took the deformable-sampling share of the b64 inference step
# from ~18 ms to the noise floor. s_one (the border-correction ones-sample)
# is computed exactly as sum_p (sum_h Ry)(sum_w Cx).
#
# Round-3 layout: S columns pack KW grid rows each (m = (h%KW)*W + w,
# _s_pack_geometry), so the minor dim is ~512 -- the previous (JP*H, W=64)
# form half-filled every 128-lane bf16 tile, doubling S's real bytes across
# the builder write and both consumer reads (the b64 profile showed the S
# pipeline at ~10 ms/step, mostly bandwidth). The row factor also shrinks
# JP*H -> JP*(H/KW) sublanes with one y-corner per slot, cutting the
# iota-compare VPU work ~8x.
# ---------------------------------------------------------------------------


def _s_build_jp() -> int:
    """Queries packed per MXU matmul in the S builder (power of two).

    JP queries are stacked along the M (sublane) dim of one matmul: a
    block-diagonal row factor (JP*H1, JP*P*2) against the stacked column
    factor (JP*P*2, KW*W) yields the JP stacked packed operator maps in one
    MXU pass -- at JP=8 that is 8 MXU-shaped matmuls per program instead of
    64 latency-bound per-query ones; the redundant block-diagonal MACs are
    free next to per-matmul latency. The M-packed output (G, JP*H1, COLS)
    splits to (G, JP, H1, COLS) as a layout-free bitcast, so the downstream
    sampling contractions stay transpose-free. Override: EGOREAR_SBUILD_JP
    (1 recovers the per-query form).
    """
    return int(os.environ.get("EGOREAR_SBUILD_JP", "8"))


def _s_pack_geometry(H: int, W: int):
    """Column packing for the S operator: the grid's h axis splits into
    (h1, k) with h = h1*KW + k, and S columns hold m = k*W + w (COLS = KW*W,
    targeting 128 so bf16 tiles use all 128 lanes -- the round-2 layout's
    W=64 minor dim only filled half a lane tile, doubling every S byte
    moved). Because the grid's flat index is hw = h1*COLS + m, the consumer
    views of S and of the (HW, C) feature tokens are BOTH pure leading-dim
    splits -- free bitcasts, no transposes.

    Why 128 and not wider: the builder's VPU cost is
    KP2*COLS (column factor) + ROWS*KP2 (row factor) with ROWS = JP*H/KW;
    minimizing over KW gives KW ~ sqrt(JP*H/W) ~ 2 for the 64x64 grids --
    measured on v5e, the COLS=512 variant spent 1.8x the round-2 builder's
    VPU time and gave back the einsum savings."""
    KW = max(1, min(H, 128 // W))
    while H % KW:
        KW -= 1
    return KW, H // KW


def _make_s_builder_kernel(ROWS: int, COLS: int, out_dtype):
    def kernel(trow_ref, wy_ref, c0_ref, cx0_ref, cx1_ref, s_ref):
        # trow/wy: (BP, G, 1, KP2) -- per (query, point, y-corner) slot, the
        # target sublane row jq*H1 + (y//KW) and the guarded y-weight
        # (bilinear y-factor x attention weight). c0/cx0/cx1: (BP, G, KP2) --
        # the packed column (y%KW)*W + x0 and the guarded x-corner weights.
        # BP > 1 packs several batch elements per program (fewer program
        # prologues/DMAs; the merge below is a free leading-dim reshape).
        # No transposes or lane/sublane reshapes anywhere.
        BP, G, KP2 = trow_ref.shape[0], trow_ref.shape[1], trow_ref.shape[3]
        BG = BP * G
        trow = trow_ref[...].reshape(BG, 1, KP2)
        wy = wy_ref[...].reshape(BG, 1, KP2)

        # Row factor (BG, ROWS, KP2): one compare per element -- each slot
        # holds a single y-corner (the round-2 builder's two-corner rows
        # over JP*H=512 sublanes cost 8x more VPU work).
        irow = jax.lax.broadcasted_iota(jnp.int32, (BG, ROWS, KP2), 1)
        ry = jnp.where(irow == trow, wy, 0.0)

        # Column factor (BG, KP2, COLS): both x-corners land at packed
        # columns c0 and c0+1 (x-guards folded into the weights outside, so
        # a corner crossing a k-block boundary contributes zero).
        c0 = c0_ref[...].reshape(BG, KP2)[..., None]
        im = jax.lax.broadcasted_iota(jnp.int32, (BG, KP2, COLS), 2)
        cx0 = cx0_ref[...].reshape(BG, KP2)[..., None]
        cx1 = cx1_ref[...].reshape(BG, KP2)[..., None]
        cx = (jnp.where(im == c0, cx0, 0.0)
              + jnp.where(im == c0 + 1, cx1, 0.0))

        # The factors are cast to the output dtype first: S is consumed in
        # out_dtype anyway, so the rounding moves from the product to the
        # factors (comparable error) at the MXU's fast-input rate.
        S = jax.lax.dot_general(
            ry.astype(out_dtype), cx.astype(out_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s_ref[...] = S.astype(out_dtype).reshape(BP, G, ROWS, COLS)

    return kernel


def _build_s_operator(loc, attn_w, H, W, out_dtype):
    """Sampling operator S (B, G, ROWS, COLS) in ``out_dtype`` plus the
    exact border-clipped ones-sample (B, NQp, 1) f32.

    Query q = g*JP + jq owns rows [jq*H1, (jq+1)*H1) of pack g; column
    m = k*W + w and row-offset h1 address grid cell h = h1*KW + k (see
    :func:`_s_pack_geometry` -- flat hw = h1*COLS + m, so consumer reshapes
    are free). loc (B, Q, nh, P, 2) in [0,1]; attn_w (B, Q, nh, P). Query
    rows are padded to a multiple of JP (zero weights -> zero S rows).
    """
    B, Q, nh, P = attn_w.shape
    NQ = nh * Q
    JP = _s_build_jp()
    KW, H1 = _s_pack_geometry(H, W)
    ROWS, COLS = JP * H1, KW * W
    locf = loc.transpose(0, 2, 1, 3, 4).reshape(B, NQ, P, 2).astype(jnp.float32)
    wf = attn_w.transpose(0, 2, 1, 3).reshape(B, NQ, P).astype(jnp.float32)
    NQp = -(-NQ // JP) * JP
    if NQp != NQ:
        pad = ((0, 0), (0, NQp - NQ), (0, 0))
        locf = jnp.pad(locf, pad + ((0, 0),))
        wf = jnp.pad(wf, pad)
    G, KP = NQp // JP, JP * P
    KP2 = 2 * KP  # one slot per (query, point, y-corner)

    x = locf[..., 0] * W - 0.5
    y = locf[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Corner guards fold into the weights: an out-of-range y would alias
    # into a neighboring query's rows, an x on a k-block edge into the next
    # block's first column -- both must contribute exactly zero.
    in_y0 = ((y0i >= 0) & (y0i < H)).astype(jnp.float32)
    in_y1 = ((y0i + 1 >= 0) & (y0i + 1 < H)).astype(jnp.float32)
    wy0 = (1.0 - ly) * wf * in_y0
    wy1 = ly * wf * in_y1
    in_x0 = ((x0i >= 0) & (x0i < W)).astype(jnp.float32)
    in_x1 = ((x0i + 1 >= 0) & (x0i + 1 < W)).astype(jnp.float32)
    cx0 = (1.0 - lx) * in_x0
    cx1 = lx * in_x1

    # Exact ones-sample (border-clipped bilinear mass), pure jnp -- cheaper
    # outside the kernel.
    span_x = in_x0 * (1.0 - lx) + in_x1 * lx
    span_y = in_y0 * (1.0 - ly) + in_y1 * ly
    s_one = (wf * span_x * span_y).sum(-1)[:, :, None]  # (B, NQp, 1)

    # Per-slot (query, point, y-corner) kernel inputs.
    jq = (jnp.arange(NQp, dtype=jnp.int32) % JP)[None, :, None]
    yc = jnp.stack([y0i, y0i + 1], axis=-1)  # (B, NQp, P, 2)
    trow = jq[..., None] * H1 + yc // KW
    wy = jnp.stack([wy0, wy1], axis=-1)
    c0 = (yc % KW) * W + x0i[..., None]
    cx0b = jnp.broadcast_to(cx0[..., None], c0.shape)
    cx1b = jnp.broadcast_to(cx1[..., None], c0.shape)

    def lane4(v):  # (B, NQp, P, 2) -> (B, G, 1, KP2)
        return v.reshape(B, G, 1, KP2)

    def flat3(v):  # (B, NQp, P, 2) -> (B, G, KP2)
        return v.reshape(B, G, KP2)

    ins = [lane4(trow), lane4(wy), flat3(c0), flat3(cx0b), flat3(cx1b)]
    # Batch elements per program: fewer program prologues + larger output
    # DMAs. Guarded by the per-program S-block footprint (the factors and
    # the f32 dot accumulator scale with it; ~1M elems keeps the program
    # comfortably inside VMEM).
    BP = int(os.environ.get("EGOREAR_SBUILD_BP", "1"))
    while BP > 1 and (B % BP or BP * G * ROWS * COLS > 2**20):
        BP //= 2
    in_specs = ([pl.BlockSpec((BP, G, 1, KP2), lambda b: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)] * 2
                + [pl.BlockSpec((BP, G, KP2), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)] * 3)
    S = pl.pallas_call(
        _make_s_builder_kernel(ROWS, COLS, out_dtype),
        grid=(B // BP,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BP, G, ROWS, COLS), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, ROWS, COLS), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * G * ROWS * KP2 * COLS,
            bytes_accessed=B * NQp * (H * W * jnp.dtype(out_dtype).itemsize
                                      + P * 24),
            transcendentals=0,
        ),
    )(*ins)
    # S keeps the padded row count and its packed kernel-native shape; the
    # (ROWS -> JP, H1) split at the consumer is a free bitcast. Slicing or
    # reshaping the full operator here would copy it.
    return S, s_one, (JP, H1, COLS)


def _lazy_sample_pallas_fwd(feat, loc, attn_w, pos, block=False):
    feat, loc, attn_w = map(jnp.asarray, (feat, loc, attn_w))
    B, HW, Cin = feat.shape
    Q, nh = loc.shape[1], loc.shape[2]
    H = W = int(HW**0.5)

    S, s_one_flat, (JP, H1, COLS) = _build_s_operator(
        loc, attn_w, H, W, feat.dtype
    )
    NQ = nh * Q
    Gq = S.shape[1]
    NQp = Gq * JP
    # Contract the packed grid dims of the 5-D view directly. The column
    # packing (hw = h1*COLS + m, _s_pack_geometry) makes BOTH views below
    # pure leading-dim splits -- layout-free bitcasts -- and (h1, m) stay
    # adjacent/minor so the dots need no operand transpose.
    S5 = S.reshape(B, Gq, JP, H1, COLS)
    s_feat_flat = jnp.einsum(
        "bgjhm,bhmc->bgjc", S5, feat.reshape(B, H1, COLS, Cin),
        preferred_element_type=jnp.float32,
    ).reshape(B, NQp, Cin)
    s_pos_flat = None
    if pos is not None:
        pos = jnp.asarray(pos)
        if pos.ndim == 2:
            pos = pos[None]
        G = pos.shape[0]
        assert B % G == 0, (B, G)
        # The G group tables map onto the batch axis either INTERLEAVED
        # (batch-major (B, V) fold: index = b * G + g, ``block=False``) or
        # in contiguous BLOCKS (view-major (V, B) fold: index = g * (B//G)
        # + b, ``block=True``); both are pure leading-dim reshapes of S,
        # so callers never transpose the feature grid.
        posr = pos.astype(S.dtype).reshape(G, H1, COLS, pos.shape[-1])
        if block:
            S6 = S5.reshape(G, B // G, Gq, JP, H1, COLS)
            s_pos_flat = jnp.einsum(
                "vbgjhm,vhmc->vbgjc", S6, posr,
                preferred_element_type=jnp.float32,
            ).reshape(B, NQp, pos.shape[-1])
        else:
            S6 = S5.reshape(B // G, G, Gq, JP, H1, COLS)
            s_pos_flat = jnp.einsum(
                "bvgjhm,vhmc->bvgjc", S6, posr,
                preferred_element_type=jnp.float32,
            ).reshape(B, NQp, pos.shape[-1])

    def _split(o):
        # Padded query rows are zeros; drop them on the small outputs.
        return o[:, :NQ].reshape(B, nh, Q, -1).transpose(0, 2, 1, 3)

    s_feat = _split(s_feat_flat).astype(feat.dtype)
    s_pos = (_split(s_pos_flat).astype(feat.dtype)
             if s_pos_flat is not None else None)
    s_one = _split(s_one_flat).astype(feat.dtype)
    return s_feat, s_pos, s_one


def _lazy_sample_reference(feat, loc, attn_w, pos, block=False):
    """Differentiable jnp twin of the fused lazy kernel (used as its VJP and
    as the f32 / non-TPU path). Samples via the smatrix formulation."""
    B, HW, Cin = feat.shape
    H = W = int(HW**0.5)
    parts = [feat]
    if pos is not None:
        if pos.ndim == 2:
            pos_b = jnp.broadcast_to(pos[None], (B,) + pos.shape)
        elif block:  # (G, HW, C), contiguous blocks (view-major: g*(B//G)+b)
            G = pos.shape[0]
            pos_b = jnp.repeat(pos, B // G, axis=0)
        else:  # (G, HW, C), groups interleaved along the batch (b*G + g)
            G = pos.shape[0]
            pos_b = jnp.tile(pos, (B // G, 1, 1))
        parts.append(pos_b.astype(feat.dtype))
    parts.append(jnp.ones((B, HW, 1), feat.dtype))
    buf = jnp.concatenate(parts, axis=-1).reshape(B, H, W, -1)
    s = _sample_shared_smatrix(buf, loc, attn_w)
    s_feat = s[..., :Cin]
    if pos is not None:
        C = pos.shape[-1]
        return s_feat, s[..., Cin:Cin + C], s[..., -1:]
    return s_feat, None, s[..., -1:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lazy_sample(block, feat, loc, attn_w, pos):
    return _lazy_sample_pallas_fwd(feat, loc, attn_w, pos, block)


def _lazy_fwd_rule(block, feat, loc, attn_w, pos):
    return (_lazy_sample_pallas_fwd(feat, loc, attn_w, pos, block),
            (feat, loc, attn_w, pos))


def _lazy_bwd_rule(block, res, g):
    """Analytic VJP of the lazy sampling op.

    The round-1 backward ran generic AD through the jnp reference twin --
    recomputing the full forward (incl. a f32 (NQ, HW) smatrix operator in
    HBM) and transposing it, ~7 of the 8 ms of the b8 train step's refiner
    backward. Analytically:

      d_feat = S^T-contraction of g_feat   (one batched matmul; S rebuilt
               by the non-differentiable Pallas builder),
      d_pos  = group-summed S^T-contraction of g_pos,
      d_loc / d_attn_w = corner gathers of the per-query adjoint field
               A[b,qn,hw] = feat.g_feat + pos.g_pos + g_one  (two batched
               matmuls + a 64-wide take_along_axis), combined with the
               bilinear corner weights / their derivatives. Border masks are
               piecewise-constant in AD, matching the reference's discrete
               one-hot masks.
    """
    feat, loc, attn_w, pos = res
    g_feat, g_pos, g_one = g
    B, HW, Cin = feat.shape
    Q, nh, P = loc.shape[1], loc.shape[2], loc.shape[3]
    H = W = int(HW**0.5)
    NQ = nh * Q

    S, _, (JP, H1, COLS) = _build_s_operator(loc, attn_w, H, W, feat.dtype)
    Gq = S.shape[1]
    NQp = Gq * JP
    S5 = S.reshape(B, Gq, JP, H1, COLS)

    def pack(gx):  # (B, Q, nh, X) -> (B, Gq, JP, X), head-major rows
        flat = gx.transpose(0, 2, 1, 3).reshape(B, NQ, gx.shape[-1])
        if NQp != NQ:
            flat = jnp.pad(flat, ((0, 0), (0, NQp - NQ), (0, 0)))
        return flat.reshape(B, Gq, JP, gx.shape[-1])

    gf = pack(g_feat).astype(S.dtype)
    d_feat = jnp.einsum(
        "bgjhm,bgjc->bhmc", S5, gf, preferred_element_type=jnp.float32,
    ).reshape(B, HW, Cin).astype(feat.dtype)

    d_pos = None
    if pos is not None:
        pos = jnp.asarray(pos)
        pos3 = pos[None] if pos.ndim == 2 else pos
        G = pos3.shape[0]
        gp = pack(g_pos).astype(S.dtype)
        if block:  # view-major fold: groups are contiguous batch blocks
            S6 = S5.reshape(G, B // G, Gq, JP, H1, COLS)
            d_pos3 = jnp.einsum(
                "vbgjhm,vbgjc->vhmc",
                S6, gp.reshape(G, B // G, Gq, JP, -1),
                preferred_element_type=jnp.float32,
            ).reshape(G, HW, pos3.shape[-1]).astype(pos.dtype)
        else:
            S6 = S5.reshape(B // G, G, Gq, JP, H1, COLS)
            d_pos3 = jnp.einsum(
                "bvgjhm,bvgjc->vhmc",
                S6, gp.reshape(B // G, G, Gq, JP, -1),
                preferred_element_type=jnp.float32,
            ).reshape(G, HW, pos3.shape[-1]).astype(pos.dtype)
        d_pos = d_pos3[0] if pos.ndim == 2 else d_pos3

    # ---- adjoint field A (B, Q, nh, HW) in f32 ----
    A = jnp.einsum("bqnc,bsc->bqns", g_feat.astype(feat.dtype), feat,
                   preferred_element_type=jnp.float32)
    if pos is not None:
        if block:
            gp4 = g_pos.reshape(G, B // G, Q, nh, -1).astype(pos3.dtype)
            A = A + jnp.einsum(
                "vbqnc,vsc->vbqns", gp4, pos3,
                preferred_element_type=jnp.float32,
            ).reshape(B, Q, nh, HW)
        else:
            gp4 = g_pos.reshape(B // G, G, Q, nh, -1).astype(pos3.dtype)
            A = A + jnp.einsum(
                "bvqnc,vsc->bvqns", gp4, pos3,
                preferred_element_type=jnp.float32,
            ).reshape(B, Q, nh, HW)
    A = A + g_one.astype(jnp.float32)  # ones channel: constant over hw

    # ---- per-point adjoint contractions via separable one-hot factors ----
    # (corner GATHERS from A were 14 ms/step of TPU scalar-gather; as two
    # small batched matmuls against the per-axis one-hot factors the same
    # quantities are ~1 ms of MXU work)
    f32 = jnp.float32
    x = loc[..., 0].astype(f32) * W - 0.5  # (B, Q, nh, P)
    y = loc[..., 1].astype(f32) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def onehots(c0, n):
        iota = jax.lax.broadcasted_iota(jnp.int32, c0.shape + (n,), c0.ndim)
        c0e = c0[..., None]
        o0 = ((iota == c0e) & (c0e >= 0) & (c0e < n)).astype(f32)
        o1 = ((iota == c0e + 1) & (c0e + 1 >= 0) & (c0e + 1 < n)).astype(f32)
        return o0, o1

    o0y, o1y = onehots(y0i, H)  # (B, Q, nh, P, H), border-masked
    o0x, o1x = onehots(x0i, W)
    ry = o0y * (1.0 - ly)[..., None] + o1y * ly[..., None]
    cx = o0x * (1.0 - lx)[..., None] + o1x * lx[..., None]
    dry = o1y - o0y  # d ry / d y_pixel
    dcx = o1x - o0x

    A2 = A.reshape(B, Q, nh, H, W)
    acx = jnp.einsum("bqnhw,bqnpw->bqnph", A2, cx,
                     preferred_element_type=f32)
    ady = jnp.einsum("bqnhw,bqnph->bqnpw", A2, ry,
                     preferred_element_type=f32)

    d_w = jnp.einsum("bqnph,bqnph->bqnp", acx, ry).astype(attn_w.dtype)
    aw = attn_w.astype(f32)
    d_x = aw * W * jnp.einsum("bqnpw,bqnpw->bqnp", ady, dcx)
    d_y = aw * H * jnp.einsum("bqnph,bqnph->bqnp", acx, dry)
    d_loc = jnp.stack([d_x, d_y], axis=-1).astype(loc.dtype)
    return d_feat, d_loc, d_w, d_pos


_lazy_sample.defvjp(_lazy_fwd_rule, _lazy_bwd_rule)


def lazy_deform_sample(feat, loc, attn_w, pos=None, impl: str = "auto",
                       pos_block: bool = False):
    """Sample raw memory (+ optional batch-independent pos table) at
    deformable locations, returning (s_feat, s_pos|None, s_one).

    feat (B, HW, Cin); loc (B, Q, nh, P, 2); attn_w (B, Q, nh, P);
    pos (HW, C) or (G, HW, C) with the G groups laid out along the batch
    either INTERLEAVED (batch index = b * G + g, batch-major (B, V) fold,
    the default) or in contiguous BLOCKS (index = g * (B//G) + b, view-major
    (V, B) fold, ``pos_block=True``). The ones-sample s_one rescales
    additive constants at zero-padded borders.
    """
    if impl == "auto":
        import os

        default = "pallas" if feat.dtype == jnp.bfloat16 else "reference"
        impl = os.environ.get("EGOREAR_LAZY_IMPL", default)
    if impl == "pallas":
        return _lazy_sample(pos_block, feat, loc, attn_w, pos)
    return _lazy_sample_reference(feat, loc, attn_w, pos, pos_block)

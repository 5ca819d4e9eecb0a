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
# Fused lazy sampling kernel: samples raw features and an optional
# batch-independent position table WITHOUT materializing the broadcast/concat
# buffer (which the profiler showed costing ~800 MB/step of HBM traffic at
# batch 16). The position block's index map is constant, so Pallas keeps it
# VMEM-resident across grid steps instead of re-reading it per batch element.
# ---------------------------------------------------------------------------


def _make_lazy_kernel(H: int, W: int, P: int, nh: int, with_pos: bool):
    def kernel(*refs):
        if with_pos:
            feat_ref, pos_ref, locx_ref, locy_ref, w_ref, of_ref, op_ref, oo_ref = refs
        else:
            feat_ref, locx_ref, locy_ref, w_ref, of_ref, oo_ref = refs
            pos_ref = op_ref = None  # pos_ref block: (1, HW, C)
        NQ = locx_ref.shape[1]  # nh * Q rows, each with its own locations
        HW = H * W
        # NOTE: S stays f32 -- Mosaic cannot relayout the bf16 select masks
        # here ("invalid relayout ... vector<60x4096xi1>"), and bf16
        # accumulation showed no wall-clock win when attempted.
        iota = jax.lax.broadcasted_iota(jnp.int32, (NQ, HW), 1)
        S = jnp.zeros((NQ, HW), jnp.float32)
        for p in range(P):
            x = locx_ref[0, :, p : p + 1] * W - 0.5
            y = locy_ref[0, :, p : p + 1] * H - 0.5
            aw = w_ref[0, :, p : p + 1]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            lx = x - x0
            ly = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            # Per x-corner pair share the flat base index: the adjacent
            # corners live at flat0 and flat0 + 1, so one subtraction covers
            # both compares. Out-of-range corners are killed by pre-masked
            # weights (an aliased flat0 at a row edge then matches with
            # weight exactly 0, which is safe). Wall-clock is neutral vs the
            # 4-compare variant on v5e (15.9 vs 15.75 ms full model) but the
            # VPU op count is ~25% lower.
            okx0 = (x0i >= 0).astype(jnp.float32)
            okx1 = (x0i + 1 < W).astype(jnp.float32)
            for dy in (0, 1):
                yc = y0i + dy
                oky = ((yc >= 0) & (yc < H))
                wy = (ly if dy else 1.0 - ly) * aw
                w0 = wy * (1.0 - lx) * okx0
                w1 = wy * lx * okx1
                flat0 = jnp.where(oky, yc * W + x0i, -2)
                d = iota - flat0
                S = S + jnp.where(d == 0, w0, jnp.where(d == 1, w1, 0.0))

        Sc = S.astype(feat_ref.dtype)
        of_ref[0] = jnp.dot(Sc, feat_ref[0], preferred_element_type=jnp.float32)
        if with_pos:
            op_ref[0] = jnp.dot(Sc.astype(pos_ref.dtype), pos_ref[0],
                                preferred_element_type=jnp.float32)
        oo_ref[0] = jnp.sum(S, axis=1, keepdims=True)

    return kernel


def _lazy_sample_pallas_fwd(feat, loc, attn_w, pos):
    feat, loc, attn_w = map(jnp.asarray, (feat, loc, attn_w))
    B, HW, Cin = feat.shape
    Q, nh, P = loc.shape[1], loc.shape[2], loc.shape[3]
    H = W = int(HW**0.5)
    NQ = nh * Q

    locf = loc.transpose(0, 2, 1, 3, 4).reshape(B, NQ, P, 2).astype(jnp.float32)
    wf = attn_w.transpose(0, 2, 1, 3).reshape(B, NQ, P).astype(jnp.float32)

    with_pos = pos is not None
    ins = [feat]
    in_specs = [pl.BlockSpec((1, HW, Cin), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    if with_pos:
        pos = jnp.asarray(pos)
        C = pos.shape[-1]
        if pos.ndim == 2:
            pos = pos[None]
        G = pos.shape[0]
        assert B % G == 0, (B, G)
        per_group = B // G
        ins.append(pos)
        # Constant within each group of consecutive grid steps, so Pallas
        # keeps the block VMEM-resident instead of re-reading per batch.
        in_specs.append(pl.BlockSpec(
            (1, HW, C), lambda b: (b // per_group, 0, 0),
            memory_space=pltpu.VMEM,
        ))
    ins += [locf[..., 0], locf[..., 1], wf]
    in_specs += [pl.BlockSpec((1, NQ, P), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)] * 3

    out_shape = [jax.ShapeDtypeStruct((B, NQ, Cin), jnp.float32)]
    out_specs = [pl.BlockSpec((1, NQ, Cin), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    if with_pos:
        out_shape.append(jax.ShapeDtypeStruct((B, NQ, pos.shape[-1]), jnp.float32))
        out_specs.append(pl.BlockSpec((1, NQ, pos.shape[-1]), lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((B, NQ, 1), jnp.float32))
    out_specs.append(pl.BlockSpec((1, NQ, 1), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        _make_lazy_kernel(H, W, P, nh, with_pos),
        grid=(B,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * NQ * HW * (Cin + (pos.shape[-1] if with_pos else 0)),
            bytes_accessed=B * HW * Cin * 2 + NQ * P * 12 * B,
            transcendentals=0,
        ),
    )(*ins)

    def _split(o):
        return o.reshape(B, nh, Q, -1).transpose(0, 2, 1, 3)

    s_feat = _split(outs[0]).astype(feat.dtype)
    s_pos = _split(outs[1]).astype(feat.dtype) if with_pos else None
    s_one = _split(outs[-1]).astype(feat.dtype)
    return s_feat, s_pos, s_one


def _lazy_sample_reference(feat, loc, attn_w, pos):
    """Differentiable jnp twin of the fused lazy kernel (used as its VJP and
    as the f32 / non-TPU path). Samples via the smatrix formulation."""
    B, HW, Cin = feat.shape
    H = W = int(HW**0.5)
    parts = [feat]
    if pos is not None:
        if pos.ndim == 2:
            pos_b = jnp.broadcast_to(pos[None], (B,) + pos.shape)
        else:  # (G, HW, C) grouped over consecutive batch blocks
            G = pos.shape[0]
            pos_b = jnp.repeat(pos, B // G, axis=0)
        parts.append(pos_b.astype(feat.dtype))
    parts.append(jnp.ones((B, HW, 1), feat.dtype))
    buf = jnp.concatenate(parts, axis=-1).reshape(B, H, W, -1)
    s = _sample_shared_smatrix(buf, loc, attn_w)
    s_feat = s[..., :Cin]
    if pos is not None:
        C = pos.shape[-1]
        return s_feat, s[..., Cin:Cin + C], s[..., -1:]
    return s_feat, None, s[..., -1:]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _lazy_sample(feat, loc, attn_w, pos):
    return _lazy_sample_pallas_fwd(feat, loc, attn_w, pos)


def _lazy_fwd_rule(feat, loc, attn_w, pos):
    return _lazy_sample_pallas_fwd(feat, loc, attn_w, pos), (feat, loc, attn_w, pos)


def _lazy_bwd_rule(res, g):
    feat, loc, attn_w, pos = res
    if pos is None:
        def f(fe, l, w):
            o = _lazy_sample_reference(fe, l, w, None)
            return (o[0], o[2])
        _, vjp = jax.vjp(f, feat, loc, attn_w)
        dfe, dl, dw = vjp((g[0], g[2]))
        return dfe, dl, dw, None
    _, vjp = jax.vjp(_lazy_sample_reference, feat, loc, attn_w, pos)
    return vjp(g)


_lazy_sample.defvjp(_lazy_fwd_rule, _lazy_bwd_rule)


def lazy_deform_sample(feat, loc, attn_w, pos=None, impl: str = "auto"):
    """Sample raw memory (+ optional batch-independent pos table) at
    deformable locations, returning (s_feat, s_pos|None, s_one).

    feat (B, HW, Cin); loc (B, Q, nh, P, 2); attn_w (B, Q, nh, P);
    pos (HW, C) or (G, HW, C) with the batch grouped as G consecutive
    blocks (e.g. views-major folding) so each pos block stays VMEM-resident.
    The ones-sample s_one rescales additive constants at zero-padded borders.
    """
    if impl == "auto":
        import os

        default = "pallas" if feat.dtype == jnp.bfloat16 else "reference"
        impl = os.environ.get("EGOREAR_LAZY_IMPL", default)
    if impl == "pallas":
        return _lazy_sample(feat, loc, attn_w, pos)
    return _lazy_sample_reference(feat, loc, attn_w, pos)

"""Transformer building blocks shared by the MVFex and Pose3D model families.

Behavioral contracts (reference files under /root/reference/pose_estimation/):
  * FFN: models/utils/transformer.py:8-33 -- (num_fcs-1) x [Linear -> GELU ->
    Dropout] followed by Linear -> Dropout (no residual inside).
  * MultiheadAttention: models/utils/transformer.py:36-108 -- separate
    q/k/v/out projections, xavier-uniform weights, zero biases, scaled
    dot-product softmax.
  * MSDeformAttn: models/utils/deform_attn.py:25-168 -- Linear heads predict
    per-(head, point) sampling offsets and softmaxed weights; sampling
    location = reference_point + offset / (W, H); directional ring bias init
    (:67-88); the bilinear sampling itself is
    :func:`egorear_tpu.ops.deformable_sampling` (the TPU-native replacement
    for mmcv's CUDA kernel invoked at deform_attn.py:155-162).

All modules are flax.linen, NHWC/time-major free, bf16-friendly (params in
fp32; activations follow the caller's dtype).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.custom_batching
import jax.numpy as jnp

from egorear_tpu.ops.deform_attn import deformable_sampling

xavier_uniform = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros


class FFN(nn.Module):
    embed_dims: int
    feedforward_dims: int
    num_fcs: int = 2
    ffn_drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for _ in range(self.num_fcs - 1):
            x = nn.Dense(self.feedforward_dims)(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Dropout(self.ffn_drop, deterministic=deterministic)(x)
        x = nn.Dense(self.embed_dims)(x)
        x = nn.Dropout(self.ffn_drop, deterministic=deterministic)(x)
        return x


class MultiheadAttention(nn.Module):
    """Batch-first multi-head attention over short token sequences.

    The joint-token sequences here are tiny (J = 15/16), so a plain einsum
    softmax attention is optimal -- the reference's deformable sampling is the
    long-sequence strategy, not this.
    """

    embed_dim: int
    num_heads: int
    bias: bool = True
    with_output_proj: bool = True

    @nn.compact
    def __call__(self, q, k, v, attn_bias: Optional[jnp.ndarray] = None):
        B, Lq, C = q.shape
        H = self.num_heads
        hd = C // H
        scale = hd**-0.5

        dense = lambda name: nn.Dense(
            self.embed_dim, use_bias=self.bias,
            kernel_init=xavier_uniform, bias_init=zeros_init, name=name,
        )
        _q = dense("q_proj")(q).reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        _k = dense("k_proj")(k).reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        _v = dense("v_proj")(v).reshape(B, -1, H, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqc,bhkc->bhqk", _q, _k) * scale
        if attn_bias is not None:
            attn = attn + attn_bias
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, _v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, C)
        if self.with_output_proj:
            out = dense("out_proj")(out)
        return out, attn


def _deform_offset_bias_init(n_heads: int, n_points: int):
    """Directional ring bias for sampling offsets (deform_attn.py:67-88)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # (H, 2)
        grid = grid / jnp.abs(grid).max(axis=-1, keepdims=True)
        grid = jnp.tile(grid[:, None, :], (1, n_points, 1))  # (H, P, 2)
        ring = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, :, None]
        grid = grid * ring
        return grid.reshape(-1).astype(dtype)

    return init


class MSDeformAttn(nn.Module):
    """Single-level multi-head deformable attention (n_levels = 1).

    The model family only ever instantiates one level (a 64x64 stride-4 map,
    egoposeformer_heatmap_mvf_ex.py:767-796), so the multi-level indexing
    machinery of the reference collapses away; views are folded into the batch
    axis by callers.
    """

    d_model: int = 256
    n_heads: int = 8
    n_points: int = 16
    impl: str = "auto"  # deformable_sampling implementation selector

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        reference_points: jnp.ndarray,  # (B, Q, 2) in [0, 1] (x, y)
        value_flat: jnp.ndarray,  # (B, H*W, C)
        spatial_shape: Tuple[int, int],  # static (H, W)
        return_sampling_locations: bool = False,
    ):
        B, Q, C = query.shape
        H, W = spatial_shape
        nh, P = self.n_heads, self.n_points
        ch = C // nh

        value = nn.Dense(
            C, kernel_init=xavier_uniform, bias_init=zeros_init, name="value_proj"
        )(value_flat)
        value = value.reshape(B, H, W, nh, ch)

        offsets = nn.Dense(
            nh * P * 2,
            kernel_init=zeros_init,
            bias_init=_deform_offset_bias_init(nh, P),
            name="sampling_offsets",
        )(query).reshape(B, Q, nh, P, 2)

        weights = nn.Dense(
            nh * P, kernel_init=zeros_init, bias_init=zeros_init,
            name="attention_weights",
        )(query).reshape(B, Q, nh, P)
        weights = jax.nn.softmax(weights, axis=-1)

        normalizer = jnp.asarray([W, H], dtype=offsets.dtype)
        loc = reference_points[:, :, None, None, :] + offsets / normalizer

        out = deformable_sampling(value, loc, weights, impl=self.impl)
        out = nn.Dense(
            C, kernel_init=xavier_uniform, bias_init=zeros_init, name="output_proj"
        )(out)
        if return_sampling_locations:
            return out, loc
        return out


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 upsample with align_corners=True as two MXU matmuls.

    Matches torch ``nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True)`` used throughout the reference heads (e.g.
    backbones/resnet.py:91, egoposeformer_heatmap_mvf_ex.py:108). x is NHWC.
    """
    B, H, W, C = x.shape
    return resize_align_corners(x, (2 * H, 2 * W))


def resize_align_corners(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear align_corners=True resize to ``out_hw``, as two MXU matmuls."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    if (oh, ow) == (H, W):
        return x
    My = jnp.asarray(_interp_matrix_cached(H, oh), dtype=x.dtype)
    Mx = jnp.asarray(_interp_matrix_cached(W, ow), dtype=x.dtype)
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,bhwc->bowc", My, x, precision=hp)
    return jnp.einsum("pw,bowc->bopc", Mx, y, precision=hp)


_INTERP_CACHE = {}


def _interp_matrix_cached(n: int, out_n: int):
    """NOTE: caches host numpy, never device arrays -- a device constant
    created inside one jit trace must not be reused in another (tracer leak).
    """
    key = (n, out_n)
    if key not in _INTERP_CACHE:
        import numpy as np

        m = np.zeros((out_n, n), np.float32)
        if n == 1 or out_n == 1:
            m[:, 0] = 1.0
        else:
            pos = np.arange(out_n) * (n - 1) / (out_n - 1)
            lo = np.floor(pos).astype(int)
            hi = np.minimum(lo + 1, n - 1)
            w = (pos - lo).astype(np.float32)
            m[np.arange(out_n), lo] += 1.0 - w
            m[np.arange(out_n), hi] += w
        _INTERP_CACHE[key] = m
    return _INTERP_CACHE[key]


class LinearParams(nn.Module):
    """Parameter-only stand-in for nn.Dense: owns kernel/bias at the same
    tree path without mandating where the matmul happens."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", xavier_uniform, (self.features_in, self.features_out)
        )
        bias = self.param("bias", zeros_init, (self.features_out,))
        return kernel, bias


class MSDeformAttnLazy(nn.Module):
    """Deformable attention that samples RAW memory and projects afterwards.

    Mathematically identical to ``MSDeformAttn`` applied to
    ``memory = feat @ mem_kernel + mem_bias (+ pos)`` followed by its internal
    value projection -- linear maps and additive position tables commute with
    attention-weighted bilinear sampling -- but the memory and value
    projections here run on the ~Q*num_heads sampled vectors instead of the
    full H*W grid. For the 64x64 maps of this model family that removes
    O(HW * C^2) matmuls per layer (value_proj alone is ~137 GFLOP/step at
    batch 16) and the per-refiner grid materializations the profiler showed
    dominating the forward pass.

    Border correctness: zero-padded bilinear corners mean additive constants
    do not sample to themselves, so a ones channel is sampled alongside and
    scales all constant terms (mem_bias, value bias).

    Parameter names/shapes match ``MSDeformAttn`` exactly, so converted
    reference checkpoints load into either implementation unchanged.
    """

    d_model: int = 256
    n_heads: int = 8
    n_points: int = 16
    impl: str = "auto"
    # Layout of per-group mem_pos tables along the folded batch: False =
    # INTERLEAVED (batch-major (B, V) fold, element i uses table i % G);
    # True = contiguous BLOCKS (view-major (V, B) fold, table i // (N/G)).
    pos_block: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        reference_points: jnp.ndarray,  # (B, Q, 2)
        feat_raw: jnp.ndarray,  # (B, H*W, Cin) raw (unprojected) memory
        spatial_shape,  # static (H, W)
        mem_kernel: Optional[jnp.ndarray] = None,  # (Cin, C)
        mem_bias: Optional[jnp.ndarray] = None,  # (C,)
        mem_pos: Optional[jnp.ndarray] = None,  # (H*W, C) shared, or
        # (G, H*W, C): per-group tables along the batch per ``pos_block``.
    ):
        from egorear_tpu.ops.deform_attn import lazy_deform_sample

        B, Q, C = query.shape
        H, W = spatial_shape
        nh, P = self.n_heads, self.n_points
        ch = C // nh
        Cin = feat_raw.shape[-1]

        offsets = nn.Dense(
            nh * P * 2,
            kernel_init=zeros_init,
            bias_init=_deform_offset_bias_init(nh, P),
            name="sampling_offsets",
        )(query).reshape(B, Q, nh, P, 2)
        weights = nn.Dense(
            nh * P, kernel_init=zeros_init, bias_init=zeros_init,
            name="attention_weights",
        )(query).reshape(B, Q, nh, P)
        weights = jax.nn.softmax(weights, axis=-1)

        normalizer = jnp.asarray([W, H], dtype=offsets.dtype)
        loc = reference_points[:, :, None, None, :] + offsets / normalizer

        # value_proj params (applied post-sampling). Declared through a
        # LinearParams holder so the parameter tree path (value_proj/kernel,
        # value_proj/bias) is identical to MSDeformAttn's Dense.
        wv, bv = LinearParams(C, C, name="value_proj")()
        wv = wv.astype(query.dtype)
        bv = bv.astype(query.dtype)

        # Fused sampling of raw features + (optional) pos table + implicit
        # ones channel; no broadcast/concat buffer is materialized. A 3-dim
        # pos (G, HW, C) is matched to batch elements interleaved: element i
        # samples group table i % G (batch-major (B, V) fold, i = b*V + v).
        pos = None
        if mem_pos is not None:
            pos = mem_pos.astype(feat_raw.dtype)
        s_feat, s_pos, s_one = lazy_deform_sample(
            feat_raw, loc, weights, pos=pos, impl=self.impl,
            pos_block=self.pos_block,
        )

        wv_h = wv.reshape(C, nh, ch)
        const = bv.reshape(nh, ch)
        if mem_kernel is not None:
            km = (mem_kernel.astype(query.dtype) @ wv).reshape(Cin, nh, ch)
            v = jnp.einsum("bqnc,cnd->bqnd", s_feat, km)
            if mem_bias is not None:
                const = const + (mem_bias.astype(query.dtype) @ wv).reshape(nh, ch)
        else:
            v = jnp.einsum("bqnc,cnd->bqnd", s_feat, wv_h)
        if s_pos is not None:
            v = v + jnp.einsum("bqnc,cnd->bqnd", s_pos, wv_h)
        v = v + s_one * const

        out = v.reshape(B, Q, C)
        out = nn.Dense(
            C, kernel_init=xavier_uniform, bias_init=zeros_init,
            name="output_proj",
        )(out)
        return out


class PatchEmbed(nn.Module):
    """ViT-style patch embedding (reference egoposeformer_heatmap_mvf_ex.py:
    734-764 ships it unused; kept for inventory parity). NHWC input."""

    patch_size: Tuple[int, int] = (4, 4)
    embed_dim: int = 1024
    flatten: bool = True
    use_norm: bool = False

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        x = nn.Conv(
            self.embed_dim, self.patch_size, strides=self.patch_size,
            name="proj",
        )(x)
        B, h, w, C = x.shape
        if self.flatten:
            x = x.reshape(B, h * w, C)
        if self.use_norm:
            x = nn.LayerNorm()(x)
        return x, h, w


class Conv3x3S2Matmul(nn.Module):
    """3x3 stride-2 pad-1 convolution expressed as 9 shifted matmuls.

    Inside an nn.vmap'ed module (stacked per-view weights) a regular conv
    lowers to a slow grouped convolution on TPU; slicing + Dense-style
    einsums lower to batched matmuls instead. Parameter names/shapes match
    nn.Conv (kernel (3, 3, Cin, Cout), bias (Cout,)) so checkpoints are
    interchangeable.
    """

    features: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, Cin) NHWC
        B, H, W, Cin = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, Cin, self.features),
        ).astype(x.dtype)
        bias = self.param(
            "bias", zeros_init, (self.features,)
        ).astype(x.dtype)

        oh, ow = H // 2, W // 2
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                sl = xp[:, dy : dy + 2 * oh : 2, dx : dx + 2 * ow : 2, :]
                term = jnp.einsum("bhwc,cd->bhwd", sl, kernel[dy, dx])
                out = term if out is None else out + term
        return out + bias


class Conv3x3S2Patches(nn.Module):
    """3x3 stride-2 pad-1 convolution as ONE patches matmul.

    Like :class:`Conv3x3S2Matmul` but materializes the 9 shifted slices into
    a single (B, H/2, W/2, 9*Cin) patch tensor and contracts it with the
    flattened kernel in one einsum: 9x larger K dim keeps the MXU busy with
    one big batched matmul instead of 9 small accumulating ones, at the cost
    of writing 2.25x the input once. Third A/B candidate for the vmapped
    per-view refiner conv (the round-3 b64 trace's top op). Param
    names/shapes match nn.Conv; checkpoints are interchangeable.
    """

    features: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, Cin) NHWC
        B, H, W, Cin = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, Cin, self.features),
        ).astype(x.dtype)
        bias = self.param(
            "bias", zeros_init, (self.features,)
        ).astype(x.dtype)

        oh, ow = H // 2, W // 2
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patches = jnp.concatenate(
            [xp[:, dy : dy + 2 * oh : 2, dx : dx + 2 * ow : 2, :]
             for dy in range(3) for dx in range(3)],
            axis=-1,
        )  # (B, oh, ow, 9*Cin)
        w = kernel.reshape(9 * Cin, self.features)
        return jnp.einsum("bhwk,kd->bhwd", patches, w) + bias


class Conv3x3S2SpaceToDepth(nn.Module):
    """3x3 stride-2 pad-1 convolution as space-to-depth + 5 shifted matmuls.

    Built to kill the round-4 b64 trace's #1 op: under the per-view
    ``nn.vmap`` a regular conv batches over the weight axis and JAX lowers
    it as a grouped convolution whose feature-group merge TRANSPOSES the
    whole (V, B, H, W, C) activation into (B, H, W, V*C) -- 4.2 ms/step at
    b64. Here the stride-2 structure is realized ONCE as a space-to-depth
    relayout (B, H, W, C) -> (B, H/2, W/2, 4C) whose channel blocks are the
    2x2 pixel phases; every kernel tap then lands on a UNIT-shifted slice of
    that tensor, so the conv becomes 5 dense einsums (contraction sizes
    C + 2C + C + C + 4C = 9C, the exact conv FLOPs) that vmap cleanly into
    batched matmuls with the view axis leading -- no grouped conv, no
    stride-2 slices, no layout transpose. Param names/shapes match nn.Conv;
    checkpoints are interchangeable.
    """

    features: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, Cin) NHWC
        B, H, W, Cin = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, Cin, self.features),
        ).astype(x.dtype)
        bias = self.param(
            "bias", zeros_init, (self.features,)
        ).astype(x.dtype)

        oh, ow = H // 2, W // 2
        # S[b, i, j, (dy, dx, c)] = x[b, 2i+dy, 2j+dx, c]; channel blocks
        # ordered (0,0), (0,1), (1,0), (1,1).
        s = x.reshape(B, oh, 2, ow, 2, Cin).transpose(0, 1, 3, 2, 4, 5)
        s = s.reshape(B, oh, ow, 4 * Cin)
        # Pad one CELL (= 2 input px) of zeros on top/left: kernel taps
        # ky/kx = 0 read input row/col 2i-1 = cell (i-1, phase 1).
        sp = jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))

        blk = lambda t, i: t[..., i * Cin : (i + 1) * Cin]
        mm = lambda t, w: jnp.einsum("bhwc,cd->bhwd", t, w)

        # cell (i-1, j-1): tap (ky=0, kx=0) on phase (1, 1)
        ul = sp[:, :oh, :ow]
        out = mm(blk(ul, 3), kernel[0, 0])
        # cell (i-1, j): taps ky=0, kx in {1,2} on phases (1,0), (1,1) --
        # blocks 2:4 are channel-contiguous, one 2C-contraction einsum.
        up = sp[:, :oh, 1:]
        w_up = jnp.concatenate([kernel[0, 1], kernel[0, 2]], axis=0)
        out = out + mm(up[..., 2 * Cin :], w_up)
        # cell (i, j-1): taps kx=0, ky in {1,2} on phases (0,1), (1,1)
        lf = sp[:, 1:, :ow]
        out = out + mm(blk(lf, 1), kernel[1, 0]) + mm(blk(lf, 3), kernel[2, 0])
        # cell (i, j): taps ky, kx in {1,2} on all four phases -- one full
        # 4C-contraction einsum with blocks ordered (0,0), (0,1), (1,0), (1,1)
        # = taps (1,1), (1,2), (2,1), (2,2).
        ct = sp[:, 1:, 1:]
        w_ct = jnp.concatenate(
            [kernel[1, 1], kernel[1, 2], kernel[2, 1], kernel[2, 2]], axis=0
        )
        out = out + mm(ct, w_ct)
        return out + bias


def _conv3x3s2_dense(x, kernel, bias):
    """Plain 3x3 stride-2 pad-1 NHWC conv (the unbatched base case)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kernel, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)
    return y + bias


@jax.custom_batching.custom_vmap
def _conv3x3s2_unrollable(x, kernel, bias):
    return _conv3x3s2_dense(x, kernel, bias)


@_conv3x3s2_unrollable.def_vmap
def _conv3x3s2_unroll_rule(axis_size, in_batched, x, kernel, bias):
    # Under the per-view nn.vmap, XLA lowers a weight-batched conv as a
    # grouped convolution and TRANSPOSES the whole (V, B, H, W, C)
    # activation into (B, H, W, V*C) -- the round-5 b64 trace's #1 op
    # (4.16 ms, PERF.md §1). V is a small static constant, so unroll
    # instead: V dense convs on contiguous view-major slices, zero
    # relayout. custom_vmap delivers each batched operand with the mapped
    # axis moved to the front; grad-of-vmap differentiates the unrolled
    # jaxpr (exactness pinned by tests/test_utils_misc.py).
    xb, kb, bb = in_batched
    outs = [
        _conv3x3s2_dense(
            x[v] if xb else x,
            kernel[v] if kb else kernel,
            bias[v] if bb else bias,
        )
        for v in range(axis_size)
    ]
    return jnp.stack(outs), True


class Conv3x3S2Unroll(nn.Module):
    """3x3 stride-2 pad-1 convolution that UNROLLS over a vmapped axis.

    Outside vmap it is exactly ``nn.Conv(features, (3, 3), strides=2,
    padding=1)``. Inside the per-view ``nn.vmap`` (stacked weights) the
    custom_vmap rule replaces the grouped-conv lowering -- whose
    (V, B, H, W, C) -> (B, H, W, V*C) relayout is the b64 trace's single
    biggest op -- with V static dense convs on contiguous view-major
    slices. Param names/shapes match nn.Conv; checkpoints are
    interchangeable.
    """

    features: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, Cin) NHWC
        Cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, Cin, self.features),
        ).astype(x.dtype)
        bias = self.param(
            "bias", zeros_init, (self.features,)
        ).astype(x.dtype)
        return _conv3x3s2_unrollable(x, kernel, bias)

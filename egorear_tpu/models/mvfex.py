"""MVFex: multi-view feature-exchange heatmap refinement with joint-query
adaptation (JQA) -- the paper's core contribution.

Behavioral contract (reference /root/reference/pose_estimation/models/
estimator/egoposeformer_heatmap_mvf_ex.py):
  * ``MVFexRefiner`` == HeatmapMVF (:442-731): joint queries built per the JQA
    / JQA-multi-view / query-only / heatmap-embedding modes (:476-520,
    :655-687); memory = per-view 1x1-projected FPN features + learned
    per-view positional embeddings (:522-523, :689-693); N x multi-view
    transformer layers; after each layer the post-normed 256-d joint tokens
    are reshaped to (J, 16, 16) maps, upsampled by a conv head, added to the
    (stop-gradient) downsampled frame features and decoded to refined
    heatmaps (:695-731).
  * ``MultiViewTransformerLayer`` (:820-935): per-view deformable cross
    attention at the 2D anchors with invalid-anchor masking, a Linear fuse
    over the concatenated per-view results, spatial MHA over joint tokens,
    FFN; residual + post-LayerNorm after each.
  * ``HeatmapMVFexNet`` == EgoPoseFormerHeatmapMVFEX (:27-437): stereo-front/
    back stage-1 estimators (V-dependent layout :67-89), anchor extraction by
    heatmap argmax (:128-143), detach policies (full_training /
    use_pred_heatmap_init / no_detach_feat_init / detach_heatmap_feat*,
    :236-297), per-view refiners, outputs re-stacked per layer (:299-437).

TPU-first deviations from the reference implementation (same math):
  * The V per-view refiner modules (independent weights, :71-89) are stacked
    along a leading axis and run as ONE vmapped program instead of V
    sequential module calls.
  * Inside a transformer layer the per-view cross-attention loop (:905-911)
    is a single deformable-attention call with views folded into the batch.
  * Feature maps are NHWC end to end, and multi-view FRAME FEATURES flow
    VIEW-MAJOR (V, B, h, w, C) from the stereo estimators through the
    refiner stack into the pose3d lifter: one materialization feeds the
    vmap leading axis, the sampling contraction (block pos mode) and the
    per-layer feature outputs, where the reference's batch-major layout
    cost a concat copy plus a vmap re-layout copy per step (round-3 b64
    trace: ~2-3 ms/step of pure dynamic-update-slice copies). Heatmaps
    keep the reference's batch-major (B, V, J, h, w) public contract.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from egorear_tpu.models.configs import MVFCfg, MVFexNetCfg, TransformerLayerCfg
from egorear_tpu.models.heatmap_net import HeatmapNet
from egorear_tpu.models.layers import (
    FFN,
    Conv3x3S2Matmul,
    LinearParams,
    MSDeformAttn,
    MSDeformAttnLazy,
    MultiheadAttention,
    resize_align_corners,
    upsample2x_align_corners,
)
from egorear_tpu.ops.heatmap import argmax_2d

def relu(x):
    # plain HLO (not jax.nn.relu's inner jit) so XLA fuses it into
    # producing conv/dot epilogues (see backbone._relu)
    return jnp.maximum(x, 0)


def _conv3x3s2(features: int, name: str):
    """3x3 stride-2 conv used inside the vmapped refiner stack.

    Measured on v5e (round 2): the real conv (grouped-conv lowering under
    the per-view vmap) beats the 9-shifted-matmul form at these shapes
    (15.75 vs 19.1 ms/step full model) -- the strided slices cost more than
    the grouped conv. The round-3 b64 profile still shows the grouped-conv
    transpose as the single biggest op (4.2 ms); EGOREAR_VMAP_CONV_IMPL
    selects an alternate lowering for in-model measurement (identical
    params/results every way):
      matmul  -- 9 shifted accumulating matmuls
      patches -- one im2col-style (.., 9*Cin) x (9*Cin, Cout) matmul
    """
    import os

    impl = os.environ.get("EGOREAR_VMAP_CONV_IMPL")
    if impl == "matmul":
        return Conv3x3S2Matmul(features, name=name)
    if impl == "patches":
        from egorear_tpu.models.layers import Conv3x3S2Patches

        return Conv3x3S2Patches(features, name=name)
    if impl == "s2d":
        from egorear_tpu.models.layers import Conv3x3S2SpaceToDepth

        return Conv3x3S2SpaceToDepth(features, name=name)
    if impl == "unroll":
        # custom_vmap unroll -- V static dense convs on contiguous
        # view-major slices instead of the grouped-conv lowering whose
        # (V, B, H, W, C) -> (B, H, W, V*C) relayout was the round-5 b64
        # trace's single biggest op (4.16 ms, PERF.md §1/§4).
        from egorear_tpu.models.layers import Conv3x3S2Unroll

        return Conv3x3S2Unroll(features, name=name)
    return nn.Conv(
        features, (3, 3), strides=2, padding=((1, 1), (1, 1)), name=name
    )


class MultiViewTransformerLayer(nn.Module):
    """Cross-view deformable attention + spatial MHA + FFN (post-norm).

    Two memory modes:
      * ``memory``: the fully projected (B, V, HW, C) token grid (the
        reference's computation order).
      * ``feat_raw`` (+ mem_kernel/mem_bias/mem_pos): raw (B, V, HW, Cin)
        features; the memory/value projections commute with the bilinear
        sampling and run post-sampling on ~J*heads vectors instead of the
        whole grid (MSDeformAttnLazy). Identical math, large TPU win.
    """

    num_views: int
    embed_dims: int
    feat_shape: Tuple[int, int]
    cfg: TransformerLayerCfg = TransformerLayerCfg()
    # Layout of the multi-view memory operands (memory / feat_raw):
    #   False -- batch-major (B, V, HW, C), views folded as b*V + v;
    #   True  -- view-major (V, B, HW, C), views folded as v*B + b.
    # View-major lets callers hand the pre-concat front/back halves'
    # natural stacking straight through without re-materializing the
    # (B, V, ...) layout (the round-3 b64 trace charged ~2 ms/step of pure
    # copies to exactly that). Queries/outputs stay (B, J, C) either way.
    vmajor: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, J, C)
        memory: Optional[jnp.ndarray] = None,  # (B, V, HW, C) / (V, B, ...)
        anchors_2d: jnp.ndarray = None,  # (B, V, J, 2), [0, 1]
        anchors_valid: jnp.ndarray = None,  # (B, V, J) bool
        feat_raw: Optional[jnp.ndarray] = None,  # (B, V, HW, Cin) / (V, B, ..)
        mem_kernel: Optional[jnp.ndarray] = None,  # (Cin, C)
        mem_bias: Optional[jnp.ndarray] = None,  # (C,)
        mem_pos: Optional[jnp.ndarray] = None,  # (V, HW, C)
        train: bool = False,
    ) -> jnp.ndarray:
        B, J, C = query.shape
        V = self.num_views

        if self.vmajor:
            # (V, B, J, ...) broadcast/fold: rows ordered v*B + b. Anchors
            # and the valid mask arrive batch-major (they are tiny); the
            # big grids are consumed in their native view-major layout.
            def fold_q(q):
                return jnp.broadcast_to(q[None], (V, B, J, C)).reshape(
                    V * B, J, C)

            anchors = jax.lax.stop_gradient(anchors_2d).transpose(
                1, 0, 2, 3).reshape(V * B, J, 2)
            valid = anchors_valid.transpose(1, 0, 2)  # (V, B, J)

            def unfold(pv):  # (V*B, J, C) -> (B, J, V*C), view-minor concat
                pv = pv.reshape(V, B, J, C)
                pv = jnp.where(valid[..., None], pv, 0.0)
                return pv.transpose(1, 2, 0, 3).reshape(B, J, V * C)
        else:
            def fold_q(q):
                return jnp.broadcast_to(q[:, None], (B, V, J, C)).reshape(
                    B * V, J, C)

            anchors = jax.lax.stop_gradient(anchors_2d).reshape(B * V, J, 2)

            def unfold(pv):  # (B*V, J, C) -> (B, J, V*C)
                pv = pv.reshape(B, V, J, C)
                pv = jnp.where(anchors_valid[..., None], pv, 0.0)
                return pv.transpose(0, 2, 1, 3).reshape(B, J, V * C)

        if self.cfg.use_normal_cross_attn and memory is None:
            # Dense attention needs the materialized grid.
            memory = feat_raw @ mem_kernel
            if mem_bias is not None:
                memory = memory + mem_bias
            if mem_pos is not None:
                memory = memory + (mem_pos[:, None] if self.vmajor
                                   else mem_pos[None])

        # --- cross attention into every view, views folded into batch ---
        identity = query
        q_folded = fold_q(query)
        if self.cfg.use_normal_cross_attn:
            kv = memory.reshape(V * B, -1, C)
            attn = MultiheadAttention(
                self.embed_dims, 4, name="cross_attn_dense"
            )
            per_view, _ = attn(q_folded, kv, kv)
            # No invalid-anchor masking on the dense path (reference parity).
            pv = per_view.reshape((V, B, J, C) if self.vmajor
                                  else (B, V, J, C))
            fused = (pv.transpose(1, 2, 0, 3) if self.vmajor
                     else pv.transpose(0, 2, 1, 3)).reshape(B, J, V * C)
        elif memory is not None:
            kv = memory.reshape(V * B, -1, C)
            per_view = MSDeformAttn(
                d_model=self.embed_dims,
                n_heads=self.cfg.cross_attn.num_heads,
                n_points=16,
                name="cross_attn",
            )(q_folded, anchors, kv, self.feat_shape)
            fused = unfold(per_view)
        else:
            # Folding is a free reshape on every big operand in BOTH
            # layouts; the (V, HW, C) pos table is matched to the view
            # groups inside the sampling contraction (lazy_deform_sample:
            # interleaved for batch-major, block for view-major), so no
            # transpose of the feature grid is ever needed.
            Cin = feat_raw.shape[-1]
            fr = feat_raw.reshape(V * B, -1, Cin)
            per_view = MSDeformAttnLazy(
                d_model=self.embed_dims,
                n_heads=self.cfg.cross_attn.num_heads,
                n_points=16,
                pos_block=self.vmajor,
                name="cross_attn",
            )(q_folded, anchors, fr, self.feat_shape,
              mem_kernel=mem_kernel, mem_bias=mem_bias, mem_pos=mem_pos)
            fused = unfold(per_view)

        fused = nn.Dense(self.embed_dims, name="fuse_mlp")(fused)
        x = nn.LayerNorm(name="norm_cross")(identity + fused)

        # --- spatial attention over joint tokens ---
        attn_res, _ = MultiheadAttention(
            self.embed_dims, self.cfg.spatial_attn.num_heads, name="spatial_attn"
        )(x, x, x)
        x = nn.LayerNorm(name="norm_spatial")(x + attn_res)

        # --- FFN ---
        ffn_out = FFN(
            self.embed_dims,
            self.cfg.ffn.feedforward_dims,
            self.cfg.ffn.num_fcs,
            self.cfg.ffn.ffn_drop,
            name="ffn",
        )(x, deterministic=not train)
        x = nn.LayerNorm(name="norm_ffn")(x + ffn_out)
        return x


class TransformerHeadLayer(nn.Module):
    """Joint-token maps (B, h, w, J) -> upsampled feature maps (B, 2h, 2w, C).

    Reference egoposeformer_heatmap_mvf_ex.py:938-970 (the 128- and 512-
    channel variants)."""

    output_dims: int = 128

    @nn.compact
    def __call__(self, x):
        if self.output_dims == 128:
            x = relu(nn.Dense(self.output_dims // 2, name="Conv_0")(x))
            x = upsample2x_align_corners(x)
            x = relu(nn.Dense(self.output_dims, name="Conv_1")(x))
        elif self.output_dims == 512:
            x = relu(nn.Dense(x.shape[-1], name="Conv_0")(x))
            x = relu(nn.Dense(self.output_dims // 8, name="Conv_1")(x))
            x = upsample2x_align_corners(x)
            x = relu(nn.Dense(self.output_dims // 4, name="Conv_2")(x))
            x = relu(nn.Dense(self.output_dims, name="Conv_3")(x))
        else:
            raise ValueError(f"unsupported output_dims {self.output_dims}")
        return x


class MVFexRefiner(nn.Module):
    """Per-view heatmap refiner (reference HeatmapMVF)."""

    num_views: int
    num_heatmap: int
    feat_shape: Tuple[int, int]
    detach_heatmap_feat: bool
    cfg: MVFCfg
    # frame_feat_mv layout: view-major (V, B, h, w, Cin) when True (see
    # MultiViewTransformerLayer.vmajor), batch-major (B, V, ...) otherwise.
    vmajor: bool = False

    @nn.compact
    def __call__(
        self,
        heatmap: jnp.ndarray,  # (B, J, h, w) this view's initial heatmaps
        frame_feat: jnp.ndarray,  # (B, h, w, Cin) this view's FPN features
        frame_feat_mv: jnp.ndarray,  # all views, layout per ``vmajor``
        anchors_2d: jnp.ndarray,  # (B, V, J, 2)
        anchors_valid: jnp.ndarray,  # (B, V, J)
        bfb: jnp.ndarray,  # (B, 512) pooled backbone bottom, this view
        bfb_mv: jnp.ndarray,  # (B, V, 512) pooled backbone bottom, all views
        train: bool = False,
    ):
        cfg = self.cfg
        B = heatmap.shape[0]
        J = self.num_heatmap
        h, w = self.feat_shape
        C = cfg.embed_dims
        Cin = cfg.input_dims

        # ---- joint-query construction ----
        def heatmap_embed():
            flat = heatmap.reshape(B, J, h * w)
            e = nn.Dense(C, name="heatmap_proj_0")(flat)
            e = relu(e)
            return nn.Dense(C, name="heatmap_proj_1")(e)

        if cfg.joint_query_adaptation or cfg.joint_query_adaptation_multi_view:
            hm_embed = heatmap_embed()
            if cfg.joint_query_adaptation:
                pooled = bfb  # (B, 512)
            else:
                pooled = bfb_mv.reshape(B, -1)  # (B, V*512)
            bfb_embed = nn.Dense(C, name="fc_bfb")(pooled)[:, None]  # (B, 1, C)
            jq = self.param(
                "joint_query_embed", nn.initializers.normal(1.0), (J, C)
            )
            x = relu(
                nn.Dense(C, name="fc_query")(jq[None] + bfb_embed + hm_embed)
            )
        elif cfg.joint_query_only:
            jq = self.param(
                "joint_query_embed", nn.initializers.normal(1.0), (J, C)
            )
            x = relu(nn.Dense(C, name="fc_query")(jnp.tile(jq[None], (B, 1, 1))))
        else:
            pos = self.param(
                "query_pos_embed", nn.initializers.zeros, (1, J, C)
            )
            x = heatmap_embed() + pos

        # ---- multi-view memory ----
        # The 1x1 memory projection is held as Dense-shaped params; in the
        # lazy path it is never applied to the grid -- MSDeformAttnLazy folds
        # it (and the pos table / bias) into the post-sampling projections.
        V = self.num_views
        mem_kernel, mem_bias = LinearParams(
            Cin, C, name="frame_feat_multi_view_proj"
        )()
        mv_pos = self.param(
            "frame_feat_multi_view_pos_embed",
            nn.initializers.zeros,
            (1, V, h * w, C),
        )
        if self.vmajor:
            feat_tokens = frame_feat_mv.reshape(V, B, h * w, Cin)
        else:
            feat_tokens = frame_feat_mv.reshape(B, V, h * w, Cin)
        if cfg.lazy_deform and not cfg.transformer.use_normal_cross_attn:
            memory = None
        else:
            pos_bc = (mv_pos[0][:, None] if self.vmajor else mv_pos)
            memory = (
                feat_tokens @ mem_kernel.astype(feat_tokens.dtype)
                + mem_bias.astype(feat_tokens.dtype)
                + pos_bc.astype(feat_tokens.dtype)
            )

        # ---- downsampled frame features for the residual head ----
        f = relu(nn.Dense(Cin * 2, name="ff_proj_0")(frame_feat))
        f = relu(_conv3x3s2(Cin * 4, name="ff_proj_1")(f))
        f = relu(nn.Dense(Cin, name="ff_proj_2")(f))  # (B, h/2, w/2, Cin)

        list_heatmap, list_feat = [], []
        # The 1x1 heatmap head is ONE module shared by every layer
        # (reference HeatmapMVF declares a single self.conv_heatmap,
        # egoposeformer_heatmap_mvf_ex.py:566,719); creating it inside the
        # loop would raise NameInUseError for num_former_layers >= 2.
        conv_heatmap = (nn.Dense(J, name="conv_heatmap")
                        if cfg.use_1by1_conv else None)
        for idx in range(cfg.num_former_layers):
            x = MultiViewTransformerLayer(
                num_views=V,
                embed_dims=C,
                feat_shape=self.feat_shape,
                cfg=cfg.transformer,
                vmajor=self.vmajor,
                name=f"transformer_{idx}",
            )(x, memory, anchors_2d, anchors_valid,
              feat_raw=feat_tokens if memory is None else None,
              mem_kernel=mem_kernel, mem_bias=mem_bias, mem_pos=mv_pos[0],
              train=train)

            _x = nn.LayerNorm(name=f"post_norm_{idx}")(x)
            side = int(C**0.5)
            token_maps = _x.reshape(B, J, side, side).transpose(0, 2, 3, 1)
            offset = TransformerHeadLayer(
                output_dims=Cin, name=f"head_{idx}"
            )(token_maps)  # (B, 2*side, 2*side, Cin)
            # The reference geometry only lines up for 256px inputs (2*side ==
            # h/2); the exact align-corners resize is a no-op there and makes
            # other image sizes work.
            offset = resize_align_corners(offset, f.shape[1:3])

            refined = offset + jax.lax.stop_gradient(f)
            refined = relu(
                nn.Dense(Cin, name=f"ff_refined_proj_{idx}_0")(refined)
            )
            refined = upsample2x_align_corners(refined)
            refined = relu(
                nn.Dense(Cin, name=f"ff_refined_proj_{idx}_1")(refined)
            )  # (B, h, w, Cin)
            list_feat.append(refined)

            hm_in = (
                jax.lax.stop_gradient(refined)
                if self.detach_heatmap_feat
                else refined
            )
            if cfg.use_1by1_conv:
                hm = conv_heatmap(hm_in)
            else:
                y = relu(_conv3x3s2(Cin * 2, name=f"conv_hm_{idx}_0")(hm_in))
                y = relu(nn.Dense(Cin * 2, name=f"conv_hm_{idx}_1")(y))
                y = upsample2x_align_corners(y)
                y = relu(nn.Dense(Cin, name=f"conv_hm_{idx}_2")(y))
                hm = nn.Dense(J, name=f"conv_hm_{idx}_3")(y)
            list_heatmap.append(hm.transpose(0, 3, 1, 2))  # (B, J, h, w)

        return list_heatmap, list_feat


class ConvHeatmapHead(nn.Module):
    """Conv-stack heatmap head used when ``use_1by1_conv`` is off at the
    MVFEX level (egoposeformer_heatmap_mvf_ex.py:101-126)."""

    input_dims: int
    num_heatmap: int

    @nn.compact
    def __call__(self, x):  # (N, h, w, Cin)
        d = self.input_dims
        x = relu(nn.Conv(d, (1, 1))(x))
        x = relu(nn.Conv(d * 2, (3, 3), strides=2, padding=((1, 1), (1, 1)))(x))
        x = relu(nn.Conv(d * 2, (1, 1))(x))
        x = upsample2x_align_corners(x)
        x = relu(nn.Conv(d, (1, 1))(x))
        return nn.Conv(self.num_heatmap, (1, 1))(x)


class HeatmapMVFexNet(nn.Module):
    """Stage-2 network: stereo estimators + V stacked MVFex refiners.

    ``__call__`` returns ``(list_heatmap, list_feat)``: heatmaps are
    batch-major (B, V, J, h, w) -- the reference's public contract
    (egoposeformer_heatmap_mvf_ex.py:299-437) -- while the frame-feature
    stages are VIEW-MAJOR (V, B, h, w, C), the internal layout that lets
    the front/back stereo halves be materialized exactly once (see
    ``_estimator_outputs``); the pose3d lifter consumes them as such.
    """

    cfg: MVFexNetCfg

    def setup(self):
        cfg = self.cfg
        V = cfg.num_views
        enc = cfg.encoder
        self.heatmap_estimator_stereo_front = HeatmapNet(
            num_heatmap=cfg.num_heatmap,
            out_stride=enc.out_stride,
            fpn_channels=enc.fpn_channels,
            detach_heatmap_feat_init=cfg.detach_heatmap_feat_init,
            bn_folded=enc.bn_folded,
        )
        if V >= 3:
            self.heatmap_estimator_stereo_back = HeatmapNet(
                num_heatmap=cfg.num_heatmap,
                out_stride=enc.out_stride,
                fpn_channels=enc.fpn_channels,
                detach_heatmap_feat_init=cfg.detach_heatmap_feat_init,
                bn_folded=enc.bn_folded,
            )

        # V refiners with independent weights, stacked and vmapped: one
        # compiled program refines every view at once. FPN features flow
        # VIEW-MAJOR (V, B, h, w, C): the per-view arg vmaps over the
        # leading axis (free slice, no transpose), the broadcast multi-view
        # arg is consumed in the same layout by the sampling contraction
        # (block pos mode), and the per-layer feature outputs come back
        # view-major (out_axes 0) straight into the pose3d lifter -- so the
        # front/back halves are materialized exactly once. Heatmaps stay
        # batch-major (B, V, J, h, w): they are the public output contract.
        RefinerStack = nn.vmap(
            MVFexRefiner,
            in_axes=(1, 0, None, None, None, 1, None, None),
            out_axes=(1, 0),
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )
        self.refiners = RefinerStack(
            num_views=V,
            num_heatmap=cfg.num_heatmap,
            feat_shape=cfg.feat_shape,
            detach_heatmap_feat=cfg.detach_heatmap_feat,
            cfg=cfg.mvf,
            vmajor=True,
        )

        self.use_1by1_conv = cfg.mvf.use_1by1_conv
        if not self.use_1by1_conv:
            self.conv_heatmap_head_front = ConvHeatmapHead(
                cfg.mvf.input_dims, cfg.num_heatmap
            )
            if V >= 3:
                self.conv_heatmap_head_back = ConvHeatmapHead(
                    cfg.mvf.input_dims, cfg.num_heatmap
                )

    # -- stage-1 dispatch over the front/back stereo pairs ------------------

    def _estimator_outputs(self, img, train):
        """Full stage-1: heatmaps (batch-major) + VIEW-MAJOR FPN feats +
        POOLED backbone bottom (s32).

        The round-3 b64 TPU trace charged ~3.5 ms/step to pure copies of
        this function's concats, so each output takes the cheapest layout
        its consumers need:
          * heatmaps (B, V, J, h, w) -- the public output contract;
          * feats (V, B, h, w, C) -- one view-major materialization serves
            BOTH refiner consumers (vmap leading axis + block-pos sampling)
            instead of a batch-major concat followed by a second
            vmap-layout copy;
          * backbone bottom pooled per stereo half BEFORE the concat
            ((B, V, 512) instead of (B, V, 8, 8, 512))."""
        cfg = self.cfg
        if cfg.num_views >= 3:
            # view_major: the (V, B) permutation rides the NCHW->NHWC input
            # transpose the backbone pays anyway (fold_views), so the
            # feature stacks arrive pre-permuted and only the SMALL pooled /
            # heatmap tensors ever transpose (round-5 b64 trace: ~1.7 ms of
            # feature-stack copies removed).
            hm_f, feat_f, pyr_f = self.heatmap_estimator_stereo_front(
                img[:, 0:2], train, return_feat=True, view_major=True
            )
            hm_b, feat_b, pyr_b = self.heatmap_estimator_stereo_back(
                img[:, 2:], train, return_feat=True, view_major=True
            )
            hm = jnp.concatenate([hm_f, hm_b], axis=1)
            feat = jnp.concatenate([feat_f, feat_b], axis=0)  # (V, B, h, w, C)
            bfb_pooled = jnp.concatenate(
                [pyr_f[-1].mean(axis=(2, 3)).transpose(1, 0, 2),
                 pyr_b[-1].mean(axis=(2, 3)).transpose(1, 0, 2)],
                axis=1,
            )  # (B, V, 512)
        else:
            hm, feat, pyramid = self.heatmap_estimator_stereo_front(
                img, train, return_feat=True, view_major=True
            )  # feat (V, B, h, w, C)
            bfb_pooled = pyramid[-1].mean(axis=(2, 3)).transpose(1, 0, 2)
        return hm, feat, bfb_pooled

    def _estimator_features(self, img, train):
        """Front/back backbone features.

        Returns ``(feat, bfb, fb_pair)``: ``feat`` is the VIEW-MAJOR
        (V, B, h, w, C) stack (see ``_estimator_outputs`` for the layout
        rationale), ``bfb`` the per-half-pooled (B, V, 512) bottom
        features, and ``fb_pair`` the pre-concat batch-major
        ``(feat_front, feat_back)`` halves (or None for the stereo-only
        layout) -- the conv-stack heatmap heads consume the halves
        directly, never the stacked tensor.
        """
        cfg = self.cfg
        if cfg.num_views >= 3:
            feat_f, pyr_f = self.heatmap_estimator_stereo_front.backbone_features(
                img[:, 0:2], train, view_major=True
            )
            feat_b, pyr_b = self.heatmap_estimator_stereo_back.backbone_features(
                img[:, 2:], train, view_major=True
            )
            feat = jnp.concatenate([feat_f, feat_b], axis=0)  # (V, B, h, w, C)
            bfb_pooled = jnp.concatenate(
                [pyr_f[-1].mean(axis=(2, 3)).transpose(1, 0, 2),
                 pyr_b[-1].mean(axis=(2, 3)).transpose(1, 0, 2)],
                axis=1,
            )  # (B, V, 512) -- pooled per half, see _estimator_outputs
            return feat, bfb_pooled, (feat_f, feat_b)
        feat, pyramid = self.heatmap_estimator_stereo_front.backbone_features(
            img, train, view_major=True
        )
        return (feat, pyramid[-1].mean(axis=(2, 3)).transpose(1, 0, 2), None)

    def _heatmaps_from_feat(self, feat, fb_pair=None):
        """Conv-stack heads at the MVFEX level (used when not use_1by1_conv).

        ``feat`` is the view-major (V, B, h, w, C) stack; ``fb_pair``
        short-circuits the front/back re-slice with the pre-concat
        VIEW-MAJOR halves when the caller still holds them (see
        ``_estimator_features``). Returns batch-major (B, V, J, h, w).
        """
        cfg = self.cfg
        V, B = feat.shape[:2]
        J = cfg.num_heatmap
        spatial = feat.shape[2:]
        if cfg.num_views >= 3:
            if fb_pair is not None:
                feat_f, feat_b = fb_pair  # (2, B, h, w, C) each, view-major
                f = feat_f.reshape(2 * B, *spatial)
                b = feat_b.reshape((V - 2) * B, *spatial)
            else:
                f = feat[0:2].reshape(2 * B, *spatial)  # view-major fold
                b = feat[2:].reshape((V - 2) * B, *spatial)
            hm_f = self.conv_heatmap_head_front(f).transpose(0, 3, 1, 2)
            hm_b = self.conv_heatmap_head_back(b).transpose(0, 3, 1, 2)
            hm = jnp.concatenate(
                [
                    hm_f.reshape(2, B, J, *hm_f.shape[2:]),
                    hm_b.reshape(V - 2, B, J, *hm_b.shape[2:]),
                ],
                axis=0,
            ).transpose(1, 0, 2, 3, 4)
        else:
            f = feat.reshape(V * B, *spatial)  # view-major fold
            hm = self.conv_heatmap_head_front(f).transpose(0, 3, 1, 2)
            hm = hm.reshape(V, B, J, *hm.shape[2:]).transpose(1, 0, 2, 3, 4)
        return hm

    def get_anchors_2d(self, heatmap):
        """Per-view argmax anchors (egoposeformer_heatmap_mvf_ex.py:128-143)."""
        heatmap = jax.lax.stop_gradient(heatmap)
        pts2d, maxvals, valid = argmax_2d(
            heatmap, threshold=self.cfg.heatmap_threshold, normalize=True
        )
        return pts2d, maxvals, valid

    def __call__(
        self,
        img: jnp.ndarray,  # (B, V, 3, H, W)
        train: bool = False,
        heatmap_for_anchor: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        sg = jax.lax.stop_gradient

        # ---- stage-1 with the reference detach policy (:236-297) ----
        # bfb_* carries the already-pooled (B, V, 512) backbone-bottom
        # features (pooling commutes with stop_gradient and the concat).
        if self.use_1by1_conv:
            hm_init, feat_init, bfb_init = self._estimator_outputs(img, train)
            if not cfg.full_training:
                hm_init, feat_init, bfb_init = jax.tree.map(
                    sg, (hm_init, feat_init, bfb_init)
                )
            if cfg.use_pred_heatmap_init:
                hm_for_refine = sg(hm_init)
                if cfg.no_detach_feat_init:
                    feat, bfb = feat_init, bfb_init
                else:
                    feat, bfb = sg(feat_init), sg(bfb_init)
            else:
                hm_for_refine, feat, bfb = hm_init, feat_init, bfb_init
        else:
            feat_init, bfb_init, fb_pair = self._estimator_features(img, train)
            if not cfg.full_training:
                feat_init, bfb_init, fb_pair = jax.tree.map(
                    sg, (feat_init, bfb_init, fb_pair)
                )
            if cfg.use_pred_heatmap_init:
                hm_init = self._heatmaps_from_feat(
                    sg(feat_init), jax.tree.map(sg, fb_pair)
                )
                hm_for_refine = sg(hm_init)
                if cfg.no_detach_feat_init:
                    feat, bfb = feat_init, bfb_init
                else:
                    feat, bfb = sg(feat_init), sg(bfb_init)
            else:
                hm_init = self._heatmaps_from_feat(feat_init, fb_pair)
                hm_for_refine, feat, bfb = hm_init, feat_init, bfb_init

        list_heatmap = [hm_init]
        list_feat = [feat_init]

        anchor_src = (
            heatmap_for_anchor if heatmap_for_anchor is not None else hm_init
        )
        anchors_2d, _, anchors_valid = self.get_anchors_2d(anchor_src)

        bfb_pooled = bfb  # (B, V, 512), pooled upstream of the pair concat

        # ---- stacked refiners over all views at once ----
        hm_layers, feat_layers = self.refiners(
            hm_for_refine,  # (B, V, J, h, w), vmapped over axis 1
            feat,  # VIEW-MAJOR (V, B, h, w, C), vmapped over axis 0
            feat,  # broadcast: full multi-view tensor, view-major
            anchors_2d,
            anchors_valid,
            bfb_pooled,  # (B, V, 512), axis 1
            bfb_pooled,  # broadcast
            train,
        )
        # hm_layers: list over layers of (B, V, J, h, w) batch-major;
        # feat_layers of (V, B, h, w, C) VIEW-MAJOR (out_axes 0: the vmap
        # emits them with the view axis leading for free, and the pose3d
        # lifter consumes that layout directly).
        list_heatmap.extend(hm_layers)
        list_feat.extend(feat_layers)
        return list_heatmap, list_feat

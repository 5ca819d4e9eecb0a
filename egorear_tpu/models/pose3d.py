"""Stage-3: 3D pose lifting via fisheye reprojection transformer, plus the
full cascaded network.

Behavioral contract (reference /root/reference/pose_estimation/models/
estimator/egoposeformer_mvf_ex.py):
  * ``Pose3DLifter`` == EgoPoseFormerPose3D (:62-452): a 1x1 feature
    projection (:144, :431-432); a 3D proposal head with three variants
    (avgpool-MLP :164-181/:324-338, heatmap-conv-MLP :183-226/:286-307,
    conv-downsample-MLP :228-253/:309-322 -- the configs use the last); then
    ``num_former_layers`` transformer layers that deform-attend at the
    fisheye reprojections of the (stop-gradient) proposal anchors in every
    view (:340-420), each emitting a 3D offset from a small reg MLP (:408-419).
  * ``EgoRearNet`` == EgoPoseFormerMVFEX (:22-59): HeatmapMVFexNet +
    Pose3DLifter; the lifter consumes init-vs-final frame features per
    ``use_pred_heatmap_init`` (:50-59, :422-427) while the MLP proposal always
    reads the final features (:434-439).

Reference quirks reproduced on purpose:
  * the reprojection mutates the anchor tensor in place across the syn
    cameras (see egorear_tpu.ops.camera docstring); both the query-gen MLP
    (:406) and the per-layer offset accumulation (:418) consume the *mutated*
    anchors, which :class:`CameraRig.project` returns as ``anchors_out``.
  * anchors are NOT re-projected between refinement layers (:408-419).

The camera rig is passed into ``__call__`` as a pytree argument (functional
style) instead of the reference's CUDA-pinned per-camera objects
(utils/camera_models.py:24-27).
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from egorear_tpu.models.configs import EgoRearNetCfg, Pose3DCfg
from egorear_tpu.models.layers import (
    FFN,
    LinearParams,
    MSDeformAttn,
    MultiheadAttention,
)
from egorear_tpu.models.mvfex import HeatmapMVFexNet, MultiViewTransformerLayer
from egorear_tpu.ops.camera import CameraRig

def relu(x):
    # plain HLO (not jax.nn.relu's inner jit) so XLA fuses it into
    # producing conv/dot epilogues (see backbone._relu)
    return jnp.maximum(x, 0)


class Pose3DLifter(nn.Module):
    num_views: int
    image_size: tuple
    use_pred_heatmap_init: bool
    cfg: Pose3DCfg

    @property
    def feat_shape(self):
        return (
            self.image_size[0] // self.cfg.feat_down_stride,
            self.image_size[1] // self.cfg.feat_down_stride,
        )

    def _proposal_mlp(self, x, train):
        """Shared MLP trunk: num_mlp_layers x [Dense, GELU, Dropout] + head."""
        cfg = self.cfg
        B = x.shape[0]
        in_dims = x.shape[-1]
        for i in range(cfg.num_mlp_layers):
            if cfg.use_mlp_avgpool:
                out = cfg.mlp_dims
            else:
                out = in_dims // 16
            x = nn.Dense(out, name=f"mlp_pred_{i}")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Dropout(cfg.mlp_dropout, deterministic=not train)(x)
            in_dims = out
        x = nn.Dense(3 * cfg.num_joints, name="mlp_pred_out")(x)
        return x.reshape(B, cfg.num_joints, 3)

    @nn.compact
    def __call__(
        self,
        frame_feats_init: jnp.ndarray,  # (V, B, h, w, Cin) VIEW-MAJOR
        frame_feats_final: jnp.ndarray,  # (V, B, h, w, Cin) VIEW-MAJOR
        heatmap_final: jnp.ndarray,  # (B, V, J_hm, h, w)
        rig: CameraRig,
        coord_trans_mat: Optional[jnp.ndarray] = None,
        train: bool = False,
        origin_3d: Optional[jnp.ndarray] = None,
    ) -> List[jnp.ndarray]:
        # ``origin_3d`` is the UnrealEgo legacy pelvis-relative hook. The
        # reference accepts it through the whole call chain but its
        # _reproject_3d_to_2d never reads it (egoposeformer_mvf_ex.py:340-382
        # has no unrealego branch) and no unrealego dataset/config ships in
        # the snapshot -- so it is accepted-and-unused here too, for API
        # parity (see PARITY.md). The projection itself exists as
        # ops/camera.py unrealego_project.
        del origin_3d
        cfg = self.cfg
        # VIEW-MAJOR frame features (V, B, h, w, Cin): the layout the MVFex
        # stage emits for free (models/mvfex.py RefinerStack out_axes) --
        # consuming it directly avoids re-materializing a batch-major copy.
        # Only the tiny proposal-MLP inputs are re-ordered (below), and in
        # exactly the flatten order the reference uses, so converted
        # checkpoints stay weight-compatible.
        V, B, h, w, Cin = frame_feats_final.shape
        J = cfg.num_joints
        C = cfg.embed_dims

        frame_feats = (
            frame_feats_init if self.use_pred_heatmap_init else frame_feats_final
        )

        # 1x1 memory projection, Dense-shaped; never applied to the grid in
        # the lazy path (folded into post-sampling projections instead).
        mem_kernel, mem_bias = LinearParams(Cin, C, name="feat_proj")()
        feat_tokens = frame_feats.reshape(V, B, h * w, Cin)
        if cfg.lazy_deform and not cfg.transformer.use_normal_cross_attn:
            memory = None
        else:
            memory = (
                feat_tokens @ mem_kernel.astype(feat_tokens.dtype)
                + mem_bias.astype(feat_tokens.dtype)
            )

        # ---- 3D proposal ----
        if cfg.use_mlp_avgpool:
            pooled = frame_feats_final.mean(axis=(2, 3))  # (V, B, Cin)
            mlp_pred = self._proposal_mlp(
                pooled.transpose(1, 0, 2).reshape(B, V * Cin), train)
        elif cfg.use_mlp_heatmap:
            # Per-view conv stacks over the predicted heatmaps (:183-226).
            d = 32
            feats = []
            for v in range(V):
                y = heatmap_final[:, v].transpose(0, 2, 3, 1)  # (B, h, w, J_hm)
                y = relu(
                    nn.Conv(d, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                            name=f"conv_heatmap_view{v}_0")(y)
                )
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
                y = relu(
                    nn.Conv(d * 2, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                            name=f"conv_heatmap_view{v}_1")(y)
                )
                feats.append(y)
            stacked = jnp.stack(feats, axis=1)  # (B, V, 8, 8, 2d)
            mlp_pred = self._proposal_mlp(stacked.reshape(B, -1), train)
        else:
            y = frame_feats_final.reshape(V * B, h, w, Cin)  # view-major fold
            y = relu(nn.Conv(Cin // 2, (1, 1), name="conv_ff_0")(y))
            y = relu(
                nn.Conv(Cin, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                        name="conv_ff_1")(y)
            )
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
            y = relu(nn.Conv(Cin // 2, (1, 1), name="conv_ff_2")(y))
            y = relu(
                nn.Conv(Cin, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                        name="conv_ff_3")(y)
            )  # (V*B, h/8, w/8, Cin)
            # Flatten per sample with views OUTERMOST -- the reference's
            # (B*V, ...).reshape(B, -1) order (egoposeformer_mvf_ex.py:
            # 309-322) -- so mlp_pred_0 weights stay converter-compatible.
            y = y.reshape(V, B, -1).transpose(1, 0, 2)
            mlp_pred = self._proposal_mlp(y.reshape(B, -1), train)

        if cfg.norm_mlp_pred:
            coor_min = jnp.asarray(cfg.coor_norm_min, dtype=mlp_pred.dtype)
            coor_max = jnp.asarray(cfg.coor_norm_max, dtype=mlp_pred.dtype)
            # NOTE: the reference calls _unnorm_coor without using its return
            # value (:304-306, :320-321, :335-336), so unnormalization is a
            # no-op there; we apply it for real when the flag is on.
            mlp_pred = (coor_max - coor_min) * (mlp_pred + 1.0) / 2.0 + coor_min

        # ---- reprojection transformer ----
        init_anchors = jax.lax.stop_gradient(mlp_pred)
        anchors_2d, anchors_valid, anchors_mut = rig.project(
            init_anchors, coord_trans_mat
        )
        dtype = feat_tokens.dtype
        anchors_2d = anchors_2d.astype(dtype)

        joint_inds = (
            jnp.arange(1, J + 1, dtype=dtype).reshape(1, J, 1) / float(J)
        )
        joint_inds = jnp.broadcast_to(joint_inds, (B, J, 1))
        q = jnp.concatenate([joint_inds, anchors_mut.astype(dtype)], -1)
        for i, dims in enumerate([C, C, C]):
            q = nn.Dense(dims, name=f"query_gen_{i}")(q)
            if i < 2:
                q = relu(q)
        x = q

        preds = [mlp_pred]
        anchors_base = jax.lax.stop_gradient(anchors_mut)
        for idx in range(cfg.num_former_layers):
            x = MultiViewTransformerLayer(
                num_views=V,
                embed_dims=C,
                feat_shape=self.feat_shape,
                cfg=cfg.transformer,
                vmajor=True,
                name=f"transformer_{idx}",
            )(x, memory, anchors_2d, anchors_valid,
              feat_raw=feat_tokens if memory is None else None,
              mem_kernel=mem_kernel, mem_bias=mem_bias, train=train)
            _x = nn.LayerNorm(name=f"post_norm_{idx}")(x)
            o = _x
            for i in range(cfg.num_pred_mlp_layers - 1):
                o = nn.Dense(C, name=f"reg_mlp_{idx}_{i}")(o)
                o = nn.gelu(o, approximate=False)
            offset = nn.Dense(3, name=f"reg_mlp_{idx}_out")(o)
            preds.append(offset + anchors_base)
        return preds


class EgoRearNet(nn.Module):
    """Full cascade: stage-1 stereo heatmaps -> MVFex refinement -> 3D lift."""

    cfg: EgoRearNetCfg

    def setup(self):
        self.heatmap_estimator = HeatmapMVFexNet(cfg=self.cfg.heatmap_mvf)
        self.pose3d_estimator = Pose3DLifter(
            num_views=self.cfg.num_views,
            image_size=self.cfg.image_size,
            use_pred_heatmap_init=self.cfg.heatmap_mvf.use_pred_heatmap_init,
            cfg=self.cfg.pose3d,
        )

    def __call__(
        self,
        img: jnp.ndarray,  # (B, V, 3, H, W)
        rig: CameraRig,
        coord_trans_mat: Optional[jnp.ndarray] = None,
        train: bool = False,
        origin_3d: Optional[jnp.ndarray] = None,
    ):
        list_heatmap, list_feat = self.heatmap_estimator(img, train)
        preds_3d = self.pose3d_estimator(
            list_feat[0],
            list_feat[-1],
            list_heatmap[-1],
            rig,
            coord_trans_mat,
            train,
            origin_3d,
        )
        return preds_3d, list_heatmap

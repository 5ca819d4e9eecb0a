"""Stage-1 per-view 2D joint-heatmap estimator.

Behavioral contract (reference /root/reference/pose_estimation/models/
estimator/egoposeformer_heatmap.py:9-44): backbone+FPN over view-folded
batches, then a 1x1 conv head emitting ``num_heatmap`` (15) channels; an
optional stop-gradient between features and head
(``detach_heatmap_feat_init``).

Public tensor contract matches the reference (images (B, V, 3, H, W) NCHW,
heatmaps (B, V, J, h, w)); internally everything is NHWC for the TPU conv
units.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from egorear_tpu.models.backbone import BackboneWithFPN


def fold_views(
    img: jnp.ndarray, layout: str = "auto", view_major: bool = False
) -> jnp.ndarray:
    """(B, V, 3, H, W) NCHW or (B, V, H, W, 3) NHWC -> (B*V, H, W, 3).

    NCHW is the reference's public contract (egoposeformer_heatmap.py:29);
    NHWC is accepted too because the decode pipeline is HWC-native and
    feeding it directly skips a full transpose pass over the input batch
    (~2 ms/step at batch 64 on v5e). ``layout`` may pin "nchw"/"nhwc"
    explicitly; "auto" disambiguates by which axis equals 3 and resolves the
    degenerate 3x3-spatial tie toward NCHW (the reference contract) -- pass
    an explicit layout for such inputs.

    ``view_major=True`` folds as (V*B, H, W, 3) instead: the MVFex refiner
    stack consumes features view-major (V, B, h, w, C), and riding the
    (V, B) permutation on the NCHW->NHWC transpose this function already
    pays makes the downstream feature-stack transposes (~1.7 ms/step at
    batch 64 in the round-5 b64 trace) disappear -- the per-sample math is
    unchanged, only the order of samples inside the folded batch.
    """
    B, V = img.shape[:2]
    if layout == "auto":
        chan_first = img.shape[2] == 3
        chan_last = img.shape[-1] == 3
        if chan_first and not chan_last:
            layout = "nchw"
        elif chan_last and not chan_first:
            layout = "nhwc"
        else:
            # True (B, V, 3, ..., 3) tie (or neither axis == 3, which the
            # assert below rejects loudly): reference NCHW contract wins;
            # pass an explicit layout to override.
            layout = "nchw"
    if layout == "nchw":
        _, _, C, H, W = img.shape
        assert C == 3, f"not an NCHW image batch: {img.shape}"
        if view_major:
            return img.transpose(1, 0, 3, 4, 2).reshape(V * B, H, W, C)
        return img.reshape(B * V, C, H, W).transpose(0, 2, 3, 1)
    assert img.shape[-1] == 3, f"unrecognized image layout {img.shape}"
    if view_major:
        return img.transpose(1, 0, 2, 3, 4).reshape(V * B, *img.shape[2:])
    return img.reshape(B * V, *img.shape[2:])


def unfold_views(
    x_nhwc: jnp.ndarray, B: int, V: int, view_major: bool = False
) -> jnp.ndarray:
    """(B*V, H, W, C) -> (B, V, H, W, C) (or (V*B, ...) -> (V, B, ...))."""
    if view_major:
        return x_nhwc.reshape(V, B, *x_nhwc.shape[1:])
    return x_nhwc.reshape(B, V, *x_nhwc.shape[1:])


class HeatmapNet(nn.Module):
    num_heatmap: int = 15
    out_stride: int = 4
    fpn_channels: int = 128
    detach_heatmap_feat_init: bool = False
    bn_folded: bool = False

    def setup(self):
        self.encoder = BackboneWithFPN(
            out_stride=self.out_stride,
            fpn_channels=self.fpn_channels,
            bn_folded=self.bn_folded,
        )
        self.conv_heatmap = nn.Conv(self.num_heatmap, (1, 1))

    def backbone_features(
        self, img: jnp.ndarray, train: bool = False, view_major: bool = False
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """img (B, V, 3, H, W) -> fpn (B, V, h, w, C) + pyramid [(B, V, ...)].

        ``view_major=True`` returns (V, B, ...) stacks instead, with the
        (V, B) permutation folded into the input transpose (see
        :func:`fold_views`).
        """
        B, V = img.shape[:2]
        feats, pyramid = self.encoder(
            fold_views(img, view_major=view_major), train
        )
        return (
            unfold_views(feats, B, V, view_major),
            [unfold_views(p, B, V, view_major) for p in pyramid],
        )

    def head(
        self, feats: jnp.ndarray, view_major: bool = False
    ) -> jnp.ndarray:
        """FPN features (B, V, h, w, C) (or (V, B, ...) when ``view_major``)
        -> heatmaps, ALWAYS batch-major (B, V, J, h, w) (public contract)."""
        a, b = feats.shape[:2]
        x = feats.reshape(a * b, *feats.shape[2:])
        if self.detach_heatmap_feat_init:
            x = jax.lax.stop_gradient(x)
        hm = self.conv_heatmap(x)  # (B*V, h, w, J)
        hm = hm.transpose(0, 3, 1, 2)
        hm = hm.reshape(a, b, *hm.shape[1:])
        if view_major:  # (V, B, J, h, w) -> (B, V, J, h, w); J*h*w is small
            hm = hm.transpose(1, 0, 2, 3, 4)
        return hm

    def __call__(
        self,
        img: jnp.ndarray,
        train: bool = False,
        return_feat: bool = False,
        view_major: bool = False,
    ):
        feats, pyramid = self.backbone_features(img, train, view_major)
        heatmap = self.head(feats, view_major)
        if return_feat:
            return heatmap, feats, pyramid
        return heatmap

"""ResNet-18 + EfficientFPN backbone (NHWC, stride-4 output).

Behavioral contract (reference /root/reference/pose_estimation/models/
backbones/resnet.py): torchvision resnet18 split into stride 2/4/8/16/32
stages with the (B, V) view axis folded into the batch (:43-74), followed by a
top-down FPN (lateral 1x1 -> x2 bilinear align-corners upsample -> concat ->
fuse 1x1 -> 3x3) emitting a single stride-4, 128-channel map (:77-137).

Convolutions use torch-style explicit symmetric padding so converted
torchvision/reference checkpoints are numerically exact. BatchNorm matches
torch defaults (eps 1e-5, running-stat momentum 0.1).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from egorear_tpu.models.layers import upsample2x_align_corners


def _relu(x):
    # jnp.maximum instead of jax.nn.relu: the relu stays a plain HLO in the
    # caller's computation (no inner-jit call boundary), which lets XLA fuse
    # it into the producing conv/dot epilogues -- the profiler showed the
    # FPN's jax.nn.relu running as standalone bandwidth-bound passes.
    return jnp.maximum(x, 0)


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        identity = x
        out = nn.Conv(
            self.channels, (3, 3), strides=self.stride,
            padding=((1, 1), (1, 1)), use_bias=False, name="conv1",
        )(x)
        out = bn("bn1")(out)
        out = _relu(out)
        out = nn.Conv(
            self.channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, name="conv2",
        )(out)
        out = bn("bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(
                self.channels, (1, 1), strides=self.stride,
                use_bias=False, name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity)
        return _relu(out + identity)


class ResNet18(nn.Module):
    """Stride-pyramid ResNet-18 feature extractor.

    Input (N, H, W, 3) NHWC; returns the [s4, s8, s16, s32] pyramid (or a
    suffix of it per ``out_stride``), channel counts (64, 128, 256, 512).
    """

    out_stride: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(
            64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
            use_bias=False, name="conv1",
        )(x)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1"
        )(out)
        s2 = _relu(out)

        out = nn.max_pool(s2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            out = BasicBlock(64, name=f"layer1_{i}")(out, train)
        s4 = out
        for i, stride in enumerate((2, 1)):
            out = BasicBlock(128, stride, name=f"layer2_{i}")(out, train)
        s8 = out
        for i, stride in enumerate((2, 1)):
            out = BasicBlock(256, stride, name=f"layer3_{i}")(out, train)
        s16 = out
        for i, stride in enumerate((2, 1)):
            out = BasicBlock(512, stride, name=f"layer4_{i}")(out, train)
        s32 = out

        pyramid = {4: [s4, s8, s16, s32], 8: [s8, s16, s32],
                   16: [s16, s32], 32: [s32]}
        return pyramid[self.out_stride]


class EfficientFPN(nn.Module):
    in_channels: Sequence[int] = (64, 128, 256, 512)
    out_channels: int = 128
    with_relu: bool = True

    @nn.compact
    def __call__(self, feats):
        act = _relu if self.with_relu else (lambda y: y)
        laterals = [
            act(nn.Conv(self.out_channels, (1, 1), name=f"lateral_{i}")(f))
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = upsample2x_align_corners(laterals[i])
            fused = act(
                nn.Conv(self.out_channels, (1, 1), name=f"fuse_{i - 1}")(
                    jnp.concatenate([laterals[i - 1], up], axis=-1)
                )
            )
            laterals[i - 1] = act(
                nn.Conv(
                    self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name=f"fpn_{i - 1}",
                )(fused)
            )
        return laterals[0]


class BackboneWithFPN(nn.Module):
    """ResNet-18 + FPN over view-folded batches.

    Input (N, H, W, 3); returns (fpn_feat (N, H/4, W/4, 128), pyramid list).
    """

    out_stride: int = 4
    fpn_channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, list]:
        pyramid = ResNet18(out_stride=self.out_stride, name="resnet")(x, train)
        fpn = EfficientFPN(
            in_channels=tuple(f.shape[-1] for f in pyramid),
            out_channels=self.fpn_channels,
            name="fpn",
        )(pyramid)
        return fpn, pyramid

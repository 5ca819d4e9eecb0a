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
    bn_folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bn_folded:
            # Serving mode: eval-mode BN is pre-folded into the conv weights
            # (see fold_batchnorm); each conv carries the absorbed bias.
            bn = lambda name: (lambda y: y)
        else:
            bn = lambda name: nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=name,
            )
        bias = self.bn_folded
        identity = x
        out = nn.Conv(
            self.channels, (3, 3), strides=self.stride,
            padding=((1, 1), (1, 1)), use_bias=bias, name="conv1",
        )(x)
        out = bn("bn1")(out)
        out = _relu(out)
        out = nn.Conv(
            self.channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=bias, name="conv2",
        )(out)
        out = bn("bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(
                self.channels, (1, 1), strides=self.stride,
                use_bias=bias, name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity)
        return _relu(out + identity)


class ResNet18(nn.Module):
    """Stride-pyramid ResNet-18 feature extractor.

    Input (N, H, W, 3) NHWC; returns the [s4, s8, s16, s32] pyramid (or a
    suffix of it per ``out_stride``), channel counts (64, 128, 256, 512).
    """

    out_stride: int = 4
    bn_folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        folded = self.bn_folded
        out = nn.Conv(
            64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
            use_bias=folded, name="conv1",
        )(x)
        if not folded:
            out = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="bn1",
            )(out)
        s2 = _relu(out)

        out = nn.max_pool(s2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            out = BasicBlock(64, bn_folded=folded, name=f"layer1_{i}")(out, train)
        s4 = out
        for i, stride in enumerate((2, 1)):
            out = BasicBlock(128, stride, folded, name=f"layer2_{i}")(out, train)
        s8 = out
        for i, stride in enumerate((2, 1)):
            out = BasicBlock(256, stride, folded, name=f"layer3_{i}")(out, train)
        s16 = out
        for i, stride in enumerate((2, 1)):
            out = BasicBlock(512, stride, folded, name=f"layer4_{i}")(out, train)
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
    bn_folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, list]:
        pyramid = ResNet18(
            out_stride=self.out_stride, bn_folded=self.bn_folded, name="resnet"
        )(x, train)
        fpn = EfficientFPN(
            in_channels=tuple(f.shape[-1] for f in pyramid),
            out_channels=self.fpn_channels,
            name="fpn",
        )(pyramid)
        return fpn, pyramid


# -- eval-mode BatchNorm folding (serving path) ------------------------------

_BN_PAIRS = (("conv1", "bn1"), ("conv2", "bn2"),
             ("downsample_conv", "downsample_bn"))


def fold_batchnorm(variables, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into the preceding conv weights.

    Input: a variables dict ``{"params": ..., "batch_stats": ...}`` for any
    model built on ``ResNet18`` (the only BN user in the framework). Output:
    a variables dict for the SAME model constructed with ``bn_folded=True``:
    every (conv, bn) pair collapses to a biased conv with

        kernel' = kernel * gamma / sqrt(var + eps)
        bias'   = beta - mean * gamma / sqrt(var + eps)

    which is numerically identical to conv -> eval-BN (torch/flax BN
    inference formula, reference resnet.py uses torch defaults eps=1e-5).
    Fold in fp32 BEFORE any bf16 serving cast so the absorbed scale rounds
    once, not twice. Training is unaffected -- this is a pure serving-time
    transform; checkpoints always store the unfolded tree.
    """
    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: x, variables["params"])  # deep-ish copy
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        if not isinstance(p, dict):
            return p
        out = {}
        consumed = set()
        for conv_name, bn_name in _BN_PAIRS:
            if conv_name in p and bn_name in p:
                bn_p, bn_s = p[bn_name], (s or {}).get(bn_name, {})
                gamma = jnp.asarray(bn_p["scale"], jnp.float32)
                beta = jnp.asarray(bn_p["bias"], jnp.float32)
                mean = jnp.asarray(bn_s["mean"], jnp.float32)
                var = jnp.asarray(bn_s["var"], jnp.float32)
                scale = gamma * jax.lax.rsqrt(var + eps)
                kernel = jnp.asarray(p[conv_name]["kernel"], jnp.float32)
                out[conv_name] = {
                    "kernel": (kernel * scale).astype(kernel.dtype),
                    "bias": (beta - mean * scale).astype(kernel.dtype),
                }
                consumed.update((conv_name, bn_name))
        for k, v in p.items():
            if k in consumed:
                continue
            out[k] = walk(v, (s or {}).get(k)) if isinstance(v, dict) else v
        return out

    new_params = walk(params, stats)
    return {"params": new_params}

"""Device-mesh construction and sharding rules.

The reference's only parallelism is Lightning DDP data-parallel
(pl_wrappers/egoposeformer/heatmap.py:159-176, SURVEY.md section 2.7). The
TPU-native strategy is richer:

  * **DP**: batches sharded over the ``data`` mesh axis; gradient psums are
    inserted by XLA from the shardings (the NCCL-allreduce equivalent).
  * **TP**: the few genuinely large weights -- the 3D-proposal MLP
    (V*128*8*8 = 32768-wide input, egoposeformer_mvf_ex.py:241-253) and the
    4096-wide JQA heatmap projections -- are sharded over the ``model`` axis
    on their widest dimension; everything else (ResNet convs, 256-d
    transformer blocks) is replicated, which is optimal at these sizes.

Collectives ride ICI: a (data, model) mesh should map 'model' to the
minor/faster axis when chips allow.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Params at least this wide get tensor-sharded over the 'model' axis.
TP_MIN_DIM = 2048


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def leaf_sharding(shape, mesh: Mesh, min_dim: int = TP_MIN_DIM,
                  shard_stacked: bool = True) -> NamedSharding:
    """Sharding for one weight of the given shape.

    2-D Dense kernels (in, out) shard their widest dim over 'model' when it
    is >= ``min_dim`` and divisible. With ``shard_stacked``, 3-D stacked
    kernels (V, in, out) -- the vmapped per-view refiner weights, e.g. the
    4096-wide JQA heatmap projections at 256px -- shard the widest of the
    two TRAILING dims (the leading axis is the view stack and must stay
    whole per view). Everything else is replicated, which is optimal at
    this model family's sizes.

    History of ``shard_stacked`` (rounds 2-4): sharding the stacked refiner
    kernels used to hit a GENUINE XLA SPMD backward miscompilation (jax
    0.9.0; gradients into the shared ResNet encoder off ~12x in norm AT
    FLOAT64, i.e. a wrong collective, not fp noise). Two triggers were
    isolated and removed:
      1. the batch-major multi-view layout's vmap re-layout (fixed by the
         round-4 view-major `(V, B, ...)` feature flow), and
      2. the per-view Python slice loop in the heatmap loss -- V separate
         reductions over ``pred[:, i]`` of the stacked refiner outputs
         (bisected with tools/tp_trainer_f64_check.py; fixed by the fused
         reduction in train/tasks._per_view_mse_sum).
    With both gone, the full train-step graph matches the replicated run
    to reduction-reassociation noise (fp32 worst-leaf ~3.5e-3 on the
    sharded kernels themselves, float64-exact), so stacked sharding is ON
    by default. tests/test_tensor_parallel.py pins both configurations;
    if an XLA upgrade regresses this, the float64 run of
    tools/tp_trainer_f64_check.py is the decisive classifier.
    Keep new per-view math fused or vmapped -- avoid Python loops that
    slice the view axis of stacked-module outputs on the training path
    (the one remaining instance is the non-default ``use_mlp_heatmap``
    proposal variant, models/pose3d.py:139).
    """
    model_size = dict(mesh.shape).get("model", 1)
    ndims = (2, 3) if shard_stacked else (2,)
    if model_size > 1 and len(shape) in ndims:
        lead = len(shape) - 2  # skip the stacked-view axis of 3-D leaves
        axes = sorted(range(lead, len(shape)), key=lambda a: -shape[a])
        for axis in axes:
            if shape[axis] >= min_dim and shape[axis] % model_size == 0:
                spec = [None] * len(shape)
                spec[axis] = "model"
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, min_dim: int = TP_MIN_DIM,
                    shard_stacked: bool = True):
    """Per-leaf NamedShardings: TP-shard wide kernels, replicate the rest.

    Applies to any pytree of arrays/ShapeDtypeStructs (params, optimizer
    moments, ...) -- the rule depends only on leaf shapes.
    """
    return jax.tree_util.tree_map(
        lambda leaf: leaf_sharding(np.shape(leaf), mesh, min_dim,
                                   shard_stacked), params
    )


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))

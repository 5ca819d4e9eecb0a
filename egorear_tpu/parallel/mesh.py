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


def param_shardings(params, mesh: Mesh):
    """Per-leaf NamedShardings: TP-shard wide Dense kernels, replicate rest."""
    model_size = mesh.shape["model"]

    def rule(path, leaf):
        shape = np.shape(leaf)
        if model_size > 1 and len(shape) == 2:
            # Dense kernel (in, out): shard the widest dim if divisible.
            for axis in np.argsort(shape)[::-1]:
                if shape[axis] >= TP_MIN_DIM and shape[axis] % model_size == 0:
                    spec = [None, None]
                    spec[int(axis)] = "model"
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))

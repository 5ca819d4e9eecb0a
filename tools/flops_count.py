#!/usr/bin/env python
"""Exact per-frame FLOP count of the flagship 4-view forward, from XLA.

Grounds BASELINE.md's reference-GPU throughput derivation: compiles the
fp32 full-cascade forward (same graph `bench.py` times) and prints XLA's
cost-model FLOPs, total and per frame.

Usage: python tools/flops_count.py [batch] [image_size]   (CPU-safe)
"""

import os
import sys

# Force CPU unconditionally: this is a cost-model analysis, no device work.
# (The axon sitecustomize pre-sets JAX_PLATFORMS=axon, so a setdefault here
# would silently keep the TPU backend and hang when the tunnel is down.)
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _build  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    net, rig, _ = _build((size, size))
    img = jnp.zeros((batch, 4, 3, size, size), jnp.float32)
    variables = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), img[:1], rig))

    def fwd(v, im):
        preds3d, hms = net.apply(v, im, rig)
        return preds3d[-1], hms[-1]

    compiled = jax.jit(fwd).lower(variables, img).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost["flops"])
    print(f"batch {batch}, image {size}px")
    print(f"total  : {flops/1e9:.2f} GFLOP")
    print(f"/frame : {flops/batch/1e9:.2f} GFLOP "
          f"(frame = one 4-view sample, full cascade)")
    for k in ("bytes accessed", "utilization operand 0"):
        if k in cost:
            print(f"{k}: {cost[k]:.3e}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B timing of the b64 bf16 full forward under the wired perf env knobs.

Each combo runs in a subprocess (the knobs are read at import/trace time),
with the persistent compile cache enabled so repeat combos are cheap. Prints
one line per combo; use this to decide which knob values become code
defaults (bench.py runs with whatever the defaults are).

Usage: python tools/bench_ab.py [--batch 64] [--iters 20] [combo ...]
  combo grammar: comma-separated KEY=VAL pairs, e.g.
    "" (empty = current defaults)
    "EGOREAR_VMAP_CONV_IMPL=matmul"
    "EGOREAR_SBUILD_BP=8,EGOREAR_VMAP_CONV_IMPL=matmul"
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
from egorear_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from __graft_entry__ import _build
fold = os.environ.get("EGOREAR_BENCH_FOLD_BN", "1") != "0"
net, rig, _ = _build((256, 256))
B = {batch}
img0 = jnp.zeros((1, 4, 3, 256, 256), jnp.float32)
variables = jax.jit(lambda: net.init(jax.random.PRNGKey(0), img0, rig))()
if fold:
    from egorear_tpu.models.backbone import fold_batchnorm
    net, _, _ = _build((256, 256), bn_folded=True)
    variables = fold_batchnorm(variables)
vb = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
    variables)
def body(im):
    p3d, hms = net.apply(vb, im, rig)
    return p3d[-1], hms[-1]
fwd = jax.jit(body)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, 4, 3, 256, 256)), jnp.bfloat16)
t0 = time.perf_counter()
jax.block_until_ready(fwd(img))
compile_s = time.perf_counter() - t0
n = {iters}
t0 = time.perf_counter()
for _ in range(n):
    out = fwd(img)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / n
print(f"RESULT ms_per_step={{dt*1000:.2f}} fps={{B/dt:.1f}} "
      f"compile_s={{compile_s:.0f}}")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("combos", nargs="*", default=[
        "",
        "EGOREAR_BENCH_FOLD_BN=0",
        "EGOREAR_VMAP_CONV_IMPL=matmul",
        "EGOREAR_VMAP_CONV_IMPL=patches",
        "EGOREAR_SBUILD_BP=8",
        "EGOREAR_SBUILD_BP=8,EGOREAR_VMAP_CONV_IMPL=patches",
        "EGOREAR_SBUILD_BP=8,EGOREAR_VMAP_CONV_IMPL=matmul",
    ])
    args = ap.parse_args()

    code = CHILD.format(repo=REPO, batch=args.batch, iters=args.iters)
    for combo in args.combos:
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        for kv in filter(None, combo.split(",")):
            k, v = kv.split("=", 1)
            env[k] = v
        tag = combo or "<defaults>"
        print(f"== {tag}", flush=True)
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=1800)
        out = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")]
        if proc.returncode != 0 or not out:
            print(f"   FAILED rc={proc.returncode}: "
                  f"{proc.stderr.strip().splitlines()[-3:]}")
            continue
        print(f"   {out[0]}", flush=True)


if __name__ == "__main__":
    main()

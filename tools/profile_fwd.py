#!/usr/bin/env python
"""Profile the flagship 4-view forward on the attached TPU.

Captures a perfetto trace of a few steps and aggregates device op durations
by fusion/op name, printing the top-k hotspots. Usage:

    python tools/profile_fwd.py [batch] [dtype] [--submodules]

``--submodules`` instead times stage-1 / refiners / pose3d separately
(separate jits, so fusion boundaries differ from the full model -- use for
orientation, not exact attribution).
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(trace_dir, min_pct=0.3):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # Find TPU device PIDs (process names containing "TPU" and track "XLA Ops"
    # or similar). We aggregate complete events (ph == "X") on device tracks.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur = e.get("dur", 0)
            agg[e["name"]] += dur
            total += dur
    return agg, total, pid_names


def hlo_op_names(hlo_text):
    """Map HLO instruction name -> op_name metadata (model scope)."""
    import re

    mapping = {}
    pat = re.compile(r"%?([\w.\-]+) = .*metadata=\{[^}]*op_name=\"([^\"]+)\"")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if m:
            mapping[m.group(1)] = m.group(2)
    return mapping


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    dtype_s = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    submodules = "--submodules" in sys.argv

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build
    from bench import _enable_compile_cache

    _enable_compile_cache()
    dtype = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32
    net, rig, _ = _build((256, 256))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(batch, 4, 3, 256, 256)), dtype)

    variables = jax.jit(lambda: net.init(jax.random.PRNGKey(0), img[:1].astype(jnp.float32), rig))()
    if dtype == jnp.bfloat16:
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables,
        )

    if submodules:
        time_submodules(net, rig, variables, img)
        return

    @jax.jit
    def fwd(v, im):
        preds3d, hms = net.apply(v, im, rig)
        return preds3d[-1], hms[-1]

    out = fwd(variables, img)
    jax.block_until_ready(out)
    # steady-state timing
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(variables, img)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"steady state: {dt*1e3:.2f} ms/step  {batch/dt:.1f} fps "
          f"(batch {batch}, {dtype_s})")

    trace_dir = "/tmp/jaxtrace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for _ in range(3):
            out = fwd(variables, img)
        jax.block_until_ready(out)

    agg, total, pid_names = aggregate_trace(trace_dir)
    # Map opaque fusion names to model scopes via compiled-HLO metadata
    # (the trace's instruction names match the HLO instruction names).
    try:
        hlo = fwd.lower(variables, img).compile().as_text()
        scope = hlo_op_names(hlo)
    except Exception as e:  # noqa: BLE001
        print(f"(op_name mapping unavailable: {e})")
        scope = {}
    print(f"\ndevice total: {total/1e3/3:.2f} ms/step over 3 steps "
          f"(top-level jit_* event double-counts its children)")
    print(f"{'us/step':>10}  {'%':>5}  op")
    for name, dur in agg.most_common(60):
        pct = 100.0 * dur / total
        if pct < 0.25:
            break
        sc = scope.get(name, "")
        print(f"{dur/3:>10.0f}  {pct:>5.1f}  {name[:40]:40s} {sc[-90:]}")

    # Scope-bucketed accounting (whole step, incl. the small-op tail).
    import collections as _c

    def bucket(sc):
        if "backbone_features" in sc or "encoder" in sc:
            return "backbone.fpn" if "/fpn/" in sc else "backbone.resnet"
        if "vmap(refiners)" in sc:
            if "cross_attn" in sc:
                return "refiner.deform_attn"
            return "refiner.ff+heads"
        if "pose3d_estimator" in sc:
            return ("pose3d.deform_attn" if "cross_attn" in sc
                    else "pose3d.other")
        if "_heatmaps_from_feat" in sc:
            return "stage2.conv_heads"
        if "_estimator" in sc:
            return "stage1.glue"
        return "other/unattributed"

    buckets = _c.Counter()
    for name, dur in agg.items():
        if name.startswith("jit_"):
            continue
        buckets[bucket(scope.get(name, ""))] += dur / 3
    print("\nscope buckets (us/step, full step):")
    for k, v in buckets.most_common():
        print(f"{v:>10.0f}  {k}")


def time_submodules(net, rig, variables, img):
    import jax
    import jax.numpy as jnp

    B = img.shape[0]

    def timeit(f, *args, n=10):
        o = f(*args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / n

    @jax.jit
    def full(v, im):
        preds3d, hms = net.apply(v, im, rig)
        return preds3d[-1], hms[-1]

    @jax.jit
    def stage12(v, im):
        hms, feats = net.apply(v, im, method=lambda m, i: m.heatmap_estimator(i))
        return hms[-1], feats[-1]

    @jax.jit
    def stage1_only(v, im):
        def run(m, i):
            return m.heatmap_estimator._estimator_outputs(i, False)
        hm, feat, bfb = net.apply(v, im, method=run)
        return hm, feat

    t_full = timeit(full, variables, img)
    t_s12 = timeit(stage12, variables, img)
    t_s1 = timeit(stage1_only, variables, img)
    print(f"batch {B}:")
    print(f"  full cascade : {t_full*1e3:8.2f} ms  ({B/t_full:8.1f} fps)")
    print(f"  s1+mvfex     : {t_s12*1e3:8.2f} ms")
    print(f"  stage-1 only : {t_s1*1e3:8.2f} ms")
    print(f"  mvfex part   : {(t_s12-t_s1)*1e3:8.2f} ms")
    print(f"  pose3d part  : {(t_full-t_s12)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

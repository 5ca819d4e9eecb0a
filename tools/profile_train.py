#!/usr/bin/env python
"""Profile the pose3d TRAIN step (b32 bf16-mixed by default) on the TPU.

Round-3 traced the b64 forward in detail (tools/profile_fwd.py); this is
the same trace discipline for the training step bench.bench_training
measures: loss + grad (analytic lazy-deform VJP included) + optax update,
params fp32 masters with bf16 compute, BN stats mutated.

Usage: python tools/profile_train.py [batch] [precision] [--remat]
  batch      default 32 (the reference's pose3d per-device train batch)
  precision  bf16-mixed (default) or fp32
  --remat    wrap the loss in jax.checkpoint for the A/B

Prints steady-state ms/step, the top device ops with model scopes, a
forward/backward/optimizer split, and scope buckets.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_fwd import aggregate_trace, hlo_op_names  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    precision = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "bf16-mixed"
    remat = "--remat" in sys.argv

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _build
    from bench import _enable_compile_cache
    from egorear_tpu.ops.metrics import mpjpe_loss

    _enable_compile_cache()
    net, rig, _ = _build((256, 256))
    rng = np.random.default_rng(0)
    B = batch
    img = jnp.asarray(rng.normal(size=(B, 4, 3, 256, 256)), jnp.float32)
    gt_pose = jnp.asarray(rng.normal(size=(B, 16, 3)) * 30, jnp.float32)
    gt_hm = jnp.asarray(rng.uniform(size=(B, 4, 15, 64, 64)), jnp.float32)

    variables = jax.jit(
        lambda: net.init(jax.random.PRNGKey(0), img[:1], rig))()
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    opt_state = tx.init(params)
    mixed = precision != "fp32"

    def cast(t):
        if not mixed:
            return t
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            t)

    def loss_core(p, stats, img, gt_pose, gt_hm):
        (p3d, hms), mut = net.apply(
            {"params": cast(p), "batch_stats": stats},
            cast(img), rig, train=True, mutable=["batch_stats"],
        )
        loss = sum(mpjpe_loss(x, gt_pose) for x in p3d) * 0.1
        loss += sum(((h - gt_hm) ** 2).mean() for h in hms) * 10.0
        return loss.astype(jnp.float32), mut["batch_stats"]

    if remat:
        loss_core = jax.checkpoint(loss_core)

    @jax.jit
    def step(params, stats, opt_state, img, gt_pose, gt_hm):
        def loss_fn(p):
            return loss_core(p, stats, img, gt_pose, gt_hm)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    args = (params, stats, opt_state, img, gt_pose, gt_hm)
    params, stats, opt_state, loss = step(*args)
    jax.block_until_ready(loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        params, stats, opt_state, loss = step(
            params, stats, opt_state, img, gt_pose, gt_hm)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"steady state: {dt*1e3:.2f} ms/step  {B/dt:.1f} fps "
          f"(batch {B}, {precision}{', remat' if remat else ''})")

    trace_dir = "/tmp/jaxtrace_train"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for _ in range(3):
            params, stats, opt_state, loss = step(
                params, stats, opt_state, img, gt_pose, gt_hm)
        jax.block_until_ready(loss)

    agg, total, _ = aggregate_trace(trace_dir)
    try:
        hlo = step.lower(params, stats, opt_state, img, gt_pose,
                         gt_hm).compile().as_text()
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

    # fwd / bwd / optimizer split + model-scope buckets. XLA scopes mark the
    # backward with transpose(jvp(...)) wrappers; optax shows under
    # clip_by_global_norm / adamw / apply_updates scopes.
    import collections as _c

    def phase(sc):
        if "transpose(jvp" in sc or "/transpose[" in sc:
            return "backward"
        if any(k in sc for k in ("adamw", "clip_by_global_norm",
                                 "apply_updates", "chain")):
            return "optimizer"
        if "jvp(" in sc or "apply" in sc or sc:
            return "forward"
        return "unattributed"

    def bucket(sc):
        if "backbone_features" in sc or "encoder" in sc:
            return "backbone"
        if "vmap(refiners)" in sc:
            return ("refiner.deform_attn" if "cross_attn" in sc
                    else "refiner.ff+heads")
        if "pose3d_estimator" in sc:
            return ("pose3d.deform_attn" if "cross_attn" in sc
                    else "pose3d.other")
        if "_heatmaps_from_feat" in sc:
            return "stage2.conv_heads"
        if any(k in sc for k in ("adamw", "clip_by_global_norm",
                                 "apply_updates")):
            return "optimizer"
        return "other/unattributed"

    phases = _c.Counter()
    buckets = _c.Counter()
    for name, dur in agg.items():
        if name.startswith("jit_"):
            continue
        sc = scope.get(name, "")
        phases[phase(sc)] += dur / 3
        buckets[f"{'bwd' if phase(sc) == 'backward' else 'fwd+'} "
                f"{bucket(sc)}"] += dur / 3

    print("\nphase split (us/step):")
    for k, v in phases.most_common():
        print(f"{v:>10.0f}  {k}")
    print("\nscope buckets (us/step):")
    for k, v in buckets.most_common(20):
        print(f"{v:>10.0f}  {k}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: full 4-view heatmap->MVFex->pose3d inference FPS/chip.

Prints ONE JSON line:
    {"metric": "4view_inference_fps_per_chip", "value": N, "unit": "frames/s",
     "vs_baseline": R, ...}

"Frame" = one multi-view sample (4 x 3 x 256 x 256 + full 3D lift), i.e. the
unit of the reference's inference step (run.py test with batch_size 1).

Baseline for ``vs_baseline``: if BENCH_BASELINE.json exists (written by
bench_baseline.py, which measures an independent PyTorch transcription of the
reference network on this host), its fps is used; otherwise a documented
estimate of the reference's single-GPU eager-fp32 throughput is used
(~250 fps: 4 views x ResNet18@256px ~ 9.1 GFLOPs/frame plus the MVFex/pose3d
transformers, torch eager fp32 on a datacenter GPU). The north-star target is
>= 5x the PyTorch per-chip FPS (BASELINE.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_PYTORCH_FPS_FALLBACK = 250.0


def _probe_backend(retry_wait_s: float = 45.0) -> None:
    """Fail fast (machine-readably) when the axon TPU tunnel is down.

    ``jax.devices()`` HANGS forever (silent retry loop) when the tunnel's
    loopback relay is down, so a transient infra outage would otherwise
    destroy the round's bench record with an opaque rc=1 / timeout (this is
    exactly what happened to BENCH_r03). Strategy: if the axon client is
    installed and we are not pinned to another platform, TCP-probe the
    stateless relay port (127.0.0.1:8083); on refusal, retry once after
    ``retry_wait_s``; if still down, emit ONE JSON line with
    ``"error": "backend_unavailable"`` and exit 0 so the driver records a
    distinct environment-down outcome instead of a crash tail.
    """
    import socket

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "axon" not in platforms and "tpu" not in platforms:
        return  # explicitly pinned to cpu/other: nothing to probe
    if not os.path.isdir("/root/.axon_site"):
        return  # no axon client: jax.devices() errors normally, no hang risk

    def _up() -> bool:
        try:
            with socket.create_connection(("127.0.0.1", 8083), timeout=5):
                return True
        except OSError:
            return False

    if _up():
        return
    time.sleep(retry_wait_s)
    if _up():
        return
    print(json.dumps({
        "metric": "4view_inference_fps_per_chip",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "error": "backend_unavailable",
        "detail": "axon TPU tunnel down: 127.0.0.1:8083 connection refused "
                  "twice (retry after %.0fs); jax.devices() would hang. "
                  "Re-run when the tunnel is restored." % retry_wait_s,
    }))
    sys.exit(0)


def _enable_compile_cache():
    # Persistent compilation cache (best effort): ~10 full-model compiles on
    # a 1-core host dominate bench wall-clock; repeat runs become fast.
    from egorear_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from __graft_entry__ import _build
    from egorear_tpu.models.backbone import fold_batchnorm

    net, rig, _ = _build((256, 256))
    rng = np.random.default_rng(0)

    # bf16 inference: params fp32 -> bf16 cast; inputs bf16. The reference
    # runs fp32 (configs precision: 32); bf16 is the TPU-native choice and
    # accuracy impact is validated separately in tests.
    img0 = jnp.zeros((1, 4, 3, 256, 256), jnp.float32)
    variables_f32 = jax.jit(
        lambda: net.init(jax.random.PRNGKey(0), img0, rig)
    )()

    # Serving path: eval-mode BN folded into the conv weights (fp32 fold,
    # then bf16 cast; exactness covered by tests/test_fold_bn.py). Opt out
    # with EGOREAR_BENCH_FOLD_BN=0 for an A/B of the unfolded graph.
    fold = os.environ.get("EGOREAR_BENCH_FOLD_BN", "1") != "0"
    if fold:
        serve_net, _, _ = _build((256, 256), bn_folded=True)
        serve_vars = fold_batchnorm(variables_f32)
    else:
        serve_net, serve_vars = net, variables_f32
    variables_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        serve_vars,
    )

    # Weights are closed over as jit constants (inference serving semantics:
    # fixed weights, varying inputs) -- per-call pytree dispatch of ~500
    # param leaves cost ~1.5 ms/step on this host's single CPU core.
    def _body_bf16(im):
        preds3d, hms = serve_net.apply(variables_bf16, im, rig)
        return preds3d[-1], hms[-1]

    fwd_bf16 = jax.jit(_body_bf16)

    # The f32 path keeps params as ARGUMENTS: embedding both precision
    # variants as executable constants exhausts HBM, and dispatch overhead
    # is irrelevant for the (slower) parity-precision config.
    @jax.jit
    def fwd_f32(v, im):
        preds3d, hms = net.apply(v, im, rig)
        return preds3d[-1], hms[-1]

    # Chunked dispatch: K sub-batches per jitted call via lax.map amortizes
    # the remaining host dispatch overhead across K device steps. Each inner
    # step is a genuine batch-b forward (the b=1 chunked entry serves the
    # reference's own eval unit, README.md:186, without changing its
    # per-sample semantics -- only dispatch is pipelined).
    @jax.jit
    def fwd_bf16_x4(imgs):  # (K, b, 4, 3, 256, 256)
        return jax.lax.map(_body_bf16, imgs)

    results = {}
    best = (0.0, None)
    # The lazy deform path cut activation memory enough for batch 64+;
    # OOM-ing configs are skipped gracefully.
    for batch, dtype, chunks in [(1, jnp.bfloat16, 1),
                                 (1, jnp.bfloat16, 16),
                                 (16, jnp.bfloat16, 1),
                                 (64, jnp.bfloat16, 1),
                                 (128, jnp.bfloat16, 1),
                                 (64, jnp.bfloat16, 4),
                                 (16, jnp.float32, 1)]:
        shape = (batch, 4, 3, 256, 256)
        if chunks > 1:
            shape = (chunks,) + shape
        img = jnp.asarray(rng.normal(size=shape), dtype=dtype)
        if chunks > 1:
            f = fwd_bf16_x4
            args = (img,)
        elif dtype == jnp.bfloat16:
            f = fwd_bf16
            args = (img,)
        else:
            f = fwd_f32
            args = (variables_f32, img)
        key = f"b{batch}_{jnp.dtype(dtype).name}" + (
            f"_x{chunks}" if chunks > 1 else "")

        try:
            out = f(*args)
            jax.block_until_ready(out)
            # Timed runs.
            frames = batch * chunks
            n_iter = max(8, int(256 // frames))
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = f(*args)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            fps = frames * n_iter / dt
        except Exception as e:  # noqa: BLE001 -- typically HBM OOM
            results[key] = f"skipped: {type(e).__name__}"
            continue
        results[key] = round(fps, 2)
        if fps > best[0]:
            best = (fps, key)

    # vs_baseline compares against the documented reference-GPU estimate
    # (~250 fps eager fp32; the >=5x north-star is against per-GPU torch).
    # The measured torch-CPU number from bench_baseline.py (this host has no
    # GPU) is reported alongside for the record, not used as the ratio base.
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    torch_cpu = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            torch_cpu = json.load(f)

    # Training throughput in the gate (VERDICT r1 item 7): pose3d train-step
    # fps at the two precisions, so training regressions are visible round
    # over round. Skippable via EGOREAR_BENCH_SKIP_TRAIN=1 (compile cost).
    if not os.environ.get("EGOREAR_BENCH_SKIP_TRAIN"):
        tb = int(os.environ.get("EGOREAR_BENCH_TRAIN_BATCH", "32"))
        for prec in ("bf16-mixed", "fp32"):
            try:
                fps = bench_training(precision=prec, emit=False)
                results[f"train_b{tb}_{prec}"] = round(fps, 2)
            except Exception as e:  # noqa: BLE001
                results[f"train_b{tb}_{prec}"] = f"skipped: {type(e).__name__}"

    print(json.dumps({
        "metric": "4view_inference_fps_per_chip",
        "value": round(best[0], 2),
        "unit": "frames/s",
        "vs_baseline": round(best[0] / REF_PYTORCH_FPS_FALLBACK, 3),
        "best_config": best[1],
        "all": results,
        "baseline_fps": REF_PYTORCH_FPS_FALLBACK,
        "baseline_source": "reference single-GPU eager-fp32 estimate "
                           "(see module docstring)",
        "torch_cpu_measured": torch_cpu,
        "device": str(jax.devices()[0]),
    }))


def bench_training(precision: str = "bf16-mixed", emit: bool = True) -> float:
    """Secondary benchmark: pose3d training-step throughput (frames/s/chip).
    Run standalone with: python bench.py train [fp32].

    bf16-mixed mirrors Trainer's fixed semantics: params/activations are
    cast to bf16 for the forward, BatchNorm running stats stay fp32 master
    copies end to end, grads are accumulated/applied in fp32.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import time as _t

    from __graft_entry__ import _build
    from egorear_tpu.ops.metrics import mpjpe_loss

    _enable_compile_cache()
    net, rig, _ = _build((256, 256))
    # Default 32 = the reference's own pose3d per-device train batch
    # (configs/ego4view_syn_pose3d.yaml).
    B = int(os.environ.get("EGOREAR_BENCH_TRAIN_BATCH", "32"))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, 4, 3, 256, 256)), jnp.float32)
    gt_pose = jnp.asarray(rng.normal(size=(B, 16, 3)) * 30, jnp.float32)
    gt_hm = jnp.asarray(rng.uniform(size=(B, 4, 15, 64, 64)), jnp.float32)

    variables = jax.jit(lambda: net.init(jax.random.PRNGKey(0), img[:1], rig))()
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    opt_state = tx.init(params)
    mixed = precision != "fp32"

    def cast(t):
        if not mixed:
            return t
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
        )

    @jax.jit
    def step(params, stats, opt_state, img, gt_pose, gt_hm):
        def loss_fn(p):
            (p3d, hms), mut = net.apply(
                {"params": cast(p), "batch_stats": stats},
                cast(img), rig, train=True,
                mutable=["batch_stats"],
            )
            loss = sum(mpjpe_loss(x, gt_pose) for x in p3d) * 0.1
            loss += sum(((h - gt_hm) ** 2).mean() for h in hms) * 10.0
            return loss.astype(jnp.float32), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    params, stats, opt_state, loss = step(params, stats, opt_state, img,
                                          gt_pose, gt_hm)
    jax.block_until_ready(loss)
    n = 20
    t0 = _t.perf_counter()
    for _ in range(n):
        params, stats, opt_state, loss = step(params, stats, opt_state, img,
                                              gt_pose, gt_hm)
    jax.block_until_ready(loss)
    dt = (_t.perf_counter() - t0) / n
    if emit:
        print(json.dumps({
            "metric": "pose3d_train_step_fps_per_chip",
            "value": round(B / dt, 2),
            "unit": "frames/s",
            "ms_per_step": round(dt * 1000, 2),
            "batch": B,
            "precision": precision,
        }))
    return B / dt


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        _probe_backend()
        bench_training("fp32" if "fp32" in sys.argv[2:] else "bf16-mixed")
    else:
        main()

#!/usr/bin/env python
"""Stacked-TP correctness checker + bisection harness on the REAL
Trainer train-step graph (the authoritative stacked-sharding gate).

Compares per-leaf Adam moments after two lr=0 train steps between mp=1
(DP) and mp=2 + tp_shard_stacked (TP), with a float64 mode as the decisive
classifier: a genuine SPMD miscompilation keeps its relative deviation at
any precision, while fp32 reduction-reassociation noise collapses by ~9
orders of magnitude.

Round-4 bisection record (jax 0.9.0, 8-virtual-CPU-device mesh): the
trainer graph deviated up to 146x on deep ResNet conv nu moments (grads
~12x, float64-identical => wrong collective). Ablations: donation NO
(--skip-nodonate comparison identical), data-sharded vs replicated batch
NO (--shardbatch identical), metrics outputs NO (--ablate-metrics),
production masked optimizer NO (--ablate-opt), step wrapper NO
(--ablate-step still reproduced on one-shot task.loss grads), per-view
slice-loss YES (swapping it for a fused reduction went clean) -- V
separate reductions over ``pred[:, i]`` of the stacked refiner outputs
were the trigger; fixed in train/tasks._per_view_mse_sum. Post-fix: fp32
moment max_rel_dev 3.5e-3 on the sharded kernels themselves
(reassociation noise), float64 clean. --ablate-sliceloss now REINTRODUCES
the slice loop as a bug-repro mode.

Usage: python tools/tp_trainer_f64_check.py [--f32] [--shardbatch]
         [--skip-nodonate] [--ablate-metrics|--ablate-opt|--ablate-step|
          --ablate-sliceloss]               (CPU, forces an 8-device mesh)
Prints the worst per-leaf moment deviation for mp=2 stacked-TP vs mp=1.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
F64 = "--f32" not in sys.argv
if F64:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tests"))
from test_tensor_parallel import MODEL_CFG  # noqa: E402

from egorear_tpu.train.tasks import Pose3DTask  # noqa: E402
from egorear_tpu.train.trainer import Trainer, TrainerConfig  # noqa: E402


def cast_tree(t, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)


def fit_moments(mp, shard_stacked, batches, tag, donate=True):
    cfg = TrainerConfig(
        max_epochs=1, seed=0, save_dir=f"/tmp/tp_f64_{tag}",
        gradient_clip_val=5.0, model_parallel=mp, tp_min_dim=256,
        tp_shard_stacked=shard_stacked,
    )
    task = Pose3DTask(model_cfg=MODEL_CFG)
    if "--ablate-metrics" in sys.argv:
        # Strip the per-stage metric outputs from the jitted loss: they are
        # extra jit outputs that reuse values inside the loss sum, a
        # candidate partitioner trigger.
        real_loss = task.loss

        def loss_no_metrics(params, extra_vars, batch, train=True, rngs=None):
            total, (_m, mutated) = real_loss(params, extra_vars, batch,
                                             train=train, rngs=rngs)
            return total, ({"loss_total": total}, mutated)

        task.loss = loss_no_metrics
    if "--ablate-sliceloss" in sys.argv:
        # REVERSE ablation / bug-repro mode: reintroduce the per-view
        # Python slice loop (V separate reductions over pred[:, i]) that
        # train/tasks._per_view_mse_sum shipped with before the round-4
        # fix. Algebraically identical to the fused form, but it is the
        # isolated trigger of the stacked-TP SPMD miscompilation -- running
        # with this flag should reproduce the ~146x moment deviation.
        from egorear_tpu.train import tasks as tasks_mod

        def sliced_per_view_mse_sum(pred, gt):
            V = pred.shape[1]
            return sum(((pred[:, i] - gt[:, i]) ** 2).mean()
                       for i in range(V))

        tasks_mod._per_view_mse_sum = sliced_per_view_mse_sum
    if "--ablate-opt" in sys.argv:
        # Replace the production optimizer (masked-wd adamw + warmup/decay
        # schedule + encoder-lr labeling) with the plain chain the clean
        # standalone probe used.
        import optax

        from egorear_tpu.train import trainer as trainer_mod

        def plain_optimizer(lr, wd, warmup, decay_epochs, steps_per_epoch,
                            grad_clip_norm=None, no_decay_mask=None,
                            params=None, encoder_lr_scale=1.0):
            tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm or 5.0),
                             optax.adamw(0.0, weight_decay=0.0))
            return tx, (lambda step: 0.0)

        trainer_mod.make_optimizer_real = trainer_mod.make_optimizer
        trainer_mod.make_optimizer = plain_optimizer
    trainer = Trainer(task, cfg, lr=0.0, weight_decay=0.0,
                      lr_decay_epochs=(), warmup_iters=1, batch_size=4,
                      workers=0)
    trainer.init_state(batches[0], steps_per_epoch=len(batches))
    if not donate:
        # Re-jit the same step function without buffer donation -- donation
        # changes aliasing decisions in the compiled module, a candidate
        # trigger for the SPMD partitioner bug this script hunts.
        # (Measured: NOT the trigger -- identical 146x deviation either way.)
        trainer._train_step = jax.jit(trainer._train_step.__wrapped__)
    if "--shardbatch" in sys.argv:
        # Feed batches the way the production fit() loop does (loader
        # device_puts them with the data-axis sharding, trainer.py:351)
        # instead of raw numpy (which jit commits replicated). The
        # standalone probe with a data-sharded batch is clean, so the
        # replicated-batch graph is the suspected bug trigger.
        batches = [jax.device_put(b, trainer.batch_sharding)
                   for b in batches]
    if F64:
        # Re-place the f64 copies with the same shardings the trainer chose
        # (the rule is shape-only, so it transfers unchanged).
        state64 = cast_tree(jax.device_get(trainer.state), jnp.float64)
        trainer.state = jax.device_put(
            state64, trainer._shardings(trainer.state))
    if "--ablate-step" in sys.argv:
        # Bypass the train_step wrapper entirely: one-shot grads of the
        # trainer's OWN task.loss at the initial state, probe-style. Splits
        # "loss internals" (prepare_batch/rngs/loss form) from "step
        # plumbing" (state dict, step counter, fold_in, p+u, opt update).
        state = trainer.state

        def loss_fn(p):
            total, (_m, _mut) = trainer.task.loss(
                p, state["extra_vars"], batches[0], train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return total
        loss, g = jax.jit(jax.value_and_grad(loss_fn))(state["params"])
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        moments = [(jax.tree_util.keystr(kp), np.asarray(jax.device_get(l)))
                   for kp, l in flat]
        return float(jax.device_get(loss)), moments
    for b in batches:
        trainer.state, metrics = trainer._train_step(trainer.state, b)
    loss = float(jax.device_get(metrics["loss_total"]))
    flat = jax.tree_util.tree_flatten_with_path(trainer.state["opt_state"])[0]
    moments = [(jax.tree_util.keystr(kp), np.asarray(jax.device_get(l)))
               for kp, l in flat
               if hasattr(l, "shape") and getattr(l, "ndim", 0) > 0]
    return loss, moments


def main():
    rng = np.random.RandomState(0)
    dt = np.float64 if F64 else np.float32
    batches = [
        {
            "img": rng.randn(4, 4, 3, 64, 64).astype(dt),
            "gt_heatmap": rng.rand(4, 4, 15, 16, 16).astype(dt),
            "gt_pose": rng.randn(4, 16, 3).astype(dt),
        }
        for _ in range(2)
    ]
    loss_dp, mom_dp = fit_moments(1, False, batches, "dp")

    def compare(tag, loss_x, mom_x):
        worst = ("", 0.0)
        devs = []
        for (ka, a), (_, b) in zip(mom_dp, mom_x):
            num = np.linalg.norm(a.astype(np.float64) - b.astype(np.float64))
            den = np.linalg.norm(a.astype(np.float64))
            if den > 1e-9:
                rel = num / den
                devs.append(rel)
                if rel > worst[1]:
                    worst = (f"{ka} shape={a.shape}", rel)
        print(f"{tag}: precision={'f64' if F64 else 'f32'} "
              f"loss_rel={abs(loss_x - loss_dp) / max(abs(loss_dp), 1e-12):.2e} "
              f"moment max_rel_dev={max(devs):.3e} mean={np.mean(devs):.3e}\n"
              f"    worst={worst[0]} ({worst[1]:.3e})", flush=True)

    loss_tp, mom_tp = fit_moments(2, True, batches, "tp")
    compare("tp+donate  ", loss_tp, mom_tp)
    if "--skip-nodonate" not in sys.argv:
        loss_tn, mom_tn = fit_moments(2, True, batches, "tpn", donate=False)
        compare("tp-nodonate", loss_tn, mom_tn)


if __name__ == "__main__":
    main()

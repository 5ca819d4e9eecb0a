#!/usr/bin/env python
"""Probe of the (resolved) stacked-kernel TP backward discrepancy.

Round-2/3 finding (parallel/mesh.leaf_sharding): on an 8-virtual-CPU-device
(data=4, model=2) mesh, the FULL pose3d model's backward deviated ~14% in
gradient norm when the 3-D stacked per-view refiner kernels AND downstream
2-D kernels were both model-sharded; each family alone was exact. The
round-4 view-major layout refactor removed the trigger (results below).
This probe measures the deviation by comparing per-leaf gradients of one
loss evaluation at identical params between:

  A. fully replicated (model_parallel=1 semantics on the same mesh),
  B. 2-D kernels sharded only (the shipped default),
  C. 2-D + stacked 3-D kernels sharded (tp_shard_stacked=True).

Usage: python tools/tp_stacked_probe.py [--train] [--f64]
       (CPU, forces an 8-device mesh)
Prints one line per config: max relative per-leaf grad-norm deviation vs A.

Round-4 results (view-major layout, jax 0.9.0):
  eval mode, fp32 : 2d-only 0.0000, 2d+stacked 0.0000  (exact)
  train mode, fp32: 2d-only 0.0000, 2d+stacked max 6.7e-3 on the sharded
                    JQA heatmap_proj_0 kernel (mean 1.2e-4)
  train mode, f64 : both 0.0000 (loss_rel 1e-15)
The f64 collapse proves this probe's fp32 train-mode deviation is
reassociation noise, not an SPMD miscompilation -- a wrong collective
would keep its relative error at any precision. NOTE this probe's simple
mean-form loss does NOT trigger the second (round-4) miscompilation
pattern -- the per-view slice-loss reductions the Trainer's task.loss used
to have; that one was bisected and fixed with the companion
tools/tp_trainer_f64_check.py, which runs the REAL trainer train-step
graph and is the authoritative checker. The pre-round-4 batch-major layout
additionally had the vmap re-layout trigger (~14% deviation, ResNet leaves
off 8-11x); the view-major refactor removed it.
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
if "--f64" in sys.argv:
    # Precision-scaling diagnostic: a genuine SPMD miscompilation keeps its
    # relative deviation at any precision; fp-reassociation noise collapses
    # by ~9 orders of magnitude going fp32 -> fp64.
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from egorear_tpu.models.configs import EgoRearNetCfg  # noqa: E402
from egorear_tpu.models.pose3d import EgoRearNet  # noqa: E402
from egorear_tpu.ops.camera import CameraRig  # noqa: E402
from egorear_tpu.ops.metrics import mpjpe_loss  # noqa: E402
from egorear_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding, make_mesh, param_shardings, replicated,
)

MVF_TRANSFORMER = {
    "cross_attn_cfg": {"num_heads": 4},
    "spatial_attn_cfg": {"num_heads": 4},
    "ffn_cfg": {"feedforward_dims": 512, "num_fcs": 2, "ffn_drop": 0.0},
}
MODEL_CFG = {
    "num_views": 4, "image_size": [64, 64], "camera_model": "ego4view_syn",
    "heatmap_mvf_cfg": {
        "num_heatmap": 15, "feat_down_stride": 4, "heatmap_threshold": 0.5,
        "full_training": True,
        "encoder_cfg": {
            "resnet_cfg": {"model_name": "resnet18", "out_stride": 4,
                           "use_imagenet_pretrain": False},
            "neck_cfg": {"in_channels": [64, 128, 256, 512],
                         "out_channels": 128},
        },
        "mvf_cfg": {
            "input_dims": 128, "embed_dims": 256, "num_former_layers": 1,
            "joint_query_adaptation": True, "use_1by1_conv": True,
            "mvf_transformer_cfg": MVF_TRANSFORMER,
        },
    },
    "pose3d_cfg": {
        "num_joints": 16, "input_dims": 128, "embed_dims": 256,
        "num_former_layers": 1, "transformer_cfg": MVF_TRANSFORMER,
    },
}


def main():
    mesh = make_mesh(8, model_parallel=2)
    net = EgoRearNet(cfg=EgoRearNetCfg.from_dict(MODEL_CFG))
    rig = CameraRig.from_calib_file("ego4view_syn")

    rng = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rng.randn(4, 4, 3, 64, 64), jnp.float32),
        "gt_heatmap": jnp.asarray(rng.rand(4, 4, 15, 16, 16), jnp.float32),
        "gt_pose": jnp.asarray(rng.randn(4, 16, 3), jnp.float32),
    }
    variables = jax.jit(
        lambda: net.init(jax.random.PRNGKey(0), batch["img"], rig)
    )()
    params, stats = variables["params"], variables["batch_stats"]

    train_mode = "--train" in sys.argv
    if "--f64" in sys.argv:
        to64 = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(jnp.float64)
            if x.dtype == jnp.float32 else x, t)
        params, stats, batch = to64(params), to64(stats), to64(batch)

    def grads_for(shard_cfg):
        if shard_cfg is None:
            p_shard = jax.tree.map(
                lambda _: replicated(mesh), params,
            )
        else:
            p_shard = param_shardings(params, mesh, **shard_cfg)
        p = jax.device_put(params, p_shard)
        s = jax.device_put(stats,
                           jax.tree.map(lambda _: replicated(mesh), stats))
        b = jax.device_put(batch, batch_sharding(mesh))

        # --aux keeps the mutated batch_stats as a LIVE jit output
        # (has_aux=True), matching the Trainer's train step; without it the
        # BN-stat outputs are dead code and XLA partitions a smaller graph.
        aux_mode = "--aux" in sys.argv

        def loss_fn(p):
            if train_mode:
                (preds3d, hms), mut = net.apply(
                    {"params": p, "batch_stats": s}, b["img"], rig,
                    train=True, mutable=["batch_stats"],
                )
            else:
                preds3d, hms = net.apply(
                    {"params": p, "batch_stats": s}, b["img"], rig,
                    train=False,
                )
                mut = None
            loss = sum(mpjpe_loss(x, b["gt_pose"]) for x in preds3d) * 0.1
            loss += sum(((h - b["gt_heatmap"]) ** 2).mean() for h in hms) * 10.0
            if aux_mode:
                return loss, mut
            return loss

        if "--opt" in sys.argv:
            # Full trainer-shaped step: grads -> clip_by_global_norm ->
            # adamw(lr=0) all inside ONE jit (the Trainer's graph,
            # trainer.py train_step); returns the raw grads for the same
            # per-leaf comparison. Isolates whether the in-graph optimizer
            # changes how SPMD partitions the backward.
            import optax

            tx = optax.chain(optax.clip_by_global_norm(5.0),
                             optax.adamw(0.0, weight_decay=0.0))
            opt0 = tx.init(params)

            def opt_step(p, opt_state):
                if aux_mode:
                    (l, mut), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(p)
                else:
                    l, g = jax.value_and_grad(loss_fn)(p)
                    mut = None
                updates, new_opt = tx.update(g, opt_state, p)
                new_p = jax.tree.map(lambda a, u: a + u, p, updates)
                return l, g, new_p, new_opt, mut

            # (No donation here: device_put of already-replicated leaves can
            # alias the source buffers, so donating would delete the shared
            # host-side params between configs. Donation only enables buffer
            # reuse; it does not change the computed values.)
            loss, g, _, new_opt, _ = jax.jit(opt_step)(p, opt0)
            g = jax.device_get(g)
            loss = float(loss)
        elif aux_mode:
            (loss, mut), g = jax.jit(
                jax.value_and_grad(loss_fn, has_aux=True))(p)
            jax.block_until_ready(mut)
        else:
            loss, g = jax.jit(jax.value_and_grad(loss_fn))(p)
        n_tp = sum(
            1 for sh in jax.tree.leaves(
                p_shard, is_leaf=lambda x: hasattr(x, "spec"))
            if getattr(sh, "spec", None) is not None and len(sh.spec) > 0
        )
        return float(loss), jax.device_get(g), n_tp

    loss_a, g_a, _ = grads_for(None)
    results = {}
    for tag, cfg in [
        ("2d-only", dict(min_dim=256, shard_stacked=False)),
        ("2d+stacked", dict(min_dim=256, shard_stacked=True)),
    ]:
        loss_x, g_x, n_tp = grads_for(cfg)
        devs = []
        paths = jax.tree_util.tree_flatten_with_path(g_a)[0]
        flat_x = jax.tree.leaves(g_x)
        worst = ("", 0.0)
        for (kp, a), bx in zip(paths, flat_x):
            na = np.linalg.norm(np.asarray(a, np.float64))
            d = np.linalg.norm(np.asarray(a, np.float64)
                               - np.asarray(bx, np.float64))
            rel = d / max(na, 1e-8)
            if na > 1e-6:
                devs.append(rel)
                if rel > worst[1]:
                    worst = (jax.tree_util.keystr(kp), rel)
        results[tag] = (max(devs), float(np.mean(devs)), n_tp,
                        abs(loss_x - loss_a) / max(abs(loss_a), 1e-8), worst)
        print(f"{tag}: tp_leaves={n_tp} loss_rel={results[tag][3]:.2e} "
              f"grad max_rel_dev={results[tag][0]:.4f} "
              f"mean={results[tag][1]:.5f} worst={worst[0]} ({worst[1]:.4f})",
              flush=True)
    return results


if __name__ == "__main__":
    main()

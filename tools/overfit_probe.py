#!/usr/bin/env python
"""Fixed-batch overfit probe for the pose3d stage.

Decides between "step budget" and "pipeline bug" for the observed
predicts-the-mean MPJPE plateau (~399 mm on the i.i.d. N(mu, 25 cm)
synthetic poses): memorizing a single small batch must drive MPJPE far
below that floor if (and only if) gradients actually connect the images to
the 3-D targets. Uses the real dataset + loader + task loss; runs on the
TPU (one compile, then ~ms steps).

Usage: python tools/overfit_probe.py [--data /tmp/ego4view_syn_64lrn]
          [--image-size 64] [--batch 8] [--steps 2000] [--lr 1e-3]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/ego4view_syn_64lrn")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--full-training", action="store_true",
                    help="undetach the backbone (config default detaches it)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from egorear_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _build
    from egorear_tpu.data.datasets import get_dataset
    from egorear_tpu.ops.metrics import mpjpe_loss

    net, rig, cfg_dict = _build((args.image_size, args.image_size))
    if args.full_training:
        from egorear_tpu.models.configs import EgoRearNetCfg
        from egorear_tpu.models.pose3d import EgoRearNet

        cfg_dict = dict(cfg_dict)
        cfg_dict["heatmap_mvf_cfg"] = dict(
            cfg_dict["heatmap_mvf_cfg"], full_training=True)
        net = EgoRearNet(cfg=EgoRearNetCfg.from_dict(cfg_dict))

    ds = get_dataset("ego4view_syn_pose3d", args.data, "train",
                     image_size=args.image_size)
    samples = [ds[i] for i in range(args.batch)]
    img = jnp.asarray(
        np.stack([s["img"] for s in samples]), jnp.float32)
    gt_hm = jnp.asarray(
        np.stack([s["gt_heatmap"] for s in samples]), jnp.float32)
    gt_pose = jnp.asarray(
        np.stack([s["gt_pose"] for s in samples]), jnp.float32)
    print(f"batch img {img.shape} hm {gt_hm.shape} pose {gt_pose.shape}")

    # Predicts-the-mean floor FOR THIS BATCH (cm).
    mean_pose = gt_pose.mean(axis=0, keepdims=True)
    floor = float(jnp.linalg.norm(gt_pose - mean_pose, axis=-1).mean())
    print(f"batch mean-prediction MPJPE floor: {floor * 10:.1f} mm")

    variables = jax.jit(
        lambda: net.init(jax.random.PRNGKey(0), img[:1], rig)
    )()
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(args.lr))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            (p3d, hms), mut = net.apply(
                {"params": p, "batch_stats": stats}, img, rig,
                train=True, mutable=["batch_stats"],
            )
            l_pose = sum(mpjpe_loss(x, gt_pose) for x in p3d) * 0.1
            l_hm = sum(((h - gt_hm) ** 2).mean() for h in hms) * 10.0
            mp_final = mpjpe_loss(p3d[-1], gt_pose)
            mp_prop = mpjpe_loss(p3d[0], gt_pose)
            return l_pose + l_hm, (mut["batch_stats"], l_hm,
                                   mp_final, mp_prop)

        grads, (new_stats, l_hm, mpf, mpp) = jax.grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, new_opt,
                l_hm, mpf, mpp)

    for i in range(args.steps):
        params, stats, opt_state, l_hm, mpf, mpp = step(
            params, stats, opt_state)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i:5d}  hm_loss {float(l_hm):8.4f}  "
                  f"final_mpjpe {float(mpf) * 10:8.1f} mm  "
                  f"proposal_mpjpe {float(mpp) * 10:8.1f} mm", flush=True)


if __name__ == "__main__":
    main()

"""Split MVFex heatmap eval by per-pair joint visibility.

The occlusion curriculum (tools/run_curriculum.py --occlusion) hides each
joint's image blob from the front or back stereo PAIR while keeping its GT
heatmap — so a hidden joint is recoverable ONLY via cross-pair feature
exchange (the MVFex refiner's job; reference
pose_estimation/models/estimator/egoposeformer_heatmap_mvf_ex.py:299-435).
The aggregate val mse_pts2d averages visible and occluded joints together
and can mask the refiner's effect: the init head is directly supervised and
near-perfect on visible joints, so a refiner that recovers occluded joints
at the cost of a little argmax jitter on visible ones can LOSE in aggregate
while winning on the only joints the experiment is about.

This tool reads a stage-2 checkpoint + the generator's per-seq
``visibility.npy`` (F, 4, 16) and reports init (hms[0]) vs final (hms[-1])
argmax point error split three ways per pair:
  - visible:   joints whose blobs are drawn in this pair's images
  - occluded:  joints hidden from this pair (but visible in the other —
               sample_pair_visibility never hides both)
Runs on CPU by default so it never contends with a live TPU training run.

Usage:
  python tools/eval_occlusion_split.py \
      --ckpt  logs/curriculum_r5/s2_mvfex/.../checkpoints/epoch=149 \
      --data-root /tmp/ego4view_syn_curr_r5 --split validation
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config",
                    default="configs/ego4view_syn_heatmap_mvfex-n1_jqa.yaml")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split", default="validation")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--limit", type=int, default=0,
                    help="cap the number of frames (0 = all)")
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"],
                    help="cpu (default) never contends with a live TPU run")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import run as run_cli
    from egorear_tpu.config.loader import load_config
    from egorear_tpu.data.datasets import get_dataset
    from egorear_tpu.ops.heatmap import argmax_2d
    from egorear_tpu.train import checkpoint as ckpt_lib

    cfg = load_config(args.config, [
        "--model.data_root", args.data_root,
        "--trainer.save_dir", "/tmp/occsplit_scratch",
        # The restored checkpoint overwrites every parameter; skip the
        # ImageNet graft so the tool runs on hosts without the weights.
        "--model.model_cfg.encoder_cfg.resnet_cfg.use_imagenet_pretrain",
        "false",
    ])
    task, targs = run_cli.build_task(cfg)
    trainer = run_cli.build_trainer(cfg, task, targs)

    ds = get_dataset(targs["dataset_type"], args.data_root, args.split,
                     render_missing_heatmaps=True, cache_in_memory=False)
    n = len(ds) if not args.limit else min(args.limit, len(ds))
    print(f"{args.split} frames: {n} (of {len(ds)})", flush=True)

    probe = ds[0]
    sample = {k: np.asarray(v)[None].repeat(args.batch, 0)
              for k, v in probe.items() if isinstance(v, np.ndarray)}
    trainer.batch_size = args.batch
    trainer.init_state(sample, steps_per_epoch=1)
    state = ckpt_lib.restore(args.ckpt)
    trainer.load_state_params(state["params"], state.get("extra_vars"))
    variables = {"params": trainer.state["params"],
                 **trainer.state["extra_vars"]}

    @jax.jit
    def fwd(img):
        hms, _ = task.model.apply(variables, img, train=False)
        init, final = hms[0], hms[-1]
        pts_i, _, _ = argmax_2d(init, threshold=1.0, normalize=False)
        pts_f, _, _ = argmax_2d(final, threshold=1.0, normalize=False)
        return pts_i, pts_f

    @jax.jit
    def gt_pts_fn(gt):
        pts, _, _ = argmax_2d(gt, threshold=1.0, normalize=False)
        return pts

    vis_cache = {}

    def frame_visibility(frame_path):
        """(4, 15) bool for this frame (Head channel dropped like the GT)."""
        seq_dir = os.path.dirname(os.path.dirname(frame_path))
        if seq_dir not in vis_cache:
            p = os.path.join(seq_dir, "visibility.npy")
            vis_cache[seq_dir] = np.load(p) if os.path.exists(p) else None
        v = vis_cache[seq_dir]
        if v is None:
            return np.ones((4, 15), bool)
        fi = int(os.path.basename(frame_path).split("_")[1].split(".")[0])
        return v[fi, :, 1:]

    # Accumulate squared argmax error per (pair, visibility, stage).
    sums = {}   # (pair, vis, stage) -> [sum_sq, count]
    for key in [(p, v, s) for p in ("front", "back")
                for v in ("visible", "occluded") for s in ("init", "final")]:
        sums[key] = [0.0, 0]

    for start in range(0, n, args.batch):
        idxs = list(range(start, min(start + args.batch, n)))
        items = [ds[i] for i in idxs]
        img = np.stack([it["img"] for it in items])
        gt = np.stack([it["gt_heatmap"] for it in items])
        pad = args.batch - len(idxs)
        if pad:
            img = np.concatenate([img, img[-1:].repeat(pad, 0)])
            gt = np.concatenate([gt, gt[-1:].repeat(pad, 0)])
        pts_i, pts_f = fwd(jnp.asarray(img))
        gtp = gt_pts_fn(jnp.asarray(gt))
        pts_i, pts_f, gtp = (np.asarray(pts_i)[: len(idxs)],
                             np.asarray(pts_f)[: len(idxs)],
                             np.asarray(gtp)[: len(idxs)])
        err_i = ((pts_i - gtp) ** 2).mean(-1)  # (B, V, J) mean over x,y
        err_f = ((pts_f - gtp) ** 2).mean(-1)
        for bi, it in enumerate(items):
            vis = frame_visibility(it["frame_path"])  # (4, 15)
            for pair, views in (("front", (0, 1)), ("back", (2, 3))):
                pv = vis[views[0]]  # pair-level (views in a pair share it)
                for stage, err in (("init", err_i), ("final", err_f)):
                    for tag, mask in (("visible", pv), ("occluded", ~pv)):
                        if mask.any():
                            e = err[bi, list(views)][:, mask]
                            sums[(pair, tag, stage)][0] += float(e.sum())
                            sums[(pair, tag, stage)][1] += int(e.size)
        done = min(start + args.batch, n)
        print(f"  {done}/{n}", flush=True)

    report = {"ckpt": args.ckpt, "split": args.split, "frames": n}
    for pair in ("front", "back"):
        for tag in ("visible", "occluded"):
            for stage in ("init", "final"):
                s, c = sums[(pair, tag, stage)]
                report[f"{pair}_{tag}_{stage}_mse_pts2d"] = (
                    round(s / c, 3) if c else None)
            i = report[f"{pair}_{tag}_init_mse_pts2d"]
            f = report[f"{pair}_{tag}_final_mse_pts2d"]
            if i and f:
                report[f"{pair}_{tag}_final_over_init"] = round(f / i, 3)
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()

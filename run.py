#!/usr/bin/env python
"""EgoRear-TPU experiment runner.

CLI-compatible with the reference entry point (run.py:11-25 + LightningCLI):

    python run.py fit     --config configs/ego4view_syn_heatmap_stereo_front.yaml
    python run.py test    --config configs/ego4view_syn_pose3d.yaml \
                          --ckpt_path logs/.../epoch=11 --model.batch_size 1
    python run.py predict --config ... --ckpt_path ...

Accepts the reference's YAML configs verbatim (class_path/init_args + trainer
blocks) plus dot-overrides. ``--ckpt_path`` takes either a native checkpoint
(orbax dir / .pkl) or a reference torch ``.ckpt`` (converted on the fly).
torch.compile flags in configs are ignored -- everything is jax.jit'ed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax

# This machine's sitecustomize pins JAX_PLATFORMS; EGOREAR_PLATFORM gives
# users an override that actually sticks (e.g. EGOREAR_PLATFORM=cpu).
if os.environ.get("EGOREAR_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EGOREAR_PLATFORM"])

# Multi-host TPU pods: set EGOREAR_DISTRIBUTED=1 (plus the usual coordinator
# env) to initialize jax.distributed before any backend use. Batches stay
# global; the mesh spans all processes' devices.
if os.environ.get("EGOREAR_DISTRIBUTED"):
    jax.distributed.initialize()

# Persistent compilation cache: full-model compiles are minutes; cache them
# across processes (fit/test subcommands, repeated experiments). Default is
# <repo>/.jax_cache; override with EGOREAR_COMPILE_CACHE=<dir> or disable
# with EGOREAR_COMPILE_CACHE=0.
from egorear_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np

from egorear_tpu.config.loader import load_config
from egorear_tpu.data.datasets import get_dataset
from egorear_tpu.train import checkpoint as ckpt_lib
from egorear_tpu.train.tasks import TASKS
from egorear_tpu.train.trainer import Trainer
from egorear_tpu.utils.logging import get_logger

logger = get_logger("run")

# Stage-pretrained init_args key -> (sub-network graft path, sub-task name).
PRETRAINED_GRAFTS = {
    "network_pretrained": ("", None),  # whole network; task-dependent name
    "heatmap_estimator_pretrained_stereo_front": (
        "heatmap_estimator_stereo_front", "heatmap"),
    "heatmap_estimator_pretrained_stereo_back": (
        "heatmap_estimator_stereo_back", "heatmap"),
    "heatmap_estimator_mvf_pretrained": ("heatmap_estimator", "heatmap_mvf_ex"),
}


def build_task(cfg):
    args = dict(cfg.init_args)
    if cfg.task_name == "pose_3d_mvf_ex" and args.get("test_on_rw"):
        # Reference rewrites these in the ctor (pose_3d_mvf_ex.py:62-66).
        args.setdefault("dataset_type", "ego4view_rw_pose3d")
        args["model_cfg"]["pose3d_cfg"]["camera_model"] = "ego4view_rw"
        args["model_cfg"]["camera_model"] = "ego4view_rw"
        args["dataset_type"] = "ego4view_rw_pose3d"
    task = TASKS[cfg.task_name](
        model_cfg=args.get("model_cfg", {}),
        w_heatmap=args.get("w_heatmap", 10.0),
        w_mpjpe=args.get("w_mpjpe", 0.1),
        dataset_type=args.get("dataset_type", ""),
        camera_calib_path=args.get("camera_calib_path"),
    )
    return task, args


def build_trainer(cfg, task, args):
    return Trainer(
        task,
        cfg.trainer,
        lr=args.get("lr", 1e-3),
        weight_decay=args.get("weight_decay", 5e-4),
        lr_decay_epochs=args.get("lr_decay_epochs", (8, 10)),
        warmup_iters=args.get("warmup_iters", 500),
        batch_size=args.get("batch_size", 32),
        workers=args.get("workers", 8),
        no_decay_mask=(cfg.task_name == "pose_3d_mvf_ex"
                       and cfg.trainer.encoder_lr_scale == 1.0),
    )


def _apply_encoder_lr(cfg, args):
    # Reference: encoder_lr_scale != 1.0 switches to the encoder param-group
    # optimizer (pose_3d_mvf_ex.py:236-246). The knob lives in the model
    # init_args (the reference's location); --trainer.encoder_lr_scale is
    # this framework's extra CLI address. Precedence, most- to
    # least-explicit (the shipped YAMLs all carry a literal 1.0, so a YAML
    # 1.0 must NOT clobber a trainer-level setting, but a user typing
    # --model.encoder_lr_scale 1.0 on the CLI must be able to reset one):
    #   1. CLI --model.encoder_lr_scale  (any value, incl. 1.0)
    #   2. YAML model-level value != 1.0
    #   3. trainer-level value (YAML or CLI)
    if "encoder_lr_scale" not in args:
        return
    model_scale = float(args["encoder_lr_scale"])
    from_cli = "model.init_args.encoder_lr_scale" in cfg.cli_keys
    if from_cli or model_scale != 1.0 or cfg.trainer.encoder_lr_scale == 1.0:
        cfg.trainer.encoder_lr_scale = model_scale


def _datasets(args, split_pair):
    dtype = args["dataset_type"]
    root = args["data_root"]
    kwargs = dict(args.get("dataset_kwargs", {}) or {})
    kwargs.setdefault(
        "render_missing_heatmaps", args.get("render_missing_heatmaps", False)
    )
    return [get_dataset(dtype, root, s, **kwargs) for s in split_pair]


def apply_pretrained(trainer, task, cfg, args, sample_batch):
    """Graft pretrained sub-networks (the reference's checkpoint surgery)."""
    import jax

    keys = [k for k in PRETRAINED_GRAFTS if args.get(k)]
    if not keys:
        return
    if trainer.state is None:
        raise RuntimeError("init state before grafting")
    params = trainer.state["params"]
    extra = dict(trainer.state["extra_vars"])
    stats = extra.get("batch_stats", {})
    for key in keys:
        path, sub_task = PRETRAINED_GRAFTS[key]
        sub_task = sub_task or cfg.task_name
        ckpt_path = args[key]
        target_params = params
        target_stats = stats
        for p in [p for p in path.split("/") if p]:
            target_params = target_params[p]
            target_stats = target_stats.get(p, {}) if isinstance(target_stats, dict) else {}
        target_vars = {"params": target_params}
        if target_stats:
            target_vars["batch_stats"] = target_stats
        loaded = ckpt_lib.load_pretrained(ckpt_path, target_vars, sub_task)
        if path:
            params = ckpt_lib.graft(params, path, loaded["params"])
            if "batch_stats" in loaded and stats:
                stats = ckpt_lib.graft(stats, path, loaded["batch_stats"])
        else:
            params = loaded["params"]
            stats = loaded.get("batch_stats", stats)
        logger.info(f"grafted {key} from {ckpt_path} into '{path or '<root>'}'")
    extra["batch_stats"] = stats
    trainer.load_state_params(params, extra)


def load_eval_ckpt(trainer, cfg, ckpt_path):
    import jax

    if ckpt_path.endswith(".ckpt"):
        from egorear_tpu.train.torch_convert import convert_lightning_ckpt

        target = {"params": trainer.state["params"],
                  **trainer.state["extra_vars"]}
        loaded = convert_lightning_ckpt(ckpt_path, target, cfg.task_name)
        extra = dict(trainer.state["extra_vars"])
        if "batch_stats" in loaded:
            extra["batch_stats"] = loaded["batch_stats"]
        trainer.load_state_params(loaded["params"], extra)
    else:
        state = ckpt_lib.restore(ckpt_path)
        trainer.load_state_params(state["params"], state.get("extra_vars"))
    logger.info(f"loaded eval checkpoint {ckpt_path}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("subcommand", choices=["fit", "test", "predict", "validate"])
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt_path", default=None)
    args_ns, overrides = parser.parse_known_args(argv)

    cfg = load_config(args_ns.config, overrides)
    np.random.seed(cfg.seed)
    task, args = build_task(cfg)
    _apply_encoder_lr(cfg, args)
    trainer = build_trainer(cfg, task, args)

    if args_ns.subcommand == "fit":
        train_ds, val_ds = _datasets(args, ("train", "validation"))
        logger.info(f"train data = {len(train_ds)}; val data = {len(val_ds)}")
        loader_probe = train_ds[0]
        sample = {k: np.asarray(v)[None].repeat(trainer.batch_size, 0)
                  for k, v in loader_probe.items() if isinstance(v, np.ndarray)}
        steps = max(1, len(train_ds) // trainer.batch_size)
        trainer.init_state(sample, steps)
        apply_pretrained(trainer, task, cfg, args, sample)
        if args_ns.ckpt_path:
            trainer.fit(train_ds, val_ds, resume_dir=args_ns.ckpt_path)
        else:
            trainer.fit(train_ds, val_ds)
    else:
        split = "test" if args_ns.subcommand in ("test", "predict") else "validation"
        (ds,) = _datasets(args, (split,))
        logger.info(f"{split} data = {len(ds)}")
        probe = ds[0]
        sample = {k: np.asarray(v)[None].repeat(trainer.batch_size, 0)
                  for k, v in probe.items() if isinstance(v, np.ndarray)}
        trainer.init_state(sample, steps_per_epoch=1)
        if args_ns.ckpt_path:
            load_eval_ckpt(trainer, cfg, args_ns.ckpt_path)
        if args_ns.subcommand == "predict":
            out_dir = os.path.join(cfg.trainer.save_dir, "predictions")
            path = trainer.predict(
                ds, out_dir, save_obj=bool(args.get("save_result"))
            )
            print(json.dumps({"predictions": path}))
            return path
        mode = "test" if args_ns.subcommand != "validate" else "val"
        metrics = trainer.evaluate(ds, mode=mode)
        print(json.dumps({k: round(float(v), 6) for k, v in metrics.items()},
                         indent=1))
        return metrics


if __name__ == "__main__":
    main()

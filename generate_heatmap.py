#!/usr/bin/env python
"""Offline GT-heatmap precompute, CLI-compatible with the reference tool
(/root/reference/generate_heatmap.py:82-141):

    python generate_heatmap.py --data_dir_path <root> --dataset_type {rw,syn}

For every frame JSON it renders 16-joint Gaussian target heatmaps (64x64,
sigma=1, from 872x872-px 2D joints) for all four cameras and saves
``fisheye_hm/<camera>/<frame>.npy``.

The rasterizer is the vectorized jnp renderer
(:func:`egorear_tpu.ops.heatmap.render_gaussian_targets`), batched over all
four cameras of a frame at once -- the same kernel the on-device input
pipeline uses, so offline and fused-on-device targets are bit-identical.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

# Same platform override as run.py: this machine's sitecustomize pins
# JAX_PLATFORMS, so EGOREAR_PLATFORM=cpu is the override that sticks (the
# renderer is tiny -- CPU is fine when no TPU is reachable).
if os.environ.get("EGOREAR_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["EGOREAR_PLATFORM"])

from egorear_tpu.data.datasets import CAMERA_NAMES, JOINT_NAMES
from egorear_tpu.ops.heatmap import render_gaussian_targets
from egorear_tpu.utils.logging import get_logger

logger = get_logger("generate_heatmap")


def process_frame(json_path: str, json_dir_name: str):
    with open(json_path) as f:
        data = json.load(f)
    joints = np.array(
        [
            [data["joints"][j][f"{cam}_pts2d"] for j in JOINT_NAMES]
            for cam in CAMERA_NAMES
        ],
        np.float32,
    )  # (4, 16, 2)
    targets, _ = render_gaussian_targets(
        joints, image_size=872, heatmap_size=64, sigma=1.0
    )
    targets = np.asarray(targets, np.float32)  # (4, 16, 64, 64)
    for cam, hm in zip(CAMERA_NAMES, targets):
        out = os.path.join(
            os.path.dirname(json_path).replace(json_dir_name, "fisheye_hm"),
            cam,
            os.path.basename(json_path).replace(".json", ".npy"),
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.save(out, hm)


def main():
    parser = argparse.ArgumentParser(description="===")
    parser.add_argument("--data_dir_path", type=str, required=True)
    parser.add_argument("--dataset_type", type=str, choices=["rw", "syn"],
                        default="rw")
    args = parser.parse_args()

    if args.dataset_type == "rw":
        seq_dirs = sorted(glob.glob(os.path.join(args.data_dir_path, "2024*/S*/seq*")))
        json_dir_name = "json_smplx"
    else:
        seq_dirs = sorted(glob.glob(os.path.join(args.data_dir_path, "rp*/*")))
        json_dir_name = "json_smplx_gendered"

    logger.info(f"{len(seq_dirs)} sequences")
    for seq in seq_dirs:
        frames = sorted(glob.glob(os.path.join(seq, json_dir_name, "*.json")))
        logger.info(f"{seq}: {len(frames)} frames")
        for fp in frames:
            process_frame(fp, json_dir_name)
    logger.info("done")


if __name__ == "__main__":
    main()

"""Ego4View dataset indexers (host side).

Path-grammar contract (reference /root/reference/pose_estimation/datasets/):
  * syn layout:  <root>/<line from split.txt>/<seq>/json_smplx_gendered/*.json
    with images at fisheye_rgb/<camera>/<frame>.jpg and GT heatmaps at
    fisheye_hm/<camera>/<frame>.npy (ego4view_syn_pose3d.py:65-94, 107-182).
  * rw layout:   <root>/<line>/json_smplx/*.json, images .png, per-sequence
    metadata ``<seqdir>_metadata.json`` holding device->camera 4x4 transforms
    (ego4view_rw_pose3d.py:77-87, 104-107, coord_trans_mat rows).
  * transforms: PIL BICUBIC resize 872 -> 256, ToTensor + ImageNet normalize
    (ego4view_syn_heatmap.py:35-38, 104).
  * GT heatmaps: 16-joint NPY sliced ``[1:]`` to drop Head -> 15 channels
    (ego4view_syn_heatmap.py:109); 3D GT is the 16-joint ``device_pts3d`` in
    centimeters (ego4view_syn_pose3d.py:100-104).

Samples are plain numpy dicts; batching/prefetch/device transfer live in
:mod:`egorear_tpu.data.loader`. If the precomputed NPY heatmap is missing the
pose3d/heatmap datasets can render targets on the fly from the frame JSON's
2D joints (same contract as generate_heatmap.py) -- pass
``render_missing_heatmaps=True``.

Reference quirk, preserved behind a flag: the syn single-view heatmap dataset
reads only the FIRST line of the split file (ego4view_syn_heatmap.py:65,
``lines[0:1]``) while every other dataset reads all lines. Default matches
the reference; pass ``all_split_lines=True`` to fix.
"""

from __future__ import annotations

import glob
import json
import os
import random
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

CAMERA_NAMES = (
    "camera_front_left",
    "camera_front_right",
    "camera_back_left",
    "camera_back_right",
)

JOINT_NAMES = (
    "Head", "Neck", "LeftArm", "RightArm", "LeftForeArm", "RightForeArm",
    "LeftHand", "RightHand", "LeftUpLeg", "RightUpLeg", "LeftLeg", "RightLeg",
    "LeftFoot", "RightFoot", "LeftToeBase", "RightToeBase",
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _cameras_for(camera_pos: str) -> Sequence[str]:
    if camera_pos == "front":
        return CAMERA_NAMES[:2]
    if camera_pos == "back":
        return CAMERA_NAMES[2:]
    return CAMERA_NAMES


def load_image(path: str, image_size: int = 256) -> np.ndarray:
    """Decode + BICUBIC resize + ImageNet-normalize -> (3, S, S) float32."""
    img = Image.open(path).convert("RGB")
    img = img.resize([image_size, image_size], Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr.transpose(2, 0, 1)


def load_image_u8(path: str, image_size: int = 256) -> np.ndarray:
    """Decode + BICUBIC resize only -> (S, S, 3) uint8 (for the on-device
    normalize path)."""
    img = Image.open(path).convert("RGB")
    img = img.resize([image_size, image_size], Image.BICUBIC)
    return np.asarray(img, np.uint8)


def _render_heatmap_from_json(json_data: dict, camera: str) -> np.ndarray:
    from egorear_tpu.ops.heatmap import render_gaussian_targets_np

    joints = np.array(
        [json_data["joints"][j][f"{camera}_pts2d"] for j in JOINT_NAMES],
        np.float32,
    )
    target, _ = render_gaussian_targets_np(joints)
    return target.astype(np.float32)


class _Ego4ViewBase:
    """Shared frame indexing + per-frame asset loading."""

    def __init__(
        self,
        data_root: str,
        info_json: str,
        variant: str,  # "syn" | "rw"
        camera_pos: str = "all",
        image_size: int = 256,
        pre_shuffle: bool = False,
        render_missing_heatmaps: bool = False,
        use_native_loader: bool = True,
        device_preprocess: bool = False,
        cache_in_memory: bool = False,
        **unused_kwargs,
    ):
        # cache_in_memory keeps every decoded sample dict resident (RAM cost
        # ~= len(dataset) x sample size, e.g. ~4 GB for 1k frames at 256px):
        # on hosts with few cores the JPEG decode + resize dominates the
        # train step (~2 s/step at batch 32 on 1 core, 10x the TPU compute),
        # and epochs past the first become loader-bound for no reason.
        self._cache: Optional[dict] = {} if cache_in_memory else None
        self.data_root = data_root
        self.variant = variant
        self.camera_pos = camera_pos or "all"
        self.cameras = _cameras_for(self.camera_pos)
        self.image_size = image_size
        self.render_missing_heatmaps = render_missing_heatmaps
        self.device_preprocess = device_preprocess
        self.json_dir = "json_smplx_gendered" if variant == "syn" else "json_smplx"
        self.img_ext = ".jpg" if variant == "syn" else ".png"
        self.frames = self._collect(info_json, pre_shuffle)
        # C++ decode+resize+normalize pipeline (<=1 LSB vs PIL); falls back
        # to PIL when the shared object is unavailable.
        self._native = None
        if use_native_loader:
            try:
                from egorear_tpu import native

                if native.available():
                    self._native = native
            except Exception:
                self._native = None

    def _load_images(self, paths) -> np.ndarray:
        """-> (len(paths), 3, S, S) normalized float32."""
        if self._native is not None:
            return self._native.load_f32_batch(list(paths), self.image_size)
        return np.stack([load_image(p, self.image_size) for p in paths])

    def _load_images_u8(self, paths) -> np.ndarray:
        """-> (len(paths), S, S, 3) uint8 (on-device preprocessing path)."""
        if self._native is not None:
            return self._native.load_u8_batch(list(paths), self.image_size)
        return np.stack([load_image_u8(p, self.image_size) for p in paths])

    def _load_views_device(self, frame: str):
        """On-device preprocessing sample: uint8 views + raw 2D joints.

        Normalization and Gaussian-target rendering then run fused on the
        TPU (egorear_tpu.data.preprocess / tasks.prepare_batch) -- the
        BASELINE.json north-star path. Host->device traffic drops ~4x
        (uint8 HWC instead of normalized f32).
        """
        imgs = self._load_images_u8(
            [self._img_path(frame, c) for c in self.cameras]
        )  # (V, S, S, 3) uint8
        with open(frame) as f:
            data = json.load(f)
        joints_2d = np.array(
            [
                [data["joints"][j][f"{c}_pts2d"] for j in JOINT_NAMES]
                for c in self.cameras
            ],
            np.float32,
        )  # (V, 16, 2)
        return imgs, joints_2d, data

    def _collect(self, info_json: str, pre_shuffle: bool) -> List[str]:
        lines = self._split_lines(info_json)
        frames: List[str] = []
        for line in lines:
            line = line.strip()
            if not line:
                continue
            if self.variant == "syn":
                for seq in sorted(glob.glob(os.path.join(self.data_root, line, "*"))):
                    frames.extend(
                        sorted(glob.glob(os.path.join(seq, self.json_dir, "*.json")))
                    )
            else:
                frames.extend(
                    sorted(
                        glob.glob(
                            os.path.join(self.data_root, line, self.json_dir, "*.json")
                        )
                    )
                )
        if pre_shuffle:
            random.shuffle(frames)
        return frames

    def _split_lines(self, info_json: str) -> List[str]:
        with open(info_json) as f:
            return f.readlines()

    # -- per-frame assets --------------------------------------------------

    def _img_path(self, frame: str, camera: str) -> str:
        return frame.replace(self.json_dir, f"fisheye_rgb/{camera}").replace(
            ".json", self.img_ext
        )

    def _hm_path(self, frame: str, camera: str) -> str:
        return frame.replace(self.json_dir, f"fisheye_hm/{camera}").replace(
            ".json", ".npy"
        )

    def _load_views(self, frame: str):
        imgs = self._load_images(
            [self._img_path(frame, c) for c in self.cameras]
        )  # (V, 3, S, S)
        hms = []
        json_cache = None
        for c in self.cameras:
            p = self._hm_path(frame, c)
            if os.path.exists(p):
                hm = np.load(p)
            elif self.render_missing_heatmaps:
                if json_cache is None:
                    with open(frame) as f:
                        json_cache = json.load(f)
                hm = _render_heatmap_from_json(json_cache, c)
            else:
                raise FileNotFoundError(
                    f"{p} (run generate_heatmap.py or pass render_missing_heatmaps=True)"
                )
            hms.append(hm[1:])  # drop Head -> 15 channels
        return imgs, np.stack(hms).astype(np.float32)

    def _load_pose(self, frame: str) -> np.ndarray:
        with open(frame) as f:
            data = json.load(f)
        return np.array(
            [data["joints"][j]["device_pts3d"] for j in JOINT_NAMES], np.float32
        )

    def _load_coord_trans(self, frame: str) -> np.ndarray:
        # Reference: frame_path.split("-")[0] + "_metadata.json"
        # (ego4view_rw_pose3d.py:104-107) -- i.e. the sequence dir name up to
        # its first hyphen. Applied to the basename only, so hyphens in
        # parent dirs don't break it; the unsuffixed location is tried first.
        seq_dir = os.path.dirname(os.path.dirname(frame))
        candidates = [
            seq_dir + "_metadata.json",
            os.path.join(
                os.path.dirname(seq_dir),
                os.path.basename(seq_dir).split("-")[0] + "_metadata.json",
            ),
        ]
        meta_path = next((p for p in candidates if os.path.exists(p)), candidates[1])
        with open(meta_path) as f:
            meta = json.load(f)["coord_transformation_matrix"]
        return np.stack(
            [np.asarray(meta[f"device_to_{c}"], np.float32) for c in self.cameras]
        )

    def __len__(self):
        return len(self.frames)


    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        if self._cache is not None:
            hit = self._cache.get(idx)
            if hit is not None:
                # Shallow copy so callers can't rebind keys of the cached
                # dict; the arrays themselves are frozen at fill time.
                return dict(hit)
        out = self._get_item(idx)
        if self._cache is not None:
            # Freeze cached arrays: an in-place consumer mutation (e.g. an
            # augmentation doing ``s["img"] -= mean``) would otherwise poison
            # every later epoch silently. Writers now get a loud ValueError.
            for v in out.values():
                if isinstance(v, np.ndarray):
                    v.setflags(write=False)
            self._cache[idx] = out
            return dict(out)
        return out


class HeatmapDataset(_Ego4ViewBase):
    """Single-view samples: one (frame, camera) pair per item
    (ego4view_{syn,rw}_heatmap.py)."""

    def __init__(self, *args, all_split_lines: Optional[bool] = None, **kwargs):
        variant = kwargs.get("variant") or args[2]
        if all_split_lines is None:
            all_split_lines = variant != "syn"  # reference quirk (syn :65)
        self._all_split_lines = all_split_lines
        super().__init__(*args, **kwargs)
        self.items = [
            (f, c) for f in self.frames for c in self.cameras
        ]

    def _split_lines(self, info_json):
        lines = super()._split_lines(info_json)
        return lines if self._all_split_lines else lines[0:1]

    def __len__(self):
        return len(self.items)

    def _get_item(self, idx) -> Dict[str, np.ndarray]:
        frame, camera = self.items[idx]
        img = self._load_images([self._img_path(frame, camera)])[0]
        p = self._hm_path(frame, camera)
        if os.path.exists(p):
            hm = np.load(p)
        elif self.render_missing_heatmaps:
            with open(frame) as f:
                hm = _render_heatmap_from_json(json.load(f), camera)
        else:
            raise FileNotFoundError(p)
        return {
            "img": img[None],  # (1, 3, S, S): V axis of size 1
            "gt_heatmap": hm[None, 1:].astype(np.float32),
            "frame_path": f"{frame}:{camera}",
        }


class HeatmapMVFDataset(_Ego4ViewBase):
    """Multi-view samples: stacked V images + GT heatmaps
    (ego4view_{syn,rw}_heatmap_mvf.py)."""

    def _get_item(self, idx) -> Dict[str, np.ndarray]:
        frame = self.frames[idx]
        if self.device_preprocess:
            img_u8, joints_2d, _ = self._load_views_device(frame)
            return {"img_u8": img_u8, "joints_2d": joints_2d,
                    "frame_path": frame}
        img, hm = self._load_views(frame)
        return {"img": img, "gt_heatmap": hm, "frame_path": frame}


class Pose3DDataset(_Ego4ViewBase):
    """Multi-view images + GT heatmaps + 16x3 device-frame pose (cm); RW adds
    per-view device->camera transforms (ego4view_{syn,rw}_pose3d.py)."""

    def _get_item(self, idx) -> Dict[str, np.ndarray]:
        frame = self.frames[idx]
        if self.device_preprocess:
            img_u8, joints_2d, data = self._load_views_device(frame)
            out = {
                "img_u8": img_u8,
                "joints_2d": joints_2d,
                "gt_pose": np.array(
                    [data["joints"][j]["device_pts3d"] for j in JOINT_NAMES],
                    np.float32,
                ),
                "frame_path": frame,
            }
            if self.variant == "rw":
                out["coord_trans_mat"] = self._load_coord_trans(frame)
            return out
        img, hm = self._load_views(frame)
        out = {
            "img": img,
            "gt_heatmap": hm,
            "gt_pose": self._load_pose(frame),
            "frame_path": frame,
        }
        if self.variant == "rw":
            out["coord_trans_mat"] = self._load_coord_trans(frame)
        return out


_DATASETS = {
    "ego4view_syn_heatmap": (HeatmapDataset, "syn"),
    "ego4view_syn_heatmap_mvf": (HeatmapMVFDataset, "syn"),
    "ego4view_syn_pose3d": (Pose3DDataset, "syn"),
    "ego4view_rw_heatmap": (HeatmapDataset, "rw"),
    "ego4view_rw_heatmap_mvf": (HeatmapMVFDataset, "rw"),
    "ego4view_rw_pose3d": (Pose3DDataset, "rw"),
}


def get_dataset(dataset_type: str, root: str, split: str, **kwargs):
    """Factory matching the reference (datasets/dataset.py:6-54)."""
    assert split in ("train", "test", "validation")
    if dataset_type not in _DATASETS:
        raise NotImplementedError(dataset_type)
    cls, variant = _DATASETS[dataset_type]
    return cls(
        root,
        os.path.join(root, f"{split}.txt"),
        variant,
        **kwargs,
    )

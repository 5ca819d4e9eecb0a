"""16-joint skeleton model: kinematic tree, bone-length renormalization,
temporal smoothing, heatmap decode, and mesh/viz export.

Behavioral contract (reference /root/reference/pose_estimation/utils/
skeleton.py): the Ego4View 16-joint tree (parents :34, bone list :28-32),
joints -> sphere/cylinder mesh (:94-100, 180-217 -- the reference uses
open3d, unavailable here, so meshes are generated directly and written as
Wavefront OBJ), per-bone length renormalization against a template
(:163-174), Gaussian temporal smoothing (:219-227) and numpy heatmap argmax
decode (:229-253).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

JOINT_NAMES = (
    "Head", "Neck", "LeftArm", "RightArm", "LeftForeArm", "RightForeArm",
    "LeftHand", "RightHand", "LeftUpLeg", "RightUpLeg", "LeftLeg", "RightLeg",
    "LeftFoot", "RightFoot", "LeftToeBase", "RightToeBase",
)

# parent[i] = index of joint i's parent (-1 = root). Neck is the root; arms
# hang off the neck, legs off their respective up-legs.
PARENTS = (1, -1, 1, 1, 2, 3, 4, 5, 1, 1, 8, 9, 10, 11, 12, 13)

BONES = tuple(
    (p, i) for i, p in enumerate(PARENTS) if p >= 0
)


def bone_lengths(joints: np.ndarray) -> np.ndarray:
    """(..., 16, 3) -> (..., num_bones) per-bone lengths."""
    a = joints[..., [b[0] for b in BONES], :]
    b = joints[..., [b[1] for b in BONES], :]
    return np.linalg.norm(b - a, axis=-1)


def renormalize_bone_lengths(
    joints: np.ndarray, template: np.ndarray
) -> np.ndarray:
    """Rescale each bone to the template's length, walking the tree from the
    root (reference skeleton.py:163-174)."""
    out = np.array(joints, dtype=np.float64, copy=True)
    t_len = bone_lengths(template)
    order = sorted(range(len(BONES)), key=lambda i: BONES[i][1])
    for bi in order:
        p, c = BONES[bi]
        vec = out[..., c, :] - out[..., p, :]
        norm = np.linalg.norm(vec, axis=-1, keepdims=True)
        norm = np.maximum(norm, 1e-9)
        delta = vec / norm * t_len[..., bi, None] - vec
        # Shift the child and all its descendants.
        stack = [c]
        while stack:
            j = stack.pop()
            out[..., j, :] += delta
            stack.extend(i for i, pp in enumerate(PARENTS) if pp == j)
    return out


def smooth_temporal(
    seq: np.ndarray, sigma: float = 1.0, radius: Optional[int] = None
) -> np.ndarray:
    """Gaussian smoothing along the time axis of (T, J, 3) sequences
    (reference skeleton.py:219-227)."""
    T = seq.shape[0]
    radius = radius if radius is not None else max(1, int(3 * sigma))
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-(xs**2) / (2 * sigma**2))
    k /= k.sum()
    pad = np.concatenate(
        [seq[:1].repeat(radius, 0), seq, seq[-1:].repeat(radius, 0)], axis=0
    )
    out = np.zeros_like(seq, dtype=np.float64)
    for i, w in enumerate(k):
        out += w * pad[i : i + T]
    return out.astype(seq.dtype)


def decode_heatmaps_np(heatmaps: np.ndarray, threshold: float = 0.0):
    """(J, H, W) -> (J, 2) argmax decode + validity (skeleton.py:229-253)."""
    J, H, W = heatmaps.shape
    flat = heatmaps.reshape(J, -1)
    idx = flat.argmax(axis=1)
    maxv = flat.max(axis=1)
    pts = np.stack([idx % W, idx // W], axis=-1).astype(np.float32)
    return pts, maxv, maxv >= threshold


# ---------------------------------------------------------------------------
# mesh generation (OBJ, no open3d dependency)
# ---------------------------------------------------------------------------


def _uv_sphere(center, radius, n=8):
    verts, faces = [], []
    for i in range(n + 1):
        theta = np.pi * i / n
        for j in range(2 * n):
            phi = 2 * np.pi * j / (2 * n)
            verts.append(center + radius * np.array([
                np.sin(theta) * np.cos(phi),
                np.sin(theta) * np.sin(phi),
                np.cos(theta),
            ]))
    cols = 2 * n
    for i in range(n):
        for j in range(cols):
            a = i * cols + j
            b = i * cols + (j + 1) % cols
            c = (i + 1) * cols + j
            d = (i + 1) * cols + (j + 1) % cols
            faces.append((a, c, b))
            faces.append((b, c, d))
    return np.asarray(verts), np.asarray(faces)


def _cylinder(p0, p1, radius, n=8):
    axis = p1 - p0
    h = np.linalg.norm(axis)
    if h < 1e-9:
        return np.zeros((0, 3)), np.zeros((0, 3), int)
    z = axis / h
    ref = np.array([1.0, 0, 0]) if abs(z[0]) < 0.9 else np.array([0, 1.0, 0])
    x = np.cross(z, ref)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    verts, faces = [], []
    for t, base in ((0.0, p0), (1.0, p1)):
        for j in range(n):
            phi = 2 * np.pi * j / n
            verts.append(base + radius * (np.cos(phi) * x + np.sin(phi) * y))
    for j in range(n):
        a, b = j, (j + 1) % n
        c, d = n + j, n + (j + 1) % n
        faces.append((a, c, b))
        faces.append((b, c, d))
    return np.asarray(verts), np.asarray(faces, int)


def skeleton_mesh(
    joints: np.ndarray,
    joint_radius: float = 1.5,
    bone_radius: float = 0.8,
) -> Tuple[np.ndarray, np.ndarray]:
    """(16, 3) joints -> (verts, faces) sphere-and-cylinder skeleton mesh
    (reference skeleton.py:94-100, 180-217; units follow the input)."""
    all_v, all_f = [], []
    offset = 0
    for j in joints:
        v, f = _uv_sphere(np.asarray(j, float), joint_radius)
        all_v.append(v)
        all_f.append(f + offset)
        offset += len(v)
    for p, c in BONES:
        v, f = _cylinder(np.asarray(joints[p], float),
                         np.asarray(joints[c], float), bone_radius)
        if len(v):
            all_v.append(v)
            all_f.append(f + offset)
            offset += len(v)
    return np.concatenate(all_v), np.concatenate(all_f)


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")


def export_pose_obj(path: str, joints: np.ndarray, **kw):
    verts, faces = skeleton_mesh(joints, **kw)
    save_obj(path, verts, faces)
    return path

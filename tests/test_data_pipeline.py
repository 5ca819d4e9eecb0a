"""Data pipeline tests: synthetic dataset tree -> indexers -> loader,
covering the reference path grammars (syn + rw), the [1:] head-drop, and the
first-line-only syn-heatmap split quirk."""

import numpy as np
import pytest

from egorear_tpu.data.datasets import get_dataset
from egorear_tpu.data.loader import DataLoader
from egorear_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def syn_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ego4view_syn")
    return make_synthetic_dataset(
        str(root), "syn", num_chars=2, num_seqs=1, frames_per_seq=4,
        write_heatmaps=True,
    )


@pytest.fixture(scope="module")
def rw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ego4view_rw")
    return make_synthetic_dataset(
        str(root), "rw", num_chars=1, num_seqs=2, frames_per_seq=3,
        write_heatmaps=True,
    )


def test_syn_pose3d_dataset(syn_root):
    ds = get_dataset("ego4view_syn_pose3d", syn_root, "train", camera_pos="all")
    assert len(ds) == 2 * 4  # 2 chars x 4 frames
    s = ds[0]
    assert s["img"].shape == (4, 3, 256, 256)
    assert s["gt_heatmap"].shape == (4, 15, 64, 64)
    assert s["gt_pose"].shape == (16, 3)
    # ImageNet normalization applied.
    assert -3.0 < s["img"].mean() < 3.0
    # Head channel dropped: NPY has 16, sample exposes 15.
    raw = np.load(ds._hm_path(ds.frames[0], "camera_front_left"))
    assert raw.shape[0] == 16
    np.testing.assert_allclose(s["gt_heatmap"][0], raw[1:], atol=1e-6)


def test_syn_heatmap_first_line_quirk(syn_root):
    ds = get_dataset("ego4view_syn_heatmap", syn_root, "train", camera_pos="front")
    # Reference quirk: reads only the first split line -> 1 char x 4 frames
    # x 2 front cameras.
    assert len(ds) == 4 * 2
    ds_all = get_dataset(
        "ego4view_syn_heatmap", syn_root, "train", camera_pos="front",
        all_split_lines=True,
    )
    assert len(ds_all) == 2 * 4 * 2
    s = ds[0]
    assert s["img"].shape == (1, 3, 256, 256)
    assert s["gt_heatmap"].shape == (1, 15, 64, 64)


def test_rw_pose3d_dataset(rw_root):
    ds = get_dataset("ego4view_rw_pose3d", rw_root, "train", camera_pos="all")
    assert len(ds) == 2 * 3
    s = ds[0]
    assert s["coord_trans_mat"].shape == (4, 4, 4)
    assert s["img"].shape == (4, 3, 256, 256)


def test_render_missing_heatmaps(tmp_path):
    root = make_synthetic_dataset(
        str(tmp_path / "nohm"), "syn", frames_per_seq=2, write_heatmaps=False
    )
    ds = get_dataset(
        "ego4view_syn_heatmap_mvf", root, "train", camera_pos="all",
        render_missing_heatmaps=True,
    )
    s = ds[0]
    assert s["gt_heatmap"].shape == (4, 15, 64, 64)
    assert s["gt_heatmap"].max() > 0.9  # at least one joint renders in view


def test_loader_batching_and_shuffle(syn_root):
    ds = get_dataset("ego4view_syn_pose3d", syn_root, "train", camera_pos="all")
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                        num_workers=2, device_put=False)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["img"].shape == (4, 4, 3, 256, 256)
    assert len(b["frame_path"]) == 4
    # Epoch-dependent shuffling.
    loader.set_epoch(1)
    batches2 = list(loader)
    assert batches2[0]["frame_path"] != batches[0]["frame_path"]


def test_loader_partial_batch(syn_root):
    ds = get_dataset("ego4view_syn_pose3d", syn_root, "test", camera_pos="all")
    loader = DataLoader(ds, batch_size=3, drop_last=False, device_put=False)
    ns = [b["img"].shape[0] for b in loader]
    assert sum(ns) == len(ds)
    assert ns[-1] == len(ds) % 3 or ns[-1] == 3


def test_device_preprocess_path(tmp_path):
    """On-device preprocessing: uint8 samples produce (nearly) the same
    prepared batches as the host pipeline, and heatmap targets are exact."""
    import jax

    from egorear_tpu.train.tasks import prepare_batch

    root = make_synthetic_dataset(
        str(tmp_path / "dev"), "syn", frames_per_seq=3, write_heatmaps=True,
        splits=("train",),
    )
    host_ds = get_dataset("ego4view_syn_pose3d", root, "train", camera_pos="all")
    dev_ds = get_dataset("ego4view_syn_pose3d", root, "train", camera_pos="all",
                         device_preprocess=True)
    assert len(host_ds) == len(dev_ds)

    h = host_ds[0]
    d = dev_ds[0]
    assert d["img_u8"].shape == (4, 256, 256, 3) and d["img_u8"].dtype == np.uint8
    assert d["joints_2d"].shape == (4, 16, 2)
    np.testing.assert_allclose(d["gt_pose"], h["gt_pose"])

    batch = {k: np.asarray(v)[None] for k, v in d.items()
             if isinstance(v, np.ndarray)}
    prepared = jax.jit(prepare_batch)(batch)
    assert prepared["img"].shape == (1, 4, 3, 256, 256)
    assert prepared["gt_heatmap"].shape == (1, 4, 15, 64, 64)
    # Heatmap targets bit-identical to the offline NPY precompute.
    np.testing.assert_allclose(
        np.asarray(prepared["gt_heatmap"][0]), h["gt_heatmap"], atol=1e-6
    )
    # Images match the host pipeline within the uint8 quantization bound.
    from egorear_tpu.data.datasets import IMAGENET_STD

    tol = (1.0 / 255.0) / IMAGENET_STD.min() + 1e-4
    assert np.abs(np.asarray(prepared["img"][0]) - h["img"]).max() <= tol


def test_cache_in_memory(syn_root):
    ds = get_dataset("ego4view_syn_pose3d", syn_root, "train",
                     cache_in_memory=True)
    a, b = ds[0], ds[0]
    # Hits share the resident arrays (no re-decode) behind fresh dicts, and
    # the arrays are frozen so an in-place consumer mutation can't poison
    # later epochs.
    assert a is not b and a["img"] is b["img"]
    assert not a["img"].flags.writeable
    with pytest.raises(ValueError):
        a["img"][...] = 0
    np.testing.assert_array_equal(a["gt_pose"], ds[0]["gt_pose"])
    # Default stays uncached (fresh, writable arrays per access).
    ds2 = get_dataset("ego4view_syn_pose3d", syn_root, "train")
    c = ds2[0]
    assert c["img"] is not ds2[0]["img"] and c["img"].flags.writeable

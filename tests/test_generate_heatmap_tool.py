"""The offline GT-heatmap precompute CLI (generate_heatmap.py).

Contract: same flags, path grammar, and output layout as the reference tool
(/root/reference/generate_heatmap.py:82-141) -- globs sequence dirs
(syn: rp*/*, rw: 2024*/S*/seq*), renders (16, 64, 64) Gaussian targets from
the 872px 2D joints of every frame JSON, saves
``fisheye_hm/<camera>/<frame>.npy`` -- and the NPYs are bit-identical to
the on-device renderer's output (same kernel).
"""

import os
import subprocess
import sys

import numpy as np

from egorear_tpu.data.datasets import CAMERA_NAMES
from egorear_tpu.data.synthetic import make_synthetic_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tool_writes_reference_layout_npys(tmp_path):
    # Dataset WITHOUT precomputed heatmaps: the tool must create them.
    root = make_synthetic_dataset(
        str(tmp_path / "syn"), "syn", num_chars=1, num_seqs=1,
        frames_per_seq=2, image_size=64, write_heatmaps=False,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "generate_heatmap.py"),
         "--data_dir_path", root, "--dataset_type", "syn"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env=dict(os.environ, EGOREAR_PLATFORM="cpu"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    import glob

    seqs = sorted(glob.glob(os.path.join(root, "rp*/*")))
    assert seqs
    npys = sorted(glob.glob(os.path.join(seqs[0], "fisheye_hm", "*", "*.npy")))
    # 4 cameras x 2 frames
    assert len(npys) == 4 * 2, npys
    hm = np.load(npys[0])
    assert hm.shape == (16, 64, 64) and hm.dtype == np.float32
    assert 0.0 <= hm.max() <= 1.0 + 1e-6 and hm.max() > 0.5

    # Parity with the dataset-side renderer: regenerate with
    # write_heatmaps=True (same joints RNG) and compare one frame.
    root2 = make_synthetic_dataset(
        str(tmp_path / "syn2"), "syn", num_chars=1, num_seqs=1,
        frames_per_seq=2, image_size=64, write_heatmaps=True,
    )
    seqs2 = sorted(glob.glob(os.path.join(root2, "rp*/*")))
    for cam in CAMERA_NAMES:
        a = sorted(glob.glob(os.path.join(seqs[0], "fisheye_hm", cam, "*.npy")))
        b = sorted(glob.glob(os.path.join(seqs2[0], "fisheye_hm", cam, "*.npy")))
        assert len(a) == len(b) == 2
        np.testing.assert_allclose(np.load(a[0]), np.load(b[0]), atol=1e-6)

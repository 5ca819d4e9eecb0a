"""On-device preprocessing parity: device bicubic resize vs PIL, fused batch
kernel vs the host pipeline."""

import numpy as np
import pytest
from PIL import Image

from egorear_tpu.data.preprocess import (
    pil_bicubic_matrix,
    preprocess_batch_device,
    preprocess_images_device,
    resize_bicubic_device,
)
from egorear_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(2, 872, 872, 3), dtype=np.uint8)


def test_resize_matches_pil(images):
    got = np.asarray(resize_bicubic_device(images, 256)) * 255.0
    for i in range(len(images)):
        want = np.asarray(
            Image.fromarray(images[i]).resize([256, 256], Image.BICUBIC)
        ).astype(np.float32)
        # PIL uses an 8-bit intermediate between passes; float intermediate
        # differs by at most 1 LSB.
        assert np.abs(got[i] - want).max() <= 1.0 + 1e-4


def test_resize_identity_at_same_size():
    m = pil_bicubic_matrix(64, 64)
    np.testing.assert_allclose(m, np.eye(64), atol=1e-6)


def test_preprocess_images_matches_host(images):
    got = np.asarray(preprocess_images_device(images[None], 256))[0]
    for i in range(len(images)):
        pil = np.asarray(
            Image.fromarray(images[i]).resize([256, 256], Image.BICUBIC),
            dtype=np.float32,
        ) / 255.0
        want = ((pil - IMAGENET_MEAN) / IMAGENET_STD).transpose(2, 0, 1)
        tol = (1.0 / 255.0) / IMAGENET_STD.min() + 1e-4
        assert np.abs(got[i] - want).max() <= tol


def test_fused_batch_kernel(images):
    rng = np.random.default_rng(1)
    joints = rng.uniform(0, 872, size=(1, 2, 16, 2)).astype(np.float32)
    out = preprocess_batch_device(images[None], joints)
    assert out["img"].shape == (1, 2, 3, 256, 256)
    assert out["gt_heatmap"].shape == (1, 2, 15, 64, 64)

    # Heatmaps equal the offline renderer's output minus the Head channel.
    from egorear_tpu.ops.heatmap import render_gaussian_targets

    t, _ = render_gaussian_targets(joints)
    np.testing.assert_allclose(
        np.asarray(out["gt_heatmap"]), np.asarray(t)[:, :, 1:], atol=1e-6
    )

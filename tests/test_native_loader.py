"""Native C++ loader: decode/resize/normalize parity vs the PIL path."""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from egorear_tpu import native
from egorear_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD, load_image

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader unavailable (no toolchain)"
)


@pytest.fixture(scope="module")
def image_files():
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    paths = []
    for i, (size, ext) in enumerate(
        [(872, ".jpg"), (872, ".png"), (256, ".jpg"), (100, ".png")]
    ):
        arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        p = os.path.join(tmp, f"im{i}{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_u8_batch_matches_pil(image_files):
    out = native.load_u8_batch(image_files, 256)
    assert out.shape == (len(image_files), 256, 256, 3)
    for i, p in enumerate(image_files):
        pil = np.asarray(
            Image.open(p).convert("RGB").resize([256, 256], Image.BICUBIC)
        )
        diff = np.abs(pil.astype(int) - out[i].astype(int))
        assert diff.max() <= 1, (p, diff.max())


def test_f32_batch_matches_pipeline(image_files):
    out = native.load_f32_batch(image_files, 256)
    assert out.shape == (len(image_files), 3, 256, 256)
    for i, p in enumerate(image_files):
        want = load_image(p, 256)  # PIL decode + resize + normalize (CHW)
        # <=1 LSB in uint8 -> <= (1/255)/min(std) in normalized space.
        tol = (1.0 / 255.0) / IMAGENET_STD.min() + 1e-6
        assert np.abs(out[i] - want).max() <= tol


def test_failure_count_raised(image_files):
    with pytest.raises(IOError):
        native.load_u8_batch([image_files[0], "/nonexistent.jpg"], 64)

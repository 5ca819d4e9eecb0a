"""Golden tests for heatmap rendering/decoding.

The expected values are computed by an independent numpy transcription of the
documented contract (generate_heatmap.py:10-48, utils/loss.py:122-142), built
here loop-by-loop so vectorization bugs in the jnp implementation can't hide.
"""

import numpy as np
import pytest

from egorear_tpu.ops.heatmap import (
    argmax_2d,
    render_gaussian_targets,
    soft_argmax_2d,
)


def _naive_render(joints, image_size=872, heatmap_size=64, sigma=1.0):
    J = len(joints)
    target = np.zeros((J, heatmap_size, heatmap_size), np.float32)
    weight = np.ones((J,), np.float32)
    tmp = int(sigma * 3)
    stride = image_size / heatmap_size
    for j in range(J):
        mu_x = int(joints[j][0] / stride + 0.5)
        mu_y = int(joints[j][1] / stride + 0.5)
        ul = [mu_x - tmp, mu_y - tmp]
        br = [mu_x + tmp + 1, mu_y + tmp + 1]
        if ul[0] >= heatmap_size or ul[1] >= heatmap_size or br[0] < 0 or br[1] < 0:
            weight[j] = 0
            continue
        size = 2 * tmp + 1
        x = np.arange(size, dtype=np.float32)
        y = x[:, None]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
        gx = max(0, -ul[0]), min(br[0], heatmap_size) - ul[0]
        gy = max(0, -ul[1]), min(br[1], heatmap_size) - ul[1]
        ix = max(0, ul[0]), min(br[0], heatmap_size)
        iy = max(0, ul[1]), min(br[1], heatmap_size)
        target[j, iy[0]:iy[1], ix[0]:ix[1]] = g[gy[0]:gy[1], gx[0]:gx[1]]
    return target, weight


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_render_matches_naive(seed):
    rng = np.random.default_rng(seed)
    # Mix of in-view, edge, and far out-of-view joints.
    joints = np.concatenate(
        [
            rng.uniform(0, 872, size=(10, 2)),
            rng.uniform(-200, 0, size=(3, 2)),
            rng.uniform(872, 1100, size=(3, 2)),
            np.array([[0.0, 0.0], [871.9, 871.9], [435.0, 1.0]]),
        ]
    ).astype(np.float32)
    want_t, want_w = _naive_render(joints)
    got_t, got_w = render_gaussian_targets(joints)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_w), want_w)


def test_render_batched_shapes():
    rng = np.random.default_rng(0)
    joints = rng.uniform(0, 872, size=(2, 4, 16, 2)).astype(np.float32)
    t, w = render_gaussian_targets(joints)
    assert t.shape == (2, 4, 16, 64, 64)
    assert w.shape == (2, 4, 16)
    # Each (b, v) slice matches the unbatched render.
    t0, w0 = render_gaussian_targets(joints[1, 2])
    np.testing.assert_allclose(np.asarray(t[1, 2]), np.asarray(t0), atol=1e-6)


def test_argmax_2d_first_max_and_threshold():
    hm = np.zeros((2, 3, 8, 8), np.float32)
    hm[0, 0, 2, 5] = 0.9
    hm[0, 1, 7, 0] = 0.4
    # Tie: flat argmax must pick the first (row-major) occurrence.
    hm[1, 2, 1, 1] = 0.7
    hm[1, 2, 3, 3] = 0.7
    pts, maxv, valid = argmax_2d(hm, threshold=0.5, normalize=False)
    assert tuple(np.asarray(pts[0, 0])) == (5.0, 2.0)
    assert tuple(np.asarray(pts[1, 2])) == (1.0, 1.0)
    assert bool(valid[0, 0]) and not bool(valid[0, 1])
    np.testing.assert_allclose(float(maxv[0, 1]), 0.4)

    pts_n, _, _ = argmax_2d(hm, threshold=0.5, normalize=True)
    np.testing.assert_allclose(np.asarray(pts_n[0, 0]), [5 / 8, 2 / 8])


def test_soft_argmax_peaks_near_hard_argmax():
    t, _ = render_gaussian_targets(np.array([[300.0, 500.0]], np.float32))
    hm = np.asarray(t) * 50.0  # sharpen so softmax concentrates
    pts, _ = soft_argmax_2d(hm)
    hard, _, _ = argmax_2d(np.asarray(t), threshold=0.0)
    np.testing.assert_allclose(np.asarray(pts[0]), np.asarray(hard[0]), atol=0.5)

"""Parity tests for the deformable sampling op.

The gather implementation is validated against a per-point scalar numpy
bilinear sampler (grid_sample align_corners=False, zero padding -- the mmcv
CUDA kernel contract); onehot and pallas are validated against gather.
"""

import jax
import numpy as np
import pytest

from egorear_tpu.ops.deform_attn import (
    _sample_gather,
    _sample_onehot,
    _sample_pallas_vjp,
    deformable_sampling,
)


def _naive(value, loc, w):
    B, H, W, nh, ch = value.shape
    Q, P = loc.shape[1], loc.shape[3]
    out = np.zeros((B, Q, nh, ch), np.float64)
    for b in range(B):
        for q in range(Q):
            for h in range(nh):
                for p in range(P):
                    x = loc[b, q, h, p, 0] * W - 0.5
                    y = loc[b, q, h, p, 1] * H - 0.5
                    x0, y0 = int(np.floor(x)), int(np.floor(y))
                    lx, ly = x - x0, y - y0
                    acc = np.zeros(ch)
                    for dy, wy in ((0, 1 - ly), (1, ly)):
                        for dx, wx in ((0, 1 - lx), (1, lx)):
                            xx, yy = x0 + dx, y0 + dy
                            if 0 <= xx < W and 0 <= yy < H:
                                acc += wy * wx * value[b, yy, xx, h]
                    out[b, q, h] += w[b, q, h, p] * acc
    return out.reshape(B, Q, nh * ch)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    B, H, W, nh, ch, Q, P = 2, 16, 16, 4, 8, 15, 16
    value = rng.normal(size=(B, H, W, nh, ch)).astype(np.float32)
    # Locations spanning in-bounds, boundary, and out-of-bounds regions.
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, nh, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, nh, P)).astype(np.float32)
    w /= w.sum(axis=-1, keepdims=True)
    return value, loc, w


def test_gather_matches_naive(case):
    value, loc, w = case
    got = np.asarray(_sample_gather(*map(np.asarray, case)))
    want = _naive(value, loc, w)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_onehot_matches_gather(case):
    got = np.asarray(_sample_onehot(*case))
    want = np.asarray(_sample_gather(*case))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_matches_gather_interpret(case):
    # CPU CI: run the Pallas kernel in interpreter mode.
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_sample_pallas_vjp(*case))
    want = np.asarray(_sample_gather(*case))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gradients_match_between_impls(case):
    value, loc, w = case

    def loss(fn, v, l, a):
        return (fn(v, l, a) ** 2).sum()

    g1 = jax.grad(lambda v, l, a: loss(_sample_gather, v, l, a), argnums=(0, 1, 2))(
        value, loc, w
    )
    g2 = jax.grad(lambda v, l, a: loss(_sample_onehot, v, l, a), argnums=(0, 1, 2))(
        value, loc, w
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_public_entrypoint_dispatch(case):
    out = deformable_sampling(*case, impl="onehot")
    assert out.shape == (2, 15, 32)


def test_shared_variants_match(case):
    """Shared-value sampling (lazy path): all impls against per-head gather."""
    from egorear_tpu.ops.deform_attn import (
        _sample_shared_gather,
        _sample_shared_pallas,
        _sample_shared_smatrix,
    )
    from jax.experimental.pallas import tpu as pltpu

    value, loc, w = case
    rng = np.random.default_rng(1)
    B, H, W = value.shape[:3]
    Cs = 13
    vs = rng.normal(size=(B, H, W, Cs)).astype(np.float32)

    want = np.asarray(_sample_shared_gather(vs, loc, w))
    got_sm = np.asarray(_sample_shared_smatrix(vs, loc, w))
    np.testing.assert_allclose(got_sm, want, atol=1e-4)
    with pltpu.force_tpu_interpret_mode():
        got_pl = np.asarray(_sample_shared_pallas(vs, loc, w))
    np.testing.assert_allclose(got_pl, want, atol=1e-4)


def test_shared_pallas_backward_is_smatrix(case):
    from egorear_tpu.ops.deform_attn import (
        _sample_shared_pallas,
        _sample_shared_smatrix,
    )
    from jax.experimental.pallas import tpu as pltpu

    value, loc, w = case
    rng = np.random.default_rng(2)
    B, H, W = value.shape[:3]
    vs = rng.normal(size=(B, H, W, 7)).astype(np.float32)

    def loss(fn, v, l, a):
        return (fn(v, l, a) ** 2).sum()

    g_ref = jax.grad(lambda *a: loss(_sample_shared_smatrix, *a), argnums=(0, 1, 2))(
        vs, loc, w
    )
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(lambda *a: loss(_sample_shared_pallas, *a), argnums=(0, 1, 2))(
            vs, loc, w
        )
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.parametrize("bp", ["1", "2"])
def test_lazy_sample_pallas_matches_reference(case, bp, monkeypatch):
    """The fused lazy path (the model's hot kernel): Pallas S-builder vs the
    differentiable reference, including locations >1 px out of bounds on
    every side (regression: the round-1 kernel mis-sampled x-corners beyond
    the left/right edges), a query-row count that is not a multiple of 8,
    and both the per-batch-element and batch-packed (BP=2) program grids."""
    monkeypatch.setenv("EGOREAR_SBUILD_BP", bp)
    from jax.experimental.pallas import tpu as pltpu

    from egorear_tpu.ops.deform_attn import (
        _lazy_sample_reference,
        lazy_deform_sample,
    )

    rng = np.random.default_rng(2)
    B, H, W, Cin, Q, nh, P = 4, 16, 16, 24, 15, 4, 16  # nh*Q = 60 rows
    feat = rng.normal(size=(B, H * W, Cin)).astype(np.float32)
    loc = rng.uniform(-0.3, 1.3, size=(B, Q, nh, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, nh, P)).astype(np.float32)
    w /= w.sum(axis=-1, keepdims=True)
    pos = rng.normal(size=(2, H * W, 8)).astype(np.float32)  # G=2 groups

    for p in (None, pos):
        want = _lazy_sample_reference(feat, loc, w, p)
        with pltpu.force_tpu_interpret_mode():
            got = lazy_deform_sample(feat, loc, w, pos=p, impl="pallas")
        for g, ww in zip(got, want):
            if ww is None:
                assert g is None
                continue
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(ww), atol=1e-4
            )


def test_lazy_sample_gradients_flow_through_reference():
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    from egorear_tpu.ops.deform_attn import (
        _lazy_sample_reference,
        lazy_deform_sample,
    )

    rng = np.random.default_rng(3)
    B, H, W, Cin, Q, nh, P = 4, 8, 8, 8, 5, 2, 4
    feat = jnp.asarray(rng.normal(size=(B, H * W, Cin)), jnp.float32)
    # includes locations far outside the grid (> 1 px beyond every border)
    loc = jnp.asarray(rng.uniform(-0.4, 1.4, size=(B, Q, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, nh, P)), jnp.float32)
    # grouped pos table (G=2), groups interleaved along the batch
    pos = jnp.asarray(rng.normal(size=(2, H * W, 6)), jnp.float32)

    def loss(fn, fe, l, ww, p):
        s_feat, s_pos, s_one = fn(fe, l, ww, p)
        return (s_feat**2).sum() + (s_pos**2).sum() + (s_one**2).sum()

    g_ref = jax.grad(
        lambda *a: loss(lambda fe, l, ww, p: _lazy_sample_reference(fe, l, ww, p), *a),
        argnums=(0, 1, 2, 3),
    )(feat, loc, w, pos)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(
            lambda *a: loss(
                lambda fe, l, ww, p: lazy_deform_sample(fe, l, ww, pos=p, impl="pallas"),
                *a,
            ),
            argnums=(0, 1, 2, 3),
        )(feat, loc, w, pos)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_lazy_sample_pos_block_mode_matches_interleaved():
    """View-major (block) pos layout == batch-major (interleaved) layout
    after reordering the folded rows, values AND pos-gradients (the layout
    contract behind MultiViewTransformerLayer.vmajor)."""
    import jax
    import jax.numpy as jnp

    from egorear_tpu.ops.deform_attn import lazy_deform_sample

    rng = np.random.default_rng(11)
    B, V, H, W, Cin, Q, nh, P, C = 3, 4, 8, 8, 8, 5, 2, 4, 6
    HW = H * W
    feat = jnp.asarray(rng.normal(size=(B, V, HW, Cin)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, V, Q, nh, P, 2)),
                      jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, V, Q, nh, P)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(V, HW, C)), jnp.float32)

    fI = feat.reshape(B * V, HW, Cin)
    lI = loc.reshape(B * V, Q, nh, P, 2)
    wI = w.reshape(B * V, Q, nh, P)
    fB = feat.transpose(1, 0, 2, 3).reshape(V * B, HW, Cin)
    lB = loc.transpose(1, 0, 2, 3, 4, 5).reshape(V * B, Q, nh, P, 2)
    wB = w.transpose(1, 0, 2, 3, 4).reshape(V * B, Q, nh, P)

    sI = lazy_deform_sample(fI, lI, wI, pos=pos, impl="reference")
    sB = lazy_deform_sample(fB, lB, wB, pos=pos, impl="reference",
                            pos_block=True)
    for a, b in zip(sI, sB):
        ar = np.asarray(a).reshape(B, V, *a.shape[1:])
        br = np.asarray(b).reshape(V, B, *b.shape[1:]).swapaxes(0, 1)
        np.testing.assert_allclose(ar, br, atol=1e-6)

    def loss(p, f, l, ww, blk):
        s = lazy_deform_sample(f, l, ww, pos=p, impl="reference",
                               pos_block=blk)
        return s[0].sum() + 1.7 * s[1].sum() + 0.3 * s[2].sum()

    gI = jax.grad(loss)(pos, fI, lI, wI, False)
    gB = jax.grad(loss)(pos, fB, lB, wB, True)
    np.testing.assert_allclose(np.asarray(gI), np.asarray(gB), atol=1e-5)

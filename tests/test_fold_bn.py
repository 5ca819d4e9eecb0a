"""Eval-mode BatchNorm folding (serving path).

Contract: ``fold_batchnorm(variables)`` + the model built with
``bn_folded=True`` is numerically identical to the unfolded model in eval
mode (conv -> BN with running stats, torch defaults eps=1e-5 -- reference
resnet.py:6-74 uses torchvision BN).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egorear_tpu.models.backbone import BackboneWithFPN, fold_batchnorm
from egorear_tpu.models.heatmap_net import HeatmapNet


def _randomize_bn(variables, seed=0):
    """Give BN params/stats non-trivial values so the fold is load-bearing."""
    rng = np.random.default_rng(seed)

    def perturb(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "bn" not in name and "batch_stats" not in name:
            return x
        if name.endswith("var"):
            return jnp.asarray(rng.uniform(0.25, 4.0, x.shape), x.dtype)
        return jnp.asarray(rng.normal(0.1, 1.0, x.shape), x.dtype)

    return jax.tree_util.tree_map_with_path(perturb, variables)


def test_fold_batchnorm_backbone_exact():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    net = BackboneWithFPN(out_stride=4, fpn_channels=32)
    variables = net.init(jax.random.PRNGKey(0), x)
    variables = _randomize_bn(variables)

    fpn_ref, pyr_ref = net.apply(variables, x, train=False)

    folded_net = BackboneWithFPN(out_stride=4, fpn_channels=32, bn_folded=True)
    folded = fold_batchnorm(variables)
    fpn_fold, pyr_fold = folded_net.apply(folded, x, train=False)

    np.testing.assert_allclose(fpn_fold, fpn_ref, atol=2e-4, rtol=1e-4)
    for a, b in zip(pyr_fold, pyr_ref):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)
    # Every BN node was consumed.
    flat = jax.tree_util.tree_leaves_with_path(folded)
    assert not any("bn" in "/".join(map(str, p)) for p, _ in flat)
    assert "batch_stats" not in folded


def test_fold_batchnorm_param_tree_matches_folded_init():
    """fold output must be loadable wherever a bn_folded init tree is."""
    x = jnp.zeros((1, 2, 3, 64, 64), jnp.float32)
    net = HeatmapNet(num_heatmap=5, fpn_channels=32)
    variables = net.init(jax.random.PRNGKey(0), x)
    folded = fold_batchnorm(variables)

    folded_net = HeatmapNet(num_heatmap=5, fpn_channels=32, bn_folded=True)
    ref_tree = folded_net.init(jax.random.PRNGKey(0), x)
    ref_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_leaves_with_path(ref_tree)}
    got_paths = {jax.tree_util.keystr(p): np.shape(l)
                 for p, l in jax.tree_util.tree_leaves_with_path(folded)}
    assert got_paths == ref_paths


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fold_batchnorm_heatmap_net(dtype):
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 2, 3, 64, 64)),
                    jnp.float32)
    net = HeatmapNet(num_heatmap=5, fpn_channels=32)
    variables = _randomize_bn(net.init(jax.random.PRNGKey(0), x), seed=3)

    hm_ref = net.apply(variables, x, train=False)

    folded = fold_batchnorm(variables)  # fold in fp32, cast after
    cast = lambda t: jax.tree.map(
        lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, t)
    folded_net = HeatmapNet(num_heatmap=5, fpn_channels=32, bn_folded=True)
    hm_fold = folded_net.apply(cast(folded), x.astype(dtype), train=False)

    tol = 2e-4 if dtype == jnp.float32 else 0.15
    np.testing.assert_allclose(
        np.asarray(hm_fold, np.float32), np.asarray(hm_ref, np.float32),
        atol=tol, rtol=tol,
    )

"""Tensor parallelism through the Trainer (round-2 VERDICT weak #3 / next #4).

``--trainer.model_parallel N`` must build a (data, model) mesh inside the
Trainer, shard the wide kernels (2-D proposal-MLP weights AND the 3-D stacked
per-view refiner weights) over the 'model' axis, and train/evaluate with the
same numbers as the pure-DP path -- the collectives XLA inserts from the
shardings must be semantically invisible.

Runs on the 8-virtual-CPU-device mesh from conftest.py.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from egorear_tpu.parallel.mesh import leaf_sharding, make_mesh, param_shardings
from egorear_tpu.train.tasks import Pose3DTask
from egorear_tpu.train.trainer import Trainer, TrainerConfig

# Multi-minute e2e tier: deselect with -m 'not slow' for fast CI.
pytestmark = pytest.mark.slow

ENCODER_CFG = {
    "resnet_cfg": {"model_name": "resnet18", "out_stride": 4,
                   "use_imagenet_pretrain": False},
    "neck_cfg": {"in_channels": [64, 128, 256, 512], "out_channels": 128},
}

MODEL_CFG = {
    "num_views": 4, "image_size": [64, 64], "camera_model": "ego4view_syn",
    "heatmap_mvf_cfg": {
        "num_heatmap": 15, "feat_down_stride": 4, "heatmap_threshold": 0.5,
        "full_training": True,
        "encoder_cfg": ENCODER_CFG,
        "mvf_cfg": {
            "input_dims": 128, "embed_dims": 256, "num_former_layers": 1,
            "joint_query_adaptation": True, "use_1by1_conv": True,
            "mvf_transformer_cfg": {
                "cross_attn_cfg": {"num_heads": 4},
                "spatial_attn_cfg": {"num_heads": 4},
                "ffn_cfg": {"feedforward_dims": 512, "num_fcs": 2,
                            "ffn_drop": 0.0},
            },
        },
    },
    "pose3d_cfg": {
        "num_joints": 16, "input_dims": 128, "embed_dims": 256,
        "num_former_layers": 1,
        "transformer_cfg": {
            "cross_attn_cfg": {"num_heads": 4},
            "spatial_attn_cfg": {"num_heads": 4},
            "ffn_cfg": {"feedforward_dims": 512, "num_fcs": 2,
                        "ffn_drop": 0.0},
        },
    },
}


def test_leaf_sharding_rule_covers_stacked_refiner_kernels():
    mesh = make_mesh(8, model_parallel=2)
    # 2-D Dense: widest dim sharded.
    assert leaf_sharding((2048, 128), mesh, 256).spec == P("model", None)
    assert leaf_sharding((128, 4096), mesh, 256).spec == P(None, "model")
    # 3-D stacked (V, in, out), opt-in: the view axis never shards; widest
    # trailing dim does (the round-2 gap -- these replicated silently).
    assert leaf_sharding((4, 4096, 256), mesh, 256,
                         shard_stacked=True).spec == P(None, "model", None)
    assert leaf_sharding((4, 256, 512), mesh, 256,
                         shard_stacked=True).spec == P(None, None, "model")
    # Stacked sharding is the default since round 4 (the old backward
    # discrepancy resolved with the view-major layout; leaf_sharding
    # docstring) and can be opted out of.
    assert leaf_sharding((4, 4096, 256), mesh, 256).spec == \
        P(None, "model", None)
    assert leaf_sharding((4, 4096, 256), mesh, 256,
                         shard_stacked=False).spec == P()
    # Below min_dim / indivisible / 1-D: replicated.
    assert leaf_sharding((4, 100, 30), mesh, 256,
                         shard_stacked=True).spec == P()
    assert leaf_sharding((513,), mesh, 256).spec == P()


def _fit_steps(mp: int, tmp_path, batches, shard_stacked: bool = False):
    cfg = TrainerConfig(
        max_epochs=1, seed=0,
        save_dir=str(tmp_path / f"mp{mp}{'s' if shard_stacked else ''}"),
        gradient_clip_val=5.0, model_parallel=mp, tp_min_dim=256,
        tp_shard_stacked=shard_stacked,
    )
    task = Pose3DTask(model_cfg=MODEL_CFG)
    # lr=0 pins the params: every step then measures forward/backward
    # equivalence directly. (With a real lr, Adam's first update is
    # ~ lr * sign(g), discontinuous at g = 0 -- fp reduction-order noise
    # between the sharded and replicated contractions flips near-zero signs
    # and the trajectories diverge chaotically within a step; the same
    # happens between DDP and single-GPU runs of the reference. Backward
    # equivalence is asserted on the accumulated Adam moments instead.)
    trainer = Trainer(task, cfg, lr=0.0, weight_decay=0.0,
                      lr_decay_epochs=(), warmup_iters=1, batch_size=4,
                      workers=0)
    trainer.init_state(batches[0], steps_per_epoch=len(batches))
    if mp > 1:
        # The wide kernels really are distributed over the model axis.
        shardings = trainer._shardings(trainer.state["params"])
        tp = [s for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.spec != P(), shardings,
                         is_leaf=lambda x: hasattr(x, "spec")))
            if s]
        assert len(tp) > 1, "no tensor-parallel leaves under model_parallel=2"
        assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    losses = []
    for b in batches:
        trainer.state, metrics = trainer._train_step(trainer.state, b)
        losses.append(float(jax.device_get(metrics["loss_total"])))
    ev = trainer._eval_step(trainer.state, batches[0], False)
    flat = jax.tree_util.tree_flatten_with_path(trainer.state["opt_state"])[0]
    moments = [(jax.tree_util.keystr(kp), jax.device_get(l))
               for kp, l in flat
               if hasattr(l, "shape") and getattr(l, "ndim", 0) > 0]
    return losses, jax.device_get(ev), moments


@pytest.mark.parametrize("shard_stacked", [False, True])
def test_trainer_model_parallel_matches_data_parallel(tmp_path, shard_stacked):
    """TP == DP through real train steps (loss, eval metrics, Adam moments).

    ``shard_stacked=True`` (the shipped default) additionally shards the
    3-D stacked per-view refiner kernels. This configuration used to hit a
    genuine XLA SPMD backward miscompilation (wrong collective: deviations
    persisted at float64) with two isolated triggers -- the batch-major
    vmap re-layout (fixed by the view-major layout) and the per-view
    slice-loop heatmap loss (fixed by the fused reduction in
    tasks._per_view_mse_sum; bisection record in
    tools/tp_trainer_f64_check.py). Post-fix, the remaining fp32 deviation
    is ~3.5e-3 worst-leaf on the sharded kernels themselves and collapses
    to ~1e-15 under float64 -- reduction-reassociation noise -- so the
    stacked parametrization asserts a correspondingly looser, but still
    noise-scale, moment tolerance that would fail loudly (deviations were
    75%+) if either trigger regressed.
    """
    rng = np.random.RandomState(0)
    batches = [
        {
            "img": rng.randn(4, 4, 3, 64, 64).astype(np.float32),
            "gt_heatmap": rng.rand(4, 4, 15, 16, 16).astype(np.float32),
            "gt_pose": rng.randn(4, 16, 3).astype(np.float32),
        }
        for _ in range(2)
    ]
    losses_dp, eval_dp, mom_dp = _fit_steps(1, tmp_path, batches)
    losses_tp, eval_tp, mom_tp = _fit_steps(2, tmp_path, batches,
                                            shard_stacked=shard_stacked)
    # Forward + loss: bitwise-grade agreement at pinned params.
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=1e-5, atol=1e-6)
    for k in eval_dp:
        np.testing.assert_allclose(eval_tp[k], eval_dp[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    # Backward: the accumulated Adam moments (pure functions of the per-step
    # gradients at lr=0) agree norm-wise -- the psums XLA inserted for the
    # sharded contractions only reorder fp reductions.
    assert len(mom_dp) == len(mom_tp)
    # Stacked sharding adds collectives whose fp32 reassociation noise
    # reaches ~3.5e-3 worst-leaf (float64-exact; measured by
    # tools/tp_trainer_f64_check.py on this exact flow). 1e-2 gives ~3x
    # headroom over the noise while sitting ~2 orders below the
    # miscompilation signature this test exists to catch.
    rtol = 1e-2 if shard_stacked else 1e-3
    bad = []
    for (ka, a), (_, b) in zip(mom_dp, mom_tp):
        num = np.linalg.norm(np.asarray(a) - np.asarray(b))
        den = np.linalg.norm(np.asarray(a))
        # Absolute floor: leaves whose true gradient is identically zero
        # (e.g. spatial-attention k_proj bias -- softmax is shift-invariant
        # in the keys) hold pure fp noise; a relative check there is
        # meaningless.
        if not num < max(rtol * den, 1e-4):
            bad.append(f"{ka} shape={np.shape(a)} |d|={num:.3e} "
                       f"|a|={den:.3e} rel={num / max(den, 1e-12):.3f}")
    assert not bad, "\n".join(bad)

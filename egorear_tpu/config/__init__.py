from egorear_tpu.config.loader import load_config, apply_overrides, ExperimentConfig

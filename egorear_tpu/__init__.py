"""EgoRear-TPU: a TPU-native (JAX/XLA/Pallas) framework for egocentric 3D human
pose estimation from head-mounted fisheye camera rigs.

Re-designed from scratch with the capabilities of hiroyasuakada/EgoRear
(ICCV 2025, arXiv 2503.11652): stereo 2D joint-heatmap estimation, multi-view
feature-exchange heatmap refinement with joint-query adaptation (MVFex/JQA),
and calibrated-fisheye 3D pose lifting -- all as jit-compiled JAX programs
sharded over TPU meshes.

Layer map (TPU-first, not a port):
    ops/       pure-jnp + Pallas primitives (deformable sampling, fisheye
               projection, heatmap rendering/decoding, pose metrics)
    models/    flax.linen model families (NHWC, bf16-friendly)
    data/      host-side dataset indexers + device-resident preprocessing
    train/     jitted train/eval steps, optax schedules, orbax checkpoints,
               torch-checkpoint converter
    parallel/  jax.sharding meshes and sharding rules
    config/    Lightning-CLI-compatible YAML front-end
"""

__version__ = "0.1.0"

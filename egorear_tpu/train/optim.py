"""Optimizer and LR-schedule construction.

Behavioral contract:
  * AdamW, base lr / weight decay from config, MultiStep decay x0.1 at the
    configured epochs, 500-iteration linear warmup (reference
    pl_wrappers/egoposeformer/heatmap.py:144-154, configs *.yaml).
  * pose3d additionally splits params into no-weight-decay (any param whose
    path contains norm/bn/ln/bias) vs decayed groups
    (pose_3d_mvf_ex.py:219-234), or an encoder-lr-scale split (:236-246).
  * gradient clipping by global norm 5.0 (configs ``gradient_clip_val``).

Warmup note: the reference rescales lr AFTER optimizer.step
(heatmap.py:144-149), so its very first step runs at full base lr and scale
min(1,(t+1)/warmup) applies from the next step on. We implement the intended
ramp lr(t) = base * min(1, (t+1)/warmup) from step 0 -- a one-step
difference documented here for the parity record.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import optax


def make_lr_schedule(
    base_lr: float,
    warmup_iters: int,
    lr_decay_epochs: Sequence[int],
    steps_per_epoch: int,
    gamma: float = 0.1,
):
    """lr(step) = base * min(1, (step+1)/warmup) * gamma^(#milestones passed)."""
    milestones = [int(e) * steps_per_epoch for e in lr_decay_epochs]

    def schedule(step):
        step = jnp.asarray(step)
        warm = jnp.minimum(1.0, (step + 1) / max(1, warmup_iters))
        decay = gamma ** jnp.sum(
            jnp.asarray([step >= m for m in milestones], dtype=jnp.float32)
        ) if milestones else 1.0
        return base_lr * warm * decay

    return schedule


def _no_decay_mask(params):
    """True (apply decay) for params NOT matching the reference's
    norm/bn/ln/bias name filter (pose_3d_mvf_ex.py:222-227)."""
    import jax

    def decide(path):
        joined = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)
        low = joined.lower()
        no_decay = (
            "norm" in low or "bn" in low or "ln" in low or "bias" in low
            or low.endswith("/scale")  # flax LayerNorm/BatchNorm scale
            or "batchnorm" in low
        )
        return not no_decay

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


def make_optimizer(
    base_lr: float,
    weight_decay: float,
    warmup_iters: int,
    lr_decay_epochs: Sequence[int],
    steps_per_epoch: int,
    grad_clip_norm: Optional[float] = 5.0,
    no_decay_mask: bool = False,
    params=None,
    encoder_lr_scale: float = 1.0,
):
    """AdamW chain: [global-norm clip] -> adamw(schedule, masked decay)
    [-> encoder-lr scaling].

    ``encoder_lr_scale != 1.0`` scales the updates of every param under an
    ``encoder`` subtree (the reference's encoder param-group path,
    pose_3d_mvf_ex.py:236-246 -- note that branch would crash in the
    reference for the MVFEX network since it has no ``.encoder`` attribute;
    all shipped configs use 1.0)."""
    schedule = make_lr_schedule(
        base_lr, warmup_iters, lr_decay_epochs, steps_per_epoch
    )
    mask = None
    if no_decay_mask:
        assert params is not None, "need params to build the decay mask"
        mask = _no_decay_mask(params)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
        mask=mask,
    )
    if encoder_lr_scale != 1.0:
        import jax

        assert params is not None, "need params to build the encoder mask"

        def is_encoder(path, _):
            return any(
                (getattr(k, "key", str(k)) == "encoder") for k in path
            )

        enc_mask = jax.tree_util.tree_map_with_path(is_encoder, params)
        tx = optax.chain(
            tx, optax.masked(optax.scale(encoder_lr_scale), enc_mask)
        )
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx, schedule

"""Checkpointing: orbax save/restore for native state, plus the
PyTorch-Lightning checkpoint converter and submodule-graft loading.

Reference behaviors covered:
  * per-epoch checkpoints, resume via ``--ckpt_path`` (Lightning
    ModelCheckpoint, configs/*.yaml callbacks; README.md:186).
  * staged-pretraining surgery: each stage loads the previous stage's
    checkpoint into a submodule after stripping the ``network._orig_mod.``
    torch.compile prefix (pl_wrappers/.../heatmap_mvf_ex.py:93-102,
    pose_3d_mvf_ex.py:103-112, utils/state_dict.py:5-22). Our native
    checkpoints need no prefix surgery; ``graft`` implants one tree into a
    subtree of another. Torch ``.ckpt`` files are converted key-by-key via
    :mod:`egorear_tpu.train.torch_convert`.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np

from egorear_tpu.utils.logging import get_logger

logger = get_logger("checkpoint")

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save(ckpt_dir: str, epoch: int, state, use_orbax: bool = True) -> str:
    """Save train state under <ckpt_dir>/epoch=<N> (Lightning-style naming).

    ``use_orbax=False`` forces the collective-free pickle path: orbax's save
    runs cross-process sync barriers internally, so a rank-0-only save on a
    multi-host pod (trainer state is replicated; only rank 0 writes) must
    not go through it.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch={epoch}"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if _HAS_ORBAX and use_orbax:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
    else:  # minimal fallback
        import pickle

        with open(path + ".pkl", "wb") as f:
            pickle.dump(jax.device_get(state), f)
    logger.info(f"saved checkpoint {path}")
    return path


def restore(path: str, target=None):
    """Restore a checkpoint saved by :func:`save`. With ``target``, restores
    into its structure; without, returns the raw array tree."""
    path = os.path.abspath(path)
    # Accept both the canonical path ``save`` returned (pickle suffix
    # implied) and an explicit ``...pkl`` path (what a directory listing or
    # ``--ckpt_path`` override naturally hands us).
    pkl = path if path.endswith(".pkl") else path + ".pkl"
    if os.path.exists(pkl):
        import pickle

        with open(pkl, "rb") as f:
            return pickle.load(f)
    if path.endswith(".pkl"):
        # An explicit .pkl path that does not exist can only be a user error;
        # falling through to orbax would produce a confusing error about a
        # malformed checkpoint directory instead.
        raise FileNotFoundError(f"checkpoint not found: {path}")
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    return ckptr.restore(path, jax.device_get(target))


def restore_latest(ckpt_dir: str, target) -> Tuple[Optional[Any], int]:
    """Restore the highest-epoch checkpoint in ``ckpt_dir``; (None, -1) if none."""
    if not os.path.isdir(ckpt_dir):
        return None, -1
    best = -1
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"epoch=(\d+)(?:\.pkl)?", name)
        if m:
            best = max(best, int(m.group(1)))
    if best < 0:
        return None, -1
    return restore(os.path.join(ckpt_dir, f"epoch={best}"), target), best


def graft(base_tree: dict, sub_path: str, sub_tree: dict) -> dict:
    """Return ``base_tree`` with the subtree at ``sub_path`` (slash-separated)
    replaced by ``sub_tree`` -- the JAX equivalent of loading a pretrained
    stage into ``network.heatmap_estimator`` etc. Strict: the subtree
    structures must match."""
    keys = [k for k in sub_path.split("/") if k]

    def _rec(node, ks):
        if not ks:
            _assert_same_structure(node, sub_tree, sub_path)
            return sub_tree
        k = ks[0]
        if k not in node:
            raise KeyError(f"graft path {sub_path!r}: {k!r} not in tree "
                           f"(have {list(node)[:8]}...)")
        out = dict(node)
        out[k] = _rec(node[k], ks[1:])
        return out

    return _rec(base_tree, keys)


def prune_to_structure(target, tree, where=""):
    """Select from ``tree`` exactly the dict structure of ``target``.

    Extra keys in ``tree`` are dropped; keys missing from ``tree`` raise.
    Needed for native-checkpoint grafts: flax only creates params for
    modules the consuming stage actually calls, so e.g. stage-2 with
    conv-stack heads never initializes the stage-1 estimator's own
    ``conv_heatmap`` head -- the stage-1 checkpoint still carries it (the
    reference's strict ``load_state_dict`` works because torch modules
    always own all params; the head's output is simply unused there,
    heatmap_mvf_ex.py:93-126)."""
    if isinstance(target, dict):
        if not isinstance(tree, dict):
            raise ValueError(
                f"graft structure mismatch at {where}: dict vs leaf"
            )
        out = {}
        for k, v in target.items():
            if k not in tree:
                raise ValueError(
                    f"checkpoint is missing {where}/{k} "
                    f"(has {sorted(tree)[:8]}...)"
                )
            out[k] = prune_to_structure(v, tree[k], f"{where}/{k}")
        return out
    return tree


def _assert_same_structure(a, b, where):
    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    if ta != tb:
        raise ValueError(f"graft structure mismatch at {where}: {ta} vs {tb}")
    for pa, pb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        if np.shape(pa) != np.shape(pb):
            raise ValueError(
                f"graft shape mismatch at {where}: {np.shape(pa)} vs {np.shape(pb)}"
            )


def load_pretrained(path: str, target_variables: dict, task_name: str) -> dict:
    """Load pretrained network variables from either a native checkpoint
    (orbax dir / .pkl) or a reference torch ``.ckpt`` (converted)."""
    if path.endswith(".ckpt"):
        from egorear_tpu.train.torch_convert import convert_lightning_ckpt

        return convert_lightning_ckpt(path, target_variables, task_name)
    state = restore(path)
    out = {"params": state["params"]}
    out.update(state.get("extra_vars", {}))
    # Prune to the target's structure (drops source-only leaves like unused
    # heads), then strict structure+shape check on what remains.
    out = prune_to_structure(target_variables, out, path)
    _assert_same_structure(out, target_variables, path)
    return out

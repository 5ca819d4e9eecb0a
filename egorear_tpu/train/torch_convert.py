"""PyTorch-Lightning checkpoint -> flax variables converter.

Consumes the reference's ``.ckpt`` files (torch.save'd Lightning state with a
``state_dict`` whose keys may carry the ``network._orig_mod.`` torch.compile
prefix and ``module.`` DDP prefix -- utils/state_dict.py:5-22) and emits the
variables tree of the corresponding egorear_tpu network.

Layout transforms:
  * conv weight  OIHW -> HWIO
  * linear weight (out, in) -> (in, out)
  * BatchNorm weight/bias -> params.scale/bias; running stats -> batch_stats
  * LayerNorm weight/bias -> scale/bias
  * nn.Embedding / nn.Parameter pos-embeds -> direct copy
  * the V per-view refiner modules (heatmap_refiner_front_left, ...) are
    STACKED along a new leading axis in view order, matching the vmapped
    refiner stack in :class:`egorear_tpu.models.mvfex.HeatmapMVFexNet`.

The key grammar below mirrors the reference module trees
(models/estimator/egoposeformer_heatmap{,_mvf_ex}.py, egoposeformer_mvf_ex.py,
models/backbones/resnet.py); every mapped location is asserted against the
target tree's shapes at the end.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from egorear_tpu.utils.logging import get_logger

logger = get_logger("torch_convert")

REFINER_ORDER_4 = (
    "heatmap_refiner_front_left",
    "heatmap_refiner_front_right",
    "heatmap_refiner_back_left",
    "heatmap_refiner_back_right",
)
REFINER_ORDER_3 = (
    "heatmap_refiner_front_left",
    "heatmap_refiner_front_right",
    "heatmap_refiner_back",
)
REFINER_ORDER_2 = REFINER_ORDER_4[:2]


def strip_prefixes(state_dict: dict) -> dict:
    """Strip Lightning/compile/DDP prefixes (utils/state_dict.py:5-22)."""
    out = {}
    for k, v in state_dict.items():
        for pre in ("network._orig_mod.", "network.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# leaf-level transforms
# ---------------------------------------------------------------------------


def _conv(v):
    return np.transpose(v, (2, 3, 1, 0))


def _linear(v):
    return np.transpose(v, (1, 0))


def _set(tree: dict, path: List[str], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    if path[-1] in node:
        raise KeyError(f"duplicate target {'/'.join(path)}")
    node[path[-1]] = value


def _emit_conv(params, path, name, v):
    if name == "weight":
        _set(params, path + ["kernel"], _conv(v))
    elif name == "bias":
        _set(params, path + ["bias"], v)
    else:
        raise KeyError(name)


def _emit_linear(params, path, name, v):
    if name == "weight":
        _set(params, path + ["kernel"], _linear(v))
    elif name == "bias":
        _set(params, path + ["bias"], v)
    else:
        raise KeyError(name)


def _emit_conv1x1_as_dense(params, path, name, v):
    """torch 1x1 conv weight (D, C, 1, 1) -> Dense kernel (C, D). Used for
    the memory projections that the lazy deformable attention holds as
    Dense-shaped params (frame_feat_multi_view_proj, feat_proj)."""
    if name == "weight":
        _set(params, path + ["kernel"], v[:, :, 0, 0].T)
    elif name == "bias":
        _set(params, path + ["bias"], v)
    else:
        raise KeyError(name)


def _emit_norm(params, stats, path, name, v):
    if name == "weight":
        _set(params, path + ["scale"], v)
    elif name == "bias":
        _set(params, path + ["bias"], v)
    elif name == "running_mean":
        _set(stats, path + ["mean"], v)
    elif name == "running_var":
        _set(stats, path + ["var"], v)
    elif name == "num_batches_tracked":
        pass
    else:
        raise KeyError(name)


# ---------------------------------------------------------------------------
# key grammars
# ---------------------------------------------------------------------------

_RESNET_STAGE = {"layer_s8": "layer2", "layer_s16": "layer3", "layer_s32": "layer4"}


def _map_heatmap_net(key: str, v, params, stats, base: List[str]):
    """Keys under a torch EgoPoseFormerHeatmap (egoposeformer_heatmap.py)."""
    if key.startswith("encoder.backbone."):
        rest = key[len("encoder.backbone."):]
        rpath = base + ["encoder", "resnet"]
        m = re.fullmatch(r"layer_s2\.0\.(\w+)", rest)
        if m:
            return _emit_conv(params, rpath + ["conv1"], m.group(1), v)
        m = re.fullmatch(r"layer_s2\.1\.(\w+)", rest)
        if m:
            return _emit_norm(params, stats, rpath + ["bn1"], m.group(1), v)
        m = re.fullmatch(r"layer_s4\.1\.(\d)\.(.+)", rest)
        if m:
            return _map_basic_block(
                m.group(2), v, params, stats, rpath + [f"layer1_{m.group(1)}"]
            )
        m = re.fullmatch(r"(layer_s8|layer_s16|layer_s32)\.(\d)\.(.+)", rest)
        if m:
            stage = _RESNET_STAGE[m.group(1)]
            return _map_basic_block(
                m.group(3), v, params, stats, rpath + [f"{stage}_{m.group(2)}"]
            )
        raise KeyError(key)
    if key.startswith("encoder.neck."):
        rest = key[len("encoder.neck."):]
        fpath = base + ["encoder", "fpn"]
        m = re.fullmatch(r"(lateral|fuse|fpn)_convs\.(\d+)\.0\.(\w+)", rest)
        if m:
            kind, idx, name = m.groups()
            return _emit_conv(params, fpath + [f"{kind}_{idx}"], name, v)
        raise KeyError(key)
    m = re.fullmatch(r"conv_heatmap\.(\w+)", key)
    if m:
        return _emit_conv(params, base + ["conv_heatmap"], m.group(1), v)
    raise KeyError(key)


def _map_basic_block(rest: str, v, params, stats, bpath: List[str]):
    m = re.fullmatch(r"(conv1|conv2)\.(\w+)", rest)
    if m:
        return _emit_conv(params, bpath + [m.group(1)], m.group(2), v)
    m = re.fullmatch(r"(bn1|bn2)\.(\w+)", rest)
    if m:
        return _emit_norm(params, stats, bpath + [m.group(1)], m.group(2), v)
    m = re.fullmatch(r"downsample\.0\.(\w+)", rest)
    if m:
        return _emit_conv(params, bpath + ["downsample_conv"], m.group(1), v)
    m = re.fullmatch(r"downsample\.1\.(\w+)", rest)
    if m:
        return _emit_norm(params, stats, bpath + ["downsample_bn"], m.group(1), v)
    raise KeyError(rest)


def _map_transformer_layer(rest: str, v, params, stats, tpath: List[str]):
    """Torch MultiViewTransformerLayer / EgoPoseFormerTransformerLayer keys."""
    m = re.fullmatch(
        r"cross_attn\.(sampling_offsets|attention_weights|value_proj|output_proj)\.(\w+)",
        rest,
    )
    if m:
        return _emit_linear(params, tpath + ["cross_attn", m.group(1)], m.group(2), v)
    m = re.fullmatch(r"fuse_mlp\.(\w+)", rest)
    if m:
        return _emit_linear(params, tpath + ["fuse_mlp"], m.group(1), v)
    m = re.fullmatch(r"spatial_attn\.(q_proj|k_proj|v_proj|out_proj)\.(\w+)", rest)
    if m:
        return _emit_linear(params, tpath + ["spatial_attn", m.group(1)], m.group(2), v)
    m = re.fullmatch(r"(norm_cross|norm_spatial|norm_ffn)\.(\w+)", rest)
    if m:
        return _emit_norm(params, stats, tpath + [m.group(1)], m.group(2), v)
    m = re.fullmatch(r"ffn\.layers\.(\d+)\.0\.(\w+)", rest)
    if m:  # inner [Linear, GELU, Dropout] blocks
        return _emit_linear(params, tpath + ["ffn", f"Dense_{m.group(1)}"], m.group(2), v)
    m = re.fullmatch(r"ffn\.layers\.(\d+)\.(\w+)", rest)
    if m:  # trailing plain Linear
        return _emit_linear(params, tpath + ["ffn", f"Dense_{m.group(1)}"], m.group(2), v)
    raise KeyError(rest)


def _map_refiner(key: str, v, params, stats):
    """Torch HeatmapMVF keys -> one (unstacked) MVFexRefiner tree."""
    m = re.fullmatch(r"heatmap_proj\.([02])\.(\w+)", key)
    if m:
        idx = "0" if m.group(1) == "0" else "1"
        return _emit_linear(params, [f"heatmap_proj_{idx}"], m.group(2), v)
    m = re.fullmatch(r"fc_bfb\.(\w+)", key)
    if m:
        return _emit_linear(params, ["fc_bfb"], m.group(1), v)
    m = re.fullmatch(r"fc_query\.0\.(\w+)", key)
    if m:
        return _emit_linear(params, ["fc_query"], m.group(1), v)
    if key == "joint_query_embed.weight":
        return _set(params, ["joint_query_embed"], v)
    if key == "query_pos_embed":
        return _set(params, ["query_pos_embed"], v)
    if key == "frame_feat_multi_view_pos_embed":
        return _set(params, ["frame_feat_multi_view_pos_embed"], v)
    m = re.fullmatch(r"frame_feat_multi_view_proj\.(\w+)", key)
    if m:
        return _emit_conv1x1_as_dense(
            params, ["frame_feat_multi_view_proj"], m.group(1), v
        )
    m = re.fullmatch(r"frame_feat_proj_layers\.([024])\.(\w+)", key)
    if m:
        idx = {"0": "0", "2": "1", "4": "2"}[m.group(1)]
        if idx == "1":  # the middle 3x3 stride-2 conv stays a conv
            return _emit_conv(params, [f"ff_proj_{idx}"], m.group(2), v)
        return _emit_conv1x1_as_dense(params, [f"ff_proj_{idx}"], m.group(2), v)
    m = re.fullmatch(r"transformer_layers\.(\d+)\.(.+)", key)
    if m:
        return _map_transformer_layer(
            m.group(2), v, params, stats, [f"transformer_{m.group(1)}"]
        )
    m = re.fullmatch(r"post_norm\.(\d+)\.(\w+)", key)
    if m:
        return _emit_norm(params, stats, [f"post_norm_{m.group(1)}"], m.group(2), v)
    m = re.fullmatch(r"head_layers\.(\d+)\.head\.([03])\.(\w+)", key)
    if m:  # 128-dim head: 1x1 convs (Dense here) at Sequential indices 0, 3
        idx = {"0": "0", "3": "1"}[m.group(2)]
        return _emit_conv1x1_as_dense(
            params, [f"head_{m.group(1)}", f"Conv_{idx}"], m.group(3), v
        )
    m = re.fullmatch(r"frame_feat_refined_proj_layers\.(\d+)\.([03])\.(\w+)", key)
    if m:
        idx = {"0": "0", "3": "1"}[m.group(2)]
        return _emit_conv1x1_as_dense(
            params, [f"ff_refined_proj_{m.group(1)}_{idx}"], m.group(3), v
        )
    m = re.fullmatch(r"conv_heatmap\.(\w+)", key)
    if m:
        return _emit_conv1x1_as_dense(params, ["conv_heatmap"], m.group(1), v)
    m = re.fullmatch(r"conv_heatmap_layers\.(\d+)\.([0257])\.(\w+)", key)
    if m:
        idx = {"0": "0", "2": "1", "5": "2", "7": "3"}[m.group(2)]
        if idx == "0":  # leading 3x3 stride-2 conv stays a conv
            return _emit_conv(params, [f"conv_hm_{m.group(1)}_{idx}"], m.group(3), v)
        return _emit_conv1x1_as_dense(
            params, [f"conv_hm_{m.group(1)}_{idx}"], m.group(3), v
        )
    raise KeyError(key)


def _map_conv_stack_head(key: str, v, params, base: List[str]):
    """MVFEX-level conv heatmap heads (Sequential indices 0,2,4,7,9)."""
    m = re.fullmatch(r"([02479])\.(\w+)", key)
    if m:
        idx = {"0": "0", "2": "1", "4": "2", "7": "3", "9": "4"}[m.group(1)]
        return _emit_conv(params, base + [f"Conv_{idx}"], m.group(2), v)
    raise KeyError(key)


def _map_pose3d(key: str, v, params, stats, base: List[str], cfg):
    m = re.fullmatch(r"feat_proj\.(\w+)", key)
    if m:
        return _emit_conv1x1_as_dense(params, base + ["feat_proj"], m.group(1), v)
    m = re.fullmatch(r"layers\.(\d+)\.(.+)", key)
    if m:
        return _map_transformer_layer(
            m.group(2), v, params, stats, base + [f"transformer_{m.group(1)}"]
        )
    m = re.fullmatch(r"post_norm\.(\d+)\.(\w+)", key)
    if m:
        return _emit_norm(params, stats, base + [f"post_norm_{m.group(1)}"], m.group(2), v)
    m = re.fullmatch(r"query_gen_mlp\.([024])\.(\w+)", key)
    if m:
        idx = {"0": "0", "2": "1", "4": "2"}[m.group(1)]
        return _emit_linear(params, base + [f"query_gen_{idx}"], m.group(2), v)
    m = re.fullmatch(r"conv_frame_feat\.([0257])\.(\w+)", key)
    if m:
        idx = {"0": "0", "2": "1", "5": "2", "7": "3"}[m.group(1)]
        return _emit_conv(params, base + [f"conv_ff_{idx}"], m.group(2), v)
    m = re.fullmatch(r"conv_heatmap_(front_left|front_right)\.([03])\.(\w+)", key)
    if m:  # use_mlp_heatmap heads, front views
        view = {"front_left": 0, "front_right": 1}[m.group(1)]
        idx = {"0": "0", "3": "1"}[m.group(2)]
        return _emit_conv(
            params, base + [f"conv_heatmap_view{view}_{idx}"], m.group(3), v
        )
    m = re.fullmatch(r"conv_frame_feat_(back_left|back_right)\.([03])\.(\w+)", key)
    if m:  # (sic) reference names the back heatmap convs "conv_frame_feat_*"
        view = {"back_left": 2, "back_right": 3}[m.group(1)]
        idx = {"0": "0", "3": "1"}[m.group(2)]
        return _emit_conv(
            params, base + [f"conv_heatmap_view{view}_{idx}"], m.group(3), v
        )
    # mlp_pred: inner blocks "i.0.weight", final "N.weight"
    m = re.fullmatch(r"mlp_pred\.(\d+)\.0\.(\w+)", key)
    if m:
        return _emit_linear(params, base + [f"mlp_pred_{m.group(1)}"], m.group(2), v)
    m = re.fullmatch(r"mlp_pred\.(\d+)\.(\w+)", key)
    if m:
        return _emit_linear(params, base + ["mlp_pred_out"], m.group(2), v)
    # reg_mlp: Sequential(Linear, GELU)*k + Linear; torch index 2i; last = out.
    # The final Linear is recognizable by its 3-dim output, so no cfg needed.
    m = re.fullmatch(r"reg_mlp\.(\d+)\.(\d+)\.(\w+)", key)
    if m:
        layer, seq, name = int(m.group(1)), int(m.group(2)), m.group(3)
        is_out = v.shape[0] == 3
        target = f"reg_mlp_{layer}_out" if is_out else f"reg_mlp_{layer}_{seq // 2}"
        return _emit_linear(params, base + [target], name, v)
    raise KeyError(key)


# ---------------------------------------------------------------------------
# top-level converters
# ---------------------------------------------------------------------------


def _stack_refiners(per_view: List[dict]) -> dict:
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_view)


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    task_name: str,
    num_views: int = 4,
    pose3d_cfg=None,
) -> dict:
    """Convert a stripped torch state dict to flax variables for the task's
    network ('heatmap' | 'heatmap_mvf_ex' | 'pose_3d_mvf_ex')."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    refiner_order = {
        2: REFINER_ORDER_2, 3: REFINER_ORDER_3, 4: REFINER_ORDER_4
    }[num_views]

    def convert_mvfex(prefix: str, base: List[str]):
        refiner_trees = [({}, {}) for _ in refiner_order]
        for key, v in sd.items():
            if not key.startswith(prefix):
                continue
            k = key[len(prefix):]
            if k.startswith("heatmap_estimator_stereo_front."):
                _map_heatmap_net(
                    k[len("heatmap_estimator_stereo_front."):], v, params, stats,
                    base + ["heatmap_estimator_stereo_front"],
                )
            elif k.startswith("heatmap_estimator_stereo_back."):
                _map_heatmap_net(
                    k[len("heatmap_estimator_stereo_back."):], v, params, stats,
                    base + ["heatmap_estimator_stereo_back"],
                )
            elif k.startswith("conv_heatmap_layers_stereo_front."):
                _map_conv_stack_head(
                    k[len("conv_heatmap_layers_stereo_front."):], v, params,
                    base + ["conv_heatmap_head_front"],
                )
            elif k.startswith("conv_heatmap_layers_stereo_back."):
                _map_conv_stack_head(
                    k[len("conv_heatmap_layers_stereo_back."):], v, params,
                    base + ["conv_heatmap_head_back"],
                )
            else:
                for i, rname in enumerate(refiner_order):
                    if k.startswith(rname + "."):
                        _map_refiner(k[len(rname) + 1:], v, *refiner_trees[i])
                        break
                else:
                    raise KeyError(key)
        rp = _stack_refiners([t[0] for t in refiner_trees])
        _set(params, base + ["refiners"], rp)
        if any(t[1] for t in refiner_trees):
            _set(stats, base + ["refiners"], _stack_refiners([t[1] for t in refiner_trees]))

    if task_name == "heatmap":
        for key, v in sd.items():
            _map_heatmap_net(key, v, params, stats, [])
    elif task_name == "heatmap_mvf_ex":
        convert_mvfex("", [])
    elif task_name == "pose_3d_mvf_ex":
        convert_mvfex("heatmap_estimator.", ["heatmap_estimator"])
        for key, v in sd.items():
            if key.startswith("pose3d_estimator."):
                _map_pose3d(
                    key[len("pose3d_estimator."):], v, params, stats,
                    ["pose3d_estimator"], pose3d_cfg,
                )
    else:
        raise ValueError(task_name)

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def verify_against(variables: dict, target: dict, path="") -> List[str]:
    """Shape-compare converted variables vs the model-initialized tree;
    returns a list of mismatch descriptions (empty == exact match)."""
    errs = []
    keys_a, keys_b = set(variables), set(target)
    for k in sorted(keys_a - keys_b):
        errs.append(f"extra {path}/{k}")
    for k in sorted(keys_b - keys_a):
        errs.append(f"missing {path}/{k}")
    for k in sorted(keys_a & keys_b):
        a, b = variables[k], target[k]
        if isinstance(a, dict) and isinstance(b, dict):
            errs.extend(verify_against(a, b, f"{path}/{k}"))
        elif isinstance(a, dict) != isinstance(b, dict):
            errs.append(f"kind mismatch {path}/{k}")
        elif tuple(np.shape(a)) != tuple(np.shape(b)):
            errs.append(
                f"shape mismatch {path}/{k}: {np.shape(a)} vs {np.shape(b)}"
            )
    return errs


def convert_torchvision_resnet18(sd: Dict[str, np.ndarray]) -> dict:
    """torchvision resnet18 state dict -> flax ``ResNet18`` module variables.

    Torchvision key grammar (models.resnet18): ``conv1``, ``bn1``,
    ``layer{1..4}.{0,1}.{conv1,bn1,conv2,bn2}``, optional
    ``layer{2,3,4}.0.downsample.{0,1}`` and the classifier ``fc`` (dropped --
    the reference keeps only the feature stages, resnet.py:16-21).
    Returns ``{"params": ..., "batch_stats": ...}`` shaped for the
    ``resnet`` subtree of :class:`egorear_tpu.models.backbone.BackboneWithFPN`.
    """
    params: dict = {}
    stats: dict = {}
    for key, v in sd.items():
        v = np.asarray(v)
        if key.startswith("fc."):
            continue
        m = re.fullmatch(r"conv1\.(\w+)", key)
        if m:
            _emit_conv(params, ["conv1"], m.group(1), v)
            continue
        m = re.fullmatch(r"bn1\.(\w+)", key)
        if m:
            _emit_norm(params, stats, ["bn1"], m.group(1), v)
            continue
        m = re.fullmatch(r"layer(\d)\.(\d)\.(.+)", key)
        if m:
            _map_basic_block(
                m.group(3), v, params, stats,
                [f"layer{m.group(1)}_{m.group(2)}"],
            )
            continue
        raise KeyError(f"unrecognized torchvision key {key}")
    return {"params": params, "batch_stats": stats}


def load_imagenet_resnet18(path: Optional[str] = None) -> dict:
    """Locate + convert ImageNet-pretrained resnet18 weights.

    The reference initializes its backbone from torchvision's pretrained
    resnet18 whenever ``use_imagenet_pretrain`` is set (resnet.py:31-41; all
    12 shipped configs set it). This host cannot download weights, so they
    are resolved from, in order: an explicit ``path``, the
    ``EGOREAR_IMAGENET_RESNET18`` env var, or the standard torch hub cache
    (``~/.cache/torch/hub/checkpoints/resnet18-*.pth``). Accepts a raw torch
    state dict (``.pth``/``.pt``) or an ``.npz`` with the same keys. Raises
    ``FileNotFoundError`` if none is available -- silently training from
    scratch under a pretrain flag would be a parity bug.
    """
    import glob
    import os

    candidates = []
    if path:
        candidates.append(path)
    env = os.environ.get("EGOREAR_IMAGENET_RESNET18")
    if env:
        candidates.append(env)
    hub = os.path.expanduser("~/.cache/torch/hub/checkpoints")
    candidates.extend(sorted(glob.glob(os.path.join(hub, "resnet18-*.pth"))))

    found = next((c for c in candidates if os.path.exists(c)), None)
    if found is None:
        raise FileNotFoundError(
            "use_imagenet_pretrain=true but no resnet18 ImageNet weights "
            "found. Provide them via the EGOREAR_IMAGENET_RESNET18 env var "
            "or ~/.cache/torch/hub/checkpoints/resnet18-*.pth (torchvision's "
            "cache location), or set "
            "encoder_cfg.resnet_cfg.use_imagenet_pretrain=false."
        )
    if found.endswith(".npz"):
        sd = dict(np.load(found))
    else:
        import torch

        raw = torch.load(found, map_location="cpu", weights_only=False)
        sd = raw.get("state_dict", raw)
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in sd.items()}
    logger.info(f"loading ImageNet resnet18 init from {found}")
    return convert_torchvision_resnet18(sd)


def graft_imagenet_backbones(variables: dict, pretrained: dict) -> dict:
    """Graft ImageNet resnet weights into every ``encoder/resnet`` subtree.

    Walks ``variables`` (params + batch_stats) for nodes named ``encoder``
    holding a ``resnet`` child and replaces that child, leaf-verified by
    shape. Covers the stage-1 net and both stereo estimators inside the
    MVFex/pose3d cascades in one pass.
    """
    import jax
    import jax.numpy as jnp

    cols = {"params": "params", "batch_stats": "batch_stats"}
    n_grafted = 0

    def walk(node, src_col):
        nonlocal n_grafted
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "encoder" and isinstance(v, dict) and "resnet" in v:
                errs = verify_against(pretrained[src_col], v["resnet"])
                if errs:
                    raise ValueError(
                        "ImageNet resnet18 weights do not match the model's "
                        f"resnet subtree:\n" + "\n".join(errs[:10])
                    )
                # b may be a tracer (task.init runs under jit): only read
                # its dtype; the pretrained arrays become jit constants.
                out[k] = dict(v, resnet=jax.tree.map(
                    lambda a, b: jnp.asarray(a, dtype=b.dtype),
                    pretrained[src_col], v["resnet"],
                ))
                n_grafted += 1
            else:
                out[k] = walk(v, src_col)
        return out

    new_vars = {}
    for col, src_col in cols.items():
        new_vars[col] = (
            walk(variables[col], src_col) if col in variables
            else variables.get(col)
        )
    new_vars.update({k: v for k, v in variables.items() if k not in cols})
    if n_grafted == 0:
        raise ValueError("no encoder/resnet subtree found to graft into")
    logger.info(f"grafted ImageNet resnet18 into {n_grafted} backbone(s)")
    return {k: v for k, v in new_vars.items() if v is not None}


def convert_lightning_ckpt(path: str, target_variables: dict, task_name: str,
                           num_views: Optional[int] = None, pose3d_cfg=None) -> dict:
    """Load a reference ``.ckpt`` and convert to flax variables, verified
    against ``target_variables`` (strict, like the reference's
    load_state_dict(strict=True))."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = strip_prefixes({k: v.numpy() if hasattr(v, "numpy") else v
                         for k, v in sd.items()})
    if num_views is None:
        num_views = 4 if any("back_left" in k for k in sd) else (
            3 if any("refiner_back." in k for k in sd) else 2
        )
    variables = convert_state_dict(sd, task_name, num_views, pose3d_cfg)
    errs = verify_against(variables, {k: v for k, v in target_variables.items()
                                      if k in variables})
    if errs:
        raise ValueError(
            f"converted checkpoint does not match target ({len(errs)} issues):\n"
            + "\n".join(errs[:40])
        )
    return variables

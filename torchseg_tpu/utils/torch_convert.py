"""Torch checkpoint -> Flax params grafting.

Replaces two reference components: ``utils/pyt_utils.load_model`` (non-strict
state_dict load with missing/unexpected-key logging, pyt_utils.py:42-79) and
the role of ``tools/gluon2pytorch.py`` (external pretrained weights into our
format).

The torch tensors are read with ``torch.load`` on CPU — torch is only a file
reader here; everything else is numpy.  Conv kernels transpose OIHW -> HWIO;
depthwise convs (C,1,kh,kw) -> (kh,kw,1,C); BN weight/bias -> scale/bias and
running_mean/var -> batch_stats mean/var.
"""

import re
from typing import Dict, Tuple

import numpy as np

from ..engine.logger import get_logger


def _to_numpy_state_dict(path_or_dict) -> Dict[str, np.ndarray]:
    if isinstance(path_or_dict, dict):
        sd = path_or_dict
    else:
        import torch

        sd = torch.load(path_or_dict, map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        if "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        try:
            out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        except Exception:
            continue
    return out


def resnet_key_map(torch_key: str) -> Tuple[Tuple[str, ...], str]:
    """Map a torch ResNet state_dict key to (flax_path, kind).

    kind: 'conv' | 'bn_param' | 'bn_stat' | 'skip'.
    Handles classic and deep (v1c) stems, layers, and downsample shortcuts.
    """
    k = torch_key
    if k.startswith("fc."):
        return (), "skip"

    # deep stem Sequential: conv1.{0,3,6} convs; conv1.{1,4} bns
    m = re.fullmatch(r"conv1\.(\d)\.(.+)", k)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        conv_names = {0: "stem_conv1", 3: "stem_conv2", 6: "stem_conv3"}
        bn_names = {1: "stem_bn1", 4: "stem_bn2"}
        if idx in conv_names:
            return (conv_names[idx],), "conv"
        if idx in bn_names:
            return (bn_names[idx],), _bn_kind(rest)
        return (), "skip"

    if k.startswith("conv1."):
        return ("conv1",), "conv"
    if k.startswith("bn1."):
        return ("bn1",), _bn_kind(k.split(".", 1)[1])

    m = re.fullmatch(r"layer(\d)\.(\d+)\.(.+)", k)
    if m:
        layer, block, rest = m.group(1), m.group(2), m.group(3)
        prefix = f"layer{layer}_{block}"
        m2 = re.fullmatch(r"conv(\d)\.weight", rest)
        if m2:
            return (prefix, f"conv{m2.group(1)}"), "conv"
        m2 = re.fullmatch(r"bn(\d)\.(.+)", rest)
        if m2:
            return (prefix, f"bn{m2.group(1)}"), _bn_kind(m2.group(2))
        m2 = re.fullmatch(r"downsample\.0\.weight", rest)
        if m2:
            return (prefix, "downsample_conv"), "conv"
        m2 = re.fullmatch(r"downsample\.1\.(.+)", rest)
        if m2:
            return (prefix, "downsample_bn"), _bn_kind(m2.group(1))
    return (), "skip"


def _bn_kind(rest: str) -> str:
    if rest in ("weight", "bias"):
        return "bn_param"
    if rest in ("running_mean", "running_var"):
        return "bn_stat"
    return "skip"  # num_batches_tracked


def convert_resnet_state_dict(sd: Dict[str, np.ndarray]):
    """torch ResNet state_dict -> (params, batch_stats) nested dicts in our
    naming scheme."""
    params, stats = {}, {}
    for k, v in sd.items():
        path, kind = resnet_key_map(k)
        if kind == "skip":
            continue
        if kind == "conv":
            _set(params, path + ("kernel",), np.transpose(v, (2, 3, 1, 0)))
        elif kind == "bn_param":
            leaf = "scale" if k.endswith("weight") else "bias"
            _set(params, path + (leaf,), v)
        elif kind == "bn_stat":
            leaf = "mean" if k.endswith("running_mean") else "var"
            _set(stats, path + (leaf,), v)
    return params, stats


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def graft(target_tree, source_tree, log=True):
    """Non-strict copy of source leaves into target (same path + shape);
    logs missing/unexpected keys like pyt_utils.load_model:42-79."""
    logger = get_logger()
    tgt = _flatten(target_tree)
    src = _flatten(source_tree)
    grafted, mismatched = {}, []
    for path, v in src.items():
        if path in tgt:
            if tuple(tgt[path].shape) == tuple(v.shape):
                grafted[path] = v
            else:
                mismatched.append((path, v.shape, tgt[path].shape))
    missing = [p for p in tgt if p not in grafted]
    unexpected = [p for p in src if p not in tgt]
    if log:
        if missing:
            logger.info("graft: %d target leaves not in checkpoint "
                        "(first: %s)", len(missing), missing[:3])
        if unexpected:
            logger.info("graft: %d checkpoint leaves unused (first: %s)",
                        len(unexpected), unexpected[:3])
        if mismatched:
            logger.warning("graft: %d shape mismatches: %s", len(mismatched),
                           mismatched[:3])

    def rebuild(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rebuild(v, prefix + (k,))
            else:
                out[k] = (
                    np.asarray(grafted[prefix + (k,)], dtype=v.dtype)
                    if prefix + (k,) in grafted
                    else v
                )
        return out

    return rebuild(target_tree)


def graft_torch_checkpoint(path: str, params, batch_stats=None,
                           subtree: str = "backbone"):
    """Load a torch ResNet/Xception backbone .pth and graft it under
    params[subtree] (and batch_stats[subtree] if given).  Returns new params
    (and stats when provided)."""
    sd = _to_numpy_state_dict(path)
    src_params, src_stats = convert_resnet_state_dict(sd)
    new_params = dict(params)
    new_params[subtree] = graft(params[subtree], src_params)
    if batch_stats is not None:
        new_stats = dict(batch_stats)
        new_stats[subtree] = graft(batch_stats[subtree], src_stats)
        return new_params, new_stats
    return new_params

"""Inference-time BatchNorm folding.

For serving, every eval-mode BatchNorm is an affine ``y*s + b`` with
``s = scale/sqrt(var+eps)``, ``b = bias - mean*s``.  Folding ``s`` into the
preceding conv's kernel (and the constant into the BN bias, leaving the BN
itself an identity) removes the per-channel multiply from the compiled
forward: XLA cannot do this itself because parameters are runtime arguments,
not compile-time constants.

Training must keep BN live (batch statistics), so this is applied only on
the :class:`..predict.Predictor` load path (reference has no analog — its
eval scripts run torch BNs in eval mode every call).

Pairing is by the package's uniform naming convention: ``bn`` follows
``pointwise`` (SeparableConvBNAct) or ``conv`` (ConvBNAct), ``bn{i}``
follows ``conv{i}`` (ResNet blocks, VGG), ``downsample_bn`` follows
``downsample_conv``.  Unpaired BNs are left untouched (still correct,
just not folded).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _conv_sibling(bn_name: str, parent: dict) -> str | None:
    if bn_name == "bn":
        for cand in ("pointwise", "conv"):
            if cand in parent:
                return cand
        return None
    if bn_name == "downsample_bn":
        return "downsample_conv" if "downsample_conv" in parent else None
    if bn_name.startswith("bn") and f"conv{bn_name[2:]}" in parent:
        return f"conv{bn_name[2:]}"
    return None


def fold_batchnorm(params: Any, batch_stats: Any, eps: float = 1e-5):
    """Return ``(params, batch_stats)`` copies with every pairable conv+BN
    folded for inference.  ``eps`` must match the model's BatchNorm epsilon
    (1e-5 everywhere in this package).  Returns the number of folded BNs as
    the third element for observability."""
    import flax
    import jax

    # tree_map rebuilds fresh container dicts (leaves shared until replaced),
    # so in-place mutation below cannot alias the caller's trees
    params = jax.tree_util.tree_map(lambda x: x, flax.core.unfreeze(params))
    batch_stats = jax.tree_util.tree_map(
        lambda x: x, flax.core.unfreeze(batch_stats))
    n_folded = _walk(params, batch_stats, eps)
    return params, batch_stats, n_folded


def _walk(p: Any, s: Any, eps: float) -> int:
    if not isinstance(p, dict) or not isinstance(s, dict):
        return 0
    n = 0
    for name in list(p.keys()):
        child = p[name]
        stats = s.get(name)
        if (
            isinstance(child, dict)
            and "scale" in child
            and "bias" in child
            and isinstance(stats, dict)
            and "mean" in stats
            and "var" in stats
        ):
            conv_name = _conv_sibling(name, p)
            if conv_name is None:
                continue
            conv = p[conv_name]
            kernel = conv.get("kernel") if isinstance(conv, dict) else None
            scale_vec = np.asarray(child["scale"], np.float64)
            if kernel is None or kernel.shape[-1] != scale_vec.shape[0]:
                continue
            mul = scale_vec / np.sqrt(np.asarray(stats["var"], np.float64) + eps)
            conv["kernel"] = np.asarray(
                np.asarray(kernel, np.float64) * mul, np.float32)
            shift = np.asarray(child["bias"], np.float64) - np.asarray(
                stats["mean"], np.float64) * mul
            if "bias" in conv:  # fold an existing conv bias through the BN
                shift = shift + np.asarray(conv["bias"], np.float64) * mul
                conv["bias"] = np.zeros_like(np.asarray(conv["bias"], np.float32))
            # Leave the BN as an exact identity: (y - 0)/sqrt((1-eps)+eps)*1 + shift
            child["scale"] = np.ones_like(scale_vec, dtype=np.float32)
            child["bias"] = np.asarray(shift, np.float32)
            stats["mean"] = np.zeros_like(scale_vec, dtype=np.float32)
            stats["var"] = np.full_like(scale_vec, 1.0 - eps, dtype=np.float32)
            n += 1
        elif isinstance(child, dict):
            n += _walk(child, s.get(name, {}), eps)
    return n

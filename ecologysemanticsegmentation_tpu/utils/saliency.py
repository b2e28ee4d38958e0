"""Grad-CAM-style saliency via jax.grad.

Capability equivalent of reference ``utils/grad_cam.py:1-71`` (pytorch_grad_cam
``GradCAM`` over ``model.decoder`` with a per-organ
``SemanticSegmentationTarget``), done the JAX way: capture an intermediate
activation with ``capture_intermediates``, weight its channels by the spatial
mean of the target's input-gradient energy, and upsample — a
gradient×activation CAM, returned as pure arrays (the reference displays via
matplotlib)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def grad_cam(
    model,
    variables,
    images: jax.Array,
    organ_index: int,
    mask: jax.Array | None = None,
    layer_filter: Callable[[str], bool] = lambda name: "aspp" in name,
):
    """(B, H, W) heatmaps in [0,1] for ``organ_index`` at input resolution.

    ``layer_filter`` selects the intermediate by module path; the default is
    the ASPP output — the DeepLabV3+ analog of the reference's
    ``model.decoder`` target layer.
    """
    _, inter = model.apply(
        variables, images, train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    paths = [p for p in _flatten_paths(inter["intermediates"]) if layer_filter("/".join(p))]
    assert paths, "no intermediate matched layer_filter"
    act = _get_path(inter["intermediates"], paths[-1])
    if isinstance(act, tuple):
        act = act[0]
    act = act.astype(jnp.float32)

    def target_fn(imgs):
        out = model.apply(variables, imgs, train=False)
        probs = jax.nn.sigmoid(out.astype(jnp.float32))
        sel = probs[..., organ_index]
        if mask is not None:
            sel = sel * mask
        return jnp.sum(sel)

    input_grads = jax.grad(target_fn)(images.astype(jnp.float32))
    saliency = jnp.sum(jnp.abs(input_grads), axis=-1)

    weights = jnp.mean(act, axis=(1, 2), keepdims=True)
    cam = jnp.maximum(jnp.sum(act * weights, axis=-1), 0.0)

    from ..ops.resize import resize_bilinear

    cam_up = resize_bilinear(cam[..., None], images.shape[1:3])[..., 0]
    heat = cam_up * saliency
    denom = jnp.max(heat, axis=(1, 2), keepdims=True)
    return heat / jnp.maximum(denom, 1e-8)


def _flatten_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += _flatten_paths(v, prefix + (k,))
    else:
        out.append(prefix)
    return out


def _get_path(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def show_cam_on_image(image: np.ndarray, heatmap: np.ndarray, alpha: float = 0.5):
    """Overlay a [0,1] heatmap on an RGB [0,1] image."""
    import cv2

    h8 = (np.asarray(heatmap) * 255).astype(np.uint8)
    colored = cv2.applyColorMap(h8, cv2.COLORMAP_JET)[:, :, ::-1] / 255.0
    return np.clip(image * (1 - alpha) + colored * alpha, 0, 1)

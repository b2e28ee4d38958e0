"""Post-training int8 quantization for the serving path.

v5e MXUs run int8 x int8 -> int32 at twice the bf16 rate; measured on this
chip the serving path's conv population speeds up 1.24-1.71x per conv with
the full requant epilogue included (experiments/int8_conv_microbench2.py).
Training stays bf16 (int8 training convs measured neutral-or-worse,
RESULTS.md round 2) — this module is consumed only by
:class:`..predict.Predictor` with ``int8=True``.

Scheme (standard symmetric PTQ):

* **weights** per-output-channel: ``s_w[c] = max|K[..., c]| / 127``,
  ``K8 = round(K / s_w)`` — computed offline from the BN-*folded* kernels.
* **activations** per-tensor: ``s_in = max|x| / 127`` observed over
  calibration batches, collected by running the bf16 forward under a
  :func:`flax.linen.intercept_methods` interceptor that ``sow``\\ s each
  conv input's absmax (no model-code changes).
* serving: ``x8 = clip(round(x / s_in))``; int8 conv accumulates in int32;
  dequant multiplies by the folded ``s_in * s_w[c]`` vector.

Convs are intercepted by module *path*, so the scheme covers every model in
the zoo without per-model code.  Skipped (stay bf16): depthwise/grouped
convs (VPU shift-add path, no MXU int8 win), convs with fewer than
``MIN_CHANNELS`` in or out channels (stem / segmentation head — lane
padding eats the win and the ends of the network are the
quantization-sensitive parts).

The reference has no quantization story; this is a TPU-serving addition.
"""

from __future__ import annotations

from typing import Any

import numpy as np

MIN_CHANNELS = 16


def _is_plain_conv(mod) -> bool:
    from flax import linen as nn

    return type(mod) is nn.Conv and mod.feature_group_count == 1


def _is_pointwise(mod) -> bool:
    from .models.common import _PointwiseConv

    return type(mod) is _PointwiseConv


def _parts(x) -> tuple:
    return x if isinstance(x, (tuple, list)) else (x,)


def calibrate_act_scales(model, variables, batches) -> dict[tuple, list[float]]:
    """Observe per-conv-input absmax over ``batches`` (eval-mode forwards).

    Returns ``{module_path: [s_in per input part]}`` — one scale for a plain
    ``nn.Conv``, one per virtual-concat part for ``_PointwiseConv``.  Runs
    jitted (the sow reductions compile into the forward).
    """
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and (
            _is_plain_conv(mod) or _is_pointwise(mod)
        ):
            for i, part in enumerate(_parts(args[0])):
                mod.sow(
                    "quant_stats", f"absmax{i}",
                    jnp.max(jnp.abs(part.astype(jnp.float32))),
                    init_fn=lambda: jnp.zeros((), jnp.float32),
                    reduce_fn=jnp.maximum,
                )
        return next_fn(*args, **kwargs)

    @jax.jit
    def run(images):
        with nn.intercept_methods(interceptor):
            _, st = model.apply(variables, images, train=False,
                                mutable=["quant_stats"])
        return st["quant_stats"]

    agg: dict[tuple, list[float]] = {}
    for images in batches:
        stats = jax.device_get(run(images))
        flat = _flatten(stats)
        for (path, name), absmax in flat.items():
            i = int(name[len("absmax"):])
            cur = agg.setdefault(path, [])
            while len(cur) <= i:
                cur.append(0.0)
            # sow wraps values in a tuple per call site
            v = float(np.max(np.asarray(absmax)))
            cur[i] = max(cur[i], v)
    return {p: [max(v, 1e-12) / 127.0 for v in vals] for p, vals in agg.items()}


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(_flatten(v, prefix + (k,)))
            else:
                out[(prefix, k)] = v
    return out


def _lookup(params, path):
    node = params
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node if isinstance(node, dict) else None


def build_qparams(params, act_scales: dict[tuple, list[float]]):
    """Quantize each calibrated conv's (BN-folded) kernel.

    Returns ``{path: {"k8": [int8 kernel per part], "dq": [f32 (cout,) per
    part], "bias": f32 or None}}``.  Parts split a ``_PointwiseConv``'s
    virtual-concat kernel on its input axis; a plain conv is one part.
    Convs with < MIN_CHANNELS in or out channels are dropped (stay bf16).
    """
    out = {}
    for path, scales in act_scales.items():
        leaf = _lookup(params, path)
        if leaf is None or "kernel" not in leaf:
            continue
        kernel = np.asarray(leaf["kernel"], np.float32)
        cin, cout = kernel.shape[-2], kernel.shape[-1]
        if cin < MIN_CHANNELS or cout < MIN_CHANNELS:
            continue
        # One kernel per path even for a _PointwiseConv's virtual concat
        # (its (1, 1, sum(parts), F) kernel is sliced on the input axis at
        # call time — per-channel s_w over the whole kernel is shared).
        s_w = np.maximum(np.abs(kernel).reshape(-1, cout).max(axis=0),
                         1e-12) / 127.0
        k8 = np.clip(np.round(kernel / s_w), -127, 127).astype(np.int8)
        bias = np.asarray(leaf["bias"], np.float32) if "bias" in leaf else None
        out[path] = {"k8": k8, "dq": s_w.astype(np.float32), "bias": bias,
                     "act_scales": [float(s) for s in scales]}
    return out


def _quantize_input(x, s_in: float):
    import jax.numpy as jnp

    return jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / s_in)), -127.0, 127.0
    ).astype(jnp.int8)


def serving_interceptor(qparams):
    """An ``nn.intercept_methods`` interceptor replacing calibrated convs
    with int8 MXU convs (weights baked as constants)."""
    import jax
    import jax.numpy as jnp

    def _norm2(v, default):
        v = default if v is None else v
        return (v, v) if isinstance(v, int) else tuple(v)

    def _quant_conv(mod, x, q):
        s_in = q["act_scales"][0]
        k8 = jnp.asarray(q["k8"])
        dq = jnp.asarray(q["dq"] * np.float32(s_in))
        padding = mod.padding
        if isinstance(padding, int):
            pad = [(padding, padding)] * 2
        elif isinstance(padding, str):
            pad = padding
        else:
            pad = [(p, p) if isinstance(p, int) else tuple(p)
                   for p in padding]
        y = jax.lax.conv_general_dilated(
            _quantize_input(x, s_in), k8, _norm2(mod.strides, 1), pad,
            rhs_dilation=_norm2(mod.kernel_dilation, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * dq
        if mod.use_bias and q["bias"] is not None:
            y = y + jnp.asarray(q["bias"])
        return y.astype(mod.dtype)

    def _quant_pointwise(mod, x, q):
        parts = _parts(x)
        k8 = jnp.asarray(q["k8"][0, 0])  # (sum(Cin), F) int8
        s_w = q["dq"]
        off, acc = 0, None
        for i, part in enumerate(parts):
            c = part.shape[-1]
            s_in = q["act_scales"][i]
            p8 = _quantize_input(part, s_in)
            y32 = jax.lax.dot_general(
                p8, k8[off:off + c],
                dimension_numbers=(((part.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y32.astype(jnp.float32) * jnp.asarray(s_w * np.float32(s_in))
            acc = y if acc is None else acc + y
            off += c
        if q["bias"] is not None:
            acc = acc + jnp.asarray(q["bias"])
        return acc.astype(mod.dtype)

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__":
            q = qparams.get(mod.path)
            if q is not None:
                if _is_plain_conv(mod):
                    return _quant_conv(mod, args[0], q)
                if _is_pointwise(mod):
                    return _quant_pointwise(mod, args[0], q)
        return next_fn(*args, **kwargs)

    return interceptor


def quantize_for_serving(model, variables, calibration_batches):
    """One-call PTQ: calibrate on ``calibration_batches`` (bf16 forwards),
    quantize kernels, and return ``(apply_fn, n_quantized)`` where
    ``apply_fn(images) -> model output`` runs the int8 forward with all
    weights (f32 residue + int8 kernels + scales) baked as constants."""
    from flax import linen as nn

    scales = calibrate_act_scales(model, variables, calibration_batches)
    qparams = build_qparams(variables["params"], scales)
    ic = serving_interceptor(qparams)

    def apply_fn(images):
        with nn.intercept_methods(ic):
            return model.apply(variables, images, train=False)

    return apply_fn, len(qparams)

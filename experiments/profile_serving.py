"""Per-op TPU profile of the SERVING forward (bf16 baked + int8 PTQ).

The train step's profile treatment applied to serving: where do the
11.4 ms (int8) / 15.8 ms (bf16) go, and what's left after the convs are
quantized?  Captures both programs in one trace; parses hlo_stats offline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/profile_serving.py
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

TRACE_DIR = "/tmp/serving_trace"
BATCH, IMG, ORGANS = 128, 256, 3


def capture():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecologysemanticsegmentation_tpu.models import build_model, fold_batchnorm
    from ecologysemanticsegmentation_tpu.quant import quantize_for_serving
    from ecologysemanticsegmentation_tpu.train import create_train_state, make_optimizer

    model = build_model("deeplabv3plus", num_classes=ORGANS, encoder_name="resnet34")
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3),
                               make_optimizer())
    p, bs, _ = fold_batchnorm(state.params, state.batch_stats)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, p),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, bs)}
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32)
    qfn, n_q = quantize_for_serving(model, variables, [x.astype(jnp.bfloat16)])
    print(f"quantized {n_q} convs", flush=True)

    @jax.jit
    def f_bf(images):
        out = model.apply(variables, images.astype(jnp.bfloat16), train=False)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    @jax.jit
    def f_q(images):
        return jax.nn.sigmoid(qfn(images.astype(jnp.bfloat16)).astype(jnp.float32))

    for _ in range(3):
        a = f_bf(x); b = f_q(x)
    float(a[0, 0, 0, 0]); float(b[0, 0, 0, 0])

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            a = f_bf(x)
        float(a[0, 0, 0, 0])
        for _ in range(5):
            b = f_q(x)
        float(b[0, 0, 0, 0])
    print("trace captured", flush=True)


def parse():
    paths = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane.pb under {TRACE_DIR}"
    path = paths[-1]
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([path], "hlo_stats", {"tqx": "out:json;"})
    out = "/tmp/serving_hlo_stats.json"
    with open(out, "wb" if isinstance(data, bytes) else "w") as f:
        f.write(data)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    if "--parse-only" not in sys.argv:
        capture()
    parse()

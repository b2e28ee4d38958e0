"""Per-op TPU profile of the flagship train step (VERDICT round-1: replace
XLA cost-analysis roofline *claims* with a jax.profiler *measurement*).

Captures a jax.profiler trace of a few steady-state train steps, then parses
the xplane.pb offline with tensorboard-plugin-profile / xprof and dumps the
top ops by self-time to /tmp/profile_ops.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/profile_step.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

TRACE_DIR = "/tmp/step_trace"
BATCH = int(os.environ.get("PROF_BATCH", 128))
IMG = 256
ORGANS = 3
# PROF_MODEL=vgg_unet profiles the zoo's VGG19-BN U-Net step instead
# (VERDICT r2 Next #3); default is the flagship's bench configuration.
MODEL = os.environ.get("PROF_MODEL", "deeplabv3plus")


def capture():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    lowres = MODEL == "deeplabv3plus"
    kw = {"upsample_head": False} if lowres else {}
    model = build_model(MODEL, num_classes=ORGANS, encoder_name="resnet34",
                        max_channels=256, **kw)
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    train_step = make_train_step(model, tx, augment=True, lowres_head=lowres)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32)),
    }
    gates3 = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    def step(state, i):
        return train_step(state, batch, jax.random.PRNGKey(i), 0.3, gates3, 3e-4, jitters)

    for i in range(3):
        state, metrics = step(state, i)
    float(metrics["loss"])  # force completion (block_until_ready lies on axon)

    with jax.profiler.trace(TRACE_DIR):
        for i in range(5):
            state, metrics = step(state, 10 + i)
        float(metrics["loss"])
    print("trace captured", flush=True)


def parse():
    """Offline xplane -> per-op table (no TensorBoard server needed)."""
    paths = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane.pb under {TRACE_DIR}"
    path = paths[-1]
    print("parsing", path, flush=True)

    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    params = {"tqx": "out:json;"}
    for tool in ("op_profile", "framework_op_stats", "hlo_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([path], tool, params)
        except Exception as e:  # tool coverage varies by version
            print(f"{tool}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        out = f"/tmp/profile_{tool}.json"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print(f"{tool}: wrote {out} ({len(data)} bytes)", flush=True)


if __name__ == "__main__":
    if "--parse-only" not in sys.argv:
        capture()
    parse()

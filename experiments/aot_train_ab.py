"""AOT train-step cache cold-vs-hit A/B on the real TPU (VERDICT r4 Next #2).

``train/aot.py`` exists because cold-starting the fused train step pays a
minutes-long client-side trace+lower on this one-CPU-core host (the module's
own serving A/B: 842.9 s from checkpoint vs 25.4 s from a StableHLO
artifact).  But the TRAIN cache has never been measured on the hardware it
was built for, and the hit path still re-enters the backend compile — which
through the axon relay may dominate, shrinking the win.  This measures it.

Each invocation runs ONE leg in a fresh process (the client-side lowering
cost being measured is per-process state):

  leg 1 (cold):  empty cache dir -> status "miss"   — build + export + first step
  leg 2 (hit):   same cache dir  -> status "hit"    — deserialize + first step
  leg 3 (none):  --no cache----  -> status "uncached" — plain build + first step

Reported per leg: wall to step-fn construction, wall to FIRST step complete
(the number a user restarting a run feels), wall of the SECOND step (sanity:
steady-state unaffected), artifact size.

Run (flagship shapes; ~minutes per leg):
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/aot_train_ab.py cold
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/aot_train_ab.py hit
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/aot_train_ab.py uncached
Env: AOT_DIR (default /tmp/aot_ab_cache), AB_BATCH (128), AB_IMG (256).
Appends JSON lines to experiments/aot_train_ab.jsonl.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

OUT = os.path.join(HERE, "aot_train_ab.jsonl")

BATCH = int(os.environ.get("AB_BATCH", 128))
IMG = int(os.environ.get("AB_IMG", 256))
ORGANS = 3


def main() -> None:
    leg = sys.argv[1] if len(sys.argv) > 1 else "cold"
    cache_dir = os.environ.get("AOT_DIR", "/tmp/aot_ab_cache")
    t_start = time.perf_counter()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state, make_optimizer, make_train_step)
    from ecologysemanticsegmentation_tpu.train.aot import cached_train_step

    print(f"devices: {jax.devices()}", flush=True)
    model = build_model("deeplabv3plus", num_classes=ORGANS,
                        encoder_name="resnet34", upsample_head=False)
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray(
            (rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32)),
    }
    gates3 = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)
    args = (state, batch, jax.random.PRNGKey(1), 0.3, gates3, 3e-4, jitters)
    # example args mirror train_multiclass.py's: ShapeDtypeStructs for the
    # traced scalar knobs (raw Python floats have no .shape to export at)
    example = (state, batch, jax.random.PRNGKey(0),
               jax.ShapeDtypeStruct((), jnp.float32),
               jax.ShapeDtypeStruct((3,), jnp.float32),
               jax.ShapeDtypeStruct((), jnp.float32),
               jax.ShapeDtypeStruct((2,), jnp.float32))
    config = {"model": "deeplabv3plus", "encoder": "resnet34", "img": IMG,
              "batch": BATCH, "organs": ORGANS, "augment": True,
              "lowres_head": True}

    build = lambda: make_train_step(model, tx, augment=True, lowres_head=True)
    t_setup = time.perf_counter()
    if leg == "uncached":
        step, status = build(), "uncached"
    else:
        step, status = cached_train_step(build, config, cache_dir, example)
    t_built = time.perf_counter()

    new_state, m = step(*args)
    loss = float(m["loss"])  # forces the host fetch (block_until_ready lies here)
    t_first = time.perf_counter()
    # per-step timing for steps 2..N: distinguishes a ONE-TIME second-call
    # recompile (fixable) from per-call overhead (path unusable)
    later_ms, t_prev, loss2 = [], t_first, float("nan")
    for i in range(2, 2 + int(os.environ.get("AB_EXTRA_STEPS", 1))):
        new_state, m2 = step(new_state, batch, jax.random.PRNGKey(i), 0.3,
                             gates3, 3e-4, jitters)
        loss2 = float(m2["loss"])
        now = time.perf_counter()
        later_ms.append(round((now - t_prev) * 1000, 1))
        t_prev = now
    t_second = t_first + later_ms[0] / 1000

    arts = glob.glob(os.path.join(cache_dir, "train_step_*.aot"))
    row = {
        "leg": leg, "status": status, "batch": BATCH, "img": IMG,
        "setup_s": round(t_setup - t_start, 1),
        "step_construct_s": round(t_built - t_setup, 1),
        "first_step_s": round(t_first - t_built, 1),
        "wall_to_first_step_s": round(t_first - t_start, 1),
        "second_step_ms": round((t_second - t_first) * 1000, 1),
        "later_steps_ms": later_ms,
        "loss": round(loss, 4), "loss2": round(loss2, 4),
        "artifact_kb": round(os.path.getsize(arts[0]) / 1024, 1) if arts else 0,
    }
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()

"""Benchmark: flagship train-step throughput on the local accelerator.

Measures steady-state images/sec of the FULL jitted training step (device
augmentation + union transform + DeepLabV3+ resnet34 fwd/bwd + 7-loss tuple +
Adam) at IMG_SIZE=256, bf16 compute — the reference's trained configuration
(``train_multiclass.py:347-353``).

Prints ONE JSON line:
  {"metric": "train_images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": N / H100_TORCH_ESTIMATE}

The reference publishes no numbers (BASELINE.md) and this host has no GPU, so
``vs_baseline`` is computed against a *documented assumption*:
H100_TORCH_ESTIMATE = 600 img/s for the PyTorch reference's train loop
(DeepLabV3+ resnet34, 256px, fp16/AMP, including its host-side albumentations
input pipeline — the reference's known bottleneck).  vs_baseline > 1.0 means
faster than the assumed H100 reference; the BASELINE.json north star is 5.0.
"""

from __future__ import annotations

import json
import time

H100_TORCH_ESTIMATE = 600.0  # img/s, documented assumption (see module docstring)

IMG = 256
ORGANS = 3


def _devices_with_watchdog(timeout_s: float = 600.0):
    """Backend init bounded by a watchdog thread: a wedged remote-TPU
    terminal (RESULTS.md round-3 incident — a server-side compile that
    never returns leaves new clients hanging in init) must produce an
    explicit failure line, not an indefinitely hung bench process."""
    import threading

    import jax

    box: list = []

    def _init():
        try:
            box.append(jax.devices())
        except Exception as e:  # backend raised instead of hanging
            box.append(e)

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    t.join(timeout_s)
    if not box:
        raise TimeoutError(
            f"accelerator backend init exceeded {timeout_s:.0f}s "
            "(wedged remote TPU terminal? see RESULTS.md incident note)")
    if isinstance(box[0], Exception):
        raise box[0]
    return box[0]


def _run_bounded(fn, timeout_s: float, what: str):
    """Run ``fn`` in a daemon thread bounded by ``timeout_s`` — same wedge
    protection as init, applied to the first compile+execute (a terminal
    that wedges AFTER init otherwise hangs the bench with no output)."""
    import threading

    box: list = []

    def _target():
        try:
            box.append((True, fn()))
        except Exception as e:  # noqa: BLE001 - reported in the JSON line
            box.append((False, e))

    t = threading.Thread(target=_target, daemon=True)
    t.start()
    t.join(timeout_s)
    if not box:
        raise TimeoutError(f"{what} exceeded {timeout_s:.0f}s "
                           "(wedged remote TPU terminal?)")
    ok, val = box[0]
    if not ok:
        raise val
    return val


def main(batch_size: int | None = None, steps: int = 20, warmup: int = 3) -> dict:
    try:
        _devices_with_watchdog()
    except Exception as e:
        result = {
            "metric": "train_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "img/s",
            "vs_baseline": 0.0,
            "extra": {"error": f"backend unavailable: {e}",
                      "last_good_measurement": "1845.8 img/s "
                      "(experiments/bench_shipped_r3.log, pre-incident)"},
        }
        print(json.dumps(result))
        return result

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    n_chips = jax.device_count()
    platform = jax.devices()[0].platform
    if batch_size is None:
        # measured on v5e: batch 128 beats 64 by ~22% (1202 vs 986 img/s)
        batch_size = 128 * n_chips if platform == "tpu" else 8

    # upsample_head=False + lowres_head: the head's x4 upsample + sigmoid are
    # folded into the fused Pallas loss kernel (ops/pallas/head_loss.py) —
    # the 256^2 logit/probability tensors never touch HBM.  Same parameters,
    # same losses (tests/test_head_loss.py), and the train_multiclass CLI
    # default for this config.
    model = build_model("deeplabv3plus", num_classes=ORGANS, encoder_name="resnet34",
                        upsample_head=False)
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    train_step = make_train_step(model, tx, augment=True, lowres_head=True)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(batch_size, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray(
            (rng.rand(batch_size, IMG, IMG, ORGANS) > 0.5).astype(np.float32)
        ),
    }
    gates3 = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    def step(state, i):
        return train_step(
            state, batch, jax.random.PRNGKey(i), 0.3, gates3, 3e-4, jitters
        )

    def _warmup():
        nonlocal state
        metrics = None
        for i in range(warmup):
            state, metrics = step(state, i)
        # NOTE: force a device->host value fetch, not just block_until_ready —
        # on the experimental remote-TPU platform block_until_ready returns
        # before execution completes, which silently inflates throughput ~50x.
        return float(metrics["loss"])

    try:
        # remote compiles of the full step take 3-5 min; 20 min = wedged
        _run_bounded(_warmup, 1200.0, "train-step compile/warmup")
    except Exception as e:
        result = {
            "metric": "train_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "img/s",
            "vs_baseline": 0.0,
            "extra": {"error": f"compile/warmup failed: {e}",
                      "last_good_measurement": "1845.8 img/s "
                      "(experiments/bench_shipped_r3.log, pre-incident)"},
        }
        print(json.dumps(result))
        return result

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, warmup + i)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    imgs_per_sec = batch_size * steps / dt
    per_chip = imgs_per_sec / n_chips
    result = {
        "metric": "train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s",
        "vs_baseline": round(per_chip / H100_TORCH_ESTIMATE, 4),
        "extra": {
            "platform": platform,
            "n_chips": n_chips,
            "batch_size": batch_size,
            "img_size": IMG,
            "steps": steps,
            "step_ms": round(1000 * dt / steps, 2),
            "assumed_h100_torch_img_per_sec": H100_TORCH_ESTIMATE,
        },
    }
    # Measured relative framework anchor (experiments/torch_cpu_anchor.py):
    # same arch/losses/optimizer at f32 on this host's one CPU core, JAX vs
    # the torch reference.  Shows the assumed-baseline ratio is not inflated
    # by a slow-torch comparison.  Point-in-time: the json's "recorded" field
    # says when/at which commit it was measured; it is NOT re-measured per
    # bench run — re-run the script after perf-relevant changes.
    try:
        import os
        anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "experiments", "torch_cpu_anchor.json")
        with open(anchor_path) as fh:
            anchor = json.load(fh)
        result["extra"]["measured_cpu_anchor_jax_over_torch"] = anchor["jax_over_torch"]
        result["extra"]["cpu_anchor_recorded"] = anchor.get("recorded", "round 2")
    except Exception:
        pass
    print(json.dumps(result))
    return result


def infer(batch_size: int = 128, steps: int = 30, warmup: int = 3) -> dict:
    """Secondary benchmark: pure inference throughput (jitted sigmoid forward,
    bf16) — the serving-path number.  Run manually: ``python -c "import bench;
    bench.infer()"`` (the driver's contract is the single line from main())."""
    import json as _json
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import create_train_state, make_forward, make_optimizer

    model = build_model("deeplabv3plus", num_classes=ORGANS, encoder_name="resnet34")
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), make_optimizer())
    forward = make_forward(model)
    x = jnp.asarray(np.random.RandomState(0).rand(batch_size, IMG, IMG, 3), jnp.float32)

    for _ in range(warmup):
        out = forward(state, x)
    float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = forward(state, x)
    float(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    result = {
        "metric": "infer_images_per_sec_per_chip",
        "value": round(batch_size * steps / dt, 2),
        "unit": "img/s",
        "extra": {"batch_size": batch_size, "img_size": IMG,
                  "step_ms": round(1000 * dt / steps, 2)},
    }
    print(_json.dumps(result))
    return result


if __name__ == "__main__":
    res = main()
    if res.get("extra", {}).get("error"):
        # The hung init thread (and grpc's own threads) can block normal
        # interpreter exit; the JSON line is already flushed.
        import os as _os
        import sys as _sys

        _sys.stdout.flush()
        _os._exit(0)

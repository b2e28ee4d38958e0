"""Full-train-step timing under PRNG variants (threefry vs TPU rbg; dropout).

The step derives every random draw (augmentation params + ASPP dropout) from
one key.  threefry2x32 is software on the VPU; 'rbg' uses the TPU's hardware
RngBitGenerator.  Typed keys (jax.random.key(..., impl=...)) carry the impl,
so the trainer code is unchanged.

Usage: python experiments/rng_experiment.py [batch]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import sys
import time

IMG = 256
ORGANS = 3


def main(batch_size=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(batch_size, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray(
            (rng.rand(batch_size, IMG, IMG, ORGANS) > 0.5).astype(np.float32)),
    }
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    def run(tag, impl, aspp_dropout=0.5, augment=True):
        model = build_model("deeplabv3plus", num_classes=ORGANS,
                            encoder_name="resnet34", upsample_head=False)
        if aspp_dropout != 0.5:
            from ecologysemanticsegmentation_tpu.models.deeplabv3plus import DeepLabV3Plus
            model = DeepLabV3Plus(num_classes=ORGANS, upsample_head=False,
                                  aspp_dropout=aspp_dropout)
        tx = make_optimizer(3e-4)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, IMG, IMG, 3), tx)
        step = make_train_step(model, tx, augment=augment, lowres_head=True)

        def key(i):
            return jax.random.key(i, impl=impl) if impl else jax.random.PRNGKey(i)

        for i in range(3):
            state, m = step(state, batch, key(i), 0.3, gates3, 3e-4, jitters)
        float(m["loss"])
        t0 = time.perf_counter()
        n = 15
        for i in range(n):
            state, m = step(state, batch, key(i), 0.3, gates3, 3e-4, jitters)
        float(m["loss"])
        ms = (time.perf_counter() - t0) / n * 1000.0
        print(json.dumps({tag: round(ms, 2)}))
        return ms

    results = {"batch": batch_size}
    results["threefry_ms"] = run("threefry_ms", None)
    results["rbg_ms"] = run("rbg_ms", "rbg")
    results["rbg_nodrop_ms"] = run("rbg_nodrop_ms", "rbg", aspp_dropout=0.0)
    results["rbg_noaug_ms"] = run("rbg_noaug_ms", "rbg", augment=False)
    print(json.dumps(results))
    with open("/tmp/rng_experiment.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

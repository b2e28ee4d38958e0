"""Encoder stage-level fwd timing on the real chip.

Times jitted truncations of the flagship forward (summing feature level k
only — XLA dead-code-eliminates deeper stages and all unused BN state), so
stage cost = t(k) - t(k-1).  Identifies which convolutions hold the ~25% MFU
forward pass back (step_budget.py: fwd 24 ms @ batch 128).

Usage: python experiments/stage_budget.py [batch]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import sys
import time

IMG = 256


def main(batch_size=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecologysemanticsegmentation_tpu.models import build_model

    model = build_model("deeplabv3plus", num_classes=3, encoder_name="resnet34",
                        upsample_head=False)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(batch_size, IMG, IMG, 3),
                    jnp.float32).astype(jnp.bfloat16)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False)

    def timed(fn, *args, steps=10, warmup=2):
        for _ in range(warmup):
            out = fn(*args)
        float(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(out.reshape(-1)[0])
        return (time.perf_counter() - t0) / steps * 1000.0

    # Truncated encoder forwards (train-mode BN): sum(features[k]) only.
    from ecologysemanticsegmentation_tpu.models.resnet import ResNetEncoder

    enc = ResNetEncoder((3, 4, 6, 3), "basic", output_stride=16)
    enc_vars = {"params": variables["params"]["encoder"],
                "batch_stats": variables["batch_stats"]["encoder"]}

    results = {"batch_size": batch_size}
    prev = 0.0
    names = ["stem_/2", "layer1_/4", "layer2_/8", "layer3_/16", "layer4_/16d"]
    for k, name in enumerate(names):
        @jax.jit
        def upto(params, bstats, im, k=k):
            feats, _ = enc.apply({"params": params, "batch_stats": bstats},
                                 im, train=True, mutable=["batch_stats"])
            return jnp.sum(feats[k].astype(jnp.float32))

        t = timed(upto, enc_vars["params"], enc_vars["batch_stats"], x)
        results[name + "_cum_ms"] = round(t, 2)
        results[name + "_ms"] = round(t - prev, 2)
        prev = t
        print(json.dumps({name: results[name + "_ms"], "cum": results[name + "_cum_ms"]}))

    # Full forward for the decoder/ASPP remainder.
    @jax.jit
    def full(params, bstats, im):
        out, _ = model.apply({"params": params, "batch_stats": bstats},
                             im, train=True, mutable=["batch_stats"],
                             rngs={"dropout": key})
        return jnp.sum(out)

    t = timed(full, variables["params"], variables["batch_stats"], x)
    results["full_fwd_ms"] = round(t, 2)
    results["aspp_decoder_ms"] = round(t - prev, 2)
    print(json.dumps(results))
    with open("/tmp/stage_budget.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

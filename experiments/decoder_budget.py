"""Cumulative ablation of the DeepLabV3+ decoder tail (fwd, batch 128).

From fixed encoder features (low /4, high /16), times jitted prefixes of the
ASPP -> aspp_out -> resize -> low_project -> concat+fuse -> head pipeline.
Diffs of consecutive cumulative numbers isolate each op's in-context cost
(the dispatch floor cancels).

Usage: python experiments/decoder_budget.py [batch]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import sys
import time


def main(batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from ecologysemanticsegmentation_tpu.models.common import (
        ConvBNAct,
        SeparableConvBNAct,
    )
    from ecologysemanticsegmentation_tpu.models.deeplabv3plus import ASPP
    from ecologysemanticsegmentation_tpu.ops.resize import resize_bilinear

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    low = jnp.asarray(rng.rand(batch, 64, 64, 64), np.float32).astype(jnp.bfloat16)
    high = jnp.asarray(rng.rand(batch, 16, 16, 512), np.float32).astype(jnp.bfloat16)

    class Tail(nn.Module):
        upto: int  # 1 aspp, 2 aspp_out, 3 resize, 4 low_project, 5 fuse, 6 head

        @nn.compact
        def __call__(self, low, high, train=True):
            y = ASPP(256, name="aspp")(high, train)
            if self.upto == 1:
                return y
            y = SeparableConvBNAct(256, name="aspp_out")(y, train)
            if self.upto == 2:
                return y
            y = resize_bilinear(y, low.shape[1:3], align_corners=True)
            if self.upto == 3:
                return y
            lo = ConvBNAct(48, (1, 1), name="low_project")(low, train)
            if self.upto == 4:
                return lo + 0.0 * jnp.sum(y)
            y = jnp.concatenate([lo, y], axis=-1)
            y = SeparableConvBNAct(256, name="fuse")(y, train)
            if self.upto == 5:
                return y
            y = nn.Conv(3, (3, 3), padding="SAME", dtype=jnp.bfloat16,
                        param_dtype=jnp.float32, name="head")(y)
            return y

    def timeit(fn, *args, steps=10, warmup=2):
        for _ in range(warmup):
            out = fn(*args)
        float(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(out.reshape(-1)[0])
        return round((time.perf_counter() - t0) / steps * 1000.0, 2)

    results = {"batch": batch}
    prev = 0.0
    names = {1: "aspp", 2: "aspp_out", 3: "resize", 4: "low_project",
             5: "concat_fuse", 6: "head"}
    full = Tail(upto=6)
    variables = full.init({"params": key, "dropout": key}, low, high, train=False)
    for upto in range(1, 7):
        tail = Tail(upto=upto)

        @jax.jit
        def run(v, lo, hi, tail=tail):
            out, _ = tail.apply(v, lo, hi, train=True,
                                mutable=["batch_stats"],
                                rngs={"dropout": key})
            return jnp.sum(out.astype(jnp.float32))

        t = timeit(run, variables, low, high)
        results[names[upto] + "_cum"] = t
        results[names[upto]] = round(t - prev, 2)
        prev = t
        print(json.dumps({names[upto]: results[names[upto]], "cum": t}))

    print(json.dumps(results))
    with open("/tmp/decoder_budget.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

"""Micro-timing of each ASPP/decoder sub-op (the ~7.3 ms / ~9% MFU region).

Usage: python experiments/aspp_budget.py [batch]
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

    from ecologysemanticsegmentation_tpu.models.common import (
        ConvBNAct,
        SeparableConvBNAct,
    )
    from ecologysemanticsegmentation_tpu.models.deeplabv3plus import ASPP
    from ecologysemanticsegmentation_tpu.ops.resize import resize_bilinear

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

    def mk(shape):
        return jnp.asarray(rng.rand(*shape), jnp.float32).astype(jnp.bfloat16)

    def timeit(fn, *args, steps=10, warmup=2):
        for _ in range(warmup):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        return round((time.perf_counter() - t0) / steps * 1000.0, 2)

    results = {"batch": batch}

    def bench_module(name, mod, x, train=True, rngs=None):
        variables = mod.init({"params": key, "dropout": key}, x, train=False)

        @jax.jit
        def run(v, x):
            out, _ = mod.apply(v, x, train=train, mutable=["batch_stats"],
                               rngs=rngs or {"dropout": key})
            return jnp.sum(out.astype(jnp.float32))

        results[name] = timeit(run, variables, x)
        print(json.dumps({name: results[name]}))

    x16 = mk((batch, 16, 16, 512))
    y16 = mk((batch, 16, 16, 256))
    low = mk((batch, 64, 64, 64))
    y64 = mk((batch, 64, 64, 304))

    bench_module("aspp_full", ASPP(256), x16)
    bench_module("aspp_nodrop", ASPP(256, drop_rate=0.0), x16)
    bench_module("sep_16sq_256", SeparableConvBNAct(256), y16)
    bench_module("sep_64sq_fuse", SeparableConvBNAct(256), y64)
    bench_module("low_project_1x1", ConvBNAct(48, (1, 1)), low)

    # resize 16 -> 64
    @jax.jit
    def rs(v):
        return jnp.sum(resize_bilinear(v, (64, 64), align_corners=True)
                       .astype(jnp.float32))

    results["resize_16_64"] = timeit(rs, y16)
    print(json.dumps({"resize_16_64": results["resize_16_64"]}))

    # head conv 3x3 256->3 at 64^2
    from flax import linen as nn

    head = nn.Conv(3, (3, 3), padding="SAME", dtype=jnp.bfloat16,
                   param_dtype=jnp.float32)
    hv = head.init(key, mk((1, 64, 64, 256)))

    @jax.jit
    def hd(v, x):
        return jnp.sum(head.apply(v, x).astype(jnp.float32))

    results["head_conv"] = timeit(hd, hv, mk((batch, 64, 64, 256)))
    print(json.dumps({"head_conv": results["head_conv"]}))

    # dropout alone
    @jax.jit
    def drop(k, x):
        mask = jax.random.bernoulli(k, 0.5, x.shape)
        return jnp.sum(jnp.where(mask, x / 0.5, 0).astype(jnp.float32))

    results["dropout_16sq"] = timeit(drop, key, y16)
    print(json.dumps({"dropout_16sq": results["dropout_16sq"]}))

    print(json.dumps(results))
    with open("/tmp/aspp_budget.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

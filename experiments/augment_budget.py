"""Isolated timing of augmentation sub-ops at batch 128 (10.9 ms in-step).

Usage: python experiments/augment_budget.py [batch]
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

    from ecologysemanticsegmentation_tpu.data import augment as A

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, 256, 256, 3), np.float32).astype(jnp.bfloat16)
    mask = jnp.asarray((rng.rand(batch, 256, 256, 3) > 0.5), np.float32).astype(jnp.bfloat16)

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

    def bench(name, fn, *args):
        results[name] = timeit(jax.jit(fn), *args)
        print(json.dumps({name: results[name]}))

    bench("noop_floor", lambda x: jnp.sum(x.astype(jnp.float32)), img)
    bench("clahe", lambda k, x: jnp.sum(A._clahe(k, x).astype(jnp.float32)), key, img)
    bench("fancy_pca", lambda k, x: jnp.sum(A._fancy_pca(k, x).astype(jnp.float32)), key, img)
    bench("color_jitter", lambda k, x: jnp.sum(A._color_jitter(k, x).astype(jnp.float32)), key, img)
    bench("hsv_shift", lambda k, x: jnp.sum(A._hsv_shift(k, x).astype(jnp.float32)), key, img)
    bench("zoom_blur", lambda k, x: jnp.sum(A._zoom_blur(k, x).astype(jnp.float32)), key, img)

    def rot(x, m):
        ys, xs = A._rotate_coords(256, 256, jnp.float32(37.0))
        return jnp.sum(A._bilinear_warp(x, ys, xs).astype(jnp.float32)) + jnp.sum(
            A._nearest_warp(m, ys, xs).astype(jnp.float32))

    bench("rotate_warp_pair", rot, img, mask)

    bench("full_augment",
          lambda k, x, m: jnp.sum(A.augment_batch(k, x, m)[0]), key,
          img.astype(jnp.float32), mask.astype(jnp.float32))

    print(json.dumps(results))
    with open("/tmp/augment_budget.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

"""Two microbenchmarks against the train-step profile's remaining slack:

1. x4 bilinear upsample (B,16,16,256)->(B,64,64,256): the einsum-resize
   lowers with ~1.7 ms of layout copies (hlo_stats: pw,nowc->nopc transpose
   + convert copy).  Candidate: depthwise transposed conv (integer-factor
   bilinear = fixed 4-phase FIR, kernel 7), which keeps conv-native layouts.

2. int8 vs bf16 conv throughput on a layer4-shaped conv (16x16x512x512@3x3,
   batch 128): the encoder's big convs are Compute-bound at 81% of bf16 MXU
   peak; v5e's int8 path is nominally 2x.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/upsample_int8.py
"""

from __future__ import annotations

import json
import sys
import time


def bilinear_x4_kernel_1d():
    """Transposed-conv kernel equivalent to align_corners=False bilinear x4.

    Output pixel o samples input at (o + 0.5)/4 - 0.5: phase p = o % 4 has
    weights on the two neighbors (1 - d, d) with d = (p + 0.5)/4 - 0.5 mod 1.
    As a stride-4 transposed conv this is a length-7 kernel per phase.
    """
    import numpy as np

    w = np.zeros((8,), np.float32)  # tap index = 4*k + p offsets
    # build by scattering: out[4i + p] += in[i + j] * weight
    taps = {}
    for p in range(4):
        d = (p + 0.5) / 4.0 - 0.5
        i0 = int(np.floor(d))
        frac = d - i0
        for (j, wt) in ((i0, 1 - frac), (i0 + 1, frac)):
            # conv_transpose with stride 4: out[o] = sum_k in[(o-k)/4] K[k]
            # => K[p - 4*j] (valid when within kernel support)
            taps[(p, j)] = wt
    # kernel index k = p - 4*j ; collect range
    ks = [p - 4 * j for (p, j) in taps]
    kmin, kmax = min(ks), max(ks)
    K = np.zeros((kmax - kmin + 1,), np.float32)
    for (p, j), wt in taps.items():
        K[p - 4 * j - kmin] += wt
    return K, -kmin  # kernel and the left offset of tap 0


def main(batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    sys.path.insert(0, "/root/repo")
    from ecologysemanticsegmentation_tpu.ops.resize import resize_bilinear

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 16, 16, 256), jnp.bfloat16)

    K, off = bilinear_x4_kernel_1d()
    kh = len(K)

    def up_convt(x):
        # separable depthwise transposed conv; 1-px edge-replicate pre-pad +
        # pad(1,1) reproduces resize_bilinear's edge clamp EXACTLY (6e-8,
        # verified on CPU) and yields exactly 4x output size
        b, h, w, c = x.shape
        xp = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
        k1 = jnp.broadcast_to(
            jnp.asarray(K, x.dtype)[:, None, None, None], (kh, 1, 1, c))
        y = lax.conv_general_dilated(
            xp, k1, window_strides=(1, 1), padding=[(1, 1), (0, 0)],
            lhs_dilation=(4, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        yp = jnp.concatenate([y[:, :, :1], y, y[:, :, -1:]], axis=2)
        k2 = jnp.broadcast_to(
            jnp.asarray(K, x.dtype)[None, :, None, None], (1, kh, 1, c))
        y = lax.conv_general_dilated(
            yp, k2, window_strides=(1, 1), padding=[(0, 0), (1, 1)],
            lhs_dilation=(1, 4),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return y

    ya = resize_bilinear(x, (64, 64)).astype(jnp.float32)
    yb = up_convt(x).astype(jnp.float32)
    print(json.dumps({
        "upsample_max_abs_delta": float(jnp.max(jnp.abs(ya - yb))),
        "ref_mean_abs": float(jnp.mean(jnp.abs(ya)))}))

    def timeit(fn, *args, steps=15, warmup=3):
        for _ in range(warmup):
            out = fn(*args)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        return round((time.perf_counter() - t0) / steps * 1000.0, 3)

    res = {}
    f_ein = jax.jit(lambda x: resize_bilinear(x, (64, 64)).sum())
    f_ct = jax.jit(lambda x: up_convt(x).sum())
    res["einsum_fwd_ms"] = timeit(f_ein, x)
    res["convt_fwd_ms"] = timeit(f_ct, x)
    g_ein = jax.jit(lambda x: jax.grad(
        lambda x: resize_bilinear(x, (64, 64)).astype(jnp.float32).sum())(x).sum())
    g_ct = jax.jit(lambda x: jax.grad(
        lambda x: up_convt(x).astype(jnp.float32).sum())(x).sum())
    res["einsum_fwdbwd_ms"] = timeit(g_ein, x)
    res["convt_fwdbwd_ms"] = timeit(g_ct, x)

    # --- int8 vs bf16 conv (layer4-shaped) ---
    a8 = jnp.asarray(rng.randint(-127, 127, (batch, 16, 16, 512)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 127, (3, 3, 512, 512)), jnp.int8)
    ab = a8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    def conv_i8(a, w):
        return lax.conv_general_dilated(
            a, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).sum()

    def conv_bf(a, w):
        return lax.conv_general_dilated(
            a, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32).sum()

    res["conv_bf16_ms"] = timeit(jax.jit(conv_bf), ab, wb)
    try:
        res["conv_int8_ms"] = timeit(jax.jit(conv_i8), a8, w8)
    except Exception as e:
        res["conv_int8_ms"] = f"FAILED {type(e).__name__}: {e}"

    print(json.dumps(res))
    with open("/tmp/upsample_int8.json", "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

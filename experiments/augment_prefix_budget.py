"""Cumulative prefix timing of augment_batch stages (isolated ops are ~free;
the composition costs ~10 ms in-step — find the seams).

Usage: python experiments/augment_prefix_budget.py [batch]
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
    images = jnp.asarray(rng.rand(batch, 256, 256, 3), np.float32)
    masks = jnp.asarray((rng.rand(batch, 256, 256, 3) > 0.5), np.float32)

    def staged(key, images, masks, upto):
        b, h, w, _ = images.shape
        keys = jax.random.split(key, 14)
        (k_outer, k_blur, k_color, k_rrc_p, k_rrc, k_flip, k_pca, k_shuf,
         k_gray, k_hsv, k_clahe, k_rot, k_tone, k_extra) = keys
        img, mask = images.astype(jnp.bfloat16), masks.astype(jnp.bfloat16)
        outer = A._gate(k_outer, 0.7, b)
        x, m = img, mask
        if upto >= 1:
            x = A._one_of(k_blur, 0.4, [A._defocus, A._gauss_blur, A._zoom_blur, A._fog], x)
        if upto >= 2:
            x = A._one_of(k_color, 0.4, [A._color_jitter, A._brightness_contrast, A._gamma, A._emboss], x)
        if upto >= 3:
            ks1, ks2, ks3, ks4 = jax.random.split(k_rrc, 4)
            scale = jax.random.uniform(ks1, (), minval=0.08, maxval=1.0)
            log_ratio = jax.random.uniform(ks2, (), minval=np.log(0.75), maxval=np.log(4 / 3))
            area = scale * h * w
            cw = jnp.clip(jnp.sqrt(area * jnp.exp(log_ratio)), 8.0, w)
            ch = jnp.clip(jnp.sqrt(area / jnp.exp(log_ratio)), 8.0, h)
            top = jax.random.uniform(ks3, ()) * (h - ch)
            left = jax.random.uniform(ks4, ()) * (w - cw)
            cys, cxs = A._crop_coords(h, w, top, left, ch, cw)
            crop_gate = jax.random.bernoulli(k_rrc_p, 0.3)
            x, m = jax.lax.cond(
                crop_gate,
                lambda xi, mi: (A._bilinear_warp(xi, cys, cxs), A._nearest_warp(mi, cys, cxs)),
                lambda xi, mi: (xi, mi), x, m)
        if upto >= 4:
            flip = A._gate(k_flip, 0.5, b)
            x = jnp.where(flip, x[:, :, ::-1], x)
            m = jnp.where(flip, m[:, :, ::-1], m)
            kp1, kp2 = jax.random.split(k_pca)
            x = jnp.where(A._gate(kp1, 0.3, b), A._fancy_pca(kp2, x), x)
            ksh1, ksh2 = jax.random.split(k_shuf)
            x = jnp.where(A._gate(ksh1, 0.5, b), A._channel_shuffle(ksh2, x), x)
            x = jnp.where(A._gate(k_gray, 0.3, b), A._to_gray(None, x), x)
        img = jnp.where(outer, x, img)
        mask = jnp.where(outer, m, mask)
        if upto >= 5:
            kh1, kh2 = jax.random.split(k_hsv)
            img = jnp.where(A._gate(kh1, 0.4, b), A._hsv_shift(kh2, img), img)
            kc1, kc2 = jax.random.split(k_clahe)
            img = jnp.where(A._gate(kc1, 0.7, b), A._clahe(kc2, img), img)
        if upto >= 6:
            kd1, kd2, kg = jax.random.split(k_rot, 3)
            degree = jax.random.randint(kd1, (), 0, 90).astype(jnp.float32)
            degree = jnp.where(jax.random.bernoulli(kd2, 0.2), 0.0, degree)
            rys, rxs = A._rotate_coords(h, w, degree)
            img, mask = jax.lax.cond(
                jax.random.bernoulli(kg, 0.4),
                lambda xi, mi: (A._bilinear_warp(xi, rys, rxs), A._nearest_warp(mi, rys, rxs)),
                lambda xi, mi: (xi, mi), img, mask)
        if upto >= 7:
            kt1, kt2 = jax.random.split(k_tone)
            img = jnp.where(A._gate(kt1, 0.5, b), A._tone_curve(kt2, img), img)
        return jnp.clip(img, 0, 1).astype(jnp.float32), mask.astype(jnp.float32)

    def timeit(fn, steps=12, warmup=2):
        for i in range(warmup):
            out = fn(jax.random.PRNGKey(i), images, masks)
        float(out[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for i in range(steps):
            out = fn(jax.random.PRNGKey(100 + i), images, masks)
        float(out[0].reshape(-1)[0])
        return round((time.perf_counter() - t0) / steps * 1000.0, 2)

    names = {0: "cast_only", 1: "blur_oneof", 2: "color_oneof", 3: "crop",
             4: "flip_pca_shuf_gray", 5: "hsv_clahe", 6: "rotate", 7: "tone_full"}
    results = {"batch": batch}
    prev = 0.0
    for upto in range(0, 8):
        fn = jax.jit(lambda k, i, m, upto=upto: staged(k, i, m, upto))
        t = timeit(fn)
        results[names[upto] + "_cum"] = t
        results[names[upto]] = round(t - prev, 2)
        prev = t
        print(json.dumps({names[upto]: results[names[upto]], "cum": t}))

    print(json.dumps(results))
    with open("/tmp/augment_prefix_budget.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

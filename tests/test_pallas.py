"""Pallas fused loss-sums kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecologysemanticsegmentation_tpu.ops.pallas.loss_sums import (
    _sums_reference,
    fused_loss_sums,
    loss_sums_nhwc,
)


def _pair(rng, c=3, n=5000):
    p = rng.uniform(0.01, 0.99, (c, n)).astype(np.float32)
    g = (rng.uniform(size=(c, n)) > 0.5).astype(np.float32)
    return jnp.asarray(p), jnp.asarray(g)


def test_fused_sums_match_reference(rng):
    p, g = _pair(rng)
    ours = np.asarray(fused_loss_sums(p, g, True))  # interpret mode
    ref = np.asarray(_sums_reference(p, g))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)


def test_fused_sums_padding_correction(rng):
    # n NOT a multiple of the lane tile: padding contributions must cancel
    p, g = _pair(rng, n=3001)
    ours = np.asarray(fused_loss_sums(p, g, True))
    ref = np.asarray(_sums_reference(p, g))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-2)


def test_fused_sums_custom_vjp_matches_autodiff(rng):
    p, g = _pair(rng, c=2, n=2048)
    w = jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))

    def scalar_fused(p, g):
        return jnp.sum(fused_loss_sums(p, g, True) * w)

    def scalar_ref(p, g):
        return jnp.sum(_sums_reference(p, g) * w)

    dp_f, dg_f = jax.grad(scalar_fused, argnums=(0, 1))(p, g)
    dp_r, dg_r = jax.grad(scalar_ref, argnums=(0, 1))(p, g)
    np.testing.assert_allclose(np.asarray(dp_f), np.asarray(dp_r), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg_f), np.asarray(dg_r), rtol=2e-4, atol=1e-5)


def test_loss_sums_nhwc_layout(rng):
    probs = jnp.asarray(rng.uniform(0.01, 0.99, (2, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(size=(2, 16, 16, 3)) > 0.5).astype(np.float32))
    sums = np.asarray(loss_sums_nhwc(probs, labels, use_pallas=False))
    assert sums.shape == (8, 3)
    np.testing.assert_allclose(sums[0], np.asarray(labels).sum(axis=(0, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(sums[7], [2 * 16 * 16] * 3)

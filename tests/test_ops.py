"""Tests for the einsum-based resize ops against torch reference semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.ops import resize_bilinear, upsample_nearest, resize_nearest


def test_upsample_nearest_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    ours = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2)
    np.testing.assert_array_equal(ours, ref.numpy().transpose(0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("out_hw", [(16, 16), (32, 48), (5, 7)])
def test_resize_bilinear_matches_torch(rng, align_corners, out_hw):
    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(2, 8, 12, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners))
    ref = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=out_hw,
        mode="bilinear", align_corners=align_corners,
    )
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_resize_bilinear_identity(rng):
    x = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(x), (8, 8), True))
    np.testing.assert_array_equal(out, x)


def test_resize_nearest_shape(rng):
    x = rng.normal(size=(1, 10, 10, 2)).astype(np.float32)
    assert resize_nearest(jnp.asarray(x), (4, 6)).shape == (1, 4, 6, 2)

"""Tests for the einsum-based resize ops against torch reference semantics."""

import numpy as np
import pytest

import jax
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


def test_device_interp_matrix_matches_host():
    """The iota-built device form (used above _DEVICE_OPERAND_ELEMS to keep
    multi-MB constants out of the HLO — RESULTS round-3 incident) must agree
    with the host f64-derived matrix to f32 noise at every geometry."""
    from ecologysemanticsegmentation_tpu.ops.resize import (
        _interp_matrix,
        _interp_matrix_device,
    )

    for out_s, in_s in [(512, 128), (1024, 256), (512, 465), (64, 64), (7, 5)]:
        for ac in (True, False):
            host = _interp_matrix(out_s, in_s, ac)
            dev = np.asarray(_interp_matrix_device(out_s, in_s, ac))
            np.testing.assert_allclose(dev, host, atol=2e-5,
                                       err_msg=f"{out_s}x{in_s} ac={ac}")
            np.testing.assert_allclose(dev.sum(axis=1), 1.0, atol=1e-5)


def test_resize_bilinear_large_matches_torch(rng):
    """Above-threshold sizes take the device-operand path; same torch oracle."""
    import torch
    import torch.nn.functional as F
    from ecologysemanticsegmentation_tpu.ops.resize import _DEVICE_OPERAND_ELEMS

    assert 512 * 384 >= _DEVICE_OPERAND_ELEMS  # this case exercises it
    x = rng.normal(size=(1, 384, 384, 2)).astype(np.float32)
    for ac in (True, False):
        ours = np.asarray(resize_bilinear(jnp.asarray(x), (512, 512), ac))
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            size=(512, 512), mode="bilinear", align_corners=ac)
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-4)


def test_augment_512px_has_no_large_hlo_constants():
    """Guard on the round-3 remote-compile incident: the 512px augmentation
    program (zoom-blur pyramid et al.) must not bake multi-MB interpolation
    constants into the HLO."""
    import re

    from ecologysemanticsegmentation_tpu.data.augment import augment_batch

    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    imgs = jax.ShapeDtypeStruct((2, 512, 512, 3), jnp.float32)
    masks = jax.ShapeDtypeStruct((2, 512, 512, 3), jnp.float32)
    txt = jax.jit(augment_batch).lower(key, imgs, masks).as_text()
    biggest = max((len(m) for m in re.findall(r"dense<[^>]*>", txt)),
                  default=0)
    # hex text: 8 chars/f32 -> 2^17 elements ~ 1 MiB of text; anything beyond
    # means a baked interpolation operand regressed.
    assert biggest < 2**20, f"largest HLO constant ~{biggest // 2} bytes"

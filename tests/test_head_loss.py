"""Fused head-upsample+sigmoid+loss-sums kernel (ops/pallas/head_loss.py).

Golden strategy mirrors tests/test_losses.py: the kernel (interpret mode on
CPU) must match the pure-jnp reference that composes the existing verified
pieces — resize_bilinear (f32) + sigmoid + loss_sums._sums_reference — and the
full train step built on it must match the unfused step's losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecologysemanticsegmentation_tpu.ops.pallas.head_loss import (
    fused_head_loss_sums,
    head_sums_reference,
)


def _case(rng, b=4, h=16, w=16, scale=4, c=3):
    logits = jnp.asarray(rng.randn(b, h, w, c) * 3.0, jnp.float32)
    labels = (rng.rand(b, h * scale, w * scale, c) > 0.5).astype(np.float32)
    # sprinkle the -1 ignore value the pipeline produces
    labels[rng.rand(*labels.shape) < 0.05] = -1.0
    return logits, jnp.asarray(labels)


def test_fused_matches_reference(rng):
    logits, labels = _case(rng)
    got = fused_head_loss_sums(logits, labels, use_pallas=True, interpret=True)
    want = head_sums_reference(logits, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-4)


def test_fused_odd_batch_tile(rng):
    # B=3 forces the bb=1 path; B=8 the bb=8 path.
    for b in (3, 8):
        logits, labels = _case(rng, b=b, h=8, w=8)
        got = fused_head_loss_sums(logits, labels, use_pallas=True, interpret=True)
        want = head_sums_reference(logits, labels)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-4)


def test_fused_gradients_match_autodiff(rng):
    logits, labels = _case(rng, b=2, h=8, w=8)
    # Weight the 8 sums so every backward term is exercised.
    wts = jnp.asarray(rng.randn(8, 3), jnp.float32)

    def scal_fused(lg):
        return jnp.sum(wts * fused_head_loss_sums(lg, labels, use_pallas=True,
                                                  interpret=True))

    def scal_ref(lg):
        return jnp.sum(wts * head_sums_reference(lg, labels))

    g_fused = jax.grad(scal_fused)(logits)
    g_ref = jax.grad(scal_ref)(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-5)


def test_fused_row_blocked_large_image(rng):
    """Large images (IMGSIZE ~768-1024 @ C=3) exceed the single-tile VMEM
    guard and must take the row-blocked kernels (grid (B, H//Hb)) — fwd and
    bwd both match the reference.  Exercises the real dispatcher guard at
    (1, 256, 256, 3) logits -> (1, 1024, 1024, 3) labels (picks Hb=64)."""
    from ecologysemanticsegmentation_tpu.ops.pallas import head_loss as hl

    logits, labels = _case(rng, b=1, h=256, w=256, scale=4)
    B, h, w, C = logits.shape
    _, H, W, _ = labels.shape
    fixed = (h * w * C * 4 + (w * C) * (W * C) * 4
             + hl.NUM_SUMS * W * C * 4)
    single = (fixed + (w * C) * (W * C) * 4 + H * W * C * 4 + 2 * H * h * 4)
    assert single > 12 * 2**20          # must NOT take the single-tile path
    assert fixed + 64 * W * C * 4 + 64 * h * 4 <= 12 * 2**20  # Hb=64 fits

    got = fused_head_loss_sums(logits, labels, use_pallas=True, interpret=True)
    want = head_sums_reference(logits, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-3)

    wts = jnp.asarray(rng.randn(8, 3), jnp.float32)

    def scal_fused(lg):
        return jnp.sum(wts * fused_head_loss_sums(
            lg, labels, use_pallas=True, interpret=True))

    def scal_ref(lg):
        return jnp.sum(wts * head_sums_reference(lg, labels))

    g_fused = jax.grad(scal_fused)(logits)
    g_ref = jax.grad(scal_ref)(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-5)


def test_seven_losses_lowres_matches_fullres(rng):
    from ecologysemanticsegmentation_tpu.losses import (
        seven_losses,
        seven_losses_lowres,
    )
    from ecologysemanticsegmentation_tpu.ops.resize import resize_bilinear

    logits, labels = _case(rng)
    got = seven_losses_lowres(logits, labels)
    up = resize_bilinear(logits, labels.shape[1:3], align_corners=True)
    want = seven_losses(jax.nn.sigmoid(up), labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_train_step_lowres_head_matches_fullres(rng):
    """End-to-end: the lowres_head train step produces the same losses and
    (one-step) updated params as the unfused step, up to the bf16-quantized
    upsample the unfused model applies between resize and sigmoid."""
    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    img, organs, bsz = 64, 3, 4
    batch = {
        "image": jnp.asarray(rng.rand(bsz, img, img, 3), jnp.float32),
        "label": jnp.asarray(
            (rng.rand(bsz, img, img, organs) > 0.5).astype(np.float32)
        ),
    }
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    losses = {}
    for tag, upsample in (("full", True), ("lowres", False)):
        model = build_model("deeplabv3plus", num_classes=organs,
                            upsample_head=upsample)
        tx = make_optimizer(3e-4)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, img, img, 3), tx)
        step = make_train_step(model, tx, augment=False,
                               lowres_head=not upsample)
        _, metrics = step(state, batch, jax.random.PRNGKey(1), 0.3,
                          gates3, 3e-4, jitters)
        losses[tag] = float(metrics["loss"])
    # bf16 quantization of the upsampled logits (full-res path only) bounds
    # the gap; both paths share every parameterized computation.
    assert abs(losses["full"] - losses["lowres"]) < 2e-2 * abs(losses["full"]), losses


def test_lowres_head_rejects_composite():
    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import make_optimizer, make_train_step

    model = build_model("deeplabv3plus", num_classes=3, upsample_head=False)
    with pytest.raises(AssertionError):
        make_train_step(model, make_optimizer(), composite_mode="general",
                        lowres_head=True)

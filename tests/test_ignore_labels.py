"""Ignore-sentinel (-1 label) semantics across the loss stack.

The reference STATES the -1 semantics — its visualizer warns "these labels
will not be learnt" (``visualize_composite_labels.py:44``) — but its loss
code sums the raw -1s, so ragged multi-organ data (missing/too-small organs,
``fish_coco_annotator.py:132-138``) drives dice numerators negative and the
``log(dice)`` in ``focal_dice_coefficient`` (``loss_functions.py:96-108``)
to NaN (found by the round-4 real-data-tree integration run).  This
framework implements the stated semantics: -1 pixels drop out of every loss
reduction.  These tests pin (a) exact equivalence with valid-subset-only
computation, (b) clean-data behavior unchanged, (c) NaN-free end-to-end
training on ragged batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecologysemanticsegmentation_tpu import losses
from ecologysemanticsegmentation_tpu.ops.pallas.loss_sums import (
    _sums_reference,
    fused_loss_sums,
    loss_sums_nhwc,
)


def _ragged_pair(rng, c=3, n=4096):
    """(C, N) probs + labels where channel 1 has a -1 block and channel 2 is
    fully ignored."""
    p = rng.uniform(0.01, 0.99, (c, n)).astype(np.float32)
    g = (rng.uniform(size=(c, n)) > 0.5).astype(np.float32)
    g[1, : n // 3] = -1.0
    g[c - 1, :] = -1.0
    return jnp.asarray(p), jnp.asarray(g)


def test_masked_sums_equal_valid_subset_sums(rng):
    p, g = _ragged_pair(rng)
    sums = np.asarray(_sums_reference(p, g))
    for c in range(3):
        keep = np.asarray(g[c]) >= 0
        if keep.any():
            sub = np.asarray(
                _sums_reference(p[c : c + 1, keep], g[c : c + 1, keep])
            )[:, 0]
        else:
            sub = np.zeros(8, np.float32)
        np.testing.assert_allclose(sums[:, c], sub, rtol=1e-5, atol=1e-3)


def test_masked_sums_clean_labels_unchanged(rng):
    p = jnp.asarray(rng.uniform(0.01, 0.99, (3, 4096)).astype(np.float32))
    g = jnp.asarray((rng.uniform(size=(3, 4096)) > 0.5).astype(np.float32))
    sums = np.asarray(_sums_reference(p, g))
    np.testing.assert_allclose(sums[7], [4096.0] * 3)
    # spot-check an unmasked row identity on clean labels
    np.testing.assert_allclose(sums[0], np.asarray(g).sum(axis=1), rtol=1e-6)


def test_fused_kernel_matches_reference_with_ignores(rng):
    p, g = _ragged_pair(rng, n=3001)  # exercises the pad path too (w=1 pads)
    ours = np.asarray(fused_loss_sums(p, g, True))  # interpret mode
    ref = np.asarray(_sums_reference(p, g))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-2)


def test_fused_vjp_matches_autodiff_with_ignores(rng):
    p, g = _ragged_pair(rng, c=2, n=2048)
    w = jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))

    def scalar_fused(p, g):
        return jnp.sum(fused_loss_sums(p, g, True) * w)

    def scalar_ref(p, g):
        return jnp.sum(_sums_reference(p, g) * w)

    dp_f, dg_f = jax.grad(scalar_fused, argnums=(0, 1))(p, g)
    dp_r, dg_r = jax.grad(scalar_ref, argnums=(0, 1))(p, g)
    np.testing.assert_allclose(np.asarray(dp_f), np.asarray(dp_r), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg_f), np.asarray(dg_r), rtol=2e-4, atol=1e-5)
    # ignored pixels must receive exactly zero probability gradient
    mask = np.asarray(g) < 0
    assert mask.any()
    assert np.all(np.asarray(dp_f)[mask] == 0.0)


def test_seven_losses_finite_and_subset_equal_on_ragged(rng):
    b, hw, c = 2, 16, 3
    p = jnp.asarray(rng.uniform(0.01, 0.99, (b, hw, hw, c)).astype(np.float32))
    g = (rng.uniform(size=(b, hw, hw, c)) > 0.5).astype(np.float32)
    g[0, :, :, 1] = -1.0  # organ missing in sample 0
    g[:, :, :, 2] = -1.0  # organ missing batch-wide
    out = np.asarray(losses.seven_losses(p, jnp.asarray(g)))
    assert np.isfinite(out).all()

    # channel-2 (fully ignored) contributes only constants: zero gradient
    def loss_fn(p):
        sev = losses.seven_losses(p, jnp.asarray(g))
        return sev[3] + sev[6]  # dice + focal_dice slots

    dp = np.asarray(jax.grad(loss_fn)(p))
    assert np.isfinite(dp).all()
    assert np.all(dp[..., 2] == 0.0)
    assert np.all(dp[0, :, :, 1] == 0.0)
    assert np.any(dp[1, :, :, 1] != 0.0)


def test_union_transform_ignore_awareness():
    # pixel-wise cases over (whole_body, ventral, dorsal), exclude ch0
    ann = jnp.asarray(
        np.array(
            [
                [1.0, 1.0, 1.0],   # clean nested
                [1.0, 1.0, -1.0],  # dorsal ignored: ventral union unaffected
                [1.0, -1.0, 1.0],  # ventral ignored: its union stays ignored
                [1.0, -1.0, -1.0], # both ignored
                [0.0, 0.0, 0.0],   # clean background
            ],
            np.float32,
        ).reshape(1, 5, 1, 3)
    )
    out = np.asarray(losses.return_union_sets_descending_order(ann)).reshape(5, 3)
    np.testing.assert_array_equal(out[0], [1, 1, 1])
    np.testing.assert_array_equal(out[1], [1, 1, -1])
    np.testing.assert_array_equal(out[2], [1, -1, 1])
    np.testing.assert_array_equal(out[3], [1, -1, -1])
    np.testing.assert_array_equal(out[4], [0, 0, 0])


def test_union_transform_clean_labels_unchanged(rng):
    ann = jnp.asarray((rng.uniform(size=(2, 8, 8, 3)) > 0.5).astype(np.float32))
    # make nested so the union equals the reference's raw-sum-clip form
    out_new = np.asarray(losses.return_union_sets_descending_order(ann))
    raw = np.asarray(ann).copy()
    for idx in range(2):
        if idx == 0:
            continue
        raw[..., idx] = np.asarray(ann)[..., idx:].sum(axis=-1)
    raw = np.clip(raw, None, 1)
    np.testing.assert_array_equal(out_new, raw)


def test_head_loss_kernel_masks_ignores(rng):
    from ecologysemanticsegmentation_tpu.ops.pallas.head_loss import (
        fused_head_loss_sums,
        head_sums_reference,
    )

    b, h, c = 2, 8, 3
    logits = jnp.asarray(rng.normal(size=(b, h, h, c)).astype(np.float32))
    g = (rng.uniform(size=(b, 4 * h, 4 * h, c)) > 0.5).astype(np.float32)
    g[0, :, :, 0] = -1.0
    g[:, :, :, 2] = -1.0
    g = jnp.asarray(g)
    ours = np.asarray(fused_head_loss_sums(logits, g, use_pallas=True,
                                           interpret=True))
    ref = np.asarray(head_sums_reference(logits, g))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)
    # count row = per-channel valid-pixel counts
    expect_n = np.asarray((np.asarray(g) >= 0).sum(axis=(0, 1, 2)), np.float32)
    np.testing.assert_allclose(ours[7], expect_n)

    # backward: ignored-everywhere channel produces zero logit gradient
    w = jnp.asarray(rng.normal(size=(8, c)).astype(np.float32))

    def scalar(x):
        return jnp.sum(fused_head_loss_sums(x, g, use_pallas=True,
                                            interpret=True) * w)

    dx = np.asarray(jax.grad(scalar)(logits))
    assert np.isfinite(dx).all()
    np.testing.assert_allclose(dx[..., 2], 0.0, atol=1e-7)


def test_dice_score_and_bce_mask_ignores(rng):
    b, hw, c = 2, 16, 3
    probs = jnp.asarray(rng.uniform(0.01, 0.99, (b, hw, hw, c)).astype(np.float32))
    g = (rng.uniform(size=(b, hw, hw, c)) > 0.5).astype(np.float32)
    g[:, : hw // 2, :, 1] = -1.0
    gj = jnp.asarray(g)
    score = np.asarray(losses.dice_score(probs, gj))
    # equal to scoring only the valid region for the ragged channel
    keep = g[..., 1] >= 0
    pv = np.asarray(probs)[..., 1][keep]
    gv = g[..., 1][keep]
    expect = (2 * (pv * gv).sum() + losses.EPS) / ((pv + gv * gv).sum() + losses.EPS)
    np.testing.assert_allclose(score[1], expect, rtol=1e-5)

    bce = float(losses.binary_cross_entropy(probs, gj))
    per = np.maximum(np.asarray(probs), 0) - np.asarray(probs) * np.maximum(g, 0) \
        + np.log1p(np.exp(-np.abs(np.asarray(probs))))
    expect_bce = per[g >= 0].sum() / (g >= 0).sum()
    np.testing.assert_allclose(bce, expect_bce, rtol=1e-5)


def test_train_step_finite_on_ragged_batch(rng):
    """End-to-end: a ragged batch (missing organs as -1) trains NaN-free
    through the full jitted step — the integration-run regression."""
    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    img = 32
    model = build_model("unet", num_classes=3, encoder_name="resnet34")
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, img, img, 3), tx)
    step = make_train_step(model, tx, augment=False)
    lab = (rng.uniform(size=(4, img, img, 3)) > 0.5).astype(np.float32)
    lab[:2, :, :, 1] = -1.0
    lab[:, :, :, 2] = -1.0  # batch-wide missing organ
    batch = {
        "image": jnp.asarray(rng.rand(4, img, img, 3), jnp.float32),
        "label": jnp.asarray(lab),
    }
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)
    state, m = step(state, batch, jax.random.PRNGKey(1), 0.3, gates3, 3e-4, jitters)
    assert np.isfinite(float(m["loss"]))
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_eval_step_valid_flag_and_weighted_mean(rng):
    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
    )

    img = 32
    model = build_model("unet", num_classes=3, encoder_name="resnet34")
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, img, img, 3), make_optimizer()
    )
    ev = make_eval_step(model)
    lab = (rng.uniform(size=(2, img, img, 3)) > 0.5).astype(np.float32)
    lab[:, :, :, 2] = -1.0
    out = ev(state, {
        "image": jnp.asarray(rng.rand(2, img, img, 3), jnp.float32),
        "label": jnp.asarray(lab),
    })
    np.testing.assert_array_equal(np.asarray(out["valid"]), [1.0, 1.0, 0.0])
    assert np.isfinite(np.asarray(out["dice"])).all()
    assert np.isfinite(float(out["bce"]))

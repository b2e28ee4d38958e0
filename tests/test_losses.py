"""Golden-parity tests for the loss library against the PyTorch reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from ecologysemanticsegmentation_tpu import losses

from reference_oracle import load_reference_losses, reference_losses_fn

REF = load_reference_losses()

needs_ref = pytest.mark.skipif(REF is None, reason="reference repo/torch unavailable")


def _rand_pair(rng, b=2, h=24, w=24, c=1):
    """Random (sigmoided-pred, binary-label) pair. NHWC numpy."""
    pred = rng.uniform(0.02, 0.98, size=(b, h, w, c)).astype(np.float32)
    gt = (rng.uniform(size=(b, h, w, c)) > 0.6).astype(np.float32)
    return pred, gt


def _to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


@needs_ref
@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize("bg", [0.0, 0.5])
def test_seven_losses_match_reference(rng, c, bg):
    import torch

    pred, gt = _rand_pair(rng, c=c)
    ours = np.asarray(losses.seven_losses(jnp.asarray(pred), jnp.asarray(gt), bg))

    xt = torch.from_numpy(_to_nchw(pred))
    gtt = torch.from_numpy(_to_nchw(gt))
    ref = reference_losses_fn(REF, xt, gtt, background_weight=bg)

    np.testing.assert_allclose(ours, np.asarray(ref), rtol=2e-4, atol=2e-5)


@needs_ref
def test_dice_score_matches_reference_eval(rng):
    """Eval Dice = -dice_loss(pred, gt, background_weight=0) per organ
    (reference test_multiclass.py:80-82)."""
    import torch

    pred, gt = _rand_pair(rng, c=3)
    ours = np.asarray(losses.dice_score(jnp.asarray(pred), jnp.asarray(gt)))

    for organ in range(3):
        ref = -REF.dice_loss(
            torch.from_numpy(_to_nchw(pred))[:, organ : organ + 1],
            torch.from_numpy(_to_nchw(gt))[:, organ : organ + 1],
            background_weight=0,
        )
        np.testing.assert_allclose(ours[organ], float(ref), rtol=1e-5)


def test_ce_slot_is_zero(rng):
    """Probability-target CE over one channel is identically 0 (see docstring)."""
    pred, gt = _rand_pair(rng, c=3)
    out = np.asarray(losses.seven_losses(jnp.asarray(pred), jnp.asarray(gt), 0.3))
    assert out[0] == 0.0


def test_binary_cross_entropy_matches_torch(rng):
    import torch

    x = rng.normal(size=(4, 8, 8, 1)).astype(np.float32)
    y = (rng.uniform(size=(4, 8, 8, 1)) > 0.5).astype(np.float32)
    ours = float(losses.binary_cross_entropy(jnp.asarray(x), jnp.asarray(y)))
    ref = float(torch.nn.BCEWithLogitsLoss()(torch.from_numpy(x), torch.from_numpy(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_union_transform_forward(rng):
    """Forward: channel k -> clipped union of channels k..C-1, excluding index 0
    (reference utils/subsets_union.py:18-22)."""
    ann = (rng.uniform(size=(2, 8, 8, 4)) > 0.5).astype(np.float32)
    out = np.asarray(losses.return_union_sets_descending_order(jnp.asarray(ann)))

    expect = ann.copy()
    for idx in range(ann.shape[-1] - 1):
        if idx == 0:
            continue
        expect[..., idx] = ann[..., idx:].sum(axis=-1)
    expect = np.clip(expect, None, 1)
    np.testing.assert_array_equal(out, expect)


def test_union_transform_roundtrip(rng):
    """reverse(forward(x)) recovers nested organ sets when organs are truly
    nested (subset chain), the regime the transform is designed for."""
    base = (rng.uniform(size=(2, 16, 16)) > 0.4).astype(np.float32)
    # Build nested organs: organ0 ⊇ organ1 ⊇ organ2 (whole_body excluded at idx 0).
    o0 = base
    o1 = base * (rng.uniform(size=base.shape) > 0.3)
    o2 = o1 * (rng.uniform(size=base.shape) > 0.3)
    ann = np.stack([o0, o1, o2], axis=-1)

    fwd = losses.return_union_sets_descending_order(jnp.asarray(ann))
    rec = np.asarray(losses.return_union_sets_descending_order(fwd, reverse=True))
    # Index 0 is excluded in both directions; channel 2 (last) is untouched;
    # channel 1 recovers the difference set organ1 \ organ2 for nested organs.
    np.testing.assert_array_equal(rec[..., 0], o0)
    np.testing.assert_array_equal(rec[..., 2], o2)
    np.testing.assert_array_equal(rec[..., 1], o1 - o2)


def test_composite_general_runs(rng):
    pred, gt = _rand_pair(rng, c=3)
    out = losses.seven_losses_composite_general(jnp.asarray(pred), jnp.asarray(gt))
    assert out.shape == (7,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sequential_composite_deadbranch_runs(rng):
    pred, gt = _rand_pair(rng, c=3)
    out = losses.sequential_densenet_composite_deadbranch(jnp.asarray(pred), jnp.asarray(gt))
    assert out.shape == (7,)
    assert np.all(np.isfinite(np.asarray(out)))


@needs_ref
def test_sequential_cross_organ_matches_reference(rng):
    """Golden parity for the sequential trainer's EXECUTED multi-organ loss:
    per-organ tuples + losses_fn(g1-g2, |x1-x2|) added to organ 1
    (reference train_multiclass_sequential_densenetloss.py:279-290).

    Labels are union-transformed (nested) first — the call site's actual
    input class (``..._densenetloss.py`` applies the union transform before
    losses), under which ``g1-g2`` is in {0,1}.  On UNNESTED labels the
    difference has -1 values: the reference sums them raw and its
    focal_dice NaNs (log of a negative dice), while this framework treats
    -1 as the ignore sentinel (tests/test_ignore_labels.py) — a deviation
    that only exists where the reference produces NaN."""
    import torch

    pred, gt = _rand_pair(rng, c=3)
    # nest: channel k := clipped union of channels k.. (the training
    # transform, reference utils/subsets_union.py:18-22)
    gt[..., 1] = np.clip(gt[..., 1] + gt[..., 2], 0, 1)
    gt[..., 0] = np.clip(gt[..., 0] + gt[..., 1], 0, 1)
    ours = np.asarray(
        losses.sequential_cross_organ_losses(jnp.asarray(pred), jnp.asarray(gt))
    )
    xt, gtt = torch.from_numpy(_to_nchw(pred)), torch.from_numpy(_to_nchw(gt))
    base = reference_losses_fn(REF, xt, gtt)
    cross = reference_losses_fn(
        REF, gtt[:, 1:2] - gtt[:, 2:3], torch.abs(xt[:, 1:2] - xt[:, 2:3])
    )
    ref = np.asarray(base) + np.asarray(cross)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_seven_losses_jittable(rng):
    import jax

    pred, gt = _rand_pair(rng, c=3)
    f = jax.jit(losses.seven_losses)
    out = f(jnp.asarray(pred), jnp.asarray(gt), 0.2)
    assert out.shape == (7,)


REF_COMPOSITE = None
if REF is not None:
    from reference_oracle import load_reference_composite

    REF_COMPOSITE = load_reference_composite()


@pytest.mark.skipif(REF_COMPOSITE is None, reason="reference composite unavailable")
def test_composite_general_matches_reference(rng):
    """Golden parity for the general composite set-theory losses_fn
    (reference loss_composite.py:22-81) with early_stopped=False
    (deterministic: no np.random jitter)."""
    import torch

    pred, gt = _rand_pair(rng, c=3)
    ours = np.asarray(
        losses.seven_losses_composite_general(jnp.asarray(pred), jnp.asarray(gt), 0.0)
    )
    ref = REF_COMPOSITE.losses_fn(
        torch.from_numpy(_to_nchw(pred)), torch.from_numpy(_to_nchw(gt)),
        composite_set_theory=True, background_weight=0, early_stopped=False,
    )
    ref = np.asarray([float(v) for v in ref])
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)

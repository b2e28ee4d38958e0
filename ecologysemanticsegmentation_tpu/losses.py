"""Loss library: the 7-loss tuple, composite set-theory losses, union transform.

Pure jittable ``jnp`` functions, NHWC layout (``(B, H, W, C)`` with one channel
per organ).  This is a behavioral rebuild of the reference's
``loss_functions.py`` / ``loss_composite.py`` / ``utils/subsets_union.py`` —
numerics match the reference's *call sites*, not its signature names, because
the reference has an argument-order quirk that is load-bearing:

* Signatures read ``(gt, pred)`` but every call site passes ``(pred, gt)``
  (e.g. reference ``train_multiclass.py:139-141`` calls
  ``losses_fn(outputs, labels)``).
* For multi-organ inputs the per-channel recursion swaps the arguments again
  (``train_multiclass.py:260-262``), so the roles are restored.
* For single-organ inputs there is no recursion, so gt/pred stay swapped all
  the way into the loss formulas.  :func:`seven_losses` reproduces both cases.

Other reproduced quirks (reference ``loss_functions.py``):

* Predictions are sigmoided *before* the losses, yet the "BCE" path applies a
  BCE-*with-logits* formula to those probabilities (``__init__.py:24`` +
  ``train_multiclass.py:134``).
* Probability-target cross entropy over a single channel is identically zero
  (``log_softmax`` of a width-1 axis is 0) — the ``ce`` slot of the tuple is
  exactly 0 for every call the reference ever makes.
* Dice denominators use ``sum(gt + pred*pred)`` (``p*p``, not ``p``), the
  background dice denominator carries an extra factor of 2
  (``loss_functions.py:58``), and all dice-family losses return the *negative*
  coefficient.

The 7-tuple ordering is ``[ce, bce, focal, dice, generalized_dice, twersky,
focal_dice]`` (reference ``train_multiclass.py:294``).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-7

# Index names for the 7-loss tuple.
LOSS_NAMES = ("ce", "bce", "focal", "dice", "generalized_dice", "twersky", "focal_dice")


def binary_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable BCE-with-logits, mean reduction.

    Equivalent of the reference's module-level ``torch.nn.BCEWithLogitsLoss``
    (``ecology_semantic_segmentation/__init__.py:24``):
    ``mean(max(x, 0) - x*y + log(1 + exp(-|x|)))``.

    ``-1`` ignore-sentinel targets are masked out of the mean (see
    ops/pallas/loss_sums.py); identical on clean ``{0,1}`` targets.
    """
    x, y = logits, targets
    w = (y >= 0).astype(jnp.float32)
    per = jnp.maximum(x, 0.0) - x * (y * w) + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.sum(w * per) / jnp.maximum(jnp.sum(w), 1.0)


def prob_cross_entropy(pred: jax.Array, target_probs: jax.Array, axis: int = -1) -> jax.Array:
    """Probability-target cross entropy: ``mean(-sum(p * log_softmax(x), axis))``.

    General form of ``F.cross_entropy(input, float_target)``.  On a width-1
    channel axis this is identically 0 — the reference's ``ce`` slot
    (``loss_functions.py:29``).
    """
    logp = jax.nn.log_softmax(pred, axis=axis)
    return jnp.mean(-jnp.sum(target_probs * logp, axis=axis))


def seven_from_sums(
    sums: jax.Array, background_weight: jax.Array | float = 0.0
) -> jax.Array:
    """The 7-loss tuple from the fused per-channel reductions.

    ``sums`` is the (8, C) array of :mod:`.ops.pallas.loss_sums` —
    [Σg, Σp, Σp², Σgp, focal-fg, focal-bg, bce-p-part, N].  All reference
    formulas (``loss_functions.py:26-117``) are algebraic in these sums:
    Σ(1−g)(1−p) = N − Σg − Σp + Σgp, Σ(1−g)+Σ(1−p)² = 2N − Σg − 2Σp + Σp²,
    etc.  Quirks kept: the extra ×2 on the standard-dice background
    denominator (``:58``) but NOT on focal-dice's (``:103``); negative dice;
    ``p·p`` denominators; the ×3.3 classification_dice multiplier.
    """
    bg = background_weight
    s_g, s_p, s_pp, s_gp, s_flfg, s_flbg, s_bce, n = (sums[i] for i in range(8))

    # n is the per-channel count of NON-ignored pixels (the sums exclude the
    # -1 sentinel; see ops/pallas/loss_sums.py).  A channel ignored across
    # the whole batch has n == 0 and all-zero sums — the max(n, 1) guard
    # makes its mean terms 0 instead of 0/0, so such a channel contributes
    # constants (zero gradient) rather than NaNs.  On clean labels n is the
    # full element count and nothing changes.
    n = jnp.maximum(n, 1.0)
    ce = jnp.zeros_like(s_g)
    bce = (s_bce - s_gp) / n
    focal = (-s_flfg - bg * s_flbg) / n

    s_g0p0 = n - s_g - s_p + s_gp
    s_g1_p1sq = s_g + s_pp
    s_g0_p0sq = 2.0 * n - s_g - 2.0 * s_p + s_pp

    dice_fg = (2.0 * s_gp + EPS) / (s_g1_p1sq + EPS)
    dice_bg = (2.0 * s_g0p0 + EPS) / (2.0 * s_g0_p0sq + EPS)
    dice = -dice_fg - bg * dice_bg

    gd_fg = (s_gp + EPS) / (s_g1_p1sq + EPS)
    gd_bg = (s_g0p0 + EPS) / (s_g0_p0sq + EPS)
    generalized_dice = -(gd_fg + bg * gd_bg)

    alpha, beta = 0.5, 0.3
    tw_fg_d = s_gp + alpha * (s_g - s_gp) + beta * (s_p - s_gp)
    tw_fg = -(s_gp + EPS) / (tw_fg_d + EPS)
    tw_bg_d = s_g0p0 + alpha * (s_p - s_gp) + beta * (s_g - s_gp)
    tw_bg = -(s_g0p0 + EPS) / (tw_bg_d + EPS)
    twersky = tw_fg + bg * tw_bg

    gamma = 1.8
    fdc_fg = (2.0 * s_gp + EPS) / (s_g1_p1sq + EPS)
    fdc_bg = (2.0 * s_g0p0 + EPS) / (s_g0_p0sq + EPS)
    fd_fg = -jnp.power(1.0 - fdc_fg, gamma) * jnp.log(fdc_fg + EPS)
    fd_bg = -jnp.power(1.0 - fdc_bg, gamma) * jnp.log(fdc_bg + EPS)
    focal_dice = fd_fg + bg * fd_bg

    m = 10.0 * 0.33
    return jnp.stack(
        [ce, bce, focal, dice * m, generalized_dice * m, twersky * m, focal_dice * m]
    )


def _seven_per_channel(
    gt: jax.Array, pred: jax.Array, background_weight: jax.Array | float = 0.0
) -> jax.Array:
    """Compute the 7-loss tuple independently per channel; returns (7, C).

    ``gt``/``pred`` are NHWC.  Every reduction the reference performs over a
    ``(B, 1, H, W)`` slice becomes a per-channel reduction over ``(B, H, W)``
    here — the vectorized equivalent of the reference's Python recursion over
    organs (``train_multiclass.py:260-262``).  The reductions run in ONE pass
    over the activations via the fused Pallas kernel on TPU (jnp fallback
    elsewhere), and the tuple is reconstructed algebraically by
    :func:`seven_from_sums`.
    """
    from .ops.pallas.loss_sums import loss_sums_nhwc

    sums = loss_sums_nhwc(pred.astype(jnp.float32), gt.astype(jnp.float32))
    return seven_from_sums(sums, background_weight)


def seven_losses(
    x: jax.Array, g: jax.Array, background_weight: jax.Array | float = 0.0
) -> jax.Array:
    """The reference's per-script ``losses_fn`` (``train_multiclass.py:253-303``).

    ``x`` = sigmoided predictions, ``g`` = labels, both NHWC.  Returns the
    ``(7,)`` loss vector summed over organs (reference sums per-organ tuples,
    ``train_multiclass.py:262``).

    Argument-role parity (see module docstring): multi-organ restores
    (gt=labels, pred=preds); single-organ keeps them swapped.

    Background-weight parity (a subtle one): the reference's multi-organ
    recursion calls ``losses_fn(g[:,i], x[:,i])`` with only two arguments
    (``train_multiclass.py:260``), so ``background_weight`` reverts to its
    default 0 inside — the background-weight *schedule is a no-op for
    multi-organ training* in the reference.  Replicated exactly: bg applies
    only to single-organ inputs.
    """
    if x.shape[-1] > 1:
        gt, pred = g, x
        background_weight = 0.0  # dropped by the reference's recursion
    else:
        gt, pred = x, g
    per = _seven_per_channel(gt, pred, background_weight)
    return jnp.sum(per, axis=-1)


def seven_losses_lowres(
    logits_lr: jax.Array, g: jax.Array, background_weight: jax.Array | float = 0.0
) -> jax.Array:
    """:func:`seven_losses` with the head's bilinear x4 upsample + sigmoid
    folded into the reduction kernel (:mod:`.ops.pallas.head_loss`).

    ``logits_lr`` = pre-sigmoid logits at the decoder's 1/4 resolution,
    ``g`` = full-resolution labels.  Multi-organ only (``C > 1``): the
    reference's per-channel recursion restores the gt/pred argument roles
    and drops ``background_weight`` (``train_multiclass.py:260``), so this
    matches ``seven_losses(sigmoid(upsample(logits)), g)`` exactly — the
    single-organ swapped-argument case cannot be expressed low-res and is
    rejected.
    """
    del background_weight  # dropped by the reference's multi-organ recursion
    assert g.shape[-1] > 1, "seven_losses_lowres is multi-organ only"
    from .ops.pallas.head_loss import fused_head_loss_sums

    # Labels are exactly {-1, 0, 1} (binarize + nearest-warp), so bf16 is a
    # lossless halving of the kernel's label traffic; the kernel upcasts each
    # tile to f32 before reducing.
    sums = fused_head_loss_sums(logits_lr, g.astype(jnp.bfloat16))
    per = seven_from_sums(sums, 0.0)
    return jnp.sum(per, axis=-1)


def seven_losses_lowres_spatial(
    logits_lr: jax.Array, g: jax.Array, mesh,
    data_axis: str = "data", model_axis: str = "model",
) -> jax.Array:
    """:func:`seven_losses_lowres` with the fused kernel explicitly
    partitioned over a ``(data, model)`` mesh (labels row-sharded over
    ``model``) via :func:`.ops.pallas.head_loss.head_sums_spatial` — the
    ``--spatial_partition`` training path, where a bare ``pallas_call``
    would force XLA to all-gather the full-resolution labels per device."""
    assert g.shape[-1] > 1, "seven_losses_lowres is multi-organ only"
    from .ops.pallas.head_loss import head_sums_spatial

    sums = head_sums_spatial(logits_lr, g.astype(jnp.bfloat16), mesh,
                             data_axis=data_axis, model_axis=model_axis)
    per = seven_from_sums(sums, 0.0)
    return jnp.sum(per, axis=-1)


def seven_losses_composite_general(
    x: jax.Array,
    g: jax.Array,
    background_weight: jax.Array | float = 0.0,
    relative_set_ratios: Sequence[float] = (1.0, 0.43197708, 0.22319692),
    early_stop_weights: np.ndarray | None = None,
) -> jax.Array:
    """The generalized composite set-theory ``losses_fn`` (``loss_composite.py:22-81``).

    For every superset index ``idx`` and subset index ``jdx > idx`` adds
    intersection, regularized-union, difference-set and Russel's-paradox loss
    terms, weighted by ``1/relative_set_ratios`` with optional early-stop
    jitter.

    ``early_stop_weights``: host-computed multiplicative jitters of shape
    ``(num_pairs, 3)`` — the ``(1 - early_stopped * choice([0,1]) * rand())``
    factors for ``(w_idx, w_jdx, w_diff)`` per (idx, jdx) pair
    (``loss_composite.py:48-52``).  ``None`` means no jitter (not early
    stopped).  Host-side randomness keeps the jitted graph static, matching
    the reference's ``np.random`` (host) semantics.
    """
    C = g.shape[-1]
    ratios = list(relative_set_ratios)

    base = seven_losses(x, g, background_weight)
    # LossList doubling: `return_losses += return_losses` for C==1
    # (loss_composite.py:42); the C>1 branch of loss_composite recurses into
    # per-channel calls that each double, so the sum is doubled either way.
    total = base * 2.0

    pair_idx = 0
    for idx in range(C - 1):
        for jdx in range(idx + 1, C):
            if early_stop_weights is None:
                j_i = j_j = j_d = 1.0
            else:
                j_i = early_stop_weights[pair_idx][0]
                j_j = early_stop_weights[pair_idx][1]
                j_d = early_stop_weights[pair_idx][2]
            pair_idx += 1

            w_idx = (1.0 / ratios[idx]) * j_i
            w_jdx = (1.0 / ratios[jdx]) * j_j
            w_diff = (1.0 / (ratios[idx] - ratios[jdx])) * j_d

            xs = x[..., idx : idx + 1]
            xj = x[..., jdx : jdx + 1]
            gs = g[..., idx : idx + 1]
            gj = g[..., jdx : jdx + 1]
            xdiff = jnp.abs(xs - xj)
            gdiff = jnp.abs(gs - gj)

            # Rigid-subset intersection / union (loss_composite.py:56-61).
            total = total + intersection_loss(xs, xj, gj) * w_jdx
            total = total + union_loss(xs, xj, gs) * w_idx
            # Difference-set terms (loss_composite.py:63-72).
            total = total + intersection_loss(xs, xdiff, gdiff) * w_diff
            total = total + union_loss(xs, xdiff, gs) * w_idx
            # Russel's paradox terms (loss_composite.py:74-81).
            total = total + intersection_loss(xs, xdiff * xs, gdiff) * w_diff
            total = total + union_loss(xs, xdiff * xs, gs) * (w_idx * w_idx * w_jdx)
    return total


def intersection_loss(superset_p: jax.Array, set_p: jax.Array, set_g: jax.Array) -> jax.Array:
    """``losses_fn(superset_p * set_p, set_g)`` (reference ``loss_composite.py:84-85``).

    The ×2: ``loss_composite.losses_fn``'s single-channel path ends with
    ``return_losses += return_losses`` (``loss_composite.py:42``), so every
    intersection/union term enters the composite sum doubled.
    """
    return 2.0 * seven_losses(superset_p * set_p, set_g)


def union_loss(superset_p: jax.Array, set_p: jax.Array, superset_g: jax.Array) -> jax.Array:
    """Numerically-regularized union loss (reference ``loss_composite.py:89-92``).

    Note the reference passes ``(superset_g, union_expr)`` — i.e. the *label*
    in the prediction slot — so for single-channel inputs the swap inside
    :func:`seven_losses` puts the union expression back into the gt role.
    Doubled for the same reason as :func:`intersection_loss`.
    """
    union_expr = superset_p * (1.0 - set_p) + (superset_p * set_p + set_p) * 0.5
    return 2.0 * seven_losses(superset_g, union_expr)


def sequential_cross_organ_losses(x: jax.Array, g: jax.Array) -> jax.Array:
    """The sequential trainer's *executed* loss
    (reference ``train_multiclass_sequential_densenetloss.py:279-290``):
    per-organ 7-tuples summed, PLUS a cross-organ term added to organ 1 —
    ``losses_fn(g[:,1]−g[:,2], |x[:,1]−x[:,2]|)`` (line 285; note: no abs on
    the label difference, abs on the prediction difference).

    The script's ``composite_set_theory`` branch below it (lines 304-362) is
    unreachable: the multi-organ recursion returns early at line 290 before
    the branch, and the flag is only True for multi-organ configs.  (It is
    also name-broken — ``ventral_side_w`` is undefined — and would crash
    zipping 0-d tensors.)  A working form of that dead branch is kept as
    :func:`sequential_densenet_composite_deadbranch` for inventory parity.
    """
    assert x.shape[-1] >= 3, "sequential cross-organ loss assumes >= 3 organs"
    base = seven_losses(x, g)
    cross = seven_losses(
        g[..., 1:2] - g[..., 2:3], jnp.abs(x[..., 1:2] - x[..., 2:3])
    )
    return base + cross


def sequential_densenet_composite_deadbranch(
    x: jax.Array,
    g: jax.Array,
    background_weight: jax.Array | float = 0.0,
    early_stop_jitters: np.ndarray | None = None,
) -> jax.Array:
    """Working form of the sequential script's unreachable composite branch
    (reference ``train_multiclass_sequential_densenetloss.py:304-362``):
    ventral-union/ventral-side/Russel/dorsal/densenet-chained intersection
    ("negative") and regularized-union ("positive") terms with weights
    2.4376…, 4.4803… (and 4.7897… for the undefined ``ventral_side_w``, per
    the branch's own comment).  The reference code would crash if reached
    (zip over 0-d tensors, NameError); here the evident intent — elementwise
    7-tuple accumulation — is implemented.

    ``early_stop_jitters``: (2,) multiplicative factors for the
    ventral_union/dorsal weights, or None for 1.0.
    """
    base = seven_losses(x, g, background_weight)

    wb_g, wb_p = g[..., 0:1], x[..., 0:1]
    vu_g, vu_p = g[..., 1:2], x[..., 1:2]
    ds_g, ds_p = g[..., 2:3], x[..., 2:3]
    vs_g = jnp.abs(vu_g - ds_g)
    vs_p = jnp.abs(vu_p - ds_p)

    if early_stop_jitters is None:
        jv, jd = 1.0, 1.0
    else:
        jv, jd = early_stop_jitters[0], early_stop_jitters[1]
    ventral_union_w = 2.4376792669332903 * jv
    dorsal_side_w = 4.480348563949717 * jd
    ventral_side_w = 4.789727146487483  # the branch's NameError, per its comment

    def union_expr(sup_p, sub_p):
        return sup_p * (1.0 - sub_p) + (sup_p * sub_p + sub_p) * 0.5

    vu_neg = seven_losses(vu_g, wb_p * vu_p)
    vs_neg = seven_losses(vs_g, wb_p * vs_p)
    vr_neg = seven_losses(vs_g, vu_p * vs_p)
    ds_neg = seven_losses(ds_g, wb_p * ds_p)
    du_neg = seven_losses(ds_g, vu_p * ds_p)

    vu_pos = seven_losses(wb_g, union_expr(wb_p, vu_p))
    vs_pos = seven_losses(wb_g, union_expr(wb_p, vs_p))
    vr_pos = seven_losses(vs_g, union_expr(vu_p, vs_p))
    ds_pos = seven_losses(wb_g, union_expr(wb_p, ds_p))
    du_pos = seven_losses(vu_g, union_expr(vu_p, ds_p))

    r1 = (base + ventral_side_w * (vs_neg + ds_neg)
          + ventral_union_w * (vu_neg + du_neg) + 4.0 * vr_neg)
    r2 = (base + dorsal_side_w * (2.0 * ds_pos + vs_pos)
          + vu_pos + 4.0 * ventral_union_w * du_pos + 4.0 * vr_pos)
    return r1 + r2


# Backwards-compatible alias (earlier name for the dead-branch form).
sequential_densenet_composite = sequential_densenet_composite_deadbranch


def composite_jitters(
    rng: np.random.RandomState | None, num_pairs: int, early_stopped: bool
) -> np.ndarray:
    """Host-side early-stop jitter factors: ``1 - early_stopped * choice([0,1]) * rand()``
    (reference ``loss_composite.py:48-52``)."""
    if not early_stopped:
        return np.ones((num_pairs, 3), np.float64)
    rng = rng or np.random.RandomState()
    return 1.0 - rng.randint(0, 2, (num_pairs, 3)) * rng.rand(num_pairs, 3)


def dice_score(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Per-organ evaluation Dice = ``-dice_loss(pred, gt, background_weight=0)``
    exactly as the eval harness computes it (reference
    ``test_multiclass.py:80-82``; signature swap means gt/pred roles follow the
    call site: ``dice_loss(outputs_organ, gt_organ)`` → gt:=pred, pred:=gt).

    Inputs NHWC; returns shape ``(C,)`` per-organ scores in [0, 1]-ish.
    """
    g, p = pred.astype(jnp.float32), gt.astype(jnp.float32)  # call-site swap
    # Ignore-mask the LABEL side (post-swap that is ``p``): -1 sentinel
    # pixels drop out of both sums, as in ops/pallas/loss_sums.py.  On clean
    # labels w == 1 and the score is unchanged.
    w = (p >= 0).astype(jnp.float32)
    p = p * w
    red = (0, 1, 2)
    num = 2.0 * jnp.sum(g * p, axis=red) + EPS
    den = jnp.sum(w * (g + p * p), axis=red) + EPS
    return num / den


def return_union_sets_descending_order(
    ann: jax.Array, exclude_indices: Sequence[int] = (0,), reverse: bool = False
) -> jax.Array:
    """Union-set label transform over the organ (last) axis, NHWC.

    Forward: channel ``k`` becomes the clipped union of channels ``k..C-1``
    (training-target transform, reference ``utils/subsets_union.py:18-22``,
    applied at ``train_multiclass.py:110``).  Channels listed in
    ``exclude_indices`` are left untouched.

    Reverse: adjacent absolute differences recover organ sets from nested
    unions at test time (``utils/subsets_union.py:23-28``), iterating from the
    second-to-last channel down so each step sees the *already updated* next
    channel.

    Ignore-awareness (deviation, documented in PARITY.md): ``-1`` ignore
    channels must not leak into the union — the reference sums them raw, so
    e.g. ``(1, -1, 0)`` unions to ``0``, silently flipping an annotated
    superset pixel to background (and ``(-1, -1)`` to ``-2``).  Here ignored
    channels are excluded from the sum and a channel whose OWN label is
    ignored stays ignored (its union is unknowable — the nested-organ union
    ``k..C-1`` equals organ ``k`` itself).  Identical to the reference on
    clean ``{0,1}`` labels.
    """
    C = ann.shape[-1]
    excl = set(int(i) for i in exclude_indices)
    if not reverse:
        pos = jnp.maximum(ann, 0)
        out = ann
        for idx in range(C - 1):
            if idx in excl:
                continue
            union = jnp.sum(pos[..., idx:], axis=-1)
            out = out.at[..., idx].set(
                jnp.where(ann[..., idx] < 0, ann[..., idx], union))
        return jnp.clip(out, max=1)
    out = ann
    for idx in range(C - 2, -1, -1):
        if idx in excl:
            continue
        out = out.at[..., idx].set(jnp.abs(out[..., idx] - out[..., idx + 1]))
    return out


def binary_cross_entropy_list(gts: Sequence[jax.Array], preds: Sequence[jax.Array]) -> jax.Array:
    """Deep-supervision BCE over a pyramid of (gt, pred) pairs.

    Reference ``loss_functions.py:13-20`` allocates a fixed 6-slot accumulator
    (a 6-level pyramid: full + [128, 64, 32, 16, 8]); we keep that contract and
    reject longer lists.
    """
    assert len(gts) <= 6, "reference binary_cross_entropy_list supports at most 6 levels"
    total = jnp.zeros((), jnp.float32)
    for y, p in zip(gts, preds):
        total = total + binary_cross_entropy(p, y)
    return total


def cross_entropy_list(gts: Sequence[jax.Array], preds: Sequence[jax.Array]) -> jax.Array:
    """Working form of reference ``cross_entropy_list`` (``loss_functions.py:22``).

    The reference's lambda calls ``torch.sum`` on a Python list — a TypeError
    if ever invoked (dead-if-called code); here it is the obvious working sum.
    Prob-target CE over single-channel pyramids is identically 0 (see
    :func:`prob_cross_entropy`), kept for parity.
    """
    total = jnp.zeros((), jnp.float32)
    for y, p in zip(gts, preds):
        total = total + prob_cross_entropy(p, y)
    return total


def focal_list(
    gts: Sequence[jax.Array], preds: Sequence[jax.Array], factor: float = 0.1
) -> jax.Array:
    """Working form of reference ``focal_list`` (``loss_functions.py:23``);
    same dead-``torch.sum``-on-list caveat as :func:`cross_entropy_list`."""
    total = jnp.zeros((), jnp.float32)
    for y, p in zip(gts, preds):
        fl = -jnp.power(1.0 - p, 1.5) * jnp.log(p + EPS)
        total = total + factor * jnp.mean(fl)
    return total


def classification_dice_list(gts: Sequence[jax.Array], preds: Sequence[jax.Array]) -> jax.Array:
    """Working form of reference ``classification_dice_list``
    (``loss_functions.py:24``): sums the 4 dice-family losses per pyramid level
    with background_weight=1 and ``classification_dice_loss``'s *default*
    factor 1e3 (multiplier 330 = 100x the trainers' factor-10 form); returns a
    (4,) vector.  (The reference lambda is dead-if-called: it passes a ``bce``
    kwarg the callee doesn't accept and ``torch.sum``s a Python list.)"""
    total = jnp.zeros((4,), jnp.float32)
    for y, p in zip(gts, preds):
        per = _seven_per_channel(y, p, background_weight=1.0)
        total = total + 100.0 * jnp.sum(per[3:7], axis=-1)
    return total


@functools.partial(jax.jit, static_argnames=("num_classes",))
def relative_ratios(segments: jax.Array, num_classes: int) -> jax.Array:
    """Per-organ positive-pixel ratios, the source of the hardcoded loss
    weights (reference ``fish_dataset.py:117-141``; values cited at
    ``train_multiclass.py:255-257``).  ``segments`` NHWC binary; returns (C,)
    normalized so the max organ is 1.
    """
    del num_classes
    sums = jnp.sum(segments, axis=(0, 1, 2))
    ratios = sums / jnp.maximum(jnp.max(sums), 1.0)
    return ratios

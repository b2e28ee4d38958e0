"""The jitted train/eval steps and train-state plumbing.

TPU-first core design (SURVEY.md §7): ONE jitted ``train_step`` contains
device-side augmentation, the union-set label transform, model forward +
backward, the full 7-loss tuple, and the Adam update.  Everything the
reference does as dozens of small Python-level kernels per batch
(``train_multiclass.py:105-148``) is a single XLA program here.

Scalar knobs that change every epoch (learning rate, background weight,
curriculum gates, composite jitters) enter as *traced arguments*, so the step
compiles exactly once per (model, shape) config.

Under a data-sharded batch (see :mod:`..parallel.mesh`) GSPMD turns the loss
reductions into global reductions: gradient all-reduce and cross-replica
BatchNorm fall out automatically.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data import augment as _augment
from ..data.augment import augment_batch as _augment_batch_uniform
from ..data.augment import augment_batch_per_sample

# AUGMENT_PER_SAMPLE=1 selects the reference's per-sample parameter
# granularity (slower: batch-level cond gates become selects under vmap);
# default is the batch-uniform pipeline (quality A/B'd equivalent,
# RESULTS.md round 3).  Module-level so experiments can monkeypatch
# ``trainer.augment_batch`` (the patch must persist through the first
# jitted CALL — trace time — not just make_train_step).
augment_batch = (
    augment_batch_per_sample if _augment.PER_SAMPLE else _augment_batch_uniform
)
from ..losses import (
    LOSS_NAMES,
    binary_cross_entropy,
    binary_cross_entropy_list,
    dice_score,
    return_union_sets_descending_order,
    seven_losses,
    seven_losses_composite_general,
    sequential_cross_organ_losses,
)


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(lr: float = 3e-4, grad_accum: int = 1) -> optax.GradientTransformation:
    """Adam with an injectable learning rate (epoch schedules are applied by
    overwriting the hyperparam, exactly like torch schedulers mutate the
    optimizer's lr).

    ``grad_accum=K`` wraps in ``optax.MultiSteps``: K micro-batch gradients
    are averaged into one Adam update (zero updates in between), letting
    large-image configs (IMGSIZE >= 512) keep an effective batch HBM can't
    hold at once.  Semantics notes: batch-COUPLED loss terms (the dice
    family normalizes over the micro-batch) make K x B accumulation a
    slightly different objective than one K*B batch, and BatchNorm statistics
    update per micro-batch — both standard accumulation behavior.  The
    optimizer-state pytree changes shape, so resume with the same
    ``--grad_accum``.

    Deliberately NOT wrapped in ``optax.flatten``: measured on v5e at batch
    128 the flat-vector update wins only in isolation (7.2 -> 5.0 ms) while
    the end-to-end step is unchanged (XLA overlaps the per-leaf updates
    inside the fused step), and flattening changes the ``mu``/``nu``
    checkpoint pytree — every previously saved msgpack checkpoint would
    silently fail to resume (RESULTS.md, round-2 A/B log)."""
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def create_train_state(model, rng, input_shape, tx) -> TrainState:
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.zeros(input_shape, jnp.float32),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def _prepare_labels(labels: jax.Array) -> jax.Array:
    """Post-augmentation label prep: binarize positives (reference
    ``fish_dataset.py:161``, applied after augmentation) then the union-set
    transform (``train_multiclass.py:110``)."""
    labels = jnp.where(labels > 0, 1.0, labels)
    return return_union_sets_descending_order(labels)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    composite_mode: str = "none",
    augment: bool = True,
    loss_formula: str = "multiclass",
    deepsupervision: bool = False,
    lowres_head: bool = False,
    k_steps: int = 1,
    scan_unroll: int = 1,
    spatial_mesh=None,
) -> Callable:
    """Build the jitted train step.

    ``composite_mode``: "none" | "general" | "sequential" — which losses_fn
    variant supplies the 7-tuple (reference per-script vs loss_composite.py).
    ``loss_formula``: "multiclass" -> ``focal_dice_w*fd + bce_w*bce +
    gdice_w*(gd+tw)`` (``train_multiclass.py:145``); "sequential" -> same
    gates, BCE term first (``..._densenetloss.py:151``) — numerically equal,
    kept for documentation.

    Step signature:
    ``step(state, batch, rng, bg_weight, gates3, lr, jitters) -> (state, metrics)``
    where ``gates3 = [focal_dice_w, bce_l_w, generalized_dice_w]`` and
    ``jitters`` is the composite early-stop jitter array (pass ones when not
    early-stopped; ignored for composite_mode="none").

    The input ``state`` is DONATED (its device buffers are reused for the
    output state) — never reuse a state object after passing it to the step.

    ``lowres_head``: the model was built with ``upsample_head=False`` (it
    emits 1/4-resolution logits) and the x4 bilinear upsample + sigmoid are
    folded into the fused loss-sums kernel (:mod:`..ops.pallas.head_loss`)
    so the full-resolution logit/probability tensors never touch HBM.
    Valid only for the plain multi-organ losses_fn (``composite_mode=
    "none"``, no deep supervision): the composite variants consume
    full-resolution probability *slices* directly.

    ``k_steps``: number of train steps fused into one dispatch via
    ``lax.scan``.  With ``k_steps > 1`` the returned callable has the same
    signature but ``batch`` leaves carry a leading (K,) axis (K
    device-resident batches) and the returned metrics are stacked (K,).
    Amortizes the remote-relay dispatch floor + inter-step device idle.

    ``spatial_mesh``: with ``lowres_head``, partition the fused head-loss
    kernel explicitly over this ``(data, model)`` mesh (labels row-sharded
    over ``model`` — the ``--spatial_partition`` path; see
    :func:`..losses.seven_losses_lowres_spatial`).
    """
    assert composite_mode in ("none", "general", "sequential")
    assert k_steps >= 1
    if lowres_head:
        assert composite_mode == "none" and not deepsupervision, (
            "lowres_head folds the upsample into the plain seven_losses path"
        )

    def seven_fn(probs, labels, bg_weight, jitters):
        if composite_mode == "general":
            return seven_losses_composite_general(
                probs, labels, bg_weight, early_stop_weights=jitters
            )
        if composite_mode == "sequential":
            # The sequential script's EXECUTED multi-organ semantics: summed
            # per-organ tuples + the cross-organ |x1-x2| term.  (Its
            # composite_set_theory branch is unreachable dead code — see
            # losses.sequential_cross_organ_losses docstring.)
            del jitters
            return sequential_cross_organ_losses(probs, labels)
        return seven_losses(probs, labels, bg_weight)

    # TPU compiler knob passthrough (client-side XLA_FLAGS can't carry
    # tpu-server flags through the remote relay; jit compiler_options can).
    # TPU-only: other backends reject unknown compile options.
    _vmem = os.environ.get("TPU_SCOPED_VMEM_KIB")
    _copts = (
        {"xla_tpu_scoped_vmem_limit_kib": _vmem}
        if _vmem and jax.devices()[0].platform == "tpu" else None
    )

    def _step_body(state, batch, rng, bg_weight, gates3, lr, jitters):
        images, labels = batch["image"], batch["label"]
        if augment:
            aug_rng = jax.random.fold_in(rng, 0)
            images, labels = augment_batch(aug_rng, images, labels)
        labels = _prepare_labels(labels)
        images = images.astype(jnp.bfloat16)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, 1)},
            )
            if lowres_head:
                from ..losses import seven_losses_lowres, seven_losses_lowres_spatial

                if spatial_mesh is not None:
                    # --spatial_partition: labels stay row-sharded over the
                    # mesh 'model' axis through the fused kernel (explicit
                    # shard_map; a bare pallas_call would make GSPMD gather
                    # the full-resolution labels per device).
                    seven = seven_losses_lowres_spatial(out, labels, spatial_mesh)
                else:
                    seven = seven_losses_lowres(out, labels)
                loss = (
                    gates3[0] * seven[6]
                    + gates3[1] * seven[1]
                    + gates3[2] * (seven[4] + seven[5])
                )
                return loss, (seven, mutated["batch_stats"])
            ds_heads = ()
            if deepsupervision:
                # Model returns (logits, [side heads shallowest-first]) — the
                # reference's promised-but-empty deepsupervision path
                # (model/deepsupervision.py is a 0-line file; plumbing at
                # fish_dataset.py:162-164), completed here: side heads are
                # scored with BCE against resized label pyramids.
                out, ds_heads = out
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            if spatial_mesh is not None:
                # --spatial_partition on the full-resolution loss paths:
                # reroute every loss_sums_nhwc reduction inside losses_fn
                # through its shard_map form (trace-time context; the
                # seven_losses* signatures stay parity-frozen).
                from ..ops.pallas.loss_sums import spatial_mesh_context

                with spatial_mesh_context(spatial_mesh):
                    seven = seven_fn(probs, labels, bg_weight, jitters)
            else:
                seven = seven_fn(probs, labels, bg_weight, jitters)
            loss = (
                gates3[0] * seven[6]          # focal_dice
                + gates3[1] * seven[1]        # bce
                + gates3[2] * (seven[4] + seven[5])  # generalized_dice + twersky
            )
            if deepsupervision:
                from ..ops.resize import resize_nearest

                ds_gts = [
                    resize_nearest(labels, h.shape[1:3]) for h in ds_heads
                ]
                ds_probs = [jax.nn.sigmoid(h.astype(jnp.float32)) for h in ds_heads]
                loss = loss + binary_cross_entropy_list(ds_gts, ds_probs)
            return loss, (seven, mutated["batch_stats"])

        (loss, (seven, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        opt_state = state.opt_state
        # inject_hyperparams' dict sits one level deeper under MultiSteps
        inner = (opt_state.inner_opt_state
                 if isinstance(opt_state, optax.MultiStepsState) else opt_state)
        inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {name: seven[i] for i, name in enumerate(LOSS_NAMES)}
        metrics["loss"] = loss
        metrics["lr"] = jnp.asarray(lr, jnp.float32)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
            ),
            metrics,
        )

    if k_steps == 1:
        return functools.partial(
            jax.jit, donate_argnums=(0,), compiler_options=_copts
        )(_step_body)

    # Multi-step dispatch: lax.scan K step bodies inside ONE jitted program.
    # Each dispatch through the remote relay costs a ~3.7 ms floor plus ~3 ms
    # of measured per-step device IDLE (relay dispatch gaps, RESULTS.md
    # profile); scanning K steps pays that once per K.  ``batch`` leaves
    # carry a leading (K,) axis; metrics come back stacked (K,) so callers
    # can still log per-batch values.
    @functools.partial(jax.jit, donate_argnums=(0,), compiler_options=_copts)
    def train_step_scan(state, batches, rng, bg_weight, gates3, lr, jitters):
        def body(state, xs):
            batch, i = xs
            return _step_body(
                state, batch, jax.random.fold_in(rng, i),
                bg_weight, gates3, lr, jitters,
            )
        return jax.lax.scan(
            body, state, (batches, jnp.arange(k_steps, dtype=jnp.uint32)),
            unroll=scan_unroll,
        )

    return train_step_scan


def make_eval_step(model, apply_union_reverse: bool = False) -> Callable:
    """Jitted eval step: forward + sigmoid + per-organ Dice + val BCE.

    ``apply_union_reverse``: the sequential evaluator transforms predictions
    back from nested unions to organ sets before scoring (reference
    ``test_multiclass_sequential_densenetloss.py:66``).
    """

    @jax.jit
    def eval_step(state: TrainState, batch):
        images = batch["image"].astype(jnp.bfloat16)
        labels = jnp.where(batch["label"] > 0, 1.0, batch["label"])
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        if isinstance(out, tuple):
            # deep-supervision models return (main, side_heads); evaluation
            # scores the MAIN head (the side heads exist only as training
            # losses — reference's promised deepsupervision semantics).  The
            # side heads are dead here, so XLA drops their compute entirely.
            out = out[0]
        probs = jax.nn.sigmoid(out.astype(jnp.float32))
        scored = probs
        if apply_union_reverse:
            scored = return_union_sets_descending_order(probs, reverse=True)
        dice = dice_score(scored, labels)
        # Per-organ batch validity: an organ with NO non-ignored pixel in
        # this batch (ragged data, -1 sentinel everywhere) has a degenerate
        # eps/eps Dice — the evaluator weights batches by this flag so
        # absent organs don't score a fake 1.0.  Clean data: always 1.
        valid = (jnp.sum(labels >= 0, axis=(0, 1, 2)) > 0).astype(jnp.float32)
        # Val loss = BCE(+dice) as the reference's val loop computes it
        # (train_multiclass.py:195-205 uses the bce path on sigmoided outputs).
        bce = binary_cross_entropy(probs, labels)
        return {"probs": probs, "dice": dice, "bce": bce, "valid": valid}

    return eval_step


def make_forward(model) -> Callable:
    """Plain jitted inference forward (sigmoid probabilities)."""

    @jax.jit
    def forward(state: TrainState, images):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images.astype(jnp.bfloat16),
            train=False,
        )
        if isinstance(out, tuple):  # deep-supervision: main head only
            out = out[0]
        return jax.nn.sigmoid(out.astype(jnp.float32))

    return forward

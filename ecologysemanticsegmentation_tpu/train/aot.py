"""AOT train-step cache: serialize the lowered train step so repeat runs
skip Python tracing/lowering.

Cold-starting a training run pays trace + lower + compile for the full
fused step (augmentation + fwd/bwd + 7-loss tuple + Adam) — 3-5 minutes on
this host (CLAUDE.md), and the serving-side A/B showed the dominant share is
the *client-side* Python trace/lower on one CPU core, not the backend
compile (``experiments/export_coldstart_tpu.log``: 842.9 s from checkpoint
vs 25.4 s from a StableHLO artifact).  This module applies the same trick to
training: ``--aot_cache DIR`` on the train CLIs serializes the jitted step
(``jax.export``) keyed by everything that shapes the trace; subsequent runs
with the same config deserialize StableHLO and go straight to the backend
compile.

Design notes (TPU-first, reference has no analog — torch re-traces nothing
but pays Python dispatch every step instead):

- The step is exported through a FLAT calling convention (leaves only) so no
  custom pytree types (flax ``TrainState``, optax named tuples) need
  ``jax.export`` serialization registration; the in/out treedefs travel in a
  pickled sidecar inside the same artifact file.  The loaded step rebuilds
  the exact ``(TrainState, metrics)`` structure.
- The loaded callable re-applies ``donate_argnums`` over the state leaves,
  preserving the trainer's buffer-donation contract (the input state is
  consumed either way).
- Pallas kernels lower to ``tpu_custom_call`` which ``jax.export`` refuses
  by default (no cross-version compatibility guarantee).  A cache — unlike a
  portability artifact — is consumed by the same jax/platform that wrote it,
  so the check is disabled and the cache key carries
  ``jax.__version__`` + platform: any mismatch is a different file, and a
  stale artifact that still fails to load falls back to a normal build.
- Artifacts hold NO weights (the state is an argument), so they are small
  (hundreds of KB) and checkpoint-agnostic: one artifact serves every
  resume/restart of the same config.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import warnings
from typing import Any, Callable, Sequence

_MAGIC = b"ESTPU-AOT-1\n"


def train_step_cache_key(config: dict) -> str:
    """Digest of everything that shapes the traced program: caller-supplied
    config (model/shape/flag dict) + jax version + backend platform + the
    env knobs that alter the augmentation/remat trace."""
    import jax

    env = {
        k: v
        for k, v in os.environ.items()
        if k.startswith(("AUGMENT_", "VGG_REMAT", "TPU_SCOPED_VMEM"))
    }
    payload = repr(
        (
            sorted(config.items()),
            sorted(env.items()),
            jax.__version__,
            jax.devices()[0].platform,
        )
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def export_train_step(step_fn: Callable, example_args: Sequence[Any]) -> bytes:
    """Trace + lower ``step_fn`` at the shapes/dtypes of ``example_args``
    (concrete arrays or ShapeDtypeStructs) and serialize it.  Returns the
    artifact bytes (StableHLO + treedef sidecar)."""
    import jax
    from jax import export as jexport

    in_leaves, in_tree = jax.tree.flatten(tuple(example_args))
    n_state = len(jax.tree.leaves(example_args[0]))

    cell: dict = {}

    def flat(*leaves):
        args = jax.tree.unflatten(in_tree, leaves)
        out = step_fn(*args)
        out_leaves, out_tree = jax.tree.flatten(out)
        cell["out_tree"] = out_tree
        return tuple(out_leaves)

    specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in in_leaves]
    exported = jexport.export(
        jax.jit(flat),
        # Pallas kernels are tpu_custom_call; fine for a same-version cache
        # (the key pins jax version + platform), see module docstring.
        disabled_checks=[jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")],
    )(*specs)
    sidecar = pickle.dumps(
        {
            "in_tree": in_tree,
            "out_tree": cell["out_tree"],
            "n_state": n_state,
            "jax": jax.__version__,
        }
    )
    blob = exported.serialize()
    return _MAGIC + len(sidecar).to_bytes(8, "little") + sidecar + blob


def load_train_step(path: str) -> Callable:
    """Rehydrate an :func:`export_train_step` artifact into a step callable
    with the trainer signature ``step(state, batch, rng, bg_weight, gates3,
    lr, jitters) -> (state, metrics)``.  The state is donated, matching
    :func:`make_train_step`.  Raises on any mismatch (caller falls back to a
    normal build)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    with open(path, "rb") as f:
        raw = f.read()
    if not raw.startswith(_MAGIC):
        raise ValueError(f"not an AOT train-step artifact: {path}")
    off = len(_MAGIC)
    n = int.from_bytes(raw[off : off + 8], "little")
    side = pickle.loads(raw[off + 8 : off + 8 + n])
    exported = jexport.deserialize(bytearray(raw[off + 8 + n :]))

    out_tree = side["out_tree"]
    call = jax.jit(
        exported.call, donate_argnums=tuple(range(side["n_state"]))
    )

    def step(state, batch, rng, bg_weight, gates3, lr, jitters):
        leaves = jax.tree.leaves(
            (
                state,
                batch,
                jnp.asarray(rng),
                jnp.asarray(bg_weight, jnp.float32),
                jnp.asarray(gates3, jnp.float32),
                jnp.asarray(lr, jnp.float32),
                jnp.asarray(jitters, jnp.float32),
            )
        )
        return jax.tree.unflatten(out_tree, call(*leaves))

    return step


def cached_train_step(
    build: Callable[[], Callable],
    config: dict,
    cache_dir: str,
    example_args: Sequence[Any],
) -> tuple[Callable, str]:
    """Cache-or-build orchestration for the train CLIs.

    Hit: deserialize + return the artifact step (skips trace/lower).
    Miss: ``build()`` the normal jitted step, export it into the cache for
    next time, and return the built step (this run compiles normally — the
    export reuses the same trace work the first call needs anyway).
    Any export/load failure degrades to the built step with a warning.

    Returns ``(step, status)`` where status is "hit" | "miss" |
    "export-failed".
    """
    os.makedirs(cache_dir, exist_ok=True)
    key = train_step_cache_key(config)
    path = os.path.join(cache_dir, f"train_step_{key}.aot")
    if os.path.exists(path):
        try:
            return load_train_step(path), "hit"
        except Exception as e:  # stale/corrupt → rebuild below
            warnings.warn(f"AOT cache load failed ({e!r}); rebuilding")
    step = build()
    try:
        blob = export_train_step(step, example_args)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return step, "miss"
    except Exception as e:
        warnings.warn(f"AOT export failed ({e!r}); running uncached")
        return step, "export-failed"

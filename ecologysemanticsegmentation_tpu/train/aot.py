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

MEASURED CAVEAT (round 5, ``experiments/aot_train_ab.jsonl``): on a
remote-compile RELAY backend (axon) the artifact path is a net loss — the
relay's program cache serves normal jit across processes (76-82 s warm)
but misses the exported-call wrapper (402-1,057 s for the same program),
while the client lowering avoided costs only ~4 s there.  The train CLIs
print a warning on such backends.  On a directly-attached TPU host, where
the client-side lowering dominates cold start (the serving numbers above),
the cache is the right call.  Steady-state artifact dispatch overhead:
+5 ms/step (flat-convention flatten/unflatten) at 97 ms steps.

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
  ``jax.__version__`` + platform + backend runtime version (libtpu): any
  mismatch is a different file.  A stale artifact that fails to LOAD falls
  back to a normal build, and one that loads but fails at its first call
  (backend compile rejection) does too (:func:`_with_first_call_fallback`).
- Artifacts hold NO weights (the state is an argument), so they are small
  (hundreds of KB) and checkpoint-agnostic: one artifact serves every
  resume/restart of the same config.
- Trust model: the artifact embeds a pickled treedef sidecar, and unpickling
  is code execution — the cache directory must be PRIVATE and as trusted as
  the checkpoints themselves (same threat model as torch.load on a ckpt).
  Never point ``--aot_cache`` at a shared/world-writable path.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import warnings
from typing import Any, Callable, Sequence

_MAGIC = b"ESTPU-AOT-1\n"

# Env knobs read at TRACE time anywhere inside the step (augmentation forms,
# remat shape, Pallas-vs-jnp kernel selection, compiler options).  Any knob
# that changes the traced program MUST have its prefix here, or flipping it
# is silently ignored on a cache hit.
_TRACE_ENV_PREFIXES = ("AUGMENT_", "VGG_REMAT", "TPU_SCOPED_VMEM", "LOSS_SUMS")


def _compiler_options():
    """The same TPU compiler knob passthrough make_train_step applies
    (trainer.py): artifacts must backend-compile with identical options on
    hit and miss, or the vmem limit silently vanishes on hit runs."""
    import jax

    vmem = os.environ.get("TPU_SCOPED_VMEM_KIB")
    return (
        {"xla_tpu_scoped_vmem_limit_kib": vmem}
        if vmem and jax.devices()[0].platform == "tpu" else None
    )


def train_step_cache_key(config: dict) -> str:
    """Digest of everything that shapes the traced program: caller-supplied
    config (model/shape/flag dict) + jax version + backend platform AND
    runtime version (a libtpu update can reject a cached tpu_custom_call
    payload under the same jax.__version__) + the env knobs that alter the
    trace (:data:`_TRACE_ENV_PREFIXES`)."""
    import jax

    env = {
        k: v
        for k, v in os.environ.items()
        if k.startswith(_TRACE_ENV_PREFIXES)
    }
    dev = jax.devices()[0]
    payload = repr(
        (
            sorted(config.items()),
            sorted(env.items()),
            jax.__version__,
            dev.platform,
            getattr(dev.client, "platform_version", ""),
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
        exported.call,
        donate_argnums=tuple(range(side["n_state"])),
        # hit and miss must compile with the same options (trainer.py applies
        # these at build time; they are not carried in the StableHLO artifact)
        compiler_options=_compiler_options(),
    )
    tree_checked: list = []

    def step(state, batch, rng, bg_weight, gates3, lr, jitters):
        if not tree_checked:
            # Commit the state leaves to the device BEFORE the first call.
            # From call 2 on, the state is this step's own output — COMMITTED
            # arrays — and jit's cache keys on the argument sharding mapping:
            # an uncommitted-state first call (eagerly-initialized params)
            # would compile once with UnspecifiedValue mappings and then
            # AGAIN at call 2 with committed ones.  Through a remote-compile
            # relay that second compile costs ~44 s (measured,
            # experiments/aot_train_ab.jsonl hit leg later_steps_ms).
            state = jax.device_put(state, jax.devices()[0])
        leaves, in_tree = jax.tree.flatten(
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
        if not tree_checked:
            # The flat calling convention relies on leaf ORDER; a pytree
            # structure drift with coincidentally matching leaf shapes would
            # otherwise be applied silently (e.g. an optax state relayout).
            if in_tree != side["in_tree"]:
                raise ValueError(
                    "argument pytree structure differs from the cached "
                    f"artifact's (artifact {side['in_tree']}, got {in_tree})"
                )
            tree_checked.append(True)
        return jax.tree.unflatten(out_tree, call(*leaves))

    return step


def _with_first_call_fallback(loaded: Callable, build: Callable[[], Callable]) -> Callable:
    """Guard an artifact step so a FIRST-CALL failure (backend refusing the
    cached tpu_custom_call payload, pytree-structure drift) rebuilds the
    normal jitted step instead of crashing the run after checkpoint restore.

    Only the first call is guarded: a backend-compile failure raises before
    any donated buffer is consumed, so the same args can feed the rebuilt
    step.  Later-call failures are real errors and propagate."""
    resolved: list = []

    def step(*args):
        if resolved:
            return resolved[0](*args)
        try:
            out = loaded(*args)
        except Exception as e:
            warnings.warn(
                f"AOT artifact failed at first call ({e!r}); rebuilding")
            fn = build()
            resolved.append(fn)
            return fn(*args)
        resolved.append(loaded)
        return out

    return step


def cached_train_step(
    build: Callable[[], Callable],
    config: dict,
    cache_dir: str,
    example_args: Sequence[Any],
) -> tuple[Callable, str]:
    """Cache-or-build orchestration for the train CLIs.

    Hit: deserialize + return the artifact step (skips trace/lower); a
    first-call failure (e.g. the backend rejecting a stale Pallas payload)
    falls back to a normal build.
    Miss: ``build()`` the normal jitted step, export it into the cache
    (ONE client-side trace+lower), then return the just-written artifact's
    loaded step — the built jit is lazy and has not traced yet, so this
    avoids paying the minutes-long client-side lowering a second time at the
    first real call.
    Any export/load failure degrades to the built step with a warning.

    Returns ``(step, status)`` where status is "hit" | "miss" |
    "export-failed".
    """
    os.makedirs(cache_dir, exist_ok=True)
    key = train_step_cache_key(config)
    path = os.path.join(cache_dir, f"train_step_{key}.aot")
    if os.path.exists(path):
        try:
            loaded = load_train_step(path)
        except Exception as e:  # stale/corrupt → rebuild below
            warnings.warn(f"AOT cache load failed ({e!r}); rebuilding")
        else:
            return _with_first_call_fallback(loaded, build), "hit"
    step = build()
    try:
        blob = export_train_step(step, example_args)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        try:
            # Reuse the export's lowering for THIS run too (falling back to
            # the built step only costs a redundant trace, not correctness).
            return _with_first_call_fallback(load_train_step(path),
                                             lambda: step), "miss"
        except Exception:
            return step, "miss"
    except Exception as e:
        warnings.warn(f"AOT export failed ({e!r}); running uncached")
        return step, "export-failed"

"""Checkpointing with the reference's epoch-addressable filename layout.

Layout parity (reference ``train_multiclass.py:163-165,305-335``):
``<models_root>/<EXPTNAME>/channels<MAXCHANNELS>/img<IMGSIZE>/<EXPTNAME>_epoch<N>.ckpt``
with resume = glob + parse epoch from filename + argmax, explicit
``--start_epoch`` override, corrupt/incompatible checkpoints skipped
(reference ``test_multiclass.py:153-160``), and missing checkpoints degrading
to epoch −1 fresh start (``train_multiclass.py:332-335``).

Serialization is flax msgpack of the full train state (params, batch_stats,
opt_state) — unlike the reference, resume restores the optimizer too, so LR
does not need manual re-specification (reference README.md:43 quirk).
Writes are atomic (tmp + rename) for preemption safety.
"""

from __future__ import annotations

import glob
import os
import re
import traceback
from typing import Any

import jax
from flax import serialization


def checkpoint_path(save_dir: str, expt_name: str, epoch: int) -> str:
    return os.path.join(save_dir, f"{expt_name}_epoch{epoch}.ckpt")


def save_checkpoint(save_dir: str, expt_name: str, epoch: int, state: Any) -> str:
    os.makedirs(save_dir, exist_ok=True)
    path = checkpoint_path(save_dir, expt_name, epoch)
    data = serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def _epoch_of(path: str) -> int | None:
    m = re.search(r"epoch(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else None


def list_checkpoints(save_dir: str, expt_name: str) -> list[tuple[int, str]]:
    """All (epoch, path) pairs, ascending by epoch."""
    paths = glob.glob(os.path.join(save_dir, f"{expt_name}*"))
    pairs = [(e, p) for p in paths if (e := _epoch_of(p)) is not None]
    return sorted(pairs)


def _check_shapes(template_state: Any, state: Any) -> None:
    """Raise if any restored leaf's shape differs from the template's.

    ``flax.serialization.from_bytes`` restores by pytree *structure* without
    shape validation, so an architecture-incompatible checkpoint (e.g. one
    saved before the smp-exact 1×1 head correction) would "load" fine and
    then crash — or silently misroute channels — deep inside the first
    jitted step.  Catching it here keeps the documented contract: corrupt or
    incompatible checkpoints are *skipped* (resume degrades to a fresh
    start, the eval sweep moves on)."""
    tleaves = jax.tree_util.tree_flatten_with_path(template_state)[0]
    sleaves = jax.tree_util.tree_flatten_with_path(state)[0]
    if len(tleaves) != len(sleaves):
        raise ValueError(
            f"checkpoint has {len(sleaves)} leaves, model expects "
            f"{len(tleaves)} (incompatible architecture)"
        )
    for (kp, t), (_, s) in zip(tleaves, sleaves):
        tshape = getattr(t, "shape", None)
        sshape = getattr(s, "shape", None)
        if tshape != sshape:
            raise ValueError(
                f"checkpoint leaf {jax.tree_util.keystr(kp)} has shape "
                f"{sshape}, model expects {tshape} (incompatible architecture)"
            )


def load_recent_model(
    save_dir: str, template_state: Any, expt_name: str, epoch: int | None = None
) -> tuple[int, Any]:
    """Resume semantics of reference ``load_recent_model``
    (``train_multiclass.py:305-335``): latest epoch by default, a specific
    epoch on request, and (−1, template) when nothing loads."""
    try:
        pairs = list_checkpoints(save_dir, expt_name)
        if not pairs:
            return -1, template_state
        if epoch is None:
            start_epoch, path = pairs[-1]
        else:
            matches = [(e, p) for e, p in pairs if e == epoch]
            if not matches:
                return -1, template_state
            start_epoch, path = matches[0]
        with open(path, "rb") as f:
            state = serialization.from_bytes(template_state, f.read())
        _check_shapes(template_state, state)
        print(f"Used latest model file: {path}")
        return start_epoch, state
    except Exception:
        traceback.print_exc()
        return -1, template_state


def load_checkpoint_file(path: str, template_state: Any) -> Any | None:
    """Load one checkpoint; None on corruption/incompatibility (eval-sweep
    skip contract, reference ``test_multiclass.py:153-160``).

    ``.pt``/``.pth`` files are treated as reference PyTorch checkpoints
    (``torch.save(net.state_dict())`` of an smp DeepLabV3Plus or the
    depthwise wrapper) and mapped onto the flax trees via
    :func:`..models.import_torch.smp_checkpoint_to_variables` — so a real
    reference checkpoint can be scored by the eval sweep directly.
    """
    try:
        if path.endswith((".pt", ".pth")):
            return _load_torch_checkpoint(path, template_state)
        with open(path, "rb") as f:
            state = serialization.from_bytes(template_state, f.read())
        _check_shapes(template_state, state)
        return state
    except Exception:
        traceback.print_exc()
        return None


def _load_torch_checkpoint(path: str, template_state: Any) -> Any | None:
    import numpy as np
    import torch

    from ..models.import_torch import smp_checkpoint_to_variables

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    variables = smp_checkpoint_to_variables(sd)

    def shapes(t):
        return [
            (jax.tree_util.keystr(k), tuple(np.shape(v)))
            for k, v in jax.tree_util.tree_flatten_with_path(t)[0]
        ]

    if shapes(variables["params"]) != shapes(template_state.params) or shapes(
        variables["batch_stats"]
    ) != shapes(template_state.batch_stats):
        raise ValueError(f"torch checkpoint {path} does not match the model tree")
    leaves = jax.tree_util.tree_leaves(template_state.params)
    dtype = leaves[0].dtype if leaves else None
    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda v: jax.numpy.asarray(v, dtype), t
    )
    return template_state.replace(
        params=cast(variables["params"]),
        batch_stats=cast(variables["batch_stats"]),
    )


def make_checkpointer(backend: str, save_dir: str, expt_name: str):
    """Uniform trainer-facing checkpointing behind ``--ckpt msgpack|orbax``.

    ``msgpack`` keeps the reference's filename-addressed layout;
    ``orbax`` is the async, preemption-safe TPU-production path
    (SURVEY.md §5 checkpoint/resume row).  Both expose
    ``restore(template, epoch)``, ``save(epoch, state)``, ``finalize()``
    with identical resume semantics (latest by default, −1 fresh start).
    """
    if backend == "msgpack":
        return _MsgpackCheckpointer(save_dir, expt_name)
    if backend == "orbax":
        return _OrbaxBackend(save_dir)
    raise ValueError(f"unknown checkpoint backend: {backend}")


class _MsgpackCheckpointer:
    def __init__(self, save_dir: str, expt_name: str):
        self.save_dir, self.expt_name = save_dir, expt_name

    def restore(self, template_state, epoch: int | None = None):
        return load_recent_model(self.save_dir, template_state, self.expt_name, epoch)

    def save(self, epoch: int, state) -> None:
        save_checkpoint(self.save_dir, self.expt_name, epoch, state)

    def finalize(self) -> None:
        pass


class _OrbaxBackend:
    def __init__(self, save_dir: str):
        self.manager = OrbaxCheckpointManager(save_dir)

    def restore(self, template_state, epoch: int | None = None):
        epoch_found, state = self.manager.restore(template_state, epoch)
        if epoch_found >= 0:
            print(f"Used latest model file: orbax step {epoch_found}")
        return epoch_found, state

    def save(self, epoch: int, state) -> None:
        self.manager.save(epoch, state)

    def finalize(self) -> None:
        self.manager.wait()
        self.manager.close()


class OrbaxCheckpointManager:
    """Async, preemption-safe checkpointing via orbax (SURVEY.md §5
    checkpoint/resume row) — the TPU-production alternative to the msgpack
    files above.  Epoch-addressable like the reference layout:
    ``<save_dir>/orbax/<epoch>/``.  ``save`` returns immediately (async
    write); ``wait`` blocks until all pending writes land.
    """

    def __init__(self, save_dir: str, max_to_keep: int | None = None):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(os.path.join(save_dir, "orbax"))
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, epoch: int, state: Any) -> None:
        self.manager.save(epoch, args=self._ocp.args.StandardSave(jax.device_get(state)))

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, template_state: Any, epoch: int | None = None) -> tuple[int, Any]:
        """(epoch, state); (-1, template) when nothing is available."""
        step = epoch if epoch is not None else self.manager.latest_step()
        if step is None:
            return -1, template_state
        try:
            restored = self.manager.restore(
                step, args=self._ocp.args.StandardRestore(jax.device_get(template_state))
            )
            return step, restored
        except Exception:
            traceback.print_exc()
            return -1, template_state

    def close(self) -> None:
        self.manager.close()

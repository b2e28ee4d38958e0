"""Async checkpoint overlap on the real chip (ROADMAP scaling item).

Orbax's ``enable_async_checkpointing`` overlaps the DISK write, but the
snapshot itself must come off the device, and on this relay-attached TPU
that fetch is the cost.  Key finding: the train state is ~700 leaves, and
``jax.device_get(state)`` fetches them one by one — each paying the relay
round-trip — so a save stalls training ~5.5 s even though the ~300 MB
payload is ~0.6 s at the relay's bulk rate.  The fix is to flatten the f32
leaves into ONE device array (a jitted concat), fetch that in a single
transfer, and rebuild the tree on the host.

Variants (flagship batch 128 @ 256px, 24 steps, save every 8):

  A  no checkpointing                 (baseline wall/step)
  B  shipped save: device_get(state)  (per-leaf fetches)
  C  device copy + per-leaf copy_to_host_async handed to orbax (worse:
     orbax's background thread still fetches per leaf, serially)
  D  flat snapshot, one sync fetch
  E  flat snapshot, async fetch collected at the NEXT save point
     (overlaps the transfer with training steps)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/ckpt_overlap.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from ecologysemanticsegmentation_tpu.train.checkpoint import OrbaxCheckpointManager

BATCH, IMG, ORGANS = 128, 256, 3
STEPS, SAVE_EVERY = 24, 8


class FlatSnapshotter:
    """Flatten a train state's f32 leaves into one device array per save."""

    def __init__(self, template):
        leaves, self.treedef = jax.tree_util.tree_flatten(template)
        self.f32 = [i for i, l in enumerate(leaves)
                    if hasattr(l, "dtype") and l.dtype == jnp.float32]
        self.shapes = [leaves[i].shape for i in self.f32]
        self.sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]

        @jax.jit
        def flatten(s):
            ls = jax.tree_util.tree_leaves(s)
            return jnp.concatenate([ls[i].ravel() for i in self.f32])

        self._flatten = flatten

    def snap(self, state):
        """-> (flat device array, small host leaves) — independent buffers."""
        leaves = jax.tree_util.tree_flatten(state)[0]
        flat = self._flatten(state)
        small = {i: jax.device_get(l) for i, l in enumerate(leaves)
                 if i not in self.f32}
        return flat, small

    def rebuild(self, flat, small):
        arr = np.asarray(flat)  # the (single) fetch
        out = [None] * (len(self.f32) + len(small))
        off = 0
        for j, i in enumerate(self.f32):
            out[i] = arr[off:off + self.sizes[j]].reshape(self.shapes[j])
            off += self.sizes[j]
        for i, v in small.items():
            out[i] = v
        return jax.tree_util.tree_unflatten(self.treedef, out)


def run(mode: str, save_dir: str | None):
    model = build_model("deeplabv3plus", num_classes=ORGANS,
                        encoder_name="resnet34", upsample_head=False)
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step = make_train_step(model, tx, augment=True, lowres_head=True)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32)),
    }
    gates3 = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    mgr = OrbaxCheckpointManager(save_dir) if save_dir else None
    snapper = FlatSnapshotter(state) if mode in ("flat", "flat_async") else None
    pending = None  # (epoch, flat, small) for flat_async

    def snapshot_copy_async(s):
        c = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, s)
        jax.tree_util.tree_map(
            lambda x: x.copy_to_host_async() if isinstance(x, jax.Array) else None, c)
        return c

    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), 0.3, gates3,
                              jnp.float32(3e-4), jitters)
    float(metrics["loss"])
    if snapper is not None:
        # warm the flatten program + one fetch so the remote compile and
        # first-transfer costs don't pollute the steady-state stall numbers
        t_w = time.perf_counter()
        fl, sm = snapper.snap(state)
        _ = snapper.rebuild(fl, sm)
        print(json.dumps({"name": f"{mode}_warm_snap_s",
                          "value": round(time.perf_counter() - t_w, 2)}), flush=True)
        t_w = time.perf_counter()
        fl, sm = snapper.snap(state)
        _ = snapper.rebuild(fl, sm)
        print(json.dumps({"name": f"{mode}_steady_snap_s",
                          "value": round(time.perf_counter() - t_w, 2)}), flush=True)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i), 0.3,
                              gates3, jnp.float32(3e-4), jitters)
        if mgr and (i + 1) % SAVE_EVERY == 0:
            if mode == "sync":
                mgr.save(i, state)
            elif mode == "copy_async":
                snap = snapshot_copy_async(state)
                mgr.manager.save(i, args=mgr._ocp.args.StandardSave(snap))
            elif mode == "flat":
                flat, small = snapper.snap(state)
                mgr.manager.save(
                    i, args=mgr._ocp.args.StandardSave(snapper.rebuild(flat, small)))
            elif mode == "flat_async":
                if pending is not None:
                    e, fl, sm = pending
                    mgr.manager.save(
                        e, args=mgr._ocp.args.StandardSave(snapper.rebuild(fl, sm)))
                flat, small = snapper.snap(state)
                flat.copy_to_host_async()
                pending = (i, flat, small)
    float(metrics["loss"])
    wall = time.perf_counter() - t0
    drain = 0.0
    if mgr:
        t1 = time.perf_counter()
        if pending is not None:
            e, fl, sm = pending
            mgr.manager.save(
                e, args=mgr._ocp.args.StandardSave(snapper.rebuild(fl, sm)))
        mgr.wait()
        drain = time.perf_counter() - t1
        mgr.close()
    return wall, drain


def main():
    which = sys.argv[1:] or ["none", "sync", "copy_async", "flat", "flat_async"]
    tags = {"none": "A_no_ckpt", "sync": "B_sync_device_get",
            "copy_async": "C_copy_async_fetch", "flat": "D_flat_one_fetch",
            "flat_async": "E_flat_async_overlap"}
    base = None
    for mode in which:
        d = f"/tmp/ckpt_overlap_{mode}" if mode != "none" else None
        if d and os.path.exists(d):
            shutil.rmtree(d)
        wall, drain = run(mode, d)
        row = {"name": tags[mode], "steps": STEPS,
               "wall_ms_per_step": round(wall * 1000 / STEPS, 1),
               "final_drain_s": round(drain, 2)}
        print(json.dumps(row), flush=True)
        if mode == "none":
            base = row["wall_ms_per_step"]
        elif base is not None:
            stall = (row["wall_ms_per_step"] - base) * STEPS / (STEPS // SAVE_EVERY)
            print(json.dumps({"name": tags[mode] + "_stall_per_save_ms",
                              "value": round(stall, 1)}), flush=True)


if __name__ == "__main__":
    main()

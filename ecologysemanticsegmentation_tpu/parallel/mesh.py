"""Device mesh + sharding utilities (GSPMD, jax.sharding).

The reference is strictly single-process single-GPU (SURVEY.md §2.5 — no DDP,
no collectives anywhere).  The TPU-native equivalent scales the same train
step over a ``jax.sharding.Mesh``:

* ``data`` axis — batch-dimension sharding.  Gradients are summed by XLA's
  automatic collectives (no NCCL-style calls in user code), and BatchNorm
  batch statistics become *globally* synchronized for free, because
  ``jnp.mean`` over a sharded batch axis is a global mean under GSPMD —
  this supersedes the reference's single-device BN and its ``batch > 1``
  assert (``train_multiclass.py:131``).
* ``model`` axis — optional tensor parallelism: wide conv kernels are sharded
  over output channels; XLA inserts the all-gathers/reduce-scatters over ICI.

The mesh degrades cleanly to a single chip (mesh of 1), which is the exact
1:1 replacement of the reference's execution model.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: int | None = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """Create a ``(data, model)`` mesh over available devices.

    ``model_parallel=1`` gives pure data parallelism.  ICI-friendliness: the
    model axis is the fastest-varying so tensor-parallel collectives ride
    neighboring chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest.

    ``spatial=True`` additionally shards image ROWS (the H axis of NHWC
    batches) over the ``model`` axis — GSPMD spatial partitioning for
    IMGSIZE >> 256: convs get automatic halo exchanges over ICI, so one
    image's activations no longer need to fit a single chip's HBM."""
    return NamedSharding(mesh, P("data", "model") if spatial else P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_for_model_axis(
    params, mesh: Mesh, min_channels: int = 256
) -> "jax.tree_util.PyTreeDef":
    """Build a sharding tree for a param pytree: conv kernels whose output
    channel dim is wide and divisible by the model axis get sharded over it
    (tensor parallelism); everything else is replicated.

    XLA then partitions the matmuls/convs and inserts the collectives — the
    scaling-book recipe: pick a mesh, annotate, let the compiler do comms.
    """
    model_size = mesh.shape["model"]

    def rule(path, x):
        if (
            model_size > 1
            and hasattr(x, "ndim")
            and x.ndim == 4  # HWIO conv kernel
            and x.shape[-1] >= min_channels
            and x.shape[-1] % model_size == 0
        ):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def local_batch_to_global(batch_size: int, mesh: Mesh) -> int:
    """Round a requested batch size up to a multiple of the data axis."""
    d = mesh.shape["data"]
    return int(math.ceil(batch_size / d) * d)


class _SliceDevice:
    """Transparent device proxy carrying an explicit ``slice_index``.

    Virtual CPU devices (the only multi-device topology available in this
    environment) expose no ``slice_index``, so the hybrid-mesh code path
    would otherwise be untestable.  ``mesh_utils.create_hybrid_device_mesh``
    only reads attributes off the device objects, so a proxy exercises the
    REAL grouping/reshape logic; the resulting grid is unwrapped back to the
    underlying devices before building the Mesh."""

    __slots__ = ("_device", "slice_index")

    def __init__(self, device, slice_index: int):
        self._device = device
        self.slice_index = slice_index

    def __getattr__(self, name):
        return getattr(self._device, name)

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"_SliceDevice({self._device!r}, slice={self.slice_index})"


def create_multislice_mesh(
    model_parallel: int = 1, devices=None, num_slices: int | None = None
) -> Mesh:
    """Multi-slice mesh for DCN-spanning data parallelism (SURVEY.md §2.5:
    "DCN-spanning multi-slice DP is the natural extension").

    Axes: ``(slice, data, model)`` — the ``slice`` axis crosses DCN, so only
    gradient all-reduce rides it (once per step); ``data``/``model``
    collectives stay on ICI.  Uses ``mesh_utils.create_hybrid_device_mesh``
    when multiple slices are attached; degrades to :func:`create_mesh` with a
    singleton slice axis on one slice.

    ``num_slices``: explicit slice count for devices that carry no
    ``slice_index`` (virtual CPU meshes) — devices are assigned to slices in
    contiguous blocks via :class:`_SliceDevice` proxies, so the hybrid
    grouping/reshape path runs even without multi-slice hardware.  Real
    ``slice_index`` attributes, when present, always win.
    """
    import numpy as np
    from jax.experimental import mesh_utils

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    have_real = hasattr(devices[0], "slice_index")
    if not have_real and num_slices and num_slices > 1:
        assert n % num_slices == 0, (n, num_slices)
        per = n // num_slices
        devices = [_SliceDevice(d, i // per) for i, d in enumerate(devices)]
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) > 1:
        num = len(slice_ids)
        per_slice = n // num
        assert per_slice % model_parallel == 0, (per_slice, model_parallel)
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_slice // model_parallel, model_parallel),
            dcn_mesh_shape=(num, 1),
            devices=devices,
        )
        grid = grid.reshape(num, per_slice // model_parallel, model_parallel)
        unwrap = np.frompyfunc(lambda d: getattr(d, "_device", d), 1, 1)
        return Mesh(unwrap(grid), axis_names=("slice", "data", "model"))
    grid = np.array(devices).reshape(1, n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("slice", "data", "model"))

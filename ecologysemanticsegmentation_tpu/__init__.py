"""ecologysemanticsegmentation_tpu — TPU-native multi-organ fish segmentation framework.

A ground-up JAX/Flax/XLA/Pallas rebuild of the capabilities of
``hansk0812/EcologySemanticSegmentation`` (reference mounted at /root/reference).
The reference is a single-GPU PyTorch research codebase; this framework is
TPU-first:

* NHWC tensor layouts everywhere (TPU native), bfloat16 compute / float32 params.
* One jitted ``train_step`` containing model forward/backward, the full 7-loss
  tuple, and the optimizer update.
* Data parallelism via ``jax.sharding.Mesh`` + ``NamedSharding`` (GSPMD): batch
  statistics of BatchNorm become globally synchronized automatically when the
  batch axis is sharded — no explicit collectives in model code.
* Device-side augmentation (jnp) replacing the reference's host-side
  albumentations pipeline (reference: ``dataset/augment.py``).
* Pallas kernels for ops XLA does not fuse well (see ``ops/``).

Reference behaviours reproduced (semantics, not code):

* Registry JSON loading — reference ``ecology_semantic_segmentation/__init__.py:5-14``
  loads the first ``*.json`` next to the package into ``datasets_metadata``.
* ``binary_cross_entropy`` — reference line 24 creates a module-level
  ``torch.nn.BCEWithLogitsLoss``; here it is a pure function in :mod:`.losses`.

Unlike the reference, importing this package does **not** eagerly scan the data
directory or construct models (reference ``dataset/fish/__init__.py:25-41``,
``model/__init__.py:12-15``).  The same split singletons are available lazily via
:func:`ecologysemanticsegmentation_tpu.data.get_split_datasets` so that CLI
outcomes match without the import-time cost.
"""

from __future__ import annotations

from .config import (
    datasets_metadata,
    get_env_variable,
    EnvConfig,
    load_registry,
)
from .losses import binary_cross_entropy

__version__ = "0.1.0"

__all__ = [
    "datasets_metadata",
    "get_env_variable",
    "EnvConfig",
    "load_registry",
    "binary_cross_entropy",
    "__version__",
]

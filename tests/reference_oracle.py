"""Load the PyTorch reference's loss module as a numerical oracle.

The reference package cannot be imported normally (importing it eagerly scans
a data directory and pulls GPU-only deps), so we load
``loss_functions.py`` standalone with a stub parent package that provides the
one symbol it needs (``binary_cross_entropy``).  This executes the reference
for *verification only* — nothing from it is vendored into the framework.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REFERENCE_DIR = "/root/reference/ecology_semantic_segmentation"


def load_reference_losses():
    """Return the reference ``loss_functions`` module, or None if unavailable."""
    path = os.path.join(REFERENCE_DIR, "loss_functions.py")
    if not os.path.exists(path):
        return None
    try:
        import torch
    except Exception:  # pragma: no cover
        return None

    pkg_name = "_ref_oracle_pkg"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [REFERENCE_DIR]
        pkg.binary_cross_entropy = torch.nn.BCEWithLogitsLoss()
        sys.modules[pkg_name] = pkg

    spec = importlib.util.spec_from_file_location(f"{pkg_name}.loss_functions", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def reference_losses_fn(lf, x, g, background_weight=0.0):
    """Replicate the reference call-site pattern of ``train_multiclass.py:253-303``
    using the loaded reference loss functions.  ``x``/``g`` are torch NCHW.
    Returns a list of 7 floats [ce, bce, fl, dice, gdice, twersky, fdice].
    """
    import torch

    CLASS_INDEX = 1
    if g.shape[CLASS_INDEX] > 1:
        # NOTE call-site fidelity: the reference recursion passes only two
        # args (train_multiclass.py:260), so background_weight reverts to its
        # default 0 for every per-organ call.
        per = [
            reference_losses_fn(lf, g[:, i : i + 1], x[:, i : i + 1])
            for i in range(g.shape[CLASS_INDEX])
        ]
        return [float(sum(vals)) for vals in zip(*per)]

    bce = lf.cross_entropy_loss(x, g, bce=True, background_weight=background_weight)
    ce = lf.cross_entropy_loss(x, g, bce=False, background_weight=background_weight)
    fl = lf.focal_loss(x, g, factor=1, background_weight=background_weight)
    d, gd, tw, fd = lf.classification_dice_loss(
        x, g, factor=10, background_weight=background_weight
    )
    return [float(v) for v in (ce, bce, fl, d, gd, tw, fd)]


def load_reference_composite():
    """Load reference loss_composite.py with a stubbed parent package whose
    ``loss_functions`` is the real reference module."""
    import importlib.util

    lf = load_reference_losses()
    if lf is None:
        return None
    path = os.path.join(REFERENCE_DIR, "loss_composite.py")
    if not os.path.exists(path):
        return None
    pkg_name = "_ref_oracle_pkg"
    sys.modules[f"{pkg_name}.loss_functions"] = lf
    spec = importlib.util.spec_from_file_location(f"{pkg_name}.loss_composite", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod

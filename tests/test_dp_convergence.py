"""Multi-epoch DP convergence equivalence (moved out of the driver dryrun).

Round 3 appended ``_dp_convergence_equivalence`` to ``dryrun_multichip`` and
the driver's bounded budget killed it (MULTICHIP_r03 rc=124): 8 epochs x 2
training runs of a UNet on one CPU core take minutes.  The trajectory
statement still matters (DP-8 must LEARN THE SAME THING as single-device,
not just match one step — tests/test_train.py covers the one-step case), so
it runs here in the suite instead, where a minutes-scale test is normal.

Reference context: the reference has no distributed training at all
(SURVEY.md §2.5); this validates the framework's DP scaling story against
its own single-device numerics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _dp_convergence_equivalence  # noqa: E402


def test_dp_convergence_equivalence_8dev():
    _dp_convergence_equivalence(8)

"""Driver-contract tests: dryrun_multichip executes a full sharded train
step on the CPU test mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(2)


def test_dryrun_multichip_full_mesh():
    import __graft_entry__ as g

    g.dryrun_multichip(8)

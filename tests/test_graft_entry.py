"""Driver entry-point tests: the two functions the round harness calls.

``entry()`` must produce a jittable loss; ``dryrun_multichip`` must run its
subprocess-isolated virtual-mesh step from ANY parent state (it never
touches the parent backend — see __graft_entry__.dryrun_multichip).
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_dryrun_multichip_subprocess(capfd):
    # The parent (this pytest process) already holds an 8-device virtual CPU
    # backend; the dryrun must still route through its subprocess and
    # succeed.  n=2 keeps the child's compile small.
    graft.dryrun_multichip(2)
    out = capfd.readouterr().out
    assert "dryrun_multichip(2): ok" in out

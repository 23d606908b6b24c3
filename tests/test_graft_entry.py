"""Driver entry points: single-chip compile check (dryrun runs via driver)."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    shapes = [tuple(o.shape) for o in out]
    assert shapes[0] == (1, 64, 64, 1)   # segm at 1/4 of 256
    assert shapes[1] == (1, 64, 64, 4)   # rbox
    assert shapes[2] == (1, 64, 64, 2)   # angle
    assert shapes[3] == (1, 64, 64, 64)  # focr
    for o in out:
        assert np.isfinite(np.asarray(o)).all()

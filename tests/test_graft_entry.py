"""Driver entry points: single-chip compile check + multi-chip dryrun.

The dryrun test invokes ``dryrun_multichip`` the exact way the driver does
(fresh subprocess, ``python -c``, no conftest platform forcing) — round 1
shipped a dryrun that passed nowhere but looked fine from inside pytest,
because only the conftest forced the virtual 8-device CPU platform.
"""

import pytest

pytestmark = pytest.mark.slow  # full-model compiles / subprocess drives; smoke tier = -m "not slow"

import os
import subprocess
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


def test_dryrun_multichip_as_driver():
    """Run the driver's exact invocation in a clean subprocess."""
    env = dict(os.environ)
    # the driver starts from the container's default env: no CPU forcing
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    import time as _time

    t0 = _time.time()
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__\n"
         "__graft_entry__.dryrun_multichip(8)\n"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=900,
    )
    wall = _time.time() - t0
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "dryrun_multichip ok" in r.stdout
    # The driver kills the dryrun at ~10 min (MULTICHIP_r03 died rc=124 at
    # ~600 s with the round-3 full-size shapes).  The round-4 shrunk
    # compile surface (8 rois, 64-wide strips, 750-class vocab — same
    # sharding topology) measures 382 s on this 1-core host; assert the
    # ≤8 min budget so a compile-surface regression fails HERE, not in
    # the driver artifact.
    #
    # CAVEAT: the bound assumes an otherwise-idle host.  With a training
    # run sharing the single core the same dryrun measured 557 s (rc=0,
    # all stages ok) — a wall-time fail here while other work is running
    # is contention, not a compile-surface regression.  Never leave
    # CPU-heavy background jobs running when the driver's round-end
    # dryrun fires.
    assert wall < 480, f"dryrun took {wall:.0f}s, budget is 480s"

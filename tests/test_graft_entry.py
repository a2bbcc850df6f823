"""Driver-contract smoke: __graft_entry__.entry() must stay jittable.

The round driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip`` on a virtual mesh; this local test catches a broken
entry before the driver does.  The multichip dryrun (full DP train-step
grad compile) is exercised by the driver itself and by
test_data_parallel.py's equivalent path, so only the cheap forward
contract is pinned here.
"""
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_entry_forward_compiles_and_runs():
    sys.path.insert(0, '/root/repo')
    import jax
    import __graft_entry__ as g

    fn, args = g.entry()
    out = np.asarray(jax.jit(fn)(*args))
    b, t = args[2]['vggish'].shape[:2]
    assert out.shape == (b, t, 7), out.shape
    assert np.isfinite(out).all()

import sys

import jax
import numpy as np


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape[0] >= 4 and out.shape[1] >= 4
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)

"""Keep the driver entry points healthy (CPU, 8-device virtual mesh)."""
import pytest
import jax
import numpy as np

pytestmark = pytest.mark.slow  # compile-heavy e2e (default suite skips; run with -m "" )


def test_entry_forward_jits():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape[0] == 8  # batch of 8 logit rows
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)

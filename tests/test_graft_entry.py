"""Driver contract: entry() compiles; dryrun_multichip runs on the fake mesh."""

import jax
import numpy as np
import pytest


@pytest.mark.slow  # duplicates the driver's own per-round entry() compile-check
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 512, 512, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow  # 262 s — duplicates the driver's own per-round dryrun
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)

"""Driver-contract tests: entry() must return a jittable fn + args that
compile and execute; dryrun_multichip is covered in test_parallel."""

import numpy as np

import jax


import pytest

# model-compile-heavy; deselect with -m 'not slow' for quick runs
pytestmark = pytest.mark.slow


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.ndim == 2  # [B, Q]
    assert np.isfinite(out).all()

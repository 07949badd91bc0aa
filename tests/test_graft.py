"""Driver entry-point tests: entry() compile-check + dryrun_multichip on the
virtual 8-device CPU mesh — exactly what the driver will do."""

import sys
from pathlib import Path

import jax
import pytest
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    out = np.asarray(out)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.full
def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)

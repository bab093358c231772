"""Regression guards on the driver entry points."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles_cpu():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 128)

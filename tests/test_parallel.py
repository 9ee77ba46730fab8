"""Mesh sharding tests on the 8-device virtual CPU mesh."""

import numpy as np

import __graft_entry__ as graft


def test_entry_compiles():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2dev():
    graft.dryrun_multichip(2)

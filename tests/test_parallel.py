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


def test_pairhmm_sp_column_split():
    """Sequence-parallel haplotype split (SURVEY §5.7 ring/blockwise
    mapping): the sp-sharded engine with the DP carry relayed through the
    mesh must reproduce the single-device jnp engine — f64 to rounding
    (the Y scan is block-reassociated, not bit-identical), f32 within the
    golden 1e-5 contract."""
    import jax
    import numpy as np

    from gkl_tpu.ops import pairhmm as pairhmm_ops
    from gkl_tpu.parallel import mesh as mesh_mod

    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", np.uint8)
    H, R, P = 48, 12, 8
    hap = bases[rng.integers(0, 4, (H, P))]
    read = hap[:R].copy()
    mut = rng.random((R, P)) < 0.1
    read[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
    q = rng.integers(15, 40, (R, P)).astype(np.uint8)
    iq = rng.integers(30, 45, (R, P)).astype(np.uint8)
    dq = rng.integers(30, 45, (R, P)).astype(np.uint8)
    gcp = np.full((R, P), 10, np.uint8)
    haplen = rng.integers(20, H + 1, P).astype(np.int32)
    rslen = rng.integers(4, R + 1, P).astype(np.int32)

    for nsp in (2, 4):
        mesh = mesh_mod.sequence_parallel_mesh(nsp)
        got64 = np.asarray(mesh_mod.pairhmm_raw_sp(
            mesh, hap, read, q, iq, dq, gcp, haplen, rslen, dtype="float64"))
        ref64 = np.asarray(pairhmm_ops.pairhmm_raw(
            hap, read, q, iq, dq, gcp, haplen, rslen, dtype="float64"))
        np.testing.assert_allclose(got64, ref64, rtol=1e-12)

        got32 = np.asarray(mesh_mod.pairhmm_raw_sp(
            mesh, hap, read, q, iq, dq, gcp, haplen, rslen, dtype="float32"))
        # raw values carry dtype-specific INITIAL_CONSTANTs (2^120 vs
        # 2^1020): normalize both to log10 likelihoods before comparing
        np.testing.assert_allclose(
            pairhmm_ops.pairhmm_log10_from_raw_f32(got32),
            pairhmm_ops.pairhmm_log10_from_raw_f64(ref64), atol=1e-5)

"""Pallas PairHMM kernel: interpret-mode parity with the jnp engine."""

import numpy as np

from gkl_tpu.ops.pairhmm import pairhmm_raw
from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas, _m2m_2d


def _batch(R=16, H=24, P=8, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, size=(H, P))]
    read = hap[:R].copy()
    mut = rng.random((R, P)) < 0.1
    read[mut] = bases[rng.integers(0, 4, size=int(mut.sum()))]
    q = rng.integers(10, 40, size=(R, P)).astype(np.uint8)
    iq = rng.integers(30, 45, size=(R, P)).astype(np.uint8)
    dq = rng.integers(30, 45, size=(R, P)).astype(np.uint8)
    gcp = np.full((R, P), 10, np.uint8)
    haplen = rng.integers(8, H + 1, P).astype(np.int32)
    rslen = rng.integers(4, R + 1, P).astype(np.int32)
    return hap, read, q, iq, dq, gcp, haplen, rslen


def test_interpret_matches_jnp():
    args = _batch()
    a = np.asarray(pairhmm_raw(*args, dtype="float32"))
    b = np.asarray(pairhmm_raw_pallas(*args, lane_block=8, interpret=True, prep="table"))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_mxu_prep_matches_table_prep():
    args = _batch(seed=3)
    a = np.asarray(pairhmm_raw_pallas(*args, lane_block=8, interpret=True, prep="table"))
    b = np.asarray(pairhmm_raw_pallas(*args, lane_block=8, interpret=True, prep="mxu"))
    # one-hot gathers reproduce table values exactly on TPU; on CPU interpret
    # the dot may round differently, so allow tiny slack
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_m2m_2d_table():
    from gkl_tpu import context as C

    tab = _m2m_2d()
    ctx = C.pairhmm_context("float32")
    rng = np.random.default_rng(0)
    i = rng.integers(0, 128, 256)
    d = rng.integers(0, 128, 256)
    want = ctx.set_mm_prob(i, d)
    got = tab[np.maximum(i, d), np.minimum(i, d)]
    np.testing.assert_array_equal(got, want)


def test_cols_variant_matches_jnp():
    from gkl_tpu.ops.pairhmm_pallas_cols import pairhmm_raw_pallas_cols

    args = _batch(seed=5)
    a = np.asarray(pairhmm_raw(*args, dtype="float32"))
    b = np.asarray(pairhmm_raw_pallas_cols(*args, lane_block=8, interpret=True))
    np.testing.assert_allclose(a, b, rtol=2e-5)


def test_cols_variant_golden():
    import golden
    from gkl_tpu import batch as batch_mod
    from gkl_tpu import context as C
    from gkl_tpu.ops.pairhmm_pallas_cols import pairhmm_raw_pallas_cols

    cases = golden.load_pairhmm_cases()[:24]
    packed = batch_mod.pack_pairs(
        [c.hap for c in cases], [c.read for c in cases],
        [(c.q, c.iq, c.dq, c.gcp) for c in cases], lane_multiple=8)
    raw = np.asarray(
        pairhmm_raw_pallas_cols(
            packed.hap, packed.read, packed.q, packed.iq, packed.dq,
            packed.gcp, packed.haplen, packed.rslen,
            lane_block=8, interpret=True)
    )[: packed.n_real]
    ctx = C.pairhmm_context("float32")
    res = np.log10(raw.astype(np.float64)) - float(ctx.LOG10_INITIAL_CONSTANT)
    expected = np.array([c.expected for c in cases])
    # golden 1e-5 contract (cases that need the double rescue excluded)
    ok = raw > float(C.MIN_ACCEPTED)
    assert ok.sum() >= 20
    np.testing.assert_allclose(res[ok], expected[ok], atol=1e-5)


def test_scaled_kernel_in_range_parity():
    """Scaled-f32 kernel matches the plain kernel for in-range lanes
    (power-of-two rescales are exact)."""
    import golden
    from gkl_tpu import batch as batch_mod
    from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas_scaled

    cases = golden.load_pairhmm_cases()[:24]
    packed = batch_mod.pack_pairs(
        [c.hap for c in cases], [c.read for c in cases],
        [(c.q, c.iq, c.dq, c.gcp) for c in cases], lane_multiple=8)
    args = (packed.hap, packed.read, packed.q, packed.iq, packed.dq,
            packed.gcp, packed.haplen, packed.rslen)
    plain = np.asarray(pairhmm_raw_pallas(*args, lane_block=8, interpret=True))
    mant, ex, _ = pairhmm_raw_pallas_scaled(*args, lane_block=8, interpret=True)
    recon = np.asarray(mant).astype(np.float64) * np.exp2(np.asarray(ex).astype(np.float64))
    ok = plain > 0
    np.testing.assert_allclose(recon[ok], plain[ok], rtol=1e-6)


def test_scaled_kernel_deep_lanes_vs_f64():
    """Deep-underflow lanes (log10 ~ -250) match the f64 engine at 1e-4."""
    from gkl_tpu import batch as batch_mod
    from gkl_tpu import context as C
    from gkl_tpu.ops.pairhmm import pairhmm_raw
    from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas_scaled

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, 320)]
    reads, quals = [], []
    for _ in range(8):
        reads.append(bases[rng.integers(0, 4, 256)])  # random vs random: deep
        quals.append(tuple(np.full(256, v, np.uint8) for v in (50, 50, 50, 10)))
    packed = batch_mod.pack_pairs([hap] * 8, reads, quals, lane_multiple=8)
    args = (packed.hap, packed.read, packed.q, packed.iq, packed.dq,
            packed.gcp, packed.haplen, packed.rslen)
    mant, ex, _ = pairhmm_raw_pallas_scaled(*args, lane_block=8, interpret=True)
    res_scaled = (np.log10(np.asarray(mant).astype(np.float64))
                  + (np.asarray(ex).astype(np.float64) - 120.0) * np.log10(2.0))
    raw64 = np.asarray(pairhmm_raw(*args, dtype="float64"))
    res64 = np.log10(raw64) - float(C.pairhmm_context("float64").LOG10_INITIAL_CONSTANT)
    assert res64[:8].max() < -200  # genuinely deep
    np.testing.assert_allclose(res_scaled[:8], res64[:8], atol=1e-4)


def test_cols_relay_matches_jnp_and_cols():
    """The read-relayed column sweep (any H x any R, VMEM-free boundary
    planes carried in HBM) matches the jnp engine across chunk counts, and
    is bit-identical to the plain cols kernel when one chunk covers the
    whole read."""
    from gkl_tpu.ops.pairhmm_pallas_cols import (
        pairhmm_raw_pallas_cols, pairhmm_raw_pallas_cols_relay)

    args = _batch(R=24, H=48, P=8, seed=5)
    want = np.asarray(pairhmm_raw(*args, dtype="float32"))
    one = np.asarray(pairhmm_raw_pallas_cols(*args, lane_block=8,
                                             interpret=True))
    for r_chunk in (8, 16, 24):
        got = np.asarray(pairhmm_raw_pallas_cols_relay(
            *args, lane_block=8, r_chunk=r_chunk, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5,
                                   err_msg=str(r_chunk))
    np.testing.assert_array_equal(
        np.asarray(pairhmm_raw_pallas_cols_relay(*args, lane_block=8,
                                                 r_chunk=24, interpret=True)),
        one)


def test_cols_relay_deep_lanes():
    """Relay chunk boundaries must not lose deep-underflow contributions:
    all-mismatch lanes keep f32-faithful values across chunk counts (the
    _split_coeff ladder spans only chunk rows, so this pins the
    boundary-seed handling)."""
    from gkl_tpu.ops.pairhmm_pallas_cols import pairhmm_raw_pallas_cols_relay

    # uniform hap 'A' vs read 'C': EVERY diagonal mismatches everywhere
    # (shifted alignments can't leak matches), so all paths pay ~16
    # 1e-4-class factors -> raw ~7e-32: deep under MIN_ACCEPTED.  Depth is
    # chosen ABOVE the relay's absolute noise floor: boundary-plane
    # components under f32-min-normal flush at each chunk boundary
    # (~1e-38/chunk absolute); lanes needing more depth are f64-rescued by
    # the API regardless of engine.
    R, H, P = 16, 16, 8
    hap = np.full((H, P), ord("A"), np.uint8)
    read = np.full((R, P), ord("C"), np.uint8)
    q = np.full((R, P), 42, np.uint8)
    iq = np.full((R, P), 42, np.uint8)
    dq = np.full((R, P), 42, np.uint8)
    gcp = np.full((R, P), 42, np.uint8)
    haplen = np.full(P, H, np.int32)
    rslen = np.full(P, R, np.int32)
    args = (hap, read, q, iq, dq, gcp, haplen, rslen)
    want = np.asarray(pairhmm_raw(*args, dtype="float32"))
    assert np.all(want < 1e-28)  # genuinely deep (still representable f32)
    for r_chunk in (4, 8, 16):
        got = np.asarray(pairhmm_raw_pallas_cols_relay(
            *args, lane_block=8, r_chunk=r_chunk, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5,
                                   err_msg=str(r_chunk))

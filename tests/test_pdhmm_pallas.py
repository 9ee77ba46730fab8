"""Pallas PDHMM kernel: interpret-mode parity with the jnp engine + golden."""

import numpy as np
import pytest

import golden
from gkl_tpu import batch as batch_mod
from gkl_tpu.ops import pdhmm as pdhmm_ops
from gkl_tpu.ops.pdhmm_pallas import pdhmm_raw_pallas


def _pack(cases, lane_multiple=8):
    packed = batch_mod.pack_pairs(
        [c.hap for c in cases],
        [c.read for c in cases],
        [(c.q, c.iq, c.dq, c.gcp) for c in cases],
        lane_multiple=lane_multiple,
    )
    H, P = packed.hap.shape
    hap_pd = np.zeros((H, P), np.uint8)
    for k, c in enumerate(cases):
        hap_pd[: len(c.hap), k] = c.hap_pd
    states = pdhmm_ops.column_states(hap_pd)
    return packed, hap_pd, states


def test_interpret_matches_jnp_f32():
    cases = golden.load_pdhmm_cases("pdhmm_syn_199_68_51.txt")[:16]
    packed, hap_pd, states = _pack(cases)
    args = (packed.hap, hap_pd, states, packed.read, packed.q, packed.iq,
            packed.dq, packed.gcp, packed.haplen, packed.rslen)
    a = np.asarray(pdhmm_ops.pdhmm_raw(*args, dtype="float32"))
    b = np.asarray(pdhmm_raw_pallas(*args, lane_block=8, interpret=True))
    # max-affine scan trees differ (associative_scan vs Hillis-Steele); the
    # max/product algebra keeps them equal to f32 reassociation noise
    np.testing.assert_allclose(a, b, rtol=2e-5)


def test_interpret_matches_golden_with_pd_events():
    """Cases with real DEL_START/DEL_END events exercise the branch logic."""
    all_cases = golden.load_pdhmm_cases("pdhmm_syn_990_1_2.txt")
    cases = [c for c in all_cases if np.any(c.hap_pd != 0) and c.expected > -30][:16]
    assert len(cases) >= 8
    packed, hap_pd, states = _pack(cases)
    raw = np.asarray(
        pdhmm_raw_pallas(
            packed.hap, hap_pd, states, packed.read, packed.q, packed.iq,
            packed.dq, packed.gcp, packed.haplen, packed.rslen,
            lane_block=8, interpret=True,
        )
    )[: packed.n_real]
    import gkl_tpu.context as C

    res = np.log10(raw.astype(np.float64)) - float(C.pdhmm_context("float32").INITIAL_CONDITION_LOG10)
    expected = np.array([c.expected for c in cases])
    np.testing.assert_allclose(res, expected, atol=1e-4)


def _chunk_batch(H, R, P, seed=0, events=True):
    from gkl_tpu.ops import pdhmm as pdhmm_ops

    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, (H, P))]
    read = np.concatenate([hap] * (R // H + 1))[:R].copy()
    mut = rng.random((R, P)) < 0.1
    read[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
    q = rng.integers(20, 40, (R, P)).astype(np.uint8)
    iq = rng.integers(30, 45, (R, P)).astype(np.uint8)
    dq = rng.integers(30, 45, (R, P)).astype(np.uint8)
    gcp = np.full((R, P), 10, np.uint8)
    haplen = rng.integers(H // 2, H + 1, P).astype(np.int32)
    rslen = rng.integers(R // 2, R + 1, P).astype(np.int32)
    hap_pd = np.zeros((H, P), np.uint8)
    if events:
        hap_pd[H // 4, ::2] = 2
        hap_pd[H // 4 + 3, ::2] = 4
        hap_pd[H // 2, 1::2] = 1 | 8
    states = pdhmm_ops.column_states(hap_pd)
    return hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen


@pytest.mark.parametrize("events", [False, True])
def test_chunked_matches_full_kernel(events):
    """The read-axis-chunked kernel must reproduce the single-pass kernel
    across chunk boundaries (to FP fusion tolerance: separately compiled
    float kernels differ by a few ulp)."""
    from gkl_tpu.ops import pdhmm_pallas

    args = _chunk_batch(H=24, R=40, P=16, events=events)
    full = np.asarray(pdhmm_pallas.pdhmm_raw_pallas(
        *args, lane_block=8, interpret=True))
    for r_chunk in (8, 16):
        ch = np.asarray(pdhmm_pallas.pdhmm_raw_pallas_chunked(
            *args, r_chunk=r_chunk, lane_block=8, interpret=True))
        np.testing.assert_allclose(ch, full, rtol=2e-6)


def test_chunked_long_reads_vs_jnp():
    """R=2048-bucket coverage: the chunked Pallas path vs the jnp engine
    (the previous fallback for long reads)."""
    from gkl_tpu.ops import pdhmm as pdhmm_ops
    from gkl_tpu.ops import pdhmm_pallas

    from gkl_tpu.context import MIN_ACCEPTED

    # near-diagonal lengths keep likelihoods above the rescue threshold
    # (reads far longer than the haplotype always underflow); R=96 with
    # r_chunk=32 still crosses two chunk boundaries
    args = _chunk_batch(H=96, R=96, P=8, events=True, seed=3)
    ref = np.asarray(pdhmm_ops.pdhmm_raw(*args, dtype="float32"))
    ch = np.asarray(pdhmm_pallas.pdhmm_raw_pallas_chunked(
        *args, r_chunk=32, lane_block=8, interpret=True))
    # engines only agree above the rescue threshold (below it subnormal
    # quantization dominates and the API reruns those lanes in f64)
    keep = ref >= MIN_ACCEPTED
    assert keep.sum() >= 4
    np.testing.assert_allclose(ch[keep], ref[keep], rtol=5e-5)

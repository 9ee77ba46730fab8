"""Cross-engine fuzz: Pallas kernels vs jnp engines over random shape
buckets and length distributions (interpret mode)."""

import numpy as np
import pytest

from gkl_tpu.ops import pdhmm as pdhmm_ops
from gkl_tpu.ops.pairhmm import pairhmm_raw
from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas
from gkl_tpu.ops.pairhmm_pallas_cols import pairhmm_raw_pallas_cols
from gkl_tpu.ops.pdhmm_pallas import pdhmm_raw_pallas
from gkl_tpu.ops.sw import sw_forward
from gkl_tpu.ops.sw_pallas import sw_forward_pallas


def _pairhmm_batch(rng, R, H, P):
    bases = np.frombuffer(b"ACGTN", np.uint8)
    hap = bases[rng.integers(0, 5, (H, P))]
    read = bases[rng.integers(0, 5, (R, P))]
    # half the lanes: read is a mutated hap prefix (likelihood in range)
    k = min(R, H)
    read[:k, ::2] = hap[:k, ::2]
    q = rng.integers(1, 60, (R, P)).astype(np.uint8)
    iq = rng.integers(1, 60, (R, P)).astype(np.uint8)
    dq = rng.integers(1, 60, (R, P)).astype(np.uint8)
    gcp = rng.integers(5, 30, (R, P)).astype(np.uint8)
    haplen = rng.integers(2, H + 1, P).astype(np.int32)
    rslen = rng.integers(2, R + 1, P).astype(np.int32)
    return hap, read, q, iq, dq, gcp, haplen, rslen


@pytest.mark.parametrize("seed,R,H", [(0, 8, 16), (1, 16, 8), (2, 24, 32), (3, 32, 48)])
def test_pairhmm_kernels_agree(seed, R, H):
    rng = np.random.default_rng(seed)
    args = _pairhmm_batch(rng, R, H, 16)
    ref = np.asarray(pairhmm_raw(*args, dtype="float32"))
    rows = np.asarray(pairhmm_raw_pallas(*args, lane_block=8, interpret=True))
    cols = np.asarray(pairhmm_raw_pallas_cols(*args, lane_block=8, interpret=True))
    # compare only above MIN_ACCEPTED: below it the API rescues in f64 and
    # f32 engines legitimately lose precision near their flush floor
    ok = ref > 1e-28
    np.testing.assert_allclose(rows[ok], ref[ok], rtol=3e-5)
    np.testing.assert_allclose(cols[ok], ref[ok], rtol=3e-5)


@pytest.mark.parametrize("seed,R,H", [(0, 8, 16), (1, 16, 24), (2, 32, 32)])
def test_pdhmm_kernels_agree(seed, R, H):
    rng = np.random.default_rng(100 + seed)
    hap, read, q, iq, dq, gcp, haplen, rslen = _pairhmm_batch(rng, R, H, 16)
    # random PD bytes with valid DEL_START/DEL_END pairing + SNP bits
    hap_pd = np.zeros((H, 16), np.uint8)
    for p in range(16):
        j = int(rng.integers(0, max(1, H - 6)))
        hap_pd[j, p] = 2
        hap_pd[j + int(rng.integers(1, 4)), p] = 4
        s = int(rng.integers(0, H))
        hap_pd[s, p] |= 1 | int(rng.choice([8, 16, 32, 64]))
    states = pdhmm_ops.column_states(hap_pd)
    args = (hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen)
    ref = np.asarray(pdhmm_ops.pdhmm_raw(*args, dtype="float32"))
    pal = np.asarray(pdhmm_raw_pallas(*args, lane_block=8, interpret=True))
    ok = ref > 1e-28  # below MIN_ACCEPTED the API rescues in f64
    np.testing.assert_allclose(pal[ok], ref[ok], rtol=3e-5)


@pytest.mark.parametrize("seed,N,M,ib", [(0, 8, 16, False), (1, 16, 8, True), (2, 40, 24, False)])
def test_sw_kernels_agree(seed, N, M, ib):
    rng = np.random.default_rng(200 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, (N, 16))]
    alt = bases[rng.integers(0, 4, (M, 16))]
    k = min(N, M)
    alt[:k, ::2] = ref[:k, ::2]
    reflen = rng.integers(1, N + 1, 16).astype(np.int32)
    altlen = rng.integers(1, M + 1, 16).astype(np.int32)
    a = sw_forward(ref, alt, reflen, altlen, 200, -150, -260, -11,
                   indel_boundary=ib, pack_bt=True)
    b = sw_forward_pallas(ref, alt, reflen, altlen, 200, -150, -260, -11,
                          indel_boundary=ib, lane_block=8, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_scaled_kernel_short_haplen_long_read():
    """Regression: padded columns beyond haplen must not dominate the
    scaled kernel's rescale max (their pad-match garbage decays slowly and
    crushed valid columns into flush range)."""
    from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas_scaled

    rng = np.random.default_rng(99)
    R, H, P = 48, 24, 16
    bases = np.frombuffer(b"ACGTN", np.uint8)
    hap = bases[rng.integers(0, 5, (H, P))]
    read = bases[rng.integers(0, 5, (R, P))]
    q = rng.integers(0, 64, (R, P)).astype(np.uint8)
    iq = rng.integers(0, 64, (R, P)).astype(np.uint8)
    dq = rng.integers(0, 64, (R, P)).astype(np.uint8)
    gcp = rng.integers(0, 40, (R, P)).astype(np.uint8)
    haplen = rng.integers(1, 10, P).astype(np.int32)  # short haps, long pad
    rslen = rng.integers(30, R + 1, P).astype(np.int32)
    args = (hap, read, q, iq, dq, gcp, haplen, rslen)
    ref = np.asarray(pairhmm_raw(*args, dtype="float32"))
    m, e, _ = pairhmm_raw_pallas_scaled(*args, lane_block=8, interpret=True)
    recon = np.asarray(m).astype(np.float64) * np.exp2(np.asarray(e).astype(np.float64))
    ok = ref > 1e-30  # above plain f32's own precision floor
    np.testing.assert_allclose(recon[ok], ref[ok], rtol=5e-5)


def test_scan_coefficient_underflow():
    """Regression: hoisted Hillis-Steele span coefficients (products of
    per-step decay factors) underflow f32 while their contributions still
    dominate — a 16-row window of high gap quals is ~1e-64, yet times a
    huge early-row M it was 44% of an in-contract result (fuzz seed 31337).
    All scan paths must carry coefficients as (mantissa, exponent) pairs."""
    rng = np.random.default_rng(31337)
    R, H, P = 32, 8, 16
    bases = np.frombuffer(b"ACGTN", np.uint8)
    hap = bases[rng.integers(0, 5, (H, P))]
    read = bases[rng.integers(0, 5, (R, P))]
    read[:5] = hap[:5]  # early rows match: early-row M is huge
    q = rng.integers(0, 64, (R, P)).astype(np.uint8)
    iq = rng.integers(0, 64, (R, P)).astype(np.uint8)
    dq = rng.integers(0, 64, (R, P)).astype(np.uint8)
    gcp = np.full((R, P), 39, np.uint8)  # 16-row span product ~ 1e-62
    haplen = np.full(P, 5, np.int32)  # tiny hap: pure-insertion tail
    rslen = np.full(P, R, np.int32)
    args = (hap, read, q, iq, dq, gcp, haplen, rslen)
    ref64 = np.asarray(pairhmm_raw(*args, dtype="float64")) * (2.0 ** -900)
    ref = np.asarray(pairhmm_raw(*args, dtype="float32"))
    rows = np.asarray(pairhmm_raw_pallas(*args, lane_block=8, interpret=True))
    cols = np.asarray(pairhmm_raw_pallas_cols(*args, lane_block=8, interpret=True))
    ok = ref > 1e-28
    # the jnp f32 reference itself must match f64 here (its associative scan
    # had the same flaw)
    np.testing.assert_allclose(ref[ok], ref64[ok], rtol=5e-5)
    np.testing.assert_allclose(rows[ok], ref[ok], rtol=5e-5)
    np.testing.assert_allclose(cols[ok], ref[ok], rtol=5e-5)

    from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas_scaled

    m, e, _ = pairhmm_raw_pallas_scaled(*args, lane_block=8, interpret=True)
    recon = np.asarray(m).astype(np.float64) * np.exp2(np.asarray(e).astype(np.float64))
    ok64 = ref64 > 1e-200
    np.testing.assert_allclose(recon[ok64], ref64[ok64], rtol=2e-3)

    # PDHMM: same insertion-scan structure (no PD events -> fast columns)
    hap_pd = np.zeros((H, P), np.uint8)
    states = pdhmm_ops.column_states(hap_pd)
    pdargs = (hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen)
    pref64 = np.asarray(pdhmm_ops.pdhmm_raw(*pdargs, dtype="float64")) * (2.0 ** -900)
    pref = np.asarray(pdhmm_ops.pdhmm_raw(*pdargs, dtype="float32"))
    ppal = np.asarray(pdhmm_raw_pallas(*pdargs, lane_block=8, interpret=True))
    ok2 = pref > 1e-28
    np.testing.assert_allclose(pref[ok2], pref64[ok2], rtol=5e-5)
    np.testing.assert_allclose(ppal[ok2], pref[ok2], rtol=5e-5)


def test_scaled_kernel_growing_pad_tail():
    """Regression: rows past a lane's rslen can GROW the DP state (with a
    wide haplotype and near-1 pYY, M <- pGAPM*Y <- H*pMY*M amplifies per
    row), driving the state scale hundreds of binades above the collected
    result — the accumulator fold must compare VALUE exponents or the
    result flushes to zero (fuzz-caught at R=256/H=384)."""
    from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas_scaled

    R, H, P = 128, 128, 8
    hap = np.full((H, P), ord("A"), np.uint8)
    read = np.full((R, P), ord("A"), np.uint8)
    q = np.full((R, P), 10, np.uint8)
    iq = np.full((R, P), 10, np.uint8)
    dq = np.full((R, P), 6, np.uint8)   # pMY ~ 0.25
    gcp = np.full((R, P), 1, np.uint8)  # pYY ~ 0.79, pGAPM ~ 0.21
    haplen = np.full(P, H, np.int32)
    rslen = np.full(P, 8, np.int32)     # 120 growing pad rows follow
    args = (hap, read, q, iq, dq, gcp, haplen, rslen)
    ref = np.asarray(pairhmm_raw(*args, dtype="float32"))
    m, e, _ = pairhmm_raw_pallas_scaled(*args, lane_block=8, interpret=True)
    recon = np.asarray(m).astype(np.float64) * np.exp2(np.asarray(e).astype(np.float64))
    assert np.all(ref > 0)
    np.testing.assert_allclose(recon, ref, rtol=1e-6)


@pytest.mark.parametrize("seed,R,H,rc", [(0, 24, 16, 8), (1, 40, 24, 16), (2, 32, 32, 8)])
def test_pdhmm_chunked_fuzz(seed, R, H, rc):
    """Read-axis-chunked PDHMM vs the single-pass kernel across random
    lengths and PD events (chunk boundaries land mid-read for most lanes)."""
    from gkl_tpu.ops.pdhmm_pallas import pdhmm_raw_pallas_chunked

    rng = np.random.default_rng(300 + seed)
    hap, read, q, iq, dq, gcp, haplen, rslen = _pairhmm_batch(rng, R, H, 16)
    hap_pd = np.zeros((H, 16), np.uint8)
    for p in range(16):
        j = int(rng.integers(0, max(1, H - 6)))
        hap_pd[j, p] = 2
        hap_pd[j + int(rng.integers(1, 4)), p] = 4
        s = int(rng.integers(0, H))
        hap_pd[s, p] |= 1 | int(rng.choice([8, 16, 32, 64]))
    states = pdhmm_ops.column_states(hap_pd)
    args = (hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen)
    full = np.asarray(pdhmm_raw_pallas(*args, lane_block=8, interpret=True))
    ch = np.asarray(pdhmm_raw_pallas_chunked(*args, r_chunk=rc, lane_block=8,
                                             interpret=True))
    ok = full > 1e-28
    np.testing.assert_allclose(ch[ok], full[ok], rtol=3e-5)


@pytest.mark.parametrize("seed,N,M,seg,ib", [(0, 32, 16, 8, False), (1, 48, 24, 16, True)])
def test_sw_relay_fuzz(seed, N, M, seg, ib):
    """SW segment relay vs the single-call kernel across random lengths
    (bit-equal: the DP is integer)."""
    from gkl_tpu.ops.sw_pallas import sw_forward_pallas_relay

    rng = np.random.default_rng(400 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, (N, 16))]
    alt = bases[rng.integers(0, 4, (M, 16))]
    k = min(N, M)
    alt[:k, ::2] = ref[:k, ::2]
    reflen = rng.integers(1, N + 1, 16).astype(np.int32)
    altlen = rng.integers(1, M + 1, 16).astype(np.int32)
    a = sw_forward_pallas(ref, alt, reflen, altlen, 200, -150, -260, -11,
                          indel_boundary=ib, lane_block=8, interpret=True)
    b = sw_forward_pallas_relay(ref, alt, reflen, altlen, 200, -150, -260,
                                -11, indel_boundary=ib, seg=seg, lane_block=8,
                                interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("seed,R,H,r_chunk",
                         [(0, 24, 16, 8), (1, 16, 40, 8), (2, 40, 24, 16),
                          (3, 33, 17, 8)])
def test_pairhmm_cols_relay_fuzz(seed, R, H, r_chunk):
    """Read-relayed column sweep vs the jnp engine over ragged random
    lengths — including reads shorter than one chunk, length-1 lanes, and
    a read span that is not a multiple of r_chunk (the boundary-plane
    carry crosses mid-lane)."""
    from gkl_tpu.ops.pairhmm_pallas_cols import pairhmm_raw_pallas_cols_relay

    rng = np.random.default_rng(300 + seed)
    args = _pairhmm_batch(rng, R, H, 16)
    hap, read, q, iq, dq, gcp, haplen, rslen = args
    # force edge lanes: a length-1 read, a length-1 hap, a read exactly at
    # one chunk, and one a single row past a chunk boundary
    rslen[0] = 1
    haplen[1] = 1
    rslen[2] = min(R, r_chunk)
    rslen[3] = min(R, r_chunk + 1)
    ref = np.asarray(pairhmm_raw(*args, dtype="float32"))
    got = np.asarray(pairhmm_raw_pallas_cols_relay(
        *args, lane_block=8, r_chunk=r_chunk, interpret=True))
    ok = ref > 1e-28  # below MIN_ACCEPTED the API rescues in f64
    assert ok.any()
    np.testing.assert_allclose(got[ok], ref[ok], rtol=3e-5)

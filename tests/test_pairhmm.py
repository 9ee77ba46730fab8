"""PairHMM golden-data contract tests (PairHmmUnitTest.java:56-234)."""

import numpy as np
import pytest

from gkl_tpu import HaplotypeData, PairHMM, PairHMMNativeArguments, ReadData

import golden


def test_simple_case():
    """ACGT/ACGT with flat quals => -6.022797e-01 (PairHmmUnitTest.java:56-89)."""
    hmm = PairHMM()
    # raw "++++" bytes (=43), not normalized — PairHmmUnitTest.java:75-81
    plus = np.full(4, ord("+"), np.uint8)
    read = ReadData(
        read_bases=b"ACGT",
        read_quals=plus,
        insertion_gop=plus,
        deletion_gop=plus,
        overall_gcp=plus,
    )
    hap = HaplotypeData(haplotype_bases=b"ACGT")
    out = hmm.compute_likelihoods([read], [hap])
    assert out.shape == (1,)
    np.testing.assert_allclose(out[0], -6.022797e-01, atol=1e-5)


@pytest.mark.parametrize("use_double", [False, True])
def test_golden_file(use_double):
    """All 104 golden cases at 1e-5 in both precision modes."""
    cases = golden.load_pairhmm_cases()
    hmm = PairHMM(PairHMMNativeArguments(use_double_precision=use_double))

    reads = [
        ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases
    ]
    haps = [HaplotypeData(c.hap) for c in cases]
    expected = np.array([c.expected for c in cases])

    # Compute pairwise (not cross-product): drive the engine per case the way
    # the reference test does (one read x one hap per call)...
    results = np.array(
        [hmm.compute_likelihoods([rd], [hp])[0] for rd, hp in zip(reads, haps)]
    )
    np.testing.assert_allclose(results, expected, atol=1e-5)


def test_cross_product_order():
    """Results are read-major over the reads x haps cross product."""
    cases = golden.load_pairhmm_cases()[:3]
    hmm = PairHMM()
    reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases]
    haps = [HaplotypeData(c.hap) for c in cases]
    out = hmm.compute_likelihoods(reads, haps)
    assert out.shape == (9,)
    singles = np.array(
        [hmm.compute_likelihoods([rd], [hp])[0] for rd in reads for hp in haps]
    )
    np.testing.assert_allclose(out, singles, rtol=0, atol=1e-12)


def test_batched_equals_single():
    """One big packed batch gives the same answers as per-case calls."""
    cases = golden.load_pairhmm_cases()
    hmm = PairHMM()
    # build a diagonal pairing via one read per call vs a single grouped batch
    reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases[:16]]
    haps = [HaplotypeData(c.hap) for c in cases[:16]]
    expected = np.array([c.expected for c in cases[:16]])
    # cross-product then pick the diagonal
    out = hmm.compute_likelihoods(reads, haps).reshape(16, 16)
    np.testing.assert_allclose(np.diagonal(out), expected, atol=1e-5)


def test_async_dispatch_matches_sync():
    """compute_likelihoods_async must equal the sync API exactly (same
    kernels, same rescue) with multiple batches in flight at once — the
    pipeline's overlap building block."""
    import golden
    from gkl_tpu import HaplotypeData, PairHMM, ReadData

    cases = golden.load_pairhmm_cases()[:6]
    reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases]
    haps = [HaplotypeData(c.hap) for c in cases]
    hmm = PairHMM()
    sync = hmm.compute_likelihoods(reads, haps)
    # two batches dispatched before either resolves
    p1 = hmm.compute_likelihoods_async(reads[:3], haps)
    p2 = hmm.compute_likelihoods_async(reads[3:], haps)
    a2 = p2.result()
    a1 = p1.result()
    got = np.concatenate([a1, a2])
    np.testing.assert_array_equal(got, sync)
    # resolving twice returns the same array
    np.testing.assert_array_equal(p1.result(), a1)


def test_async_inflight_budget_defers_groups(monkeypatch):
    """With the in-flight byte budget forced tiny, later bucket groups
    defer ('lazy') at dispatch time and only go to the device from
    result() — and the numbers still equal the sync API (bounds device
    memory for huge heterogeneous batches)."""
    import golden
    from gkl_tpu import HaplotypeData, PairHMM, ReadData

    cases = golden.load_pairhmm_cases()[:8]
    reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases]
    haps = [HaplotypeData(c.hap) for c in cases]
    hmm = PairHMM()
    sync = hmm.compute_likelihoods(reads, haps)
    monkeypatch.setattr(PairHMM, "_ASYNC_INFLIGHT_BYTES", 1)
    pending = hmm.compute_likelihoods_async(reads, haps)
    kinds = [w[0] for w in pending._work]
    if len(kinds) > 1:  # first group always dispatches; the rest defer
        assert kinds.count("lazy") == len(kinds) - 1
    np.testing.assert_array_equal(pending.result(), sync)


def test_pack_pairs_indexed_matches_dense():
    """PackedPairsIndexed.materialize() reproduces pack_pairs bit-for-bit on
    the real lanes (pad lanes differ by design: indexed pad lanes alias
    column 0 instead of holding fill)."""
    import golden
    from gkl_tpu import batch as batch_mod

    cases = golden.load_pairhmm_cases()[:9]
    reads = [c.read for c in cases]
    rquals = [(c.q, c.iq, c.dq, c.gcp) for c in cases]
    haps = [c.hap for c in cases[:4]]
    pk = batch_mod.pack_pairs_indexed(haps, reads, rquals, lane_multiple=8)
    dense = batch_mod.pack_pairs(
        [h for _ in reads for h in haps],
        [r for r in reads for _ in haps],
        [qs for qs in rquals for _ in haps],
        lane_multiple=8,
    )
    got = pk.materialize()
    n = pk.n_real
    assert n == dense.n_real == len(reads) * len(haps)
    for field in ("hap", "read", "q", "iq", "dq", "gcp"):
        np.testing.assert_array_equal(getattr(got, field)[:, :n],
                                      getattr(dense, field)[:, :n])
    np.testing.assert_array_equal(got.haplen[:n], dense.haplen[:n])
    np.testing.assert_array_equal(got.rslen[:n], dense.rslen[:n])


def test_const_quals_detection():
    from gkl_tpu import api

    n = 24
    mk = lambda v: np.full(n, v, np.uint8)  # noqa: E731
    seq = np.full(n, 65, np.uint8)
    const_reads = [ReadData(seq, mk(30), mk(45), mk(45), mk(10))
                   for _ in range(5)]
    assert api._const_quals_of(const_reads) == (45, 45, 10)
    varied = const_reads + [ReadData(seq, mk(30), mk(45), mk(44), mk(10))]
    assert api._const_quals_of(varied) is None
    ragged = const_reads[:2]
    ragged[1].deletion_gop[7] = 9  # non-uniform within one plane
    assert api._const_quals_of(ragged) is None


def test_indexed_scaled_path_matches_dense_engine(monkeypatch):
    """The deduplicated device-expanded path (indexed packing + scaled
    kernel in interpret mode) agrees with the plain engine across mixed
    length buckets, with and without constant GOP planes."""
    import golden
    from gkl_tpu import api
    from gkl_tpu.ops import pairhmm_pallas

    def interp_scaled(*args, lane_block=128, **kw):
        return pairhmm_pallas.pairhmm_raw_pallas_scaled(
            *args, lane_block=8, interpret=True)

    cases = golden.load_pairhmm_cases()[:10]
    reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases]
    haps = [HaplotypeData(c.hap) for c in cases[:5]]
    expected = PairHMM().compute_likelihoods(reads, haps)

    monkeypatch.setattr(api, "_scaled_inner_fn", lambda: interp_scaled)
    monkeypatch.setattr(PairHMM, "_use_pallas",
                        classmethod(lambda cls, hap_len=0: True))
    hmm = PairHMM()
    pending = hmm.compute_likelihoods_async(reads, haps)
    kinds = {w[0] for w in pending._work}
    assert kinds == {"scaled"}  # the indexed fast path actually ran
    got = pending.result()
    np.testing.assert_allclose(got, expected, atol=1e-4)

    # constant-GOP flow: shared planes per length, detected automatically
    gop = {len(c.read): np.full(len(c.read), 45, np.uint8) for c in cases}
    gcp = {len(c.read): np.full(len(c.read), 10, np.uint8) for c in cases}
    creads = [ReadData(c.read, c.q, gop[len(c.read)], gop[len(c.read)],
                       gcp[len(c.read)]) for c in cases]
    assert api._const_quals_of(creads) == (45, 45, 10)
    pending = hmm.compute_likelihoods_async(creads, haps)
    assert {w[0] for w in pending._work} == {"scaled"}
    assert all(w[2].const_quals == (45, 45, 10) for w in pending._work)
    got_c = pending.result()
    monkeypatch.undo()
    expected_c = PairHMM().compute_likelihoods(creads, haps)
    np.testing.assert_allclose(got_c, expected_c, atol=1e-4)


def test_oracle_native_matches_python():
    """The threaded native f64 oracle (native/pairhmm_oracle.cc — the
    IntelPairHmm.cc:157-165 rescue engine) must be bit-identical to the
    per-lane Python oracle: both run the same sequential DP on the same
    precomputed probability rows."""
    from gkl_tpu.ops import pairhmm_ref

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    haps, reads, quals = [], [], []
    for _ in range(16):
        hl = int(rng.integers(4, 70))
        rl = int(rng.integers(3, 60))
        haps.append(bases[rng.integers(0, 5, hl)])
        reads.append(bases[rng.integers(0, 5, rl)])
        quals.append((rng.integers(6, 60, rl).astype(np.uint8),
                      rng.integers(20, 50, rl).astype(np.uint8),
                      rng.integers(20, 50, rl).astype(np.uint8),
                      np.full(rl, 10, np.uint8)))
    got = pairhmm_ref.pairhmm_scalar_batch(haps, reads, quals, threads=3)
    want = np.array([
        pairhmm_ref.pairhmm_scalar(haps[k], reads[k], *quals[k])
        for k in range(len(haps))
    ])
    np.testing.assert_array_equal(got, want)


def test_extract_lanes_matches_materialize():
    """The rescue's lane compaction on an INDEXED batch must see exactly the
    planes a full materialize() would (const-GOP synthesis included)."""
    from gkl_tpu import batch as batch_mod
    from gkl_tpu.api import _extract_lanes

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    haps = [bases[rng.integers(0, 4, int(rng.integers(8, 40)))]
            for _ in range(3)]
    reads = [bases[rng.integers(0, 4, 24)] for _ in range(5)]
    rq = [(rng.integers(10, 50, 24).astype(np.uint8),
           rng.integers(20, 45, 24).astype(np.uint8),
           rng.integers(20, 45, 24).astype(np.uint8),
           rng.integers(5, 20, 24).astype(np.uint8)) for _ in range(5)]
    for const in (None, (45, 46, 10)):
        pk = batch_mod.pack_pairs_indexed(haps, reads, rq,
                                          lane_multiple=8, const_quals=const)
        dense = pk.materialize()
        lanes = np.array([0, 4, 7, 14])
        hs, rs, qs = _extract_lanes(pk, lanes)
        for i, k in enumerate(lanes):
            hl, rl = int(pk.haplen[k]), int(pk.rslen[k])
            np.testing.assert_array_equal(hs[i], dense.hap[:hl, k])
            np.testing.assert_array_equal(rs[i], dense.read[:rl, k])
            for got_q, want_q in zip(qs[i], (dense.q, dense.iq, dense.dq,
                                             dense.gcp)):
                np.testing.assert_array_equal(got_q, want_q[:rl, k])


def test_rescue_is_lane_granular(monkeypatch):
    """Rescue work scales with the number of deep lanes, not the group: 3
    deep lanes in a 4096-lane group recompute exactly 3 lanes (the
    reference's per-pair double rescue, IntelPairHmm.cc:157-165), pinned
    via the pairhmm_rescue METRICS counter."""
    from gkl_tpu import profiling

    monkeypatch.setenv("GKL_TPU_METRICS", "1")
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, 48)]
    q50 = np.full(32, 50, np.uint8)
    # gcp=50 too: with cheap gap extensions the whole-read-insertion path
    # keeps mismatched lanes in f32 range; Q50 everywhere makes every path
    # cost ~32*1e-5-class factors -> raw ~1e-124, far under f32
    gcp = np.full(32, 50, np.uint8)
    deep_lanes = (17, 900, 3000)
    # guaranteed-mismatch read: every base differs from the hap prefix ->
    # 32 mismatch priors of 1e-5/3 -> raw ~1e-139, far under f32 range
    mism = bases[(np.searchsorted(bases, hap[:32]) + 1) % 4]
    assert not np.any(mism == hap[:32])
    reads = []
    for i in range(4096):
        rb = mism if i in deep_lanes else hap[:32]
        reads.append(ReadData(rb.copy(), q50, q50, q50, gcp))
    haps = [HaplotypeData(hap)]

    profiling.METRICS.reset()
    out = PairHMM(lane_multiple=8).compute_likelihoods(reads, haps)
    snap = profiling.METRICS.snapshot()
    assert "pairhmm_rescue" in snap, snap.keys()
    assert snap["pairhmm_rescue"]["items"] == len(deep_lanes)

    # and the rescued values are the exact-f64 answers
    f64 = PairHMM(PairHMMNativeArguments(use_double_precision=True),
                  lane_multiple=8).compute_likelihoods(
        [reads[i] for i in deep_lanes], haps)
    np.testing.assert_allclose(out[list(deep_lanes)], f64, rtol=0, atol=1e-9)


def test_long_pair_dispatch_uses_relay(monkeypatch):
    """Pairs past BOTH the rows-kernel hap cap and the cols-kernel read cap
    must route to the read-relayed cols kernel, not the ~50x-slower jnp
    scan (the round-3 long-read cliff).  Caps are shrunk so small shapes
    exercise the big-shape routing."""
    from gkl_tpu import utils
    from gkl_tpu.ops import pairhmm_pallas_cols

    monkeypatch.setattr(utils, "is_tpu_available", lambda: True)
    monkeypatch.setattr(PairHMM, "PALLAS_MAX_HAP", 16)
    monkeypatch.setattr(PairHMM, "COLS_MAX_READ", 8)
    calls = {}
    orig = pairhmm_pallas_cols.pairhmm_raw_pallas_cols_relay

    def spy(*args, lane_block=128, **kw):
        calls["relay"] = True
        return orig(*args, lane_block=8, r_chunk=8, interpret=True)

    monkeypatch.setattr(pairhmm_pallas_cols, "pairhmm_raw_pallas_cols_relay",
                        spy)

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, 24)]  # bucket 24 > mocked hap cap 16
    reads = [ReadData(hap[:16].copy(),  # bucket 16 > mocked read cap 8
                      *(np.full(16, v, np.uint8) for v in (30, 40, 40, 10)))
             for _ in range(3)]
    haps = [HaplotypeData(hap)]
    want = PairHMM().compute_likelihoods(reads, haps)  # jnp reference path

    monkeypatch.setattr(PairHMM, "_use_pallas",
                        classmethod(lambda cls, hap_len=0: hap_len <= 16))
    got = PairHMM(lane_multiple=8).compute_likelihoods(reads, haps)
    assert calls.get("relay"), "relay kernel was not dispatched"
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_pallas_falloff_warns_and_strict_raises(monkeypatch, capsys):
    """On a TPU backend, degrading to the jnp scan must be loud: a stderr
    diagnostic by default, a RuntimeError under GKL_TPU_STRICT_PALLAS=1
    (VERDICT r3: the silent ~50x failure mode)."""
    from gkl_tpu import api as api_mod
    from gkl_tpu import utils

    monkeypatch.setattr(utils, "is_tpu_available", lambda: True)
    monkeypatch.setenv("GKL_TPU_PALLAS", "0")  # force the fall-off
    monkeypatch.setattr(api_mod, "_PALLAS_FALLOFF_SEEN", set())

    cases = [
        ReadData(np.frombuffer(b"ACGTACGT", np.uint8),
                 *(np.full(8, v, np.uint8) for v in (30, 40, 40, 10)))
    ]
    haps = [HaplotypeData(np.frombuffer(b"ACGTACGT", np.uint8))]
    out = PairHMM(lane_multiple=8).compute_likelihoods(cases, haps)
    assert np.isfinite(out).all()
    assert "fell off the Pallas fast path" in capsys.readouterr().err
    # the diagnostic is deduplicated: an identical batch stays quiet
    PairHMM(lane_multiple=8).compute_likelihoods(cases, haps)
    assert "fell off" not in capsys.readouterr().err

    monkeypatch.setenv("GKL_TPU_STRICT_PALLAS", "1")
    with pytest.raises(RuntimeError, match="Pallas fast path"):
        PairHMM(lane_multiple=8).compute_likelihoods(cases, haps)

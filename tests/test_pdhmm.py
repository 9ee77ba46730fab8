"""PDHMM golden-data contract tests (IntelPDHMMUnitTest.java:160-257).

Tolerance 1e-4 vs the reference golden TSVs (DOUBLE_ASSERTION_DELTA,
IntelPDHMMUnitTest.java:33).
"""

import numpy as np
import pytest

from gkl_tpu.api_pdhmm import PDHaplotypeData, PDHMM, PDHMMNativeArguments
from gkl_tpu.api import ReadData
from gkl_tpu.ops import pdhmm_ref

import golden

TOL = 1e-4


def _flat_batch(cases):
    """Flatten cases into the Java computePDHMM layout (flat padded arrays)."""
    t = len(cases)
    max_h = max(len(c.hap) for c in cases)
    max_r = max(len(c.read) for c in cases)
    hap = np.zeros((t, max_h), np.uint8)
    pd = np.zeros((t, max_h), np.uint8)
    read = np.zeros((t, max_r), np.uint8)
    q = np.zeros((t, max_r), np.uint8)
    iq = np.zeros((t, max_r), np.uint8)
    dq = np.zeros((t, max_r), np.uint8)
    g = np.zeros((t, max_r), np.uint8)
    for i, c in enumerate(cases):
        hap[i, : len(c.hap)] = c.hap
        pd[i, : len(c.hap)] = c.hap_pd
        read[i, : len(c.read)] = c.read
        q[i, : len(c.read)] = c.q
        iq[i, : len(c.read)] = c.iq
        dq[i, : len(c.read)] = c.dq
        g[i, : len(c.read)] = c.gcp
    hl = np.array([len(c.hap) for c in cases], np.int64)
    rl = np.array([len(c.read) for c in cases], np.int64)
    return hap, pd, read, q, iq, dq, g, hl, rl


def test_scalar_reference_sample():
    cases = golden.load_pdhmm_cases("pdhmm_syn_199_68_51.txt")[:8]
    for c in cases:
        r = pdhmm_ref.pdhmm_scalar(c.hap, c.hap_pd, c.read, c.q, c.iq, c.dq, c.gcp)
        assert abs(r - c.expected) < TOL


@pytest.mark.parametrize(
    "fname",
    ["pdhmm_syn_199_68_51.txt", "pdhmm_syn_990_1_2.txt", "pdhmm_syn_1412_129_223.txt"],
)
def test_golden_files_flat_api(fname):
    cases = golden.load_pdhmm_cases(fname)
    hmm = PDHMM()
    args = _flat_batch(cases)
    # exercise the flat 1-D Java layout for one file, 2-D for the others
    if fname.endswith("990_1_2.txt"):
        flat = [a.reshape(-1) for a in args[:7]] + list(args[7:])
        out = hmm.compute_pdhmm(
            *flat,
            batch_size=len(cases),
            max_hap_length=args[0].shape[1],
            max_read_length=args[2].shape[1],
        )
    else:
        out = hmm.compute_pdhmm(*args)
    expected = np.array([c.expected for c in cases])
    np.testing.assert_allclose(out, expected, atol=TOL)


def test_object_path_cross_product():
    cases = golden.load_pdhmm_cases("pdhmm_syn_199_68_51.txt")[:4]
    hmm = PDHMM()
    reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases]
    haps = [PDHaplotypeData(c.hap, haplotype_pdbases=c.hap_pd) for c in cases]
    out = hmm.compute_likelihoods(reads, haps)
    assert out.shape == (16,)
    expected = np.array([c.expected for c in cases])
    np.testing.assert_allclose(out.reshape(4, 4).diagonal(), expected, atol=TOL)


def test_memory_budget_slicing():
    """A tiny maxMemoryInMB forces multi-slice execution with equal results
    (mirrors IntelPDHMMUnitTest initializing with maxMemoryInMB=10)."""
    cases = golden.load_pdhmm_cases("pdhmm_syn_199_68_51.txt")[:48]
    hmm_small = PDHMM(PDHMMNativeArguments(max_memory_in_mb=1), lane_multiple=8)
    hmm_big = PDHMM()
    args = _flat_batch(cases)
    out_small = hmm_small.compute_pdhmm(*args)
    out_big = hmm_big.compute_pdhmm(*args)
    np.testing.assert_allclose(out_small, out_big, atol=1e-12)


def test_dynamic_range_boost_is_exact():
    """The 2^600 midpoint rescale changes deep results only by the rescale.

    (Boosting shallow lanes would overflow — the engine only applies it to
    lanes whose unboosted probability is tiny.)
    """
    import gkl_tpu.batch as batch_mod
    from gkl_tpu.ops import pdhmm as pdhmm_ops

    all_cases = golden.load_pdhmm_cases("pdhmm_syn_1412_129_223.txt")
    cases = [c for c in all_cases if -560 < c.expected < -350][:8]
    assert len(cases) >= 2
    packed = batch_mod.pack_pairs(
        [c.hap for c in cases],
        [c.read for c in cases],
        [(c.q, c.iq, c.dq, c.gcp) for c in cases],
        lane_multiple=8,
    )
    H, P = packed.hap.shape
    hap_pd = np.zeros((H, P), np.uint8)
    for k, c in enumerate(cases):
        hap_pd[: len(c.hap), k] = c.hap_pd
    states = pdhmm_ops.column_states(hap_pd)
    base = np.asarray(
        pdhmm_ops.pdhmm_raw(
            packed.hap, hap_pd, states, packed.read, packed.q, packed.iq,
            packed.dq, packed.gcp, packed.haplen, packed.rslen,
        )
    )
    boost_row = np.maximum(packed.rslen // 2, 1).astype(np.int32)
    # A modest rescale is exactly invertible; very large boosts can overflow
    # lanes whose mid-row magnitude is still near the f64 ceiling, which is
    # why the engine applies boosts adaptively (or falls back to the scalar
    # oracle for reference-parity subnormal quantization).
    boosted = np.asarray(
        pdhmm_ops.pdhmm_raw(
            packed.hap, hap_pd, states, packed.read, packed.q, packed.iq,
            packed.dq, packed.gcp, packed.haplen, packed.rslen,
            boost_row, 100.0,
        )
    )
    np.testing.assert_allclose(np.log10(boosted) - 100 * np.log10(2.0), np.log10(base), atol=1e-9)


def test_invalid_args():
    cases = golden.load_pdhmm_cases("pdhmm_syn_199_68_51.txt")[:2]
    hmm = PDHMM()
    hap, pd, read, q, iq, dq, g, hl, rl = _flat_batch(cases)
    with pytest.raises(ValueError):
        hmm.compute_pdhmm(hap, pd, read, q, iq, dq, g, hl, rl[:1])
    with pytest.raises(ValueError):
        hmm.compute_pdhmm(hap.reshape(-1)[:-3], pd, read, q, iq, dq, g, hl, rl,
                          batch_size=2, max_hap_length=hap.shape[1], max_read_length=read.shape[1])
    with pytest.raises(ValueError):
        hmm.compute_pdhmm(hap, pd, read, q, iq, dq, g, np.zeros(2, np.int64), rl)
    with pytest.raises(ValueError):
        hmm.compute_likelihoods([], [])


def test_pdhmm_new_object_path():
    """newPDHMMTest equivalent (IntelPDHMMUnitTest.java:446-555) — the
    reference ships this file with assertions commented out; here the full
    reads x haps expected matrix is asserted at 1e-4."""
    reads, haps, expected = golden.load_pdhmm_new()
    # subset for CI speed: first 24 reads x all haps, expected is read-major
    n_r, n_h = 24, len(haps)
    hmm = PDHMM()
    rds = [ReadData(*r) for r in reads[:n_r]]
    hps = [PDHaplotypeData(h[0], haplotype_pdbases=h[1]) for h in haps]
    out = hmm.compute_likelihoods(rds, hps)
    want = expected[: n_r * n_h]
    np.testing.assert_allclose(out, want, atol=TOL)


def test_batch_oracle_matches_serial():
    """The native thread-pool batch oracle must be bit-identical to the
    per-lane Python oracle (both preserve f64 gradual underflow)."""
    import golden
    from gkl_tpu.ops import pdhmm_ref

    cases = golden.load_pdhmm_cases("pdhmm_syn_199_68_51.txt")[:24]
    haps = [c.hap for c in cases]
    pds = [c.hap_pd for c in cases]
    reads = [c.read for c in cases]
    quals = [(c.q, c.iq, c.dq, c.gcp) for c in cases]
    batch = pdhmm_ref.pdhmm_scalar_batch(haps, pds, reads, quals)
    serial = np.array([
        pdhmm_ref.pdhmm_scalar(haps[k], pds[k], reads[k], *quals[k])
        for k in range(len(cases))
    ])
    np.testing.assert_array_equal(batch, serial)


def test_scattered_events_lane_planning():
    """Heterogeneous flat batch with one PD event at a random column per
    pair: the batch planner reorders lanes by first event column
    (pdhmm_ops.lane_event_key) to keep the Pallas fast/slow split
    effective, and must restore caller order exactly — results must match
    the scalar oracle (the permutation is a pure planning detail)."""
    from gkl_tpu import parallel

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    t, hl_n, rl_n = 48, 40, 24
    hap = bases[rng.integers(0, 4, (t, hl_n))]
    pd = np.zeros((t, hl_n), np.uint8)
    for i in range(t):
        j = int(rng.integers(2, hl_n - 6))
        pd[i, j] = 2  # DEL_START
        pd[i, j + 3] = 4  # DEL_END
    pd[::7] = 0  # some event-free lanes
    read = bases[rng.integers(0, 4, (t, rl_n))]
    q = rng.integers(20, 41, (t, rl_n)).astype(np.uint8)
    iq = rng.integers(30, 46, (t, rl_n)).astype(np.uint8)
    dq = rng.integers(30, 46, (t, rl_n)).astype(np.uint8)
    g = np.full((t, rl_n), 10, np.uint8)
    hl = np.full(t, hl_n, np.int64)
    rl = np.full(t, rl_n, np.int64)

    # mesh path exercises the sorted/packed lane pipeline (the CPU
    # no-mesh path shortcuts straight to the native oracle)
    hmm = PDHMM(mesh=parallel.data_parallel_mesh(2))
    got = hmm.compute_pdhmm(hap, pd, read, q, iq, dq, g, hl, rl,
                            batch_size=t, max_hap_length=hl_n,
                            max_read_length=rl_n)
    want = pdhmm_ref.pdhmm_scalar_batch(
        list(hap), list(pd), list(read),
        [(q[i], iq[i], dq[i], g[i]) for i in range(t)])
    np.testing.assert_allclose(got, want, atol=TOL, rtol=0)


def test_indexed_dedup_matches_engine(monkeypatch):
    """The deduplicated device-expanded PDHMM path (identity-shared planes,
    interpret-mode kernel) agrees with the plain engine on the object-path
    cross product, for both the single and the chunked kernel."""
    from gkl_tpu import api_pdhmm, utils
    from gkl_tpu.ops import pdhmm_pallas

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    haps = []
    for j in range(4):
        hb = bases[rng.integers(0, 4, 24)]
        pd = np.zeros(24, np.uint8)
        if j % 2:
            pd[5] = 2  # DEL_START
            pd[8] = 4  # DEL_END
        haps.append(PDHaplotypeData(hb, pd))
    reads = []
    for _ in range(4):
        n = 16
        reads.append(ReadData(bases[rng.integers(0, 4, n)],
                              rng.integers(20, 40, n).astype(np.uint8),
                              rng.integers(30, 45, n).astype(np.uint8),
                              rng.integers(30, 45, n).astype(np.uint8),
                              np.full(n, 10, np.uint8)))
    expected = PDHMM().compute_likelihoods(reads, haps)

    ran = []

    def interp_inner(kernel):
        ran.append(kernel)
        fn = (pdhmm_pallas.pdhmm_raw_pallas if kernel == "single"
              else pdhmm_pallas.pdhmm_raw_pallas_chunked)

        def wrapped(*args, **kw):
            return fn(*args, lane_block=8, interpret=True)

        return wrapped

    monkeypatch.setattr(api_pdhmm, "_pdhmm_indexed_inner", interp_inner)
    monkeypatch.setattr(utils, "is_tpu_available", lambda: True)
    got = PDHMM(lane_multiple=8).compute_likelihoods(reads, haps)
    assert ran == ["single"], ran  # the indexed fast path actually ran
    np.testing.assert_allclose(got, expected, atol=TOL)

    # chunked kernel selection: shrink the single-kernel ceiling
    monkeypatch.setattr(pdhmm_pallas, "pdhmm_single_fits",
                        lambda H, R, lane_block=128: False)
    ran.clear()
    got_c = PDHMM(lane_multiple=8).compute_likelihoods(reads, haps)
    assert ran == ["chunked"], ran
    np.testing.assert_allclose(got_c, expected, atol=TOL)


def test_indexed_dedup_declines_unique_planes(monkeypatch):
    """Per-pair unique planes give no dedup: the indexed path must decline
    (None) so the dense path runs — guards the threshold logic."""
    from gkl_tpu import api_pdhmm, utils

    monkeypatch.setattr(utils, "is_tpu_available", lambda: True)
    rng = np.random.default_rng(6)
    bases = np.frombuffer(b"ACGT", np.uint8)
    n = 40  # > the max(16, n//2) dedup threshold
    haps = [bases[rng.integers(0, 4, 24)] for _ in range(n)]
    pds = [np.zeros(24, np.uint8) for _ in range(n)]
    reads = [bases[rng.integers(0, 4, 16)] for _ in range(n)]
    quals = [(rng.integers(20, 40, 16).astype(np.uint8),) * 4
             for _ in range(n)]
    pd = PDHMM(lane_multiple=8)
    assert pd._try_indexed(list(range(n)), haps, pds, reads, quals, 8) is None


def test_indexed_dedup_rescue_interaction(monkeypatch):
    """Deep lanes surfaced by the indexed path still flow through the
    oracle rescue: with MIN_ACCEPTED raised so EVERY lane rescues, the
    indexed dispatch's raw array must drive the per-lane oracle rerun and
    the final numbers must still match the plain engine."""
    from gkl_tpu import api_pdhmm, utils
    from gkl_tpu.ops import pdhmm_pallas

    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", np.uint8)
    haps = [PDHaplotypeData(bases[rng.integers(0, 4, 24)],
                            np.zeros(24, np.uint8)) for _ in range(3)]
    reads = []
    for _ in range(3):
        n = 16
        reads.append(ReadData(bases[rng.integers(0, 4, n)],
                              rng.integers(20, 40, n).astype(np.uint8),
                              rng.integers(30, 45, n).astype(np.uint8),
                              rng.integers(30, 45, n).astype(np.uint8),
                              np.full(n, 10, np.uint8)))
    expected = PDHMM().compute_likelihoods(reads, haps)

    def interp_inner(kernel):
        fn = pdhmm_pallas.pdhmm_raw_pallas

        def wrapped(*args, **kw):
            return fn(*args, lane_block=8, interpret=True)

        return wrapped

    monkeypatch.setattr(api_pdhmm, "_pdhmm_indexed_inner", interp_inner)
    monkeypatch.setattr(utils, "is_tpu_available", lambda: True)
    monkeypatch.setattr(api_pdhmm, "MIN_ACCEPTED", 1.0)  # rescue everything
    got = PDHMM(lane_multiple=8).compute_likelihoods(reads, haps)
    np.testing.assert_allclose(got, expected, atol=TOL)


def test_2d_input_shape_validation():
    """2-D flat-path inputs get the same contract checks as the Java flat
    layout: wrong row counts and mismatched plane widths raise instead of
    silently truncating (regression: a (t, 100) qual plane next to a
    (t, 150) read plane used to be padded with qual_fill and return wrong
    likelihoods)."""
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    t, hl_n, rl_n = 4, 20, 12
    hap = bases[rng.integers(0, 4, (t, hl_n))]
    pd = np.zeros((t, hl_n), np.uint8)
    read = bases[rng.integers(0, 4, (t, rl_n))]
    q = np.full((t, rl_n), 30, np.uint8)
    hl = np.full(t, hl_n, np.int64)
    rl = np.full(t, rl_n, np.int64)
    hmm = PDHMM()

    ok = hmm.compute_pdhmm(hap, pd, read, q, q, q, q, hl, rl, batch_size=t)
    assert ok.shape == (t,)

    with pytest.raises(ValueError, match="width"):  # narrow qual plane
        hmm.compute_pdhmm(hap, pd, read, q[:, :-2], q, q, q, hl, rl,
                          batch_size=t)
    with pytest.raises(ValueError, match="width"):  # narrow PD plane
        hmm.compute_pdhmm(hap, pd[:, :-1], read, q, q, q, q, hl, rl,
                          batch_size=t)
    with pytest.raises(ValueError, match="rows"):   # short batch
        hmm.compute_pdhmm(hap[:-1], pd, read, q, q, q, q, hl, rl,
                          batch_size=t)
    with pytest.raises(ValueError, match="width"):  # declared max mismatch
        hmm.compute_pdhmm(hap, pd, read, q, q, q, q, hl, rl, batch_size=t,
                          max_read_length=rl_n + 8)


def test_pdhaplotype_requires_pdbases():
    """Omitting the PD flag bytes raises a clear ValueError, not numpy's
    obscure TypeError from np.asarray(None)."""
    with pytest.raises(ValueError, match="haplotype_pdbases is required"):
        PDHaplotypeData(np.frombuffer(b"ACGT", np.uint8))


def test_forced_pallas_mesh_misalignment_raises(monkeypatch):
    """KernelLevel.PALLAS on a mesh whose lane count cannot fill
    128 * mesh.size must raise (the raise-on-unsatisfiable forcing
    contract), and the auto level must warn loudly instead of silently
    running the ~50x-slower jnp scan (regression: both used to degrade
    silently)."""
    from gkl_tpu import api as api_mod
    from gkl_tpu import parallel, utils

    monkeypatch.setattr(utils, "is_tpu_available", lambda: True)
    monkeypatch.setattr(api_mod, "_PALLAS_FALLOFF_SEEN", set())
    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", np.uint8)
    # t chosen so the indexed-dedup fast path bails (2t > max(16, t//2))
    # and the dense packed path reaches the mesh dispatch under test
    t, hl_n, rl_n = 12, 16, 8
    hap = bases[rng.integers(0, 4, (t, hl_n))]
    pd = np.zeros((t, hl_n), np.uint8)
    read = bases[rng.integers(0, 4, (t, rl_n))]
    q = np.full((t, rl_n), 30, np.uint8)
    hl = np.full(t, hl_n, np.int64)
    rl = np.full(t, rl_n, np.int64)
    mesh = parallel.data_parallel_mesh(2)

    # explicit lane_multiple=128 defeats the ctor's mesh auto-alignment:
    # 128 packed lanes cannot fill 128 * mesh.size = 256
    forced = PDHMM(PDHMMNativeArguments(kernel_level=2), mesh=mesh,
                   lane_multiple=128)
    with pytest.raises(RuntimeError, match="do not fill"):
        forced.compute_pdhmm(hap, pd, read, q, q, q, q, hl, rl, batch_size=t)

    import io
    import sys
    err = io.StringIO()
    monkeypatch.setattr(sys, "stderr", err)
    auto = PDHMM(mesh=mesh, lane_multiple=128)
    out = auto.compute_pdhmm(hap, pd, read, q, q, q, q, hl, rl, batch_size=t)
    assert np.isfinite(out).all()
    assert "fell off the Pallas fast path" in err.getvalue()

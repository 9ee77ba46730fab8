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

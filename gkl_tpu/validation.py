"""GATK-scale end-to-end validation corpus.

The reference validates itself by running GATK's own HaplotypeCaller-path
tests against the library (``scripts/gatkIntegration.sh:26-31``).  This is
that role at scale for the TPU build: a seeded-deterministic corpus of
>=10k mixed (read, haplotype) pairs — varied lengths, PD events,
deep-underflow lanes that force the f64 rescue tier — written to a real
BAM, streamed through the FULL pipeline (BAM -> codec -> batch planner ->
device kernels: PairHMM + SW realignment + PDHMM), and checked against the
scalar f64 oracles.  Any drift in an engine, the dedup upload path, or a
rescue tier fails the check.

Used by ``tests/test_gatk_corpus.py`` (small, CPU CI) and
``benchmarks/suite.py`` (full scale on TPU, emitted as a bench metric so
every round records a pass at scale).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


@dataclasses.dataclass
class Corpus:
    bam_path: str
    haplotypes: list          # HaplotypeData
    pd_haplotypes: list       # PDHaplotypeData
    source_hap: np.ndarray    # (n_reads,) which haplotype each read came from
    deep_lanes: np.ndarray    # (n_reads,) bool: engineered underflow reads


def build_corpus(bam_path: str, *, n_reads: int = 10240, n_haplotypes: int = 8,
                 n_pd_haplotypes: int = 4, seed: int = 0) -> Corpus:
    """Deterministic synthetic active region, written as a real BAM.

    * haplotypes: varied lengths (160..420), near-identical population
      (mutated copies of one ancestor — the assembled-haplotype shape);
    * reads: windows of a random haplotype with 1-5% mutations, lengths
      48..250, qualities 18..45;
    * every 64th read is a DEEP lane: long (250) and low-quality (q 4..8)
      with 25% mutations — its f32 likelihood underflows MIN_ACCEPTED and
      must go through the f64 rescue tier;
    * PD haplotypes: the first ``n_pd_haplotypes`` haplotypes with 0-2
      deletion events (DEL_START/DEL_END flag bytes) each.
    """
    from . import bam as bam_mod
    from .api import HaplotypeData
    from .api_pdhmm import PDHaplotypeData

    rng = np.random.default_rng(seed)
    ancestor = _BASES[rng.integers(0, 4, 420)]
    haps = []
    for i in range(n_haplotypes):
        L = int(rng.integers(160, 421)) if i else 420
        seq = ancestor[:L].copy()
        mut = rng.random(L) < 0.01
        seq[mut] = _BASES[rng.integers(0, 4, int(mut.sum()))]
        haps.append(seq)

    pd_haps = []
    for i in range(n_pd_haplotypes):
        seq = haps[i]
        pd = np.zeros(len(seq), np.uint8)
        for _ in range(int(rng.integers(0, 3))):
            j = int(rng.integers(4, len(seq) - 12))
            span = int(rng.integers(2, 7))
            pd[j] = 2              # DEL_START
            pd[j + span] = 4       # DEL_END
        pd_haps.append(PDHaplotypeData(seq, haplotype_pdbases=pd))

    source = np.zeros(n_reads, np.int32)
    deep = np.zeros(n_reads, bool)
    records = []
    for r in range(n_reads):
        hi = int(rng.integers(0, n_haplotypes))
        source[r] = hi
        hap = haps[hi]
        if r % 64 == 0:
            deep[r] = True
            L = 250
            mut_rate = 0.25
            qlo, qhi = 4, 9
        else:
            L = int(rng.integers(48, 251))
            mut_rate = float(rng.uniform(0.01, 0.05))
            qlo, qhi = 18, 46
        start = int(rng.integers(0, max(1, len(hap) - min(L, len(hap)) + 1)))
        seq = hap[start:start + L]
        if len(seq) < L:  # read overhangs the haplotype end: pad with noise
            seq = np.concatenate([
                seq, _BASES[rng.integers(0, 4, L - len(seq))]])
        seq = seq.copy()
        mut = rng.random(L) < mut_rate
        seq[mut] = _BASES[rng.integers(0, 4, int(mut.sum()))]
        qual = rng.integers(qlo, qhi, L).astype(np.uint8)
        records.append(bam_mod.BamRecord(
            name=f"synth{r:06d}", flag=0, ref_id=0, pos=start, mapq=60,
            cigar=[(L, "M")], seq=seq, qual=qual))

    header = bam_mod.BamHeader(text="@HD\tVN:1.6\n@SQ\tSN:synth\tLN:420\n",
                               ref_names=["synth"], ref_lengths=[420])
    bam_mod.write_bam_streaming(bam_path, header, iter(records), level=5)
    return Corpus(bam_path=bam_path,
                  haplotypes=[HaplotypeData(h) for h in haps],
                  pd_haplotypes=pd_haps, source_hap=source, deep_lanes=deep)


def check_corpus(corpus: Corpus, *, sample_stride: int = 16,
                 chunk_reads: int = 2048, threads: int | None = None) -> dict:
    """Run the full mixed pipeline over the corpus and verify against the
    scalar oracles.  Raises AssertionError on any drift; returns stats.

    * PairHMM: a deterministic sample (every ``sample_stride``-th read x
      every haplotype) PLUS every deep-underflow lane is recomputed with
      the f64 scalar oracle and must agree within 1e-4 — this corpus's
      250-base low-quality reads accumulate more f32 rounding than the
      golden vectors (TPU measured ~5e-5 worst case), so the exact 1e-5
      precision contract stays pinned by the 104 golden cases while this
      bound catches engine/dedup/rescue drift;
    * SW: the sampled reads' realignment CIGARs/offsets must equal the
      scalar reference aligner's;
    * PDHMM: the sampled reads against every PD haplotype at 1e-4;
    * globally: every likelihood finite and <= 0.
    """
    from . import pipeline
    from .ops import pairhmm_ref, pdhmm_ref, sw_ref

    res = pipeline.region_bam(corpus.bam_path, corpus.haplotypes,
                              pd_haplotypes=corpus.pd_haplotypes,
                              chunk_reads=chunk_reads, threads=threads)
    n_reads = len(res.read_names)
    nh = len(corpus.haplotypes)
    assert n_reads == len(corpus.source_hap), (
        f"pipeline dropped reads: {n_reads} != {len(corpus.source_hap)}")
    lik = res.likelihoods
    assert np.isfinite(lik).all(), "non-finite PairHMM likelihoods"
    assert (lik <= 1e-9).all(), "positive log10 likelihoods"
    assert np.isfinite(res.pd_likelihoods).all(), "non-finite PDHMM"

    # reconstruct the pipeline's exact engine inputs (qual floor + GOP/GCP
    # defaults) for the oracle legs
    from . import bam as bam_mod

    _, records = bam_mod.read_bam(corpus.bam_path)
    assert [r.name for r in records] == res.read_names
    reads = pipeline.reads_from_records(records)

    sample = sorted(set(range(0, n_reads, sample_stride))
                    | set(np.nonzero(corpus.deep_lanes)[0].tolist()))
    hs = [np.asarray(h.haplotype_bases, np.uint8)
          for h in corpus.haplotypes]

    # --- PairHMM oracle (threaded native f64) ---
    o_haps, o_reads, o_quals = [], [], []
    for i in sample:
        rd = reads[i]
        for h in hs:
            o_haps.append(h)
            o_reads.append(rd.read_bases)
            o_quals.append((rd.read_quals, rd.insertion_gop,
                            rd.deletion_gop, rd.overall_gcp))
    expected = np.asarray(pairhmm_ref.pairhmm_scalar_batch(
        o_haps, o_reads, o_quals, threads=threads)).reshape(len(sample), nh)
    got = lik[sample]
    err = np.abs(got - expected).max()
    assert err < 1e-4, f"PairHMM drift: max |err| = {err:.3e}"

    # deep lanes really exercised the rescue tier: their f32 raw results
    # underflow (that is what the corpus engineered), so agreement at 1e-5
    # against f64 means the rescue path ran and is exact
    deep_idx = np.nonzero(corpus.deep_lanes)[0]
    deep_min = lik[deep_idx].min()
    assert deep_min < -60.0, (
        f"deep lanes not deep (min log10 = {deep_min:.1f}) — the corpus no "
        "longer exercises the rescue tier")

    # --- SW oracle: realignment of sampled reads vs their best haplotype ---
    n_sw = 0
    for i in sample[: max(64, len(sample) // 4)]:
        b = int(res.best_haplotype[i])
        exp = sw_ref.sw_align(hs[b], reads[i].read_bases, 200, -150, -260,
                              -11, 9)  # SOFTCLIP
        assert res.cigars[i] == exp.cigar, (
            f"SW cigar drift read {i}: {res.cigars[i]} != {exp.cigar}")
        assert int(res.offsets[i]) == int(exp.offset), (
            f"SW offset drift read {i}")
        n_sw += 1

    # --- PDHMM oracle ---
    p_haps, p_pds, p_reads, p_quals = [], [], [], []
    pd_sample = sample[: max(64, len(sample) // 4)]
    for i in pd_sample:
        rd = reads[i]
        for hp in corpus.pd_haplotypes:
            p_haps.append(hp.haplotype_bases)
            p_pds.append(hp.haplotype_pdbases)
            p_reads.append(rd.read_bases)
            p_quals.append((rd.read_quals, rd.insertion_gop,
                            rd.deletion_gop, rd.overall_gcp))
    pd_expected = np.asarray(pdhmm_ref.pdhmm_scalar_batch(
        p_haps, p_pds, p_reads, p_quals, threads=threads)).reshape(
        len(pd_sample), len(corpus.pd_haplotypes))
    pd_err = np.abs(res.pd_likelihoods[pd_sample] - pd_expected).max()
    assert pd_err < 1e-4, f"PDHMM drift: max |err| = {pd_err:.3e}"

    return {
        "n_reads": n_reads,
        "n_pairs": n_reads * nh + n_reads * len(corpus.pd_haplotypes),
        "n_oracle_pairs": len(sample) * nh + len(pd_sample)
        * len(corpus.pd_haplotypes),
        "n_sw_checked": n_sw,
        "n_deep_lanes": int(corpus.deep_lanes.sum()),
        "pairhmm_max_err": float(err),
        "pdhmm_max_err": float(pd_err),
    }


def run(bam_path: str | None = None, *, n_reads: int = 10240,
        sample_stride: int = 16, seed: int = 0,
        threads: int | None = None) -> dict:
    """Build + check in one call (the bench/CI entry)."""
    import tempfile

    own = bam_path is None
    if own:
        fd, bam_path = tempfile.mkstemp(suffix=".bam",
                                        prefix="gkl_gatk_corpus_")
        os.close(fd)
    try:
        corpus = build_corpus(bam_path, n_reads=n_reads, seed=seed)
        return check_corpus(corpus, sample_stride=sample_stride,
                            threads=threads)
    finally:
        if own and os.path.exists(bam_path):
            os.unlink(bam_path)

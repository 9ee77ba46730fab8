"""GATK-scale validation corpus — CI-size run (the gatkIntegration.sh role,
scripts/gatkIntegration.sh:26-31, as a seeded-deterministic harness).

The full >=10k-pair corpus runs on TPU through benchmarks/suite.py every
round; this CI slice runs the same builder + checker end-to-end (BAM ->
codec -> batch planner -> PairHMM + SW + PDHMM -> oracle comparison) at a
size the CPU backend finishes quickly, including engineered deep-underflow
lanes that must pass through the f64 rescue tier.
"""

import numpy as np
import pytest

from gkl_tpu import validation


def test_corpus_end_to_end_small():
    stats = validation.run(n_reads=192, sample_stride=8, seed=0)
    assert stats["n_reads"] == 192
    assert stats["n_deep_lanes"] == 3
    assert stats["pairhmm_max_err"] < 1e-4
    assert stats["pdhmm_max_err"] < 1e-4
    assert stats["n_sw_checked"] >= 16


def test_corpus_is_deterministic(tmp_path):
    a = validation.build_corpus(str(tmp_path / "a.bam"), n_reads=64, seed=7)
    b = validation.build_corpus(str(tmp_path / "b.bam"), n_reads=64, seed=7)
    assert np.array_equal(a.source_hap, b.source_hap)
    with open(a.bam_path, "rb") as fa, open(b.bam_path, "rb") as fb:
        assert fa.read() == fb.read()


def test_corpus_checker_catches_drift(tmp_path, monkeypatch):
    """The checker is only evidence if it actually fails on engine drift:
    poison the PairHMM result post-hoc and assert the oracle leg trips."""
    corpus = validation.build_corpus(str(tmp_path / "c.bam"), n_reads=64,
                                     seed=1)
    from gkl_tpu import pipeline

    real = pipeline.region_bam

    def poisoned(*a, **kw):
        res = real(*a, **kw)
        res.likelihoods[8, 0] += 3e-4  # just past the 1e-4 drift bound
        return res

    monkeypatch.setattr(pipeline, "region_bam", poisoned)
    with pytest.raises(AssertionError, match="PairHMM drift"):
        validation.check_corpus(corpus, sample_stride=8)

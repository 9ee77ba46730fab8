"""Smith-Waterman tests: semantic cases (SmithWatermanUnitTest.java:146-178),
validation matrix, and property tests vs the scalar reference."""

import numpy as np
import pytest

from gkl_tpu.api_sw import (
    MAX_SW_SEQUENCE_LENGTH,
    OverhangStrategy,
    SmithWaterman,
    SWParameters,
)
from gkl_tpu.ops import sw_ref

STRATEGIES = list(OverhangStrategy)
GATK_PARAMS = SWParameters(200, -150, -260, -11)


def test_single_element():
    sw = SmithWaterman(lane_multiple=8)
    r = sw.align(b"C", b"C", SWParameters(3, -2, -2, -1), OverhangStrategy.IGNORE)
    assert r.cigar == "1M"


def test_two_element():
    sw = SmithWaterman(lane_multiple=8)
    r = sw.align(b"AD", b"AT", SWParameters(3, -5, -2, -1), OverhangStrategy.IGNORE)
    assert r.cigar == "1M1I"


def test_validation():
    sw = SmithWaterman(lane_multiple=8)
    with pytest.raises(ValueError):
        sw.align(b"", b"A", GATK_PARAMS, OverhangStrategy.SOFTCLIP)
    with pytest.raises(ValueError):
        sw.align(b"A" * (MAX_SW_SEQUENCE_LENGTH + 1), b"A", GATK_PARAMS, OverhangStrategy.SOFTCLIP)
    with pytest.raises(ValueError):
        sw.align(b"A", b"A", SWParameters(65537, -1, -2, -1), OverhangStrategy.SOFTCLIP)
    with pytest.raises(TypeError):
        sw.align(b"A", b"A", None, OverhangStrategy.SOFTCLIP)
    with pytest.raises(TypeError):
        sw.align(b"A", b"A", GATK_PARAMS, None)


def _random_pair(rng, max_len=48):
    bases = np.frombuffer(b"ACGT", np.uint8)
    n = int(rng.integers(1, max_len))
    ref = bases[rng.integers(0, 4, n)]
    # derive alt by mutating/indeling ref so alignments are interesting
    alt = list(ref[int(rng.integers(0, max(1, n // 3))):])
    for _ in range(int(rng.integers(0, 4))):
        if not alt:
            break
        p = int(rng.integers(0, len(alt)))
        op = rng.integers(0, 3)
        if op == 0:
            alt[p] = bases[rng.integers(0, 4)]
        elif op == 1:
            alt.insert(p, bases[rng.integers(0, 4)])
        else:
            del alt[p]
    if not alt:
        alt = [bases[0]]
    return ref, np.array(alt, np.uint8)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_property_vs_reference(strategy):
    rng = np.random.default_rng(int(strategy))
    refs, alts = [], []
    for _ in range(24):
        r, a = _random_pair(rng)
        refs.append(r)
        alts.append(a)
    sw = SmithWaterman(lane_multiple=8)
    results = sw.align_batch(refs, alts, GATK_PARAMS, strategy)
    for r, a, got in zip(refs, alts, results):
        want = sw_ref.sw_align(r, a, 200, -150, -260, -11, int(strategy))
        assert got.cigar == want.cigar, (bytes(r), bytes(a), got, want)
        assert got.alignment_offset == want.offset


@pytest.mark.parametrize("strategy", [OverhangStrategy.SOFTCLIP, OverhangStrategy.INDEL])
def test_scalar_fallback_matches_device(strategy):
    """The native scalar aligner (long-sequence path) agrees with the device path."""
    rng = np.random.default_rng(7)
    sw = SmithWaterman(lane_multiple=8)
    for _ in range(8):
        r, a = _random_pair(rng, max_len=40)
        device = sw.align(r, a, GATK_PARAMS, strategy)
        scalar = sw._align_scalar(r, a, GATK_PARAMS, strategy)
        assert device.cigar == scalar.cigar
        assert device.alignment_offset == scalar.alignment_offset


def test_python_fallback_postprocess(monkeypatch):
    """With native disabled, the pure-Python walk gives identical results."""
    rng = np.random.default_rng(3)
    refs, alts = zip(*(_random_pair(rng) for _ in range(8)))
    sw_native = SmithWaterman(lane_multiple=8)
    sw_py = SmithWaterman(lane_multiple=8)
    sw_py._native = None
    a = sw_native.align_batch(list(refs), list(alts), GATK_PARAMS, OverhangStrategy.SOFTCLIP)
    b = sw_py.align_batch(list(refs), list(alts), GATK_PARAMS, OverhangStrategy.SOFTCLIP)
    assert [(x.cigar, x.alignment_offset) for x in a] == [
        (x.cigar, x.alignment_offset) for x in b
    ]


def test_gatk_like_long_pair():
    """A realistic 300bp haplotype-style alignment round-trips sensibly."""
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, 300)]
    alt = ref.copy()
    alt[150] = bases[(int(alt[150]) + 1) % 4]  # SNP
    alt = np.concatenate([alt[:80], alt[95:]])  # 15bp deletion
    sw = SmithWaterman(lane_multiple=8)
    got = sw.align(ref, alt, GATK_PARAMS, OverhangStrategy.SOFTCLIP)
    want = sw_ref.sw_align(ref, alt, 200, -150, -260, -11, 9)
    assert got.cigar == want.cigar
    assert "D" in got.cigar


def test_device_eligibility_tpu_rules(monkeypatch):
    """With Pallas available the device path covers the full reference axis
    (N to 32767) while the alt axis is VMEM-bounded; without it the jnp
    DEVICE_MAX_LEN ceiling applies."""
    from gkl_tpu.api_sw import DEVICE_MAX_LEN, SmithWaterman

    monkeypatch.setattr(SmithWaterman, "_pallas_possible", staticmethod(lambda: True))
    sw = SmithWaterman(lane_multiple=128)
    assert sw._device_eligible(8000, 500)
    assert sw._device_eligible(32000, 500)
    assert sw._device_eligible(8000, 2048)
    assert not sw._device_eligible(500, 4000)   # alt axis > VMEM
    assert not sw._device_eligible(32000, 2048) # bt tensor > HBM budget
    # a lane multiple that breaks the Pallas 128-lane constraint must fall
    # back to the jnp ceiling (the dispatch could otherwise OOM at big N)
    sw8 = SmithWaterman(lane_multiple=8)
    assert not sw8._device_eligible(8000, 500)
    assert sw8._device_eligible(DEVICE_MAX_LEN, DEVICE_MAX_LEN)
    monkeypatch.setattr(SmithWaterman, "_pallas_possible", staticmethod(lambda: False))
    sw = SmithWaterman(lane_multiple=128)
    assert sw._device_eligible(DEVICE_MAX_LEN, DEVICE_MAX_LEN)
    assert not sw._device_eligible(DEVICE_MAX_LEN + 1, 100)


def test_scalar_batch_threaded_matches_oracle():
    """The native thread-pool scalar batch must reproduce the serial oracle
    (CIGAR + offset) for beyond-device pairs."""
    from gkl_tpu.api_sw import OverhangStrategy, SmithWaterman, SWParameters
    from gkl_tpu.ops import sw_ref

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    refs, alts = [], []
    for k in range(6):
        n = int(rng.integers(300, 900))
        m = int(rng.integers(300, 900))
        r = bases[rng.integers(0, 4, n)]
        a = r[:m].copy() if m <= n else np.concatenate([r, bases[rng.integers(0, 4, m - n)]])
        mut = rng.random(len(a)) < 0.08
        a[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
        refs.append(r)
        alts.append(a)
    sw = SmithWaterman()
    p = SWParameters(200, -150, -260, -11)
    for strat in (OverhangStrategy.SOFTCLIP, OverhangStrategy.INDEL,
                  OverhangStrategy.LEADING_INDEL, OverhangStrategy.IGNORE):
        got = sw._align_scalar_batch(refs, alts, p, strat)
        for k in range(len(refs)):
            o = sw_ref.sw_align(refs[k], alts[k], 200, -150, -260, -11, int(strat))
            assert got[k].cigar == o.cigar and got[k].alignment_offset == o.offset

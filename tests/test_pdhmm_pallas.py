"""Pallas PDHMM kernel: interpret-mode parity with the jnp engine + golden."""

import numpy as np

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

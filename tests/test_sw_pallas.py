"""Pallas SW kernel: interpret-mode bit parity with the jnp engine."""

import numpy as np
import pytest

from gkl_tpu.ops.sw import sw_forward
from gkl_tpu.ops.sw_pallas import sw_forward_pallas, sw_pallas_fits


def _batch(N=24, M=32, P=16, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, (N, P))]
    alt = bases[rng.integers(0, 4, (M, P))]
    alt[: min(N, M)] = ref[: min(N, M)]
    mut = rng.random((M, P)) < 0.15
    alt[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
    reflen = rng.integers(8, N + 1, P).astype(np.int32)
    altlen = rng.integers(8, M + 1, P).astype(np.int32)
    return ref, alt, reflen, altlen


@pytest.mark.parametrize("indel_boundary", [False, True])
def test_interpret_bit_parity(indel_boundary):
    args = _batch()
    a = sw_forward(*args, 200, -150, -260, -11, indel_boundary=indel_boundary, pack_bt=True)
    b = sw_forward_pallas(*args, 200, -150, -260, -11,
                          indel_boundary=indel_boundary, lane_block=8, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("indel_boundary", [False, True])
def test_mrelay_bit_parity(indel_boundary, monkeypatch):
    """Alt-slab relay (M > SW_M_SLAB): exact-int DP must be bit-identical
    to both the jnp engine and the tall single-slab kernel, including
    lanes whose altlen falls in different slabs and padded tails."""
    from gkl_tpu.ops import sw_pallas

    monkeypatch.setattr(sw_pallas, "SW_M_SLAB", 16)  # force multi-slab
    # the jit cache keys on shapes, not on SW_M_SLAB: flush so this test's
    # forced slab size neither reuses nor pollutes other tests' traces
    sw_forward_pallas.clear_cache()
    args = _batch(N=24, M=40, P=16, seed=11)  # pads to 48 = 3 slabs
    a = sw_forward(*args, 200, -150, -260, -11,
                   indel_boundary=indel_boundary, pack_bt=True)
    try:
        b = sw_forward_pallas(*args, 200, -150, -260, -11,
                              indel_boundary=indel_boundary, lane_block=8,
                              interpret=True)
    finally:
        sw_forward_pallas.clear_cache()
    # relay pads to a slab multiple (48), the jnp engine to M (40): compare
    # the real-M prefix of bt/lastrow, full lastcol
    bt_a, lr_a, lc_a = (np.asarray(x) for x in a)
    bt_b, lr_b, lc_b = (np.asarray(x) for x in b)
    np.testing.assert_array_equal(bt_a, bt_b[:, :, : bt_a.shape[2]])
    np.testing.assert_array_equal(lr_a, lr_b[: lr_a.shape[0]])
    np.testing.assert_array_equal(lc_a, lc_b)


def test_fits_budget():
    assert sw_pallas_fits(160, 160)
    assert sw_pallas_fits(384, 384)
    # reference-axis streaming: VMEM bounds only M, so the full device
    # bucket range (<= 2048 x 2048) fits
    assert sw_pallas_fits(2048, 2048)
    # M=4096 measured to exceed v5e VMEM even at the minimum streamed chunk
    assert not sw_pallas_fits(2048, 4096)
    assert not sw_pallas_fits(162, 160)  # N must be a multiple of 4
    # smaller lane blocks scale the ceiling up proportionally
    assert sw_pallas_fits(2048, 4096, lane_block=64)


def test_interpret_parity_padded_m():
    """Alt lengths beyond 512 pad to a power of two inside the kernel; the
    sliced outputs must still match the jnp engine bit-for-bit."""
    args = _batch(N=24, M=40, P=16, seed=3)
    a = sw_forward(*args, 200, -150, -260, -11, indel_boundary=False, pack_bt=True)
    from gkl_tpu.ops import sw_pallas
    orig = sw_pallas._pad_m
    sw_pallas._pad_m = lambda M: 64 if M == 40 else orig(M)
    try:
        b = sw_forward_pallas(*args, 200, -150, -260, -11,
                              indel_boundary=False, lane_block=8, interpret=True)
    finally:
        sw_pallas._pad_m = orig
    bt_a, lr_a, lc_a = (np.asarray(x) for x in a)
    bt_b, lr_b, lc_b = (np.asarray(x) for x in b)
    assert bt_b.shape[2] == 64 and lr_b.shape[0] == 64
    np.testing.assert_array_equal(bt_a, bt_b[:, :, :40])
    np.testing.assert_array_equal(lr_a, lr_b[:40])
    np.testing.assert_array_equal(lc_a, lc_b)


def test_relay_matches_direct():
    """The segment relay (carried H/F/lastrow state) must reproduce the
    single-call kernel bit-for-bit across segment boundaries."""
    from gkl_tpu.ops.sw_pallas import sw_forward_pallas_relay

    for indel_boundary in (False, True):
        args = _batch(N=64, M=24, P=16, seed=5)
        a = sw_forward_pallas(*args, 200, -150, -260, -11,
                              indel_boundary=indel_boundary, lane_block=8,
                              interpret=True)
        b = sw_forward_pallas_relay(*args, 200, -150, -260, -11,
                                    indel_boundary=indel_boundary, seg=16,
                                    lane_block=8, interpret=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

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

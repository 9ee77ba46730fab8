"""Every config knob must have a behavioral effect or raise — the
reference validates and acts on each one (ComputeConfig,
pdhmm-implementation.h:45-268: ENABLE throws without OpenMP, thread clamp,
level validation); silent acceptance of dead settings is a bug class this
file guards against."""

import os

import numpy as np
import pytest

from gkl_tpu import native_lib
from gkl_tpu.api import HaplotypeData, PairHMM, PairHMMNativeArguments, ReadData
from gkl_tpu.api_pdhmm import (
    KernelLevel,
    ParallelSetting,
    PDHaplotypeData,
    PDHMM,
    PDHMMNativeArguments,
)
from gkl_tpu.api_sw import OverhangStrategy, SmithWaterman, SWParameters


def _tiny_pairs(n_reads=3, n_haps=2, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = [
        ReadData(
            bases[rng.integers(0, 4, 24)],
            np.full(24, 30, np.uint8),
            np.full(24, 45, np.uint8),
            np.full(24, 45, np.uint8),
            np.full(24, 10, np.uint8),
        )
        for _ in range(n_reads)
    ]
    haps = [HaplotypeData(bases[rng.integers(0, 4, 40)]) for _ in range(n_haps)]
    return reads, haps


# ---------------------------------------------------------------------------
# PairHMM max_number_of_threads → dp-device span (OpenMP clamp analogue)
# ---------------------------------------------------------------------------


def test_pairhmm_thread_cap_builds_mesh():
    import jax

    n_dev = len(jax.devices())
    assert n_dev >= 2  # conftest forces the 8-device CPU mesh

    assert PairHMM(PairHMMNativeArguments(max_number_of_threads=1)).mesh is None
    assert PairHMM(PairHMMNativeArguments(max_number_of_threads=2)).mesh.size == 2
    assert PairHMM(PairHMMNativeArguments(max_number_of_threads=0)).mesh.size == n_dev
    # clamps to the available devices, like the reference clamps to
    # omp_get_max_threads (IntelPairHmm.cc:88-91)
    assert PairHMM(PairHMMNativeArguments(max_number_of_threads=10**6)).mesh.size == n_dev
    with pytest.raises(ValueError):
        PairHMM(PairHMMNativeArguments(max_number_of_threads=-1))


def test_pairhmm_thread_cap_results_match_single_device():
    reads, haps = _tiny_pairs()
    base = PairHMM(PairHMMNativeArguments()).compute_likelihoods(reads, haps)
    capped = PairHMM(PairHMMNativeArguments(max_number_of_threads=2))
    np.testing.assert_allclose(
        capped.compute_likelihoods(reads, haps), base, rtol=0, atol=5e-5
    )


def test_pairhmm_initialize_reconfigures_mesh():
    hmm = PairHMM(PairHMMNativeArguments())
    assert hmm.mesh is None
    hmm.initialize(PairHMMNativeArguments(max_number_of_threads=2))
    assert hmm.mesh is not None and hmm.mesh.size == 2
    # the reference re-reads the clamp on every initializeNative
    # (IntelPairHmm.cc:88-91): lowering the cap must drop the auto-mesh
    # and its lane padding, not silently keep the old span
    hmm.initialize(PairHMMNativeArguments(max_number_of_threads=1))
    assert hmm.mesh is None and hmm._lane_multiple is None
    hmm.initialize(PairHMMNativeArguments(max_number_of_threads=4))
    assert hmm.mesh.size == 4


def test_pairhmm_thread_cap_mesh_is_process_local():
    # the OpenMP clamp is per-process; an auto-mesh must never span
    # processes (each process feeds its own batches — a cross-process
    # collective program would deadlock)
    import jax

    local = set(jax.local_devices())
    mesh = PairHMM(PairHMMNativeArguments(max_number_of_threads=0)).mesh
    assert all(d in local for d in mesh.devices.flat)


def test_pairhmm_explicit_mesh_wins_over_thread_cap():
    from gkl_tpu import parallel

    mesh = parallel.data_parallel_mesh(4)
    hmm = PairHMM(PairHMMNativeArguments(max_number_of_threads=2), mesh=mesh)
    assert hmm.mesh.size == 4


# ---------------------------------------------------------------------------
# PDHMM ParallelSetting / max_number_of_threads / KernelLevel
# ---------------------------------------------------------------------------


def _tiny_pd():
    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = [
        ReadData(
            bases[rng.integers(0, 4, 20)],
            np.full(20, 30, np.uint8),
            np.full(20, 40, np.uint8),
            np.full(20, 40, np.uint8),
            np.full(20, 10, np.uint8),
        )
    ]
    hap = bases[rng.integers(0, 4, 32)]
    haps = [PDHaplotypeData(hap, haplotype_pdbases=np.zeros(32, np.uint8))]
    return reads, haps


def test_pdhmm_parallel_setting_drives_pool_size(monkeypatch):
    from gkl_tpu.ops import pdhmm_ref

    if native_lib.load("gkl_pdhmm_oracle") is None:
        pytest.skip("native oracle unavailable")
    seen = {}
    orig = pdhmm_ref.pdhmm_scalar_batch

    def spy(haps, hap_pds, reads, quals, threads=None):
        seen["threads"] = threads
        return orig(haps, hap_pds, reads, quals, threads=threads)

    monkeypatch.setattr("gkl_tpu.api_pdhmm.pdhmm_ref", pdhmm_ref, raising=False)
    monkeypatch.setattr(pdhmm_ref, "pdhmm_scalar_batch", spy)

    reads, haps = _tiny_pd()
    PDHMM(
        PDHMMNativeArguments(parallel_setting=ParallelSetting.DISABLE)
    ).compute_likelihoods(reads, haps)
    assert seen["threads"] == 1

    PDHMM(
        PDHMMNativeArguments(max_number_of_threads=3)
    ).compute_likelihoods(reads, haps)
    assert seen["threads"] == min(3, os.cpu_count() or 1)


def test_pdhmm_enable_without_native_raises(monkeypatch):
    monkeypatch.setattr("gkl_tpu.native_lib.load", lambda name: None)
    with pytest.raises(RuntimeError, match="ENABLE"):
        PDHMM(PDHMMNativeArguments(parallel_setting=ParallelSetting.ENABLE))


def test_pdhmm_kernel_level_pallas_unavailable_raises():
    # the test harness runs on the CPU backend: forcing the Pallas engine
    # must raise instead of silently running a slower tier (the reference
    # throws on an unsatisfiable explicit AVX level)
    reads, haps = _tiny_pd()
    hmm = PDHMM(PDHMMNativeArguments(kernel_level=KernelLevel.PALLAS))
    with pytest.raises(RuntimeError, match="PALLAS"):
        hmm.compute_likelihoods(reads, haps)


def test_pdhmm_scalar_level_still_works():
    reads, haps = _tiny_pd()
    base = PDHMM(PDHMMNativeArguments()).compute_likelihoods(reads, haps)
    scal = PDHMM(
        PDHMMNativeArguments(kernel_level=KernelLevel.SCALAR)
    ).compute_likelihoods(reads, haps)
    np.testing.assert_allclose(scal, base, rtol=0, atol=1e-4)


# ---------------------------------------------------------------------------
# SmithWaterman threads / codec GKL_TPU_THREADS
# ---------------------------------------------------------------------------


def test_sw_threads_validation_and_parity():
    with pytest.raises(ValueError):
        SmithWaterman(threads=0)
    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", np.uint8)
    # beyond the CPU device ceiling -> the native scalar thread pool
    refs = [bases[rng.integers(0, 4, 2200)] for _ in range(2)]
    alts = [r[50:150].copy() for r in refs]
    p = SWParameters(200, -150, -260, -11)
    a = SmithWaterman().align_batch(refs, alts, p, OverhangStrategy.SOFTCLIP)
    b = SmithWaterman(threads=1).align_batch(refs, alts, p, OverhangStrategy.SOFTCLIP)
    for ra, rb in zip(a, b):
        assert (ra.cigar, ra.alignment_offset) == (rb.cigar, rb.alignment_offset)


def test_codec_threads_env(monkeypatch):
    from gkl_tpu import compression as comp
    from gkl_tpu import utils

    monkeypatch.setenv("GKL_TPU_THREADS", "1")
    assert utils.default_host_threads() == 1
    assert comp._default_threads() == 1
    monkeypatch.setenv("GKL_TPU_THREADS", "3")
    assert utils.default_host_threads() == 3
    monkeypatch.delenv("GKL_TPU_THREADS")
    assert utils.default_host_threads() == min(16, os.cpu_count() or 1)
    # data still round-trips with a forced single-thread pool
    monkeypatch.setenv("GKL_TPU_THREADS", "1")
    blocks = [os.urandom(1000) for _ in range(4)]
    assert comp.inflate_blocks(comp.deflate_blocks(blocks, level=1)) == blocks


def test_inflate_ways_env():
    """GKL_TPU_INFLATE_WAYS sets the batch-inflate gang width (the C++ side
    caches it per process, so each width gets a fresh subprocess).  Every
    width must round-trip the same heterogeneous batch."""
    import subprocess
    import sys

    script = r"""
import numpy as np
from gkl_tpu import compression as comp
rng = np.random.default_rng(3)
blocks = [bytes(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)])
          for n in (0, 1, 40000, 500, 65000, 3)]
assert comp.inflate_blocks(comp.deflate_blocks(blocks, level=1), threads=1) == blocks
assert comp.inflate_blocks(comp.deflate_blocks(blocks, level=6), threads=1) == blocks
print("WAYS_OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    for ways in ("1", "3", "4", "99"):  # 99 clamps to 4
        env["GKL_TPU_INFLATE_WAYS"] = ways
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, timeout=240)
        assert "WAYS_OK" in out.stdout, (ways, out.stdout, out.stderr[-2000:])

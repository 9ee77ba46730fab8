"""Utils / loader / observability tests (IntelGKLUtilsUnitTest analogue)."""

import os

import numpy as np
import pytest

from gkl_tpu import native_lib, profiling, utils


def test_platform_probes():
    assert utils.default_backend() == "cpu"  # conftest forces CPU
    assert utils.is_tpu_available() is False
    assert utils.supports_native_float64() is True
    assert utils.available_parallelism() >= 1


def test_flush_to_zero_semantics():
    # On CPU the effective FTZ mode is off; set is a no-op reporting state
    assert utils.get_flush_to_zero() is False
    assert utils.set_flush_to_zero(True) is False


def test_native_loader_allowlist():
    with pytest.raises(ValueError):
        native_lib.load("not_a_real_library")


def test_native_loader_disable_env(monkeypatch):
    monkeypatch.setenv("GKL_TPU_NATIVE", "0")
    assert native_lib.native_enabled() is False
    assert native_lib.load("gkl_codec") is None


def test_native_codec_builds():
    lib = native_lib.load("gkl_codec")
    assert lib is not None, "native codec should build in this environment"


def test_metrics_counters(monkeypatch):
    monkeypatch.setenv("GKL_TPU_METRICS", "1")
    profiling.METRICS.reset()
    from gkl_tpu.api import HaplotypeData, PairHMM, ReadData

    n = 8
    rd = ReadData(b"ACGT", np.full(4, 30, np.uint8), np.full(4, 40, np.uint8),
                  np.full(4, 40, np.uint8), np.full(4, 10, np.uint8))
    hp = HaplotypeData(b"ACGTACGT")
    PairHMM().compute_likelihoods([rd] * n, [hp])
    snap = profiling.METRICS.snapshot()
    assert snap["pairhmm"]["items"] == n
    assert snap["pairhmm"]["cells"] == n * 4 * 8
    assert snap["pairhmm"]["seconds"] > 0
    assert "pairhmm" in profiling.METRICS.report()
    profiling.METRICS.reset()
    assert profiling.METRICS.snapshot() == {}


def test_profile_csv():
    rng = np.random.default_rng(0)
    data = bytes(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 1 << 16)])
    csv = profiling.profile_csv(data, levels=(1, 6))
    lines = csv.splitlines()
    assert lines[0] == "level,ms,size,ratio"
    assert len(lines) == 3


def test_repeated_stability():
    """repeatedTest analogue (IntelPDHMMUnitTest.java:283-390): repeated
    runs produce identical results (no state leakage across calls)."""
    import golden
    from gkl_tpu.api_pdhmm import PDHMM

    cases = golden.load_pdhmm_cases("pdhmm_syn_199_68_51.txt")[:8]
    hmm = PDHMM(lane_multiple=8)
    hap = [c.hap for c in cases]
    repeat = int(os.environ.get("GKL_TPU_REPEAT_COUNT", "3"))

    def run():
        t = len(cases)
        max_h = max(len(c.hap) for c in cases)
        max_r = max(len(c.read) for c in cases)
        a = np.zeros((t, max_h), np.uint8)
        pd = np.zeros((t, max_h), np.uint8)
        rd = np.zeros((t, max_r), np.uint8)
        q = np.zeros((t, max_r), np.uint8)
        iq = np.zeros((t, max_r), np.uint8)
        dq = np.zeros((t, max_r), np.uint8)
        g = np.zeros((t, max_r), np.uint8)
        for i, c in enumerate(cases):
            a[i, : len(c.hap)] = c.hap
            pd[i, : len(c.hap)] = c.hap_pd
            rd[i, : len(c.read)] = c.read
            q[i, : len(c.read)] = c.q
            iq[i, : len(c.read)] = c.iq
            dq[i, : len(c.read)] = c.dq
            g[i, : len(c.read)] = c.gcp
        hl = np.array([len(c.hap) for c in cases], np.int64)
        rl = np.array([len(c.read) for c in cases], np.int64)
        return hmm.compute_pdhmm(a, pd, rd, q, iq, dq, g, hl, rl)

    first = run()
    for _ in range(repeat - 1):
        np.testing.assert_array_equal(run(), first)


def test_pairhmm_null_and_empty_inputs():
    """Null/empty exception matrix (PairHmmUnitTest.java:30-53)."""
    from gkl_tpu.api import HaplotypeData, PairHMM, ReadData

    hmm = PairHMM()
    q = np.full(4, 30, np.uint8)
    rd = ReadData(b"ACGT", q, q, q, q)
    hp = HaplotypeData(b"ACGT")
    with pytest.raises(TypeError):
        hmm.compute_likelihoods(None, [hp])
    with pytest.raises(TypeError):
        hmm.compute_likelihoods([rd], None)
    with pytest.raises(ValueError):
        hmm.compute_likelihoods([], [hp])
    with pytest.raises(ValueError):
        hmm.compute_likelihoods([rd], [])
    with pytest.raises(ValueError):
        hmm.compute_likelihoods([ReadData(b"", q[:0], q[:0], q[:0], q[:0])], [hp])
    with pytest.raises(ValueError):
        hmm.compute_likelihoods([ReadData(b"ACGT", q[:2], q, q, q)], [hp])


def test_debug_module():
    from gkl_tpu import batch as batch_mod
    from gkl_tpu import debug

    packed = batch_mod.pack_pairs(
        [np.frombuffer(b"ACGT", np.uint8)], [np.frombuffer(b"AC", np.uint8)],
        [(np.full(2, 30, np.uint8),) * 4], lane_multiple=8)
    debug.check_batch(packed)  # valid batch passes
    import jax.numpy as jnp

    with debug.debug_context():
        with pytest.raises(FloatingPointError):
            import jax

            jax.jit(lambda x: jnp.log(x) * 0 + jnp.sqrt(x - 2))(jnp.float32(1.0)).block_until_ready()


def test_path_to_test_resource():
    p = utils.path_to_test_resource("pairhmm-testdata.txt")
    assert os.path.exists(p)
    for bad in ("../etc/passwd", "a/b.txt", ".hidden", "x;y"):
        with pytest.raises(ValueError):
            utils.path_to_test_resource(bad)


def test_profiler_trace_smoke(tmp_path):
    """jax.profiler trace context produces a trace directory."""
    import jax.numpy as jnp

    from gkl_tpu import profiling

    with profiling.trace(str(tmp_path)):
        jnp.arange(128.0).sum().block_until_ready()
    files = list(tmp_path.rglob("*"))
    assert files, "trace directory should contain profiler output"

"""Round-4 TPU validation pass — run ONCE when the axon tunnel recovers.

Each step is isolated (a failure prints and moves on) so a short recovery
window still yields maximum evidence:

1. golden vectors through the public APIs (drive_verify's checks inline);
2. PairHMM read-relay: parity vs the cols kernel / jnp at probe shapes,
   then compile+rate at long-read shapes (the round-3 jnp cliff);
3. scattered-vs-grouped PDHMM rate (the >=0.8 target, 3-tier flags);
4. quick pipeline reads/s;
5. codec MB/s + vs-zlib ratio.

Usage: timeout 5400 python scripts/probe_round4.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def step(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                fn()
                print(f"PROBE4 {name} ok ({time.time() - t0:.0f}s)", flush=True)
            except Exception:
                traceback.print_exc()
                print(f"PROBE4 {name} FAIL", flush=True)
        return run
    return deco


@step("backend")
def s_backend():
    import jax

    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    assert float((x @ x).sum()) > 0


@step("golden")
def s_golden():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import golden

    from gkl_tpu import HaplotypeData, PairHMM, PairHMMNativeArguments, ReadData

    cases = golden.load_pairhmm_cases()
    for dbl in (False, True):
        hmm = PairHMM(PairHMMNativeArguments(use_double_precision=dbl))
        got = np.array([
            hmm.compute_likelihoods(
                [ReadData(c.read, c.q, c.iq, c.dq, c.gcp)],
                [HaplotypeData(c.hap)])[0]
            for c in cases
        ])
        err = np.max(np.abs(got - np.array([c.expected for c in cases])))
        print(f"  pairhmm golden max err (double={dbl}): {err:.3e}")
        assert err < 1e-5


@step("relay_parity")
def s_relay_parity():
    from gkl_tpu.ops.pairhmm import pairhmm_raw
    from gkl_tpu.ops.pairhmm_pallas_cols import (
        pairhmm_raw_pallas_cols, pairhmm_raw_pallas_cols_relay)

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    R, H, P = 512, 4096, 128
    hap = bases[rng.integers(0, 4, (H, P))]
    read = hap[:R].copy()
    mut = rng.random((R, P)) < 0.02
    read[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
    q = rng.integers(20, 40, (R, P)).astype(np.uint8)
    iq = rng.integers(30, 45, (R, P)).astype(np.uint8)
    gcp = np.full((R, P), 10, np.uint8)
    haplen = np.full(P, H, np.int32)
    rslen = np.full(P, R, np.int32)
    args = (hap, read, q, iq, iq, gcp, haplen, rslen)
    cols = np.asarray(pairhmm_raw_pallas_cols(*args))
    one = np.asarray(pairhmm_raw_pallas_cols_relay(*args, r_chunk=512))
    np.testing.assert_array_equal(one, cols)  # single chunk == cols kernel
    two = np.asarray(pairhmm_raw_pallas_cols_relay(*args, r_chunk=256))
    ok = cols > 0
    np.testing.assert_allclose(two[ok], cols[ok], rtol=2e-5)
    # vs jnp at a thin lane count (jnp is slow)
    thin = tuple(a[:, :8] if a.ndim == 2 else a[:8] for a in args)
    jref = np.asarray(pairhmm_raw(*thin, dtype="float32"))
    rel = np.asarray(pairhmm_raw_pallas_cols_relay(*thin, r_chunk=256))
    okj = jref > 0
    np.testing.assert_allclose(rel[okj], jref[okj], rtol=5e-5)
    print("  relay parity ok (single-chunk bit-equal; multi-chunk 2e-5)")


@step("relay_rate")
def s_relay_rate():
    import functools

    import jax
    import jax.numpy as jnp

    from gkl_tpu.ops.pairhmm_pallas_cols import pairhmm_raw_pallas_cols_relay

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks.suite import _device_loop_time, _gatk_like_batch

    for R, H, P in ((1024, 4096, 256), (4096, 16384, 128)):
        args = [jax.device_put(a) for a in _gatk_like_batch(R, H, P)]

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(a0, a1, a2, a3, a4, a5, a6, a7, n):
            def body(i, acc):
                return acc + pairhmm_raw_pallas_cols_relay(
                    a0, a1, a2 + (i % 3).astype(jnp.uint8), a3, a4, a5, a6, a7)

            return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body,
                                     jnp.zeros((P,), jnp.float32)).sum()

        per = _device_loop_time(loop, args, 6)
        print(f"  relay R={R} H={H} P={P}: {R * H * P / per / 1e9:.1f} Gcells/s")


@step("pdhmm_scattered")
def s_pdhmm():
    from benchmarks import suite

    suite.RESULTS.clear()
    suite.bench_pdhmm(True, False)
    vals = {r["metric"]: r["value"] for r in suite.RESULTS}
    g = vals.get("pdhmm_dp_cells_per_sec", 0.0)
    s = vals.get("pdhmm_dp_cells_per_sec_scattered", 0.0)
    print(f"  grouped {g / 1e9:.1f} G, scattered {s / 1e9:.1f} G, "
          f"ratio {s / g if g else 0:.2f} (target >= 0.8)")


@step("pipeline")
def s_pipeline():
    from benchmarks import suite

    suite.RESULTS.clear()
    suite.bench_bam_pipeline(False)
    for r in suite.RESULTS:
        print(f"  {r['metric']}: {r['value']:.0f}")


@step("codec")
def s_codec():
    from benchmarks import suite

    suite.RESULTS.clear()
    suite.bench_codec(False)
    for r in suite.RESULTS:
        extra = {k: v for k, v in r.items() if k not in ("metric", "value", "unit")}
        print(f"  {r['metric']}: {r['value']:.1f} {extra}")


if __name__ == "__main__":
    for s in (s_backend, s_golden, s_relay_parity, s_relay_rate, s_pdhmm,
              s_pipeline, s_codec):
        s()
    print("PROBE4 done", flush=True)

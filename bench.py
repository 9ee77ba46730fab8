"""Benchmark harness: PairHMM DP cells/sec on the current default backend.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Measurement methodology: the remote-TPU relay in this environment adds
~25-120 ms of host latency per dispatch/fetch and its ``block_until_ready``
does not reliably block, so kernels are timed with an on-device
``lax.fori_loop`` running K iterations (inputs perturbed per iteration so
nothing folds away, outputs accumulated so nothing is DCE'd) and two K
values are differenced to cancel fixed dispatch+fetch overhead.

Baseline: the reference publishes no numbers (BASELINE.md), so we anchor to
the structural speed-of-light of its AVX-512 float kernel: ~13 vector ops
per 16-cell anti-diagonal step => ~1.2 cells/cycle/core => ~3.0e9 DP
cells/s per AVX-512 core at ~2.5 GHz (see SURVEY.md §6).  The BASELINE.md
north-star target is >=10x that per chip.
"""

from __future__ import annotations

import functools
import json
import os
import time

# Persistent compile cache: remote TPU compiles are slow; cache them.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402

BASELINE_CELLS_PER_SEC = 3.0e9  # one AVX-512 core, derived (SURVEY.md §6)

# Socket-equivalent framing: the reference runs OpenMP across the whole
# socket (IntelPairHmm.cc:151-153); 32 AVX-512 cores is a generous
# production Xeon.  vs_baseline stays per-core (BASELINE.md's anchor);
# vs_socket32 rides along so both framings are always on record.
SOCKET_CORES = 32

# Roofline anchor: TPU v5e TensorCore VPU = 4 ALUs x (8 sublanes x 128
# lanes) at ~0.94 GHz, counting an FMA as 2 flops => ~7.7 Tf32op/s.  The
# DP kernels are VPU-bound (elementwise mul/add/select chains - no MXU
# contraction in the recurrence), so %-of-VPU-peak is the honest
# speed-of-light figure.  Per-cell op counts come from each kernel's own
# CostEstimate (ops/pairhmm_pallas.py etc.).
VPU_F32_PEAK = 4 * 8 * 128 * 2 * 0.94e9
KERNEL_FLOPS_PER_CELL = {
    "pairhmm_dp_cells_per_sec": 50,            # scaled rows kernel
    "pairhmm_dp_cells_per_sec_longread": 43,   # cols relay kernel
    "pairhmm_sharded_dp_cells_per_sec": 50,
    "pdhmm_dp_cells_per_sec": 60,
    "pdhmm_dp_cells_per_sec_scattered": 60,
    "sw_dp_cells_per_sec": 30,                 # int32 ops (VPU too)
    "sw_dp_cells_per_sec_large": 30,
}


def _gatk_like_batch(R, H, P, seed=0):
    """Realistic batch: reads are mutated haplotype prefixes (likelihoods in
    f32 range, like HaplotypeCaller's read-vs-assembled-haplotype pairs)."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    hap = bases[rng.integers(0, 4, size=(H, P))]
    read = hap[:R].copy()
    mut = rng.random((R, P)) < 0.02
    read[mut] = bases[rng.integers(0, 4, size=int(mut.sum()))]
    q = rng.integers(20, 40, size=(R, P)).astype(np.uint8)
    iq = rng.integers(30, 45, size=(R, P)).astype(np.uint8)
    dq = rng.integers(30, 45, size=(R, P)).astype(np.uint8)
    gcp = np.full((R, P), 10, np.uint8)
    haplen = np.full(P, H, np.int32)
    rslen = np.full(P, R, np.int32)
    return hap, read, q, iq, dq, gcp, haplen, rslen


def bench_pairhmm(R=128, H=224, P=2048, iters=100):
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    if on_tpu:
        # the API's actual f32 path: the scaled kernel (rescue built in)
        from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas_scaled

        def fn(*a):
            mant, ex, _ = pairhmm_raw_pallas_scaled(*a)
            return mant + ex.astype(jnp.float32) * jnp.float32(1e-30)
    else:
        from gkl_tpu.ops.pairhmm import pairhmm_raw

        def fn(*a):
            return pairhmm_raw(*a, dtype="float32")

    args = [jax.device_put(a) for a in _gatk_like_batch(R, H, P)]

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a0, a1, a2, a3, a4, a5, a6, a7, n):
        def body(i, acc):
            return acc + fn(a0, a1, a2 + (i % 3).astype(jnp.uint8), a3, a4, a5, a6, a7)

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, jnp.zeros((P,), jnp.float32)).sum()

    # the kernels scope x64 off internally; the prep needs x64 for its f64
    # closed forms, so the loop traces under the library's global config
    t = {}
    for n in (2, 2 + iters):
        np.asarray(loop(*args, n=n))  # warmup/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(*args, n=n))
            ts.append(time.perf_counter() - t0)
        t[n] = min(ts)
    per_call = (t[2 + iters] - t[2]) / iters
    return float(R) * float(H) * float(P) / per_call


def _suite_extras(quick: bool) -> dict:
    """Run the full engine/codec/pipeline suite (benchmarks/suite.py) with
    its stdout suppressed and collect every metric, so the driver's single
    JSON line records the whole engine set, not just the PairHMM headline."""
    import contextlib
    import io

    sys_path_root = os.path.dirname(os.path.abspath(__file__))
    import sys

    if sys_path_root not in sys.path:
        sys.path.insert(0, sys_path_root)
    from benchmarks import suite

    import jax

    on_tpu = jax.default_backend() in ("tpu", "axon")
    extras: dict = {}
    for name, fn in (
        ("pairhmm_longread", lambda: suite.bench_pairhmm_longread(on_tpu, quick)),
        ("pdhmm", lambda: suite.bench_pdhmm(on_tpu, quick)),
        ("sw", lambda: suite.bench_sw(on_tpu, quick)),
        ("pairhmm_sharded", lambda: suite.bench_pairhmm_sharded(on_tpu, quick)),
        # codec is host-native C++ — its numbers are valid (and cheap) on any
        # backend, so never degrade its corpus/reps to quick mode: on a CPU
        # fallback run these are the round's only full-fidelity perf evidence
        ("codec", lambda: suite.bench_codec(False)),
        ("bam", lambda: suite.bench_bam_pipeline(quick)),
        ("gatk_corpus", lambda: suite.bench_gatk_corpus(quick)),
    ):
        suite.RESULTS.clear()
        try:
            with contextlib.redirect_stdout(io.StringIO()):
                fn()
            for rec in suite.RESULTS:
                extras[rec["metric"]] = rec["value"]
                # every scalar side-channel rides along (ratio, cores,
                # zlib_mb_per_sec, vs_zlib_per_core, stage breakdowns ...)
                for k, v in rec.items():
                    if k in ("metric", "value", "unit"):
                        continue
                    if isinstance(v, (int, float)):
                        extras[f"{rec['metric']}_{k}"] = v
        except Exception as e:  # noqa: BLE001 - partial extras beat none
            extras[name + "_error"] = str(e)[:200]
    return extras


def inner_main():
    """Measure on whatever backend this process resolved.  The headline and
    the suite extras are isolated from each other: a failing headline still
    emits every extra (and vice versa), so one broken engine cannot void a
    round's evidence."""
    import sys

    import jax

    jax.config.update("jax_enable_x64", True)
    backend = jax.default_backend()
    quick = backend == "cpu"
    rec = {
        "metric": "pairhmm_dp_cells_per_sec",
        "value": 0.0,
        "unit": "cells/s",
        "vs_baseline": 0.0,
        "extra": {"backend": backend},
    }
    try:
        if quick:
            cells_per_sec = bench_pairhmm(R=32, H=64, P=256, iters=10)
        else:
            cells_per_sec = bench_pairhmm()
        rec["value"] = cells_per_sec
        rec["vs_baseline"] = cells_per_sec / BASELINE_CELLS_PER_SEC
    except Exception as e:  # noqa: BLE001 - extras still run
        rec["error"] = str(e)[:300]
    try:
        rec["extra"].update(_suite_extras(quick))
    except Exception as e:  # noqa: BLE001
        rec["extra"]["suite_error"] = str(e)[:300]
    # roofline + socket framings (VERDICT r4 weak #6): every DP-kernel rate
    # also lands as a %-of-VPU-f32-peak and the headline additionally as a
    # 32-core-socket-equivalent multiple
    rec["extra"]["vs_socket32"] = rec["value"] / (
        BASELINE_CELLS_PER_SEC * SOCKET_CORES)
    rates = dict(rec["extra"])
    rates["pairhmm_dp_cells_per_sec"] = rec["value"]
    for metric, fpc in KERNEL_FLOPS_PER_CELL.items():
        v = rates.get(metric)
        if isinstance(v, (int, float)) and v > 0:
            rec["extra"][f"{metric}_pct_vpu_peak"] = round(
                100.0 * v * fpc / VPU_F32_PEAK, 2)
    print(json.dumps(rec))
    sys.stdout.flush()
    return 0


# ---------------------------------------------------------------------------
# Outer harness.  The remote-TPU (axon) backend in this environment fails in
# two modes: a clean init error, and a HANG inside jax's first device op
# (observed >300 s).  In-process retries cannot recover a hang, so the outer
# process never imports jax: it probes the backend in a bounded SUBPROCESS
# with retry/backoff, then runs the measurement in a subprocess on the
# backend the probe proved alive — falling back to CPU with an explicit
# "backend_unavailable" marker (rc still 0) so partial evidence always lands.
# ---------------------------------------------------------------------------

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128));"
    "assert float((x @ x).sum()) > 0;"
    "print('PROBE_OK', jax.default_backend(), flush=True)"
)


def _probe_backend(attempts=5, probe_timeout=150):
    """Return the live default backend name, or None if every bounded
    attempt failed/hung (VERDICT r3: 5 attempts over ~3+ min)."""
    import subprocess
    import sys

    delays = [0, 10, 20, 40, 60]
    for i in range(attempts):
        if delays[min(i, len(delays) - 1)] and i:
            time.sleep(delays[min(i, len(delays) - 1)])
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=probe_timeout,
            )
        except subprocess.TimeoutExpired:
            print(f"bench: backend probe attempt {i + 1}/{attempts} hung "
                  f"(> {probe_timeout}s)", file=sys.stderr)
            continue
        if r.returncode == 0 and "PROBE_OK" in r.stdout:
            return r.stdout.split("PROBE_OK", 1)[1].split()[0]
        print(f"bench: backend probe attempt {i + 1}/{attempts} failed "
              f"(rc={r.returncode}): {r.stderr.strip()[-200:]}",
              file=sys.stderr)
    return None


def _run_inner(env_extra, timeout_s):
    """Run `bench.py --inner` in a subprocess; return its JSON line or None."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(env_extra)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired:
        print(f"bench: inner run hung (> {timeout_s}s)", file=sys.stderr)
        return None
    sys.stderr.write(r.stderr[-4000:])
    for line in reversed(r.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    print(f"bench: inner run emitted no JSON (rc={r.returncode})",
          file=sys.stderr)
    return None


_CPU_ENV = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}


def main():
    backend = _probe_backend()
    rec = None
    if backend and backend != "cpu":
        rec = _run_inner({}, timeout_s=4800)
        if rec is not None:
            rec.setdefault("extra", {})["backend"] = backend
    if rec is None:
        marker = "backend_unavailable" if backend != "cpu" else None
        rec = _run_inner(_CPU_ENV, timeout_s=2400)
        if rec is None:
            rec = {"metric": "pairhmm_dp_cells_per_sec", "value": 0.0,
                   "unit": "cells/s", "vs_baseline": 0.0,
                   "error": "both TPU and CPU bench runs failed"}
        if marker:
            rec.setdefault("extra", {})[marker] = True
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    import sys

    if "--inner" in sys.argv:
        raise SystemExit(inner_main())
    raise SystemExit(main())

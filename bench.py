"""Benchmark harness: PairHMM DP cells/sec on the current default backend.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Baseline: the reference publishes no numbers (BASELINE.md), so we anchor to
the structural speed-of-light of its AVX-512 float kernel: ~13 vector ops
per 16-cell anti-diagonal step => ~1.2 cells/cycle/core => ~3.0e9 DP
cells/s per AVX-512 core at ~2.5 GHz (see SURVEY.md §6).  The BASELINE.md
north-star target is >=10x that per chip.
"""

from __future__ import annotations

import json
import os
import time

# Persistent compile cache: remote TPU compiles are minutes-slow; cache them.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402

BASELINE_CELLS_PER_SEC = 3.0e9  # one AVX-512 core, derived (SURVEY.md §6)


def bench_pairhmm(R=128, H=224, P=2048, iters=10, dtype="float32"):
    import jax

    from gkl_tpu.ops.pairhmm import pairhmm_raw

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    hap = bases[rng.integers(0, 4, size=(H, P))]
    read = bases[rng.integers(0, 4, size=(R, P))]
    q = rng.integers(10, 40, size=(R, P)).astype(np.uint8)
    iq = rng.integers(30, 45, size=(R, P)).astype(np.uint8)
    dq = rng.integers(30, 45, size=(R, P)).astype(np.uint8)
    gcp = np.full((R, P), 10, np.uint8)
    haplen = np.full(P, H, np.int32)
    rslen = np.full(P, R, np.int32)

    args = [jax.device_put(a) for a in (hap, read, q, iq, dq, gcp, haplen, rslen)]

    # warmup / compile
    pairhmm_raw(*args, dtype=dtype).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = pairhmm_raw(*args, dtype=dtype)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    cells = float(R) * float(H) * float(P)
    return cells / dt


def main():
    try:
        import jax

        jax.config.update("jax_enable_x64", True)
        backend = jax.default_backend()
        # Keep the benchmark fast off-TPU (driver runs it on the real chip).
        if backend == "cpu":
            cells_per_sec = bench_pairhmm(R=32, H=64, P=256, iters=3)
        else:
            cells_per_sec = bench_pairhmm()
        print(
            json.dumps(
                {
                    "metric": "pairhmm_dp_cells_per_sec",
                    "value": cells_per_sec,
                    "unit": "cells/s",
                    "vs_baseline": cells_per_sec / BASELINE_CELLS_PER_SEC,
                }
            )
        )
    except Exception as e:  # noqa: BLE001 - the driver needs a line either way
        print(json.dumps({"metric": "pairhmm_dp_cells_per_sec", "value": 0.0, "unit": "cells/s", "vs_baseline": 0.0, "error": str(e)}))
        raise


if __name__ == "__main__":
    main()

"""Probe: streamed-hap cols kernel at large H on the real TPU.

Checks (a) compile/run across (H, R) corners, (b) numeric agreement with
the jnp engine at 1e-5-class rtol, (c) Gcells/s.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
jax.config.update("jax_enable_x64", True)

from gkl_tpu.ops import pairhmm as jnp_ops  # noqa: E402
from gkl_tpu.ops import pairhmm_pallas_cols as cols  # noqa: E402


def batch(H, R, P, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, (H, P))]
    read = bases[rng.integers(0, 4, (R, P))]
    q = rng.integers(20, 41, (R, P)).astype(np.uint8)
    iq = rng.integers(30, 46, (R, P)).astype(np.uint8)
    dq = rng.integers(30, 46, (R, P)).astype(np.uint8)
    gcp = np.full((R, P), 10, np.uint8)
    haplen = np.full(P, H, np.int32)
    rslen = np.full(P, R, np.int32)
    return hap, read, q, iq, dq, gcp, haplen, rslen


for H, R in [(4096, 256), (8192, 256), (16384, 256), (32768, 152),
             (16384, 512), (8192, 1024)]:
    P = 256
    args = batch(H, R, P)
    try:
        t0 = time.time()
        out = np.asarray(cols.pairhmm_raw_pallas_cols(*args, lane_block=128))
        t_compile = time.time() - t0
        t0 = time.time()
        out = np.asarray(cols.pairhmm_raw_pallas_cols(*args, lane_block=128))
        dt = time.time() - t0
        ref = np.asarray(jnp_ops.pairhmm_raw(*args, dtype="float32"))
        mask = ref > 0
        rel = np.max(np.abs(out[mask] - ref[mask]) / ref[mask]) if mask.any() else 0.0
        gc = H * R * P / dt / 1e9
        print(f"H={H} R={R}: {gc:.1f} Gcells/s, rel vs jnp {rel:.2e}, "
              f"compile {t_compile:.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"H={H} R={R}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

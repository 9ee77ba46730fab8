"""Probe: SW kernel rate at the large assembly-region shape vs chunk size
and lane count (the sw_dp_cells_per_sec_large regime)."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
jax.config.update("jax_enable_x64", True)

from gkl_tpu.ops import sw_pallas  # noqa: E402


def timeit(N, M, P, iters=8, pick=None):
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, size=(N, P))]
    alt = ref[:M].copy()
    mut = rng.random((M, P)) < 0.05
    alt[mut] = bases[rng.integers(0, 4, size=int(mut.sum()))]
    args = [jax.device_put(a) for a in (
        ref, alt, np.full(P, N, np.int32), np.full(P, M, np.int32))]

    orig = sw_pallas._pick_chunk
    if pick is not None:
        sw_pallas._pick_chunk = lambda n, m, lb: pick

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(ref, alt, reflen, altlen, n):
        def body(i, acc):
            bt, lr, lc = sw_pallas.sw_forward_pallas(
                ref, alt + (i % 2).astype(jnp.uint8), reflen, altlen,
                200, -150, -260, -11, indel_boundary=False)
            return acc + jnp.sum(bt.astype(jnp.float32)) + jnp.sum(lr).astype(jnp.float32)

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, jnp.float32(0))

    try:
        t = {}
        for n in (2, 2 + iters):
            np.asarray(loop(*args, n=n))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(loop(*args, n=n))
                ts.append(time.perf_counter() - t0)
            t[n] = min(ts)
        per = (t[2 + iters] - t[2]) / iters
        return N * M * P / per / 1e9
    finally:
        sw_pallas._pick_chunk = orig


for desc, kw in [
    ("baseline 2048x512x128", dict(N=2048, M=512, P=128)),
    ("CH=128 forced", dict(N=2048, M=512, P=128, pick=128)),
    ("CH=32 forced", dict(N=2048, M=512, P=128, pick=32)),
    ("P=256", dict(N=2048, M=512, P=256)),
    ("M=256", dict(N=2048, M=256, P=128)),
]:
    try:
        g = timeit(**kw)
        print(f"{desc}: {g:.1f} Gcells/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{desc}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)

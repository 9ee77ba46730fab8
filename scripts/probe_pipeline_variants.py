"""Probe: BAM pipeline throughput vs chunk size / prefetch depth on TPU."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["GKL_TPU_METRICS"] = "1"
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

from gkl_tpu import bam as bam_mod  # noqa: E402
from gkl_tpu import pipeline, profiling  # noqa: E402
from gkl_tpu.api import HaplotypeData  # noqa: E402

bam_path = "/root/repo/tests/data/HiSeq.1mb.1RG.2k_lines.bam"
_, records = bam_mod.read_bam(bam_path, limit=8)
haps = [HaplotypeData(records[i].seq) for i in (0, 1)]

for chunk, prefetch in [(512, 2), (512, 6), (1024, 3), (2048, 2), (4096, 2)]:
    # warm pass (compile any new bucket shapes)
    pipeline.pairhmm_bam(bam_path, haps, chunk_reads=chunk, prefetch=prefetch)
    best = None
    for _ in range(3):
        profiling.METRICS.reset()
        t0 = time.perf_counter()
        res = pipeline.pairhmm_bam(bam_path, haps, chunk_reads=chunk,
                                   prefetch=prefetch)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            snap = profiling.METRICS.snapshot()
            best = (dt, {k: round(v["seconds"], 4)
                         for k, v in snap.items() if k.startswith("pipeline")})
    dt, stages = best
    print(f"chunk={chunk} prefetch={prefetch}: "
          f"{len(res.read_names)/dt:.0f} reads/s ({dt*1e3:.0f} ms) {stages}",
          flush=True)

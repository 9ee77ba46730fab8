"""One-off: stage-time breakdown of the BAM→PairHMM pipeline on the TPU."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

from gkl_tpu import bam as bam_mod  # noqa: E402
from gkl_tpu import batch as batch_mod  # noqa: E402
from gkl_tpu import pipeline  # noqa: E402
from gkl_tpu.api import HaplotypeData, PairHMM  # noqa: E402

bam_path = "/root/repo/tests/data/HiSeq.1mb.1RG.2k_lines.bam"

t0 = time.perf_counter()
_, records = bam_mod.read_bam(bam_path)
t_decode = time.perf_counter() - t0
records = [r for r in records
           if not (r.flag & (bam_mod.FLAG_UNMAPPED | bam_mod.FLAG_SECONDARY
                             | bam_mod.FLAG_SUPPLEMENTARY)) and len(r.seq)]
print(f"decode: {t_decode*1e3:.1f} ms for {len(records)} records", flush=True)

haps = [HaplotypeData(records[i].seq) for i in (0, 1)]
hmm = PairHMM()

# per-chunk breakdown, chunk=512
for trial in range(2):
    tag = "warm" if trial else "cold"
    tt = {"reads": 0.0, "pack": 0.0, "kernel": 0.0, "rescue": 0.0}
    t_all = time.perf_counter()
    for c0 in range(0, len(records), 512):
        chunk = records[c0:c0 + 512]
        t0 = time.perf_counter()
        reads = pipeline.reads_from_records(chunk)
        tt["reads"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        pairs_read, pairs_hap, quals = [], [], []
        for rd in reads:
            for hp in haps:
                pairs_read.append(rd.read_bases)
                pairs_hap.append(hp.haplotype_bases)
                quals.append((rd.read_quals, rd.insertion_gop,
                              rd.deletion_gop, rd.overall_gcp))
        groups = batch_mod.group_by_bucket(pairs_hap, pairs_read)
        packs = []
        for idxs in groups.values():
            packs.append(batch_mod.pack_pairs(
                [pairs_hap[i] for i in idxs], [pairs_read[i] for i in idxs],
                [quals[i] for i in idxs], lane_multiple=hmm._lane_multiple))
        tt["pack"] += time.perf_counter() - t0

        for packed in packs:
            t0 = time.perf_counter()
            fwd = hmm._forward_scaled(packed)
            tt["kernel"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            if fwd is not None and np.any(fwd[1]):
                raw64 = hmm._raw_batch(packed, "float64")
            tt["rescue"] += time.perf_counter() - t0
    dt = time.perf_counter() - t_all
    print(f"[{tag}] total {dt*1e3:.0f} ms -> {len(records)/dt:.0f} reads/s; "
          + ", ".join(f"{k}={v*1e3:.0f}ms" for k, v in tt.items()),
          flush=True)
    # bucket shapes
    print("  buckets:", [(p.hap.shape, p.read.shape) for p in packs], flush=True)

"""Full benchmark suite: one JSON line per kernel/stage.

``bench.py`` at the repo root prints the single driver headline metric
(PairHMM DP cells/s); this suite covers every engine and the host codec:

* pairhmm  — Pallas f32 forward, DP cells/s (on-device loop differencing)
* pdhmm    — Pallas f32 forward, DP cells/s
* sw       — score+backtrack DP, DP cells/s (device-only)
* deflate / inflate — native block codec, MB/s per level
* bam_pipeline — BAM -> codec -> batch -> device PairHMM, reads/s

Usage: python benchmarks/suite.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


RESULTS: list[dict] = []  # every _emit also lands here (bench.py collects)


def _emit(metric, value, unit, **extra):
    rec = {"metric": metric, "value": value, "unit": unit, **extra}
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)


def _device_loop_time(fn_loop, args, iters, x64=True):
    """Min wall time of jitted fori-loop at two iteration counts, differenced
    to cancel dispatch/fetch overhead (see bench.py methodology).  Kernels
    scope x64 internally; preps need the global x64 for f64 closed forms."""
    import contextlib

    import jax

    scope = contextlib.nullcontext() if x64 else jax.enable_x64(False)
    with scope:
        t = {}
        for n in (2, 2 + iters):
            np.asarray(fn_loop(*args, n=n))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn_loop(*args, n=n))
                ts.append(time.perf_counter() - t0)
            t[n] = min(ts)
    return (t[2 + iters] - t[2]) / iters


def _gatk_like_batch(R, H, P, seed=0):
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


def bench_pairhmm(on_tpu, quick):
    import jax
    import jax.numpy as jnp

    R, H, P, iters = (32, 64, 256, 10) if quick or not on_tpu else (128, 224, 2048, 100)
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

    per = _device_loop_time(loop, args, iters)
    _emit("pairhmm_dp_cells_per_sec", R * H * P / per, "cells/s", shape=[R, H, P])


def bench_pairhmm_longread(on_tpu, quick):
    """Long-read × long-haplotype pairs (PacBio/ONT class): past BOTH the
    rows kernel's hap cap and the cols kernel's read cap, so this exercises
    the read-relayed column sweep — the round-3 jnp cliff (~1.4 Gcells/s)
    made a first-class metric."""
    import jax
    import jax.numpy as jnp

    if not on_tpu:
        return  # the relay targets the Pallas path; CPU interpret is noise
    from gkl_tpu.ops.pairhmm_pallas_cols import pairhmm_raw_pallas_cols_relay

    R, H, P, iters = 1024, 4096, 256, 10
    args = [jax.device_put(a) for a in _gatk_like_batch(R, H, P)]

    def fn(*a):
        return pairhmm_raw_pallas_cols_relay(*a)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a0, a1, a2, a3, a4, a5, a6, a7, n):
        def body(i, acc):
            return acc + fn(a0, a1, a2 + (i % 3).astype(jnp.uint8), a3, a4, a5, a6, a7)

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, jnp.zeros((P,), jnp.float32)).sum()

    per = _device_loop_time(loop, args, iters)
    _emit("pairhmm_dp_cells_per_sec_longread", R * H * P / per, "cells/s",
          shape=[R, H, P])


def bench_pdhmm(on_tpu, quick):
    import jax
    import jax.numpy as jnp

    from gkl_tpu.ops import pdhmm as pdhmm_ops

    R, H, P, iters = (32, 64, 256, 5) if quick or not on_tpu else (128, 224, 2048, 40)
    hap, read, q, iq, dq, gcp, haplen, rslen = _gatk_like_batch(R, H, P)

    if on_tpu:
        from gkl_tpu.ops.pdhmm_pallas import pdhmm_raw_pallas as fn
    else:
        fn = functools.partial(pdhmm_ops.pdhmm_raw, dtype="float32")

    rng = np.random.default_rng(1)
    scenarios = {}
    # aligned PD events: the realistic read x haplotype cross-product case
    # (the API groups lanes by haplotype, so event columns align per block)
    pd_a = np.zeros((H, P), np.uint8)
    for j in (H // 4, 2 * H // 3):
        pd_a[j, :] = 2
        pd_a[min(j + 3, H - 1), :] = 4
    scenarios["pdhmm_dp_cells_per_sec"] = pd_a
    # scattered events (heterogeneous flat batch): one event at a random
    # column per lane.  The batch planner orders lanes by first event
    # column before packing (api_pdhmm._compute_pairs /
    # pdhmm_ops.lane_event_key), so the bench applies the same permutation
    # — this measures the production path, not the unplanned worst case.
    pd_s = np.zeros((H, P), np.uint8)
    for p in range(P):
        j = rng.integers(4, H - 8)
        pd_s[j, p] = 2
        pd_s[j + 3, p] = 4
    order = sorted(range(P), key=lambda p: pdhmm_ops.lane_event_key(pd_s[:, p]))
    scenarios["pdhmm_dp_cells_per_sec_scattered"] = pd_s[:, order]

    for metric, hap_pd in scenarios.items():
        states = pdhmm_ops.column_states(hap_pd)
        args = [jax.device_put(a) for a in (hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen)]

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(a0, a1, a2, a3, a4, a5, a6, a7, a8, a9, n, fn=fn):
            def body(i, acc):
                return acc + fn(a0, a1, a2, a3, a4 + (i % 3).astype(jnp.uint8), a5, a6, a7, a8, a9)

            return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, jnp.zeros((P,), jnp.float32)).sum()

        per = _device_loop_time(loop, args, iters)
        _emit(metric, R * H * P / per, "cells/s", shape=[R, H, P])


def bench_pairhmm_sharded(on_tpu, quick):
    """The mesh path (shard_map-wrapped Pallas) on all local devices — on a
    single chip this measures the shard_map wrapper overhead vs the direct
    kernel; on pods it is the scaling metric."""
    import jax

    from gkl_tpu import parallel
    from gkl_tpu.batch import PackedPairs

    if not on_tpu:
        return
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as Pspec

    from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas_scaled

    R, H, P, iters = (128, 224, 2048, 100)
    n_dev = len(jax.devices())
    P = max(P, 128 * n_dev)
    batch = _gatk_like_batch(R, H, P)
    mesh = parallel.data_parallel_mesh()
    ls = parallel.mesh.lane_sharding(mesh)
    vs = parallel.mesh.vec_sharding(mesh)
    args = [jax.device_put(a, ls) for a in batch[:6]] + [
        jax.device_put(a, vs) for a in batch[6:]]

    # same on-device loop differencing as the direct bench (per-dispatch
    # tunnel latency would otherwise dominate); the shard_map sits inside
    # the jitted loop body, so each iteration runs the SPMD kernel
    local = jax.shard_map(
        lambda *a: pairhmm_raw_pallas_scaled(*a),
        mesh=mesh,
        in_specs=(Pspec(None, "dp"),) * 6 + (Pspec("dp"),) * 2,
        out_specs=(Pspec("dp"),) * 3,
        check_vma=False,
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a0, a1, a2, a3, a4, a5, a6, a7, n):
        def body(i, acc):
            mant, ex, _ = local(a0, a1, a2 + (i % 3).astype(jnp.uint8), a3, a4, a5, a6, a7)
            return acc + mant + ex.astype(jnp.float32) * jnp.float32(1e-30)

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body,
                                 jnp.zeros((P,), jnp.float32)).sum()

    with mesh:
        per = _device_loop_time(loop, args, iters)
    _emit("pairhmm_sharded_dp_cells_per_sec", R * H * P / per, "cells/s",
          shape=[R, H, P], n_devices=n_dev)


def bench_sw(on_tpu, quick):
    import jax
    import jax.numpy as jnp

    from gkl_tpu.ops import sw as sw_ops

    N, M, P, iters = (64, 64, 64, 5) if quick or not on_tpu else (160, 160, 512, 80)
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, size=(N, P))]
    alt = ref[:M].copy()
    mut = rng.random((M, P)) < 0.05
    alt[mut] = bases[rng.integers(0, 4, size=int(mut.sum()))]
    reflen = np.full(P, N, np.int32)
    altlen = np.full(P, M, np.int32)
    args = [jax.device_put(a) for a in (ref, alt, reflen, altlen)]

    from gkl_tpu.ops.sw_pallas import sw_pallas_fits

    if on_tpu and P % 128 == 0 and M % 2 == 0 and sw_pallas_fits(N, M):
        from gkl_tpu.ops.sw_pallas import sw_forward_pallas

        def fwd(ref, alt, reflen, altlen):
            return sw_forward_pallas(ref, alt, reflen, altlen, 200, -150, -260,
                                     -11, indel_boundary=False)
    else:
        def fwd(ref, alt, reflen, altlen):
            return sw_ops.sw_forward(ref, alt, reflen, altlen, 200, -150, -260,
                                     -11, indel_boundary=False, pack_bt=True)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(ref, alt, reflen, altlen, n):
        def body(i, acc):
            # perturb a DP input (alt bases) so nothing hoists out of the loop
            bt, lr, lc = fwd(ref, alt + (i % 2).astype(jnp.uint8), reflen, altlen)
            return acc + jnp.sum(bt.astype(jnp.float32)) + jnp.sum(lr).astype(jnp.float32)

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, jnp.float32(0))

    # SW's public path traces under the library's global x64 config
    per = _device_loop_time(loop, args, iters, x64=True)
    _emit("sw_dp_cells_per_sec", N * M * P / per, "cells/s", shape=[N, M, P])

    if on_tpu and not quick:
        # large assembly-region bucket: the ref-axis-streamed kernel rate
        # (the 160x160 shape above is read-vs-read realistic; this one is
        # the long-reference regime the segment relay serves)
        N2, M2, P2 = 2048, 512, 128
        ref2 = bases[rng.integers(0, 4, size=(N2, P2))]
        alt2 = ref2[:M2].copy()
        mut2 = rng.random((M2, P2)) < 0.05
        alt2[mut2] = bases[rng.integers(0, 4, size=int(mut2.sum()))]
        args2 = [jax.device_put(a) for a in (
            ref2, alt2, np.full(P2, N2, np.int32), np.full(P2, M2, np.int32))]
        per2 = _device_loop_time(loop, args2, 10, x64=True)
        _emit("sw_dp_cells_per_sec_large", N2 * M2 * P2 / per2, "cells/s",
              shape=[N2, M2, P2])


def bench_codec(quick):
    import zlib

    from gkl_tpu import compression as comp

    rng = np.random.default_rng(0)
    n = (1 << 20) if quick else (4 << 20)
    data = bytes(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)])
    blocks = [data[i : i + 65280] for i in range(0, len(data), 65280)]
    # host core count so round-over-round MB/s compares like-for-like (the
    # batch pools scale with cores; driver hosts vary)
    cores = os.cpu_count() or 1
    reps = 1 if quick else 3
    for level in (1, 6):
        compressed = comp.deflate_blocks(blocks, level=level)  # warm
        dt = dzd = 9e9
        zblocks = None
        for _ in range(reps):
            # interleave ours vs single-core zlib in the same clock windows
            # (the hosts' clocks wander ~2x across seconds)
            t0 = time.perf_counter()
            compressed = comp.deflate_blocks(blocks, level=level)
            dt = min(dt, time.perf_counter() - t0)
            def _zdef(b):
                co = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS)
                return co.compress(b) + co.flush()

            t0 = time.perf_counter()
            zblocks = [_zdef(b) for b in blocks]
            dzd = min(dzd, time.perf_counter() - t0)
        _emit(f"deflate_l{level}_mb_per_sec", n / dt / 1e6, "MB/s",
              ratio=sum(map(len, compressed)) / n, cores=cores,
              zlib_mb_per_sec=n / dzd / 1e6,
              zlib_ratio=sum(map(len, zblocks)) / n,
              vs_zlib_per_core=dzd / (dt * cores))
        dt = dta = dz = dtz = dzz = 9e9
        # the bench hosts' clocks wander ~2x across seconds; the inflate
        # legs are cheap (~10 ms each), so take best-of over many
        # interleaved reps to sample all three variants in the same windows
        for _ in range(3 * reps):
            # the packed (caller-buffer) entry is the production decode
            # path — the BGZF reader consumes the strided buffer directly
            # (bgzf._inflate_verify_join), matching the reference's JNI
            # contract of inflating into a caller-provided byte[]
            # (IntelInflater.java inflate(byte[],...))
            t0 = time.perf_counter()
            res = comp.inflate_blocks_packed(compressed)
            dt = min(dt, time.perf_counter() - t0)
            if res is not None:
                comp.release_blocks_buffer(res[0])
            # list-of-bytes convenience contract, for reference
            t0 = time.perf_counter()
            comp.inflate_blocks(compressed)
            dta = min(dta, time.perf_counter() - t0)
            # single-core zlib on the same blocks: the reference replaces
            # exactly this engine with ISA-L (IntelInflater.cc), so the
            # per-core speedup over zlib is the contract number
            t0 = time.perf_counter()
            for b in compressed:
                zlib.decompressobj(-zlib.MAX_WBITS).decompress(b)
            dz = min(dz, time.perf_counter() - t0)
            # EXTERNALLY-produced corpus: the same data as stock zlib
            # emitted it (zblocks, from the deflate stanza above).  This is
            # the production inflate scenario — the reference's inflater
            # decodes BAMs written by other tools (IntelInflater.java) — so
            # its per-core ratio rides along as a separate metric
            t0 = time.perf_counter()
            res = comp.inflate_blocks_packed(zblocks)
            dtz = min(dtz, time.perf_counter() - t0)
            if res is not None:
                comp.release_blocks_buffer(res[0])
            t0 = time.perf_counter()
            for b in zblocks:
                zlib.decompressobj(-zlib.MAX_WBITS).decompress(b)
            dzz = min(dzz, time.perf_counter() - t0)
        _emit(f"inflate_l{level}_mb_per_sec", n / dt / 1e6, "MB/s",
              cores=cores, zlib_mb_per_sec=n / dz / 1e6,
              vs_zlib_per_core=dz / (dt * cores),
              assembled_mb_per_sec=n / dta / 1e6)
        _emit(f"inflate_zlib_l{level}_corpus_mb_per_sec", n / dtz / 1e6,
              "MB/s", cores=cores, zlib_mb_per_sec=n / dzz / 1e6,
              vs_zlib_per_core=dzz / (dtz * cores))


def _replicated_bam(bam_path, copies):
    """A copies×-replicated BAM (built once, via the streaming writer):
    the bundled 2k-line file is only ~1 chunk of reads, far too small for a
    steady-state throughput window — the pipeline's overlap needs many
    chunks in flight to mean anything."""
    import tempfile

    from gkl_tpu import bam as bam_mod

    dst = os.path.join(tempfile.gettempdir(), f"gkl_bench_x{copies}.bam")
    if not os.path.exists(dst):
        header, records = bam_mod.read_bam(bam_path)

        def rep():
            for _ in range(copies):
                yield from records

        bam_mod.write_bam_streaming(dst, header, rep(), level=1)
    return dst


def _mutated_haps(records, n, seed=0):
    """n haplotypes derived from the BAM's own reads: the first few reads
    verbatim plus mutated variants (the assembled-haplotype population of a
    real active region — dozens of near-identical candidates)."""
    from gkl_tpu.api import HaplotypeData

    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    haps = []
    for i in range(n):
        seq = np.asarray(records[i % 8].seq, np.uint8).copy()
        if i >= 8:
            mut = rng.random(seq.shape) < 0.01
            seq[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
        haps.append(HaplotypeData(seq))
    return haps


def bench_bam_pipeline(quick):
    from gkl_tpu import bam as bam_mod
    from gkl_tpu import pipeline
    from gkl_tpu import profiling

    bam_path = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                            "HiSeq.1mb.1RG.2k_lines.bam")
    if not os.path.exists(bam_path):
        return
    _, records = bam_mod.read_bam(bam_path, limit=8)
    if quick:
        limit, chunk = 128, 1024
    else:
        bam_path = _replicated_bam(bam_path, 16)
        limit, chunk = None, 2048

    # haplotype-count sweep: 2 haps is codec/host-bound; real active
    # regions score against dozens of assembled haplotypes, where the
    # device becomes the term that matters (VERDICT r4 weak #5)
    for nh in (2, 8, 32):
        haps = _mutated_haps(records, nh)
        # warm pass over the SAME stream (compiles every shape incl. the
        # tail chunk's bucket), then the timed pass with stage breakdown
        pipeline.pairhmm_bam(bam_path, haps, limit=limit, chunk_reads=chunk)
        os.environ["GKL_TPU_METRICS"] = "1"
        profiling.METRICS.reset()
        t0 = time.perf_counter()
        res = pipeline.pairhmm_bam(bam_path, haps, limit=limit,
                                   chunk_reads=chunk)
        dt = time.perf_counter() - t0
        os.environ.pop("GKL_TPU_METRICS", None)
        snap = profiling.METRICS.snapshot()
        stages = {k: round(v["seconds"], 4) for k, v in snap.items()
                  if k.startswith("pipeline_")}
        suffix = "" if nh == 2 else f"_h{nh}"
        _emit(f"bam_pipeline_reads_per_sec{suffix}",
              len(res.read_names) / dt, "reads/s",
              n_reads=len(res.read_names), n_haplotypes=nh,
              stage_seconds=stages)

    # composed HaplotypeCaller-shaped flow (BASELINE config 5): PairHMM
    # scoring + SW realignment to the best haplotype + PDHMM re-scoring on
    # one BAM stream.  The region must be HC-SHAPED: reads drawn from the
    # haplotype population (GATK only scores a region's reads against that
    # region's assembled haplotypes) — streaming unrelated reads makes
    # ~99% of PDHMM pairs deep-underflow host rescues, which measures the
    # rescue ladder, not the pipeline.  The validation-corpus builder
    # produces exactly that region shape as a real BAM.
    import tempfile

    from gkl_tpu import validation

    fd, corpus_bam = tempfile.mkstemp(suffix=".bam", prefix="gkl_mixed_")
    os.close(fd)
    try:
        n_reads = 1024 if quick else 13056
        corpus = validation.build_corpus(corpus_bam, n_reads=n_reads)
        pipeline.region_bam(corpus_bam, corpus.haplotypes,
                            pd_haplotypes=corpus.pd_haplotypes,
                            chunk_reads=chunk)
        os.environ["GKL_TPU_METRICS"] = "1"
        profiling.METRICS.reset()
        t0 = time.perf_counter()
        res = pipeline.region_bam(corpus_bam, corpus.haplotypes,
                                  pd_haplotypes=corpus.pd_haplotypes,
                                  chunk_reads=chunk)
        dt = time.perf_counter() - t0
        os.environ.pop("GKL_TPU_METRICS", None)
        snap = profiling.METRICS.snapshot()
        stages = {k: round(v["seconds"], 4) for k, v in snap.items()
                  if k.startswith("pipeline_")}
        _emit("mixed_pipeline_reads_per_sec", len(res.read_names) / dt,
              "reads/s", n_reads=len(res.read_names), n_haplotypes=8,
              n_pd_haplotypes=4, stage_seconds=stages)
    finally:
        if os.path.exists(corpus_bam):
            os.unlink(corpus_bam)


def bench_gatk_corpus(quick):
    """GATK-scale end-to-end validation at full size (>=10k reads through
    BAM -> codec -> batch -> PairHMM + SW + PDHMM, oracle-checked): the
    gatkIntegration.sh role, recorded as a bench metric so every round
    carries a pass/fail at scale.  Value = reads/s through the composed
    pipeline; the oracle legs run outside the timed window."""
    from gkl_tpu import validation

    n_reads = 1024 if quick else 10240
    import tempfile

    fd, bam_path = tempfile.mkstemp(suffix=".bam", prefix="gkl_corpus_")
    os.close(fd)
    try:
        corpus = validation.build_corpus(bam_path, n_reads=n_reads)
        from gkl_tpu import pipeline

        # warm (compile all shape buckets), then timed pipeline-only pass
        pipeline.region_bam(bam_path, corpus.haplotypes,
                            pd_haplotypes=corpus.pd_haplotypes,
                            chunk_reads=2048)
        t0 = time.perf_counter()
        res = pipeline.region_bam(bam_path, corpus.haplotypes,
                                  pd_haplotypes=corpus.pd_haplotypes,
                                  chunk_reads=2048)
        dt = time.perf_counter() - t0
        stats = validation.check_corpus(corpus, sample_stride=64 if quick
                                        else 32)
        _emit("gatk_corpus_reads_per_sec", len(res.read_names) / dt,
              "reads/s", ok=1, **{k: v for k, v in stats.items()
                                  if isinstance(v, (int, float))})
    finally:
        if os.path.exists(bam_path):
            os.unlink(bam_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma list: pairhmm,pdhmm,sw,codec,bam,gatk_corpus")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    _emit("backend", 1.0 if on_tpu else 0.0, "is_tpu", name=jax.default_backend())

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    if want("pairhmm"):
        bench_pairhmm(on_tpu, args.quick)
    if want("pairhmm_longread"):
        bench_pairhmm_longread(on_tpu, args.quick)
    if want("pairhmm_sharded"):
        bench_pairhmm_sharded(on_tpu, args.quick)
    if want("pdhmm"):
        bench_pdhmm(on_tpu, args.quick)
    if want("sw"):
        bench_sw(on_tpu, args.quick)
    if want("codec"):
        bench_codec(args.quick)
    if want("bam"):
        bench_bam_pipeline(args.quick)
    if want("gatk_corpus"):
        bench_gatk_corpus(args.quick)


if __name__ == "__main__":
    sys.exit(main())

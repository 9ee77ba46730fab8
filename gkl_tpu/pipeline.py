"""Streaming pipeline: BAM blocks → host codec → batch planner → device DP.

The TPU-native end-to-end path that replaces the reference's
GATK-orchestrated flow (GATK reads BAM via htsjdk + IntelInflater, then
feeds read×haplotype batches through JNI, SURVEY.md §3.1):

1. **host codec stage** — BGZF blocks inflated by the multi-threaded native
   codec (`compression/bgzf.py`), records decoded by `bam.py`;
2. **batch planner** — reads filtered/bucketed/padded into (len, lane)
   arrays (`batch.py`), quality floors applied like GATK's PairHMM input
   normalization (PairHmmUnitTest.java:309-319: quals clamped ≥ 6);
3. **device stage** — lane-batched PairHMM likelihoods on the TPU mesh
   (single chip or sharded via `parallel.pairhmm_raw_sharded`);
4. **gather** — per-pair log10 likelihood vectors (tiny) back to host.

Chunked and genuinely overlapped: a producer thread decodes/filters BGZF
records (native codec, GIL released) while the main thread packs and
dispatches; device batches are dispatched asynchronously
(``PairHMM.compute_likelihoods_async``) and resolved two chunks behind, so
chunk N's kernels run while chunk N+1 decodes and packs.  Host memory
stays bounded by ``prefetch`` chunks.  Stage times land in
``profiling.METRICS`` (pipeline_wait / pipeline_dispatch /
pipeline_resolve).
"""

from __future__ import annotations

import collections
import dataclasses
import queue as queue_mod
import threading
import time
from typing import Iterable, Iterator, Sequence

import numpy as np

from . import bam as bam_mod
from .api import HaplotypeData, PairHMM, PairHMMNativeArguments, ReadData

MIN_BASE_QUAL = 6  # GATK clamps read quals below 6 (PairHmmUnitTest.java:317)


@dataclasses.dataclass
class ChunkResult:
    read_names: list[str]
    likelihoods: np.ndarray  # (n_reads, n_haplotypes) log10


def reads_from_records(records: Iterable[bam_mod.BamRecord],
                       default_gcp: int = 10) -> list[ReadData]:
    """BamRecords → ReadData with GATK-style qual normalization.

    BAM has no per-base indel GOPs; like GATK's default PairHMM inputs the
    insertion/deletion GOPs default to 45 and the gap continuation penalty
    to ``default_gcp`` (GATK PairHMMLikelihoodCalculationEngine defaults).
    """
    # constant GOP/GCP rows are shared across reads of the same length
    # (read-only downstream); per-record np.full allocations dominated the
    # dispatch stage before
    gop_cache: dict[int, np.ndarray] = {}
    gcp_cache: dict[int, np.ndarray] = {}
    out = []
    for rec in records:
        q = np.maximum(rec.qual, MIN_BASE_QUAL).astype(np.uint8)
        n = len(rec.seq)
        gop = gop_cache.get(n)
        if gop is None:
            gop = gop_cache[n] = np.full(n, 45, np.uint8)
            gcp_cache[n] = np.full(n, default_gcp, np.uint8)
        out.append(
            ReadData(
                read_bases=rec.seq,
                read_quals=q,
                insertion_gop=gop,
                deletion_gop=gop,
                overall_gcp=gcp_cache[n],
            )
        )
    return out


def pairhmm_stream(
    bam_path: str,
    haplotypes: Sequence[HaplotypeData],
    *,
    chunk_reads: int = 1024,
    limit: int | None = None,
    include_filtered: bool = False,
    hmm: PairHMM | None = None,
    threads: int | None = None,
    prefetch: int = 3,
) -> Iterator[ChunkResult]:
    """Stream a BAM through the PairHMM engine against ``haplotypes``.

    Yields one ChunkResult per ``chunk_reads`` reads.  Secondary /
    supplementary / unmapped reads are skipped unless ``include_filtered``
    (GATK's HaplotypeCaller read filters, approximated).

    Three overlapped stages: a producer thread decodes/filters records
    (bounded ``prefetch``-chunk queue), the main thread packs and
    async-dispatches each chunk, and results resolve TWO chunks behind
    the dispatch (chunk N dispatches while N-1 computes and N-2 reads
    back) so the device is never idle waiting on host work.
    """
    hmm = hmm or PairHMM(PairHMMNativeArguments())
    haplotypes = list(haplotypes)
    from . import profiling

    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, prefetch))
    # Set when the consumer abandons the generator (break / exception /
    # GC): the producer's puts poll it so the thread — and the open BAM
    # handle inside its record iterator — cannot leak blocked on a full
    # queue.
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue_mod.Full:
                continue
        return False

    def producer():
        try:
            # incremental BGZF decode + record parse: host memory stays
            # bounded by one read window regardless of BAM size
            _, record_iter = bam_mod.read_bam_streaming(
                bam_path, limit=limit, threads=threads)
            batch: list[bam_mod.BamRecord] = []
            for rec in record_iter:
                if not include_filtered and rec.flag & (
                    bam_mod.FLAG_UNMAPPED
                    | bam_mod.FLAG_SECONDARY
                    | bam_mod.FLAG_SUPPLEMENTARY
                ):
                    continue
                if len(rec.seq) == 0:
                    # '*'-sequence records can never go through PairHMM
                    # (ReadData rejects empty bases) — skipped even under
                    # include_filtered
                    continue
                batch.append(rec)
                if len(batch) >= chunk_reads:
                    if not _put(("chunk", batch)):
                        return
                    batch = []
            if batch and not _put(("chunk", batch)):
                return
            _put(("done", None))
        except BaseException as e:  # noqa: BLE001 — relayed to the consumer
            _put(("error", e))

    threading.Thread(target=producer, daemon=True).start()

    metrics_on = profiling.metrics_enabled()
    nh = len(haplotypes)
    pending: collections.deque = collections.deque()

    def resolve(entry) -> ChunkResult:
        names, nr, handle = entry
        t0 = time.perf_counter() if metrics_on else 0.0
        res = ChunkResult(names, np.asarray(handle.result()).reshape(nr, nh))
        if metrics_on:
            profiling.METRICS.record("pipeline_resolve", items=nr,
                                     seconds=time.perf_counter() - t0)
        return res

    try:
        while True:
            t0 = time.perf_counter() if metrics_on else 0.0
            kind, payload = q.get()
            if metrics_on:
                profiling.METRICS.record("pipeline_wait", items=1,
                                         seconds=time.perf_counter() - t0)
            if kind == "error":
                raise payload
            if kind == "done":
                break
            records = payload
            t0 = time.perf_counter() if metrics_on else 0.0
            reads = reads_from_records(records)
            handle = hmm.compute_likelihoods_async(reads, haplotypes)
            if metrics_on:
                profiling.METRICS.record("pipeline_dispatch",
                                         items=len(reads),
                                         seconds=time.perf_counter() - t0)
            pending.append(([r.name for r in records], len(reads), handle))
            # resolve two chunks behind: chunk N dispatches while N-1's
            # upload/compute and N-2's result readback are both still in
            # flight — one-behind left the head blocked on the previous
            # chunk's full round trip (the link is latency-, not
            # bandwidth-dominated at these sizes)
            while len(pending) > 2:
                yield resolve(pending.popleft())
        while pending:
            yield resolve(pending.popleft())
    finally:
        stop.set()


def sw_align_stream(
    bam_path: str,
    reference: np.ndarray | bytes,
    parameters=None,
    strategy=None,
    *,
    chunk_reads: int = 512,
    limit: int | None = None,
    threads: int | None = None,
):
    """Stream a BAM's reads through the Smith-Waterman engine against a
    reference window, yielding (read_names, [SWAlignerResult]) per chunk —
    the GATK assembly-region realignment pattern (reads re-aligned to an
    assembled haplotype/reference via IntelSmithWaterman)."""
    from .api_sw import OverhangStrategy, SmithWaterman, SWParameters

    parameters = parameters or SWParameters(200, -150, -260, -11)
    strategy = OverhangStrategy.SOFTCLIP if strategy is None else strategy
    if isinstance(reference, (bytes, bytearray)):
        reference = np.frombuffer(bytes(reference), np.uint8)
    sw = SmithWaterman()

    _, record_iter = bam_mod.read_bam_streaming(bam_path, limit=limit,
                                                threads=threads)

    batch: list[bam_mod.BamRecord] = []
    for rec in record_iter:
        if rec.flag & (bam_mod.FLAG_UNMAPPED | bam_mod.FLAG_SECONDARY
                       | bam_mod.FLAG_SUPPLEMENTARY) or len(rec.seq) == 0:
            continue
        batch.append(rec)
        if len(batch) >= chunk_reads:
            res = sw.align_batch([reference] * len(batch),
                                 [r.seq for r in batch], parameters, strategy)
            yield [r.name for r in batch], res
            batch = []
    if batch:
        res = sw.align_batch([reference] * len(batch),
                             [r.seq for r in batch], parameters, strategy)
        yield [r.name for r in batch], res


def bam_recompress(src_path: str, dst_path: str, *, level: int = 6,
                   threads: int | None = None, limit: int | None = None,
                   window_blocks: int = 64) -> int:
    """Stream a BAM through decode → re-encode → parallel BGZF deflate.

    Record-level round trip in bounded memory: the read side inflates
    incrementally (``read_bam_streaming``) while the write side batches
    encoded records into maximal BGZF blocks for the native deflate pool
    (``write_bam_streaming``) — the DeflaterIntegrationTest loop
    (write the BAM through the accelerated deflater at a chosen level,
    then assert record equality on re-read) as a pipeline stage.  Records
    are read with ``keep_raw=True`` and re-emitted byte-verbatim, so tags,
    mate info, and bin all survive the recompress.  Returns the record
    count.
    """
    header, records = bam_mod.read_bam_streaming(src_path, limit=limit,
                                                 threads=threads,
                                                 keep_raw=True)
    return bam_mod.write_bam_streaming(dst_path, header, records,
                                       level=level, threads=threads,
                                       window_blocks=window_blocks)


def pairhmm_bam(bam_path: str, haplotypes: Sequence[HaplotypeData],
                **kw) -> ChunkResult:
    """Non-streaming convenience: whole BAM → one concatenated result."""
    names: list[str] = []
    liks: list[np.ndarray] = []
    for chunk in pairhmm_stream(bam_path, haplotypes, **kw):
        names.extend(chunk.read_names)
        liks.append(chunk.likelihoods)
    return ChunkResult(names, np.concatenate(liks, axis=0) if liks else np.zeros((0, len(haplotypes))))

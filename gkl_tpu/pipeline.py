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


@dataclasses.dataclass
class RegionChunkResult:
    """One chunk of the composed HaplotypeCaller-shaped region pipeline."""

    read_names: list[str]
    likelihoods: np.ndarray        # (n_reads, n_haps) PairHMM log10
    best_haplotype: np.ndarray     # (n_reads,) argmax over haplotypes
    cigars: list[str]              # SW realignment of read vs its best hap
    offsets: np.ndarray            # (n_reads,) SW alignment offsets
    pd_likelihoods: np.ndarray | None  # (n_reads, n_pd_haps) PDHMM log10


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


def _chunk_producer(bam_path: str, *, chunk_reads: int, limit: int | None,
                    include_filtered: bool, threads: int | None,
                    prefetch: int):
    """Start the shared producer thread: decodes/filters BGZF records into
    ``chunk_reads``-sized batches on a bounded queue.  Returns (queue,
    stop_event); the consumer MUST set the event when abandoning the
    stream so the thread — and the open BAM handle inside its record
    iterator — cannot leak blocked on a full queue."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, prefetch))
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
    return q, stop


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

    q, stop = _chunk_producer(bam_path, chunk_reads=chunk_reads, limit=limit,
                              include_filtered=include_filtered,
                              threads=threads, prefetch=prefetch)

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


def region_stream(
    bam_path: str,
    haplotypes: Sequence[HaplotypeData],
    *,
    pd_haplotypes: Sequence | None = None,
    sw_parameters=None,
    sw_strategy=None,
    chunk_reads: int = 1024,
    limit: int | None = None,
    include_filtered: bool = False,
    hmm: PairHMM | None = None,
    sw=None,
    pdhmm=None,
    threads: int | None = None,
    prefetch: int = 3,
) -> Iterator[RegionChunkResult]:
    """The composed HaplotypeCaller-shaped region pipeline: ONE BAM stream
    drives all three kernels the way GATK's active-region flow does
    (scripts/gatkIntegration.sh:26-31 exercises exactly this path in the
    reference's consumer):

    1. PairHMM scores every read against every assembled haplotype
       (async-dispatched, resolved two chunks behind — the device computes
       chunk N while N+1 decodes/packs);
    2. each read is SW-realigned against its best-scoring haplotype
       (AlignmentUtils.createReadAlignedToRef's realignment step), giving
       CIGAR + offset;
    3. optionally, PDHMM re-scores reads against partially-determined
       haplotypes (the DRAGEN-GATK pdhmm mode).

    Yields one RegionChunkResult per chunk.
    """
    from .api_sw import OverhangStrategy, SmithWaterman, SWParameters

    hmm = hmm or PairHMM(PairHMMNativeArguments())
    sw = sw or SmithWaterman()
    haplotypes = list(haplotypes)
    hap_seqs = [np.asarray(h.haplotype_bases, np.uint8) for h in haplotypes]
    sw_parameters = sw_parameters or SWParameters(200, -150, -260, -11)
    sw_strategy = (OverhangStrategy.SOFTCLIP if sw_strategy is None
                   else sw_strategy)
    if pd_haplotypes is not None:
        from .api_pdhmm import PDHMM

        pd_haplotypes = list(pd_haplotypes)
        pdhmm = pdhmm or PDHMM()
    from . import profiling

    q, stop = _chunk_producer(bam_path, chunk_reads=chunk_reads, limit=limit,
                              include_filtered=include_filtered,
                              threads=threads, prefetch=prefetch)

    metrics_on = profiling.metrics_enabled()
    nh = len(haplotypes)
    pending: collections.deque = collections.deque()

    def resolve(entry) -> RegionChunkResult:
        records, reads, handle = entry
        t0 = time.perf_counter() if metrics_on else 0.0
        lik = np.asarray(handle.result()).reshape(len(reads), nh)
        if metrics_on:
            profiling.METRICS.record("pipeline_resolve", items=len(reads),
                                     seconds=time.perf_counter() - t0)
        # SW realignment: each read against its argmax haplotype
        t0 = time.perf_counter() if metrics_on else 0.0
        best = np.argmax(lik, axis=1)
        refs = [hap_seqs[b] for b in best]
        alts = [r.read_bases for r in reads]
        aligned = sw.align_batch(refs, alts, sw_parameters, sw_strategy)
        if metrics_on:
            profiling.METRICS.record("pipeline_sw", items=len(reads),
                                     seconds=time.perf_counter() - t0)
        pd_lik = None
        if pd_haplotypes is not None:
            t0 = time.perf_counter() if metrics_on else 0.0
            pd_lik = np.asarray(
                pdhmm.compute_likelihoods(reads, pd_haplotypes)
            ).reshape(len(reads), len(pd_haplotypes))
            if metrics_on:
                profiling.METRICS.record("pipeline_pdhmm", items=len(reads),
                                         seconds=time.perf_counter() - t0)
        return RegionChunkResult(
            read_names=[r.name for r in records],
            likelihoods=lik,
            best_haplotype=best,
            cigars=[a.cigar for a in aligned],
            offsets=np.asarray([a.alignment_offset for a in aligned]),
            pd_likelihoods=pd_lik,
        )

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
            pending.append((records, reads, handle))
            while len(pending) > 2:
                yield resolve(pending.popleft())
        while pending:
            yield resolve(pending.popleft())
    finally:
        stop.set()


def region_bam(bam_path: str, haplotypes: Sequence[HaplotypeData],
               **kw) -> RegionChunkResult:
    """Non-streaming convenience: whole BAM → one concatenated region result."""
    names: list[str] = []
    liks: list[np.ndarray] = []
    bests: list[np.ndarray] = []
    cigars: list[str] = []
    offs: list[np.ndarray] = []
    pd_liks: list[np.ndarray] = []
    for chunk in region_stream(bam_path, haplotypes, **kw):
        names.extend(chunk.read_names)
        liks.append(chunk.likelihoods)
        bests.append(chunk.best_haplotype)
        cigars.extend(chunk.cigars)
        offs.append(chunk.offsets)
        if chunk.pd_likelihoods is not None:
            pd_liks.append(chunk.pd_likelihoods)
    nh = len(haplotypes)
    return RegionChunkResult(
        read_names=names,
        likelihoods=(np.concatenate(liks, axis=0) if liks
                     else np.zeros((0, nh))),
        best_haplotype=(np.concatenate(bests) if bests
                        else np.zeros((0,), np.int64)),
        cigars=cigars,
        offsets=np.concatenate(offs) if offs else np.zeros((0,), np.int64),
        pd_likelihoods=(np.concatenate(pd_liks, axis=0) if pd_liks else None),
    )


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

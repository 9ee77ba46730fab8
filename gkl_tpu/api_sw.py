"""Smith-Waterman public API — parity with IntelSmithWaterman
(smithwaterman/IntelSmithWaterman.java:44-191).

``align`` validates like the Java layer (null/empty, MAX_SW_SEQUENCE_LENGTH
= 32767, MAXIMUM_SW_MATCH_VALUE = 65536) and returns (cigar, offset).  The
engine splits work TPU-natively: the O(n*m) score/backtrack DP runs
lane-batched on device (ops/sw.py), while the O(n+m) maximum selection and
CIGAR walk run in the native C++ runtime (native/sw_runtime.cc), with a
pure-Python fallback.  Pairs longer than the device bucket ceiling use the
native scalar aligner (full 32k range, like the reference's dynamically
grown matrices, PairWiseSW.h:462-472).
"""

from __future__ import annotations

import ctypes
import dataclasses
import enum
from typing import Sequence

import numpy as np

from . import batch as batch_mod
from . import native_lib
from .ops import sw as sw_ops
from .ops import sw_ref

MAX_SW_SEQUENCE_LENGTH = 32 * 1024 - 1
MAXIMUM_SW_MATCH_VALUE = 64 * 1024
# shape-bucket cap per align_batch call: heterogeneous batches merge down
# to this many (N, M) device dispatches (see the merge in align_batch)
_SW_MAX_SHAPE_GROUPS = 4
# jnp-engine ceiling (non-TPU backends): beyond this the unpacked (P, N, M)
# code tensor stops being a sensible resident; the Pallas path instead
# streams the reference axis and is bounded only by sw_pallas_fits (alt
# axis in VMEM) and the backtrack HBM budget below
DEVICE_MAX_LEN = 2048
# device->host backtrack tensor budget per kernel call: lanes * N/2 * M_pad
# bytes; groups exceeding it split into lane chunks, and buckets that blow
# it even at the minimum lane padding fall back to the threaded scalar path
SW_BT_BUDGET = 1 << 30
# host-memory budget for the threaded scalar pool: each worker holds one
# n*m-byte backtrack vector, so concurrency clamps to BUDGET / max(n*m)
SW_SCALAR_POOL_BUDGET = 2 << 30


class OverhangStrategy(enum.IntEnum):
    SOFTCLIP = 9
    INDEL = 10
    LEADING_INDEL = 11
    IGNORE = 12


@dataclasses.dataclass
class SWParameters:
    match_value: int
    mismatch_penalty: int
    gap_open_penalty: int
    gap_extend_penalty: int


@dataclasses.dataclass
class SWAlignerResult:
    cigar: str
    alignment_offset: int


def _as_seq(x) -> np.ndarray:
    if isinstance(x, (bytes, bytearray, str)):
        if isinstance(x, str):
            x = x.encode("ascii")
        return np.frombuffer(bytes(x), dtype=np.uint8)
    return np.asarray(x).astype(np.uint8)


class SmithWaterman:
    def __init__(self, *, lane_multiple: int | None = None, mesh=None,
                 threads: int | None = None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis; the
        score/backtrack DP shards lane-wise across it and each host fetches
        only its backtrack shard for the CIGAR walk.  ``threads`` caps the
        native scalar-aligner pool (default: GKL_TPU_THREADS env or all
        cores — the reference's OpenMP worker clamp)."""
        self._lane_multiple = lane_multiple
        self.mesh = mesh
        if threads is not None and threads < 1:
            raise ValueError("threads must be >= 1")
        self._threads = threads
        if mesh is not None and lane_multiple is None:
            # per-shard lanes must fill the Pallas lane block on TPU
            self._lane_multiple = (128 if self._use_pallas(8, 8, 128) else 8) * mesh.size
        self._native = native_lib.load("gkl_sw_runtime")
        if self._native is not None:
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i32p = ctypes.POINTER(ctypes.c_int32)
            self._native.sw_postprocess.restype = ctypes.c_int
            self._native.sw_postprocess.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, i32p, i32p, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int, i32p, i32p,
            ]
            self._native.sw_postprocess_packed.restype = ctypes.c_int
            self._native.sw_postprocess_packed.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_long, i32p, i32p,
                ctypes.c_int, ctypes.c_char_p, ctypes.c_int, i32p, i32p,
            ]
            self._native.sw_align_scalar.restype = ctypes.c_int
            self._native.sw_align_scalar.argtypes = [
                u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
                ctypes.c_int, i32p, i32p,
            ]
            i64p = ctypes.POINTER(ctypes.c_int64)
            self._native.sw_align_scalar_batch.restype = None
            self._native.sw_align_scalar_batch.argtypes = [
                u8p, i64p, i32p, u8p, i64p, i32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
                i32p, i32p, ctypes.c_int,
            ]

    def close(self) -> None:
        pass

    @staticmethod
    def _pallas_possible() -> bool:
        import os

        from . import utils

        return utils.is_tpu_available() and os.environ.get("GKL_TPU_PALLAS") != "0"

    @classmethod
    def _use_pallas(cls, N: int, M: int, P: int) -> bool:
        from .ops import sw_pallas

        return (
            cls._pallas_possible()
            and P % 128 == 0
            and M % 2 == 0
            and sw_pallas.sw_pallas_fits(N, M)
        )

    def _device_eligible(self, rlen: int, alen: int) -> bool:
        """Device coverage: the Pallas kernel streams the reference axis, so
        N extends to the full 32767 range as long as the alt axis fits VMEM
        (sw_pallas_fits) and the backtrack tensor fits the HBM budget at
        the minimum 128-lane batch — the TPU analogue of the reference's
        on-demand matrix growth (PairWiseSW.h:454-501).  Non-TPU backends
        keep the jnp engine's DEVICE_MAX_LEN ceiling."""
        # the Pallas rules below only apply when the lane padding the
        # dispatch will use actually satisfies the kernel's lane-block
        # constraint (a custom lane_multiple can break P % 128)
        lm = self._lane_multiple or batch_mod.default_lane_multiple()
        if self.mesh is not None:
            lane_ok = lm % (128 * self.mesh.size) == 0
        else:
            lane_ok = lm % 128 == 0
        if not (self._pallas_possible() and lane_ok):
            return max(rlen, alen) <= DEVICE_MAX_LEN
        from .ops import sw_pallas

        # evaluate the SAME segment-rounded N the dispatch groups by (a
        # plain bucket_length here would under-estimate the dispatched
        # backtrack tensor for relay-length references)
        N = batch_mod.bucket_length(rlen)
        if N > sw_pallas.SW_RELAY_SEG:
            seg = sw_pallas.SW_RELAY_SEG
            N = ((rlen + seg - 1) // seg) * seg
        M = batch_mod.bucket_length(alen)
        return (
            sw_pallas.sw_pallas_fits(N, M)
            and lm * (N // 2) * sw_pallas._pad_m(M) <= SW_BT_BUDGET
        )

    # ------------------------------------------------------------------
    def align(self, ref, alt, parameters: SWParameters, strategy) -> SWAlignerResult:
        return self.align_batch([ref], [alt], parameters, strategy)[0]

    def align_batch(
        self, refs: Sequence, alts: Sequence, parameters: SWParameters, strategy
    ) -> list[SWAlignerResult]:
        if parameters is None:
            raise TypeError("Parameter structure is null.")
        if strategy is None:
            raise TypeError("OverhangStrategy is null.")
        strategy = OverhangStrategy(strategy)
        refs = [_as_seq(r) for r in refs]
        alts = [_as_seq(a) for a in alts]
        for r, a in zip(refs, alts):
            if r is None or a is None:
                raise TypeError("Sequence is null.")
            if len(r) <= 0 or len(a) <= 0:
                raise ValueError("Cannot align empty sequences")
            if len(r) > MAX_SW_SEQUENCE_LENGTH or len(a) > MAX_SW_SEQUENCE_LENGTH:
                raise ValueError(
                    f"Sequences exceed maximum length of {MAX_SW_SEQUENCE_LENGTH} bytes"
                )
        if parameters.match_value > MAXIMUM_SW_MATCH_VALUE:
            raise ValueError(
                f"Match value parameter exceeds maximum value of {MAXIMUM_SW_MATCH_VALUE}"
            )

        import time as _time

        from . import profiling

        t0 = _time.perf_counter() if profiling.metrics_enabled() else 0.0

        out: list[SWAlignerResult | None] = [None] * len(refs)

        device_idx = [
            k for k in range(len(refs)) if self._device_eligible(len(refs[k]), len(alts[k]))
        ]
        dev_set = set(device_idx)
        scalar_idx = [k for k in range(len(refs)) if k not in dev_set]

        # group device pairs by shape bucket, then split groups whose
        # backtrack tensor would exceed the HBM budget into lane chunks.
        # Beyond one segment the Pallas path relays 2048-row segments with
        # carried state — ONE compiled shape per alt bucket covers every
        # reference length, so long refs bucket to segment multiples.
        from .ops import sw_pallas

        pallas_on = self._pallas_possible()

        def n_bucket(rlen: int) -> int:
            b = batch_mod.bucket_length(rlen)
            if pallas_on and b > sw_pallas.SW_RELAY_SEG:
                seg = sw_pallas.SW_RELAY_SEG
                return ((rlen + seg - 1) // seg) * seg
            return b

        groups: dict[tuple[int, int], list[int]] = {}
        for k in device_idx:
            key = (n_bucket(len(refs[k])), batch_mod.bucket_length(len(alts[k])))
            groups.setdefault(key, []).append(k)

        # Dispatch-latency-aware bucket merging: a heterogeneous batch
        # (mixed read/haplotype lengths, the HaplotypeCaller region shape)
        # can shatter into dozens of (N, M) shape buckets, and each bucket
        # is a separate device dispatch — on a remote-TPU link one
        # dispatch costs ~25-120 ms while the EXTRA padded compute from
        # merging two buckets is single-digit ms at device rates.  Greedy
        # pairwise merge (always the pair whose padded-cell increase is
        # smallest) down to a handful of buckets; per-lane reflen/altlen
        # keep results exact under any padding.
        if len(groups) > _SW_MAX_SHAPE_GROUPS:
            items = sorted(groups.items())
            while len(items) > _SW_MAX_SHAPE_GROUPS:
                best_i, best_extra = 0, None
                for i in range(len(items) - 1):
                    (n1, m1), i1 = items[i]
                    (n2, m2), i2 = items[i + 1]
                    nm, mm = max(n1, n2), max(m1, m2)
                    extra = (nm * mm * (len(i1) + len(i2))
                             - n1 * m1 * len(i1) - n2 * m2 * len(i2))
                    if best_extra is None or extra < best_extra:
                        best_i, best_extra = i, extra
                (n1, m1), i1 = items[best_i]
                (n2, m2), i2 = items[best_i + 1]
                items[best_i : best_i + 2] = [
                    ((max(n1, n2), max(m1, m2)), i1 + i2)]
            groups = {}
            for key, idxs in items:  # same-shape merges may collide: join
                groups.setdefault(key, []).extend(idxs)

        chunked: list[tuple[tuple[int, int], list[int]]] = []
        lm = self._lane_multiple or batch_mod.default_lane_multiple()
        for (N, M), idxs in groups.items():
            per_lane = (N // 2) * sw_pallas._pad_m(M)
            # budget in LANE-PADDING units: bucket_lanes re-pads each chunk
            # up to lane_multiple, so chunking in 128-lane units would
            # overrun SW_BT_BUDGET by up to lane_multiple/128 x
            max_lanes = max(lm, (SW_BT_BUDGET // max(1, per_lane)) // lm * lm)
            for s0 in range(0, len(idxs), max_lanes):
                chunked.append(((N, M), idxs[s0 : s0 + max_lanes]))

        for (N, M), idxs in chunked:
            P = batch_mod.bucket_lanes(len(idxs), self._lane_multiple or batch_mod.default_lane_multiple())
            ref_a = np.zeros((N, P), np.uint8)
            alt_a = np.zeros((M, P), np.uint8)
            # distinct pad bases so padded tails never "match"
            alt_a[:] = 1
            reflen = np.ones(P, np.int32)
            altlen = np.ones(P, np.int32)
            for c, k in enumerate(idxs):
                ref_a[: len(refs[k]), c] = refs[k]
                alt_a[: len(alts[k]), c] = alts[k]
                reflen[c] = len(refs[k])
                altlen[c] = len(alts[k])

            indel_boundary = strategy in (OverhangStrategy.INDEL, OverhangStrategy.LEADING_INDEL)
            if self.mesh is not None:
                from . import parallel

                with self.mesh:
                    pal_mesh = P % (128 * self.mesh.size) == 0
                    if (pal_mesh and N > sw_pallas.SW_RELAY_SEG
                            and self._use_pallas(sw_pallas.SW_RELAY_SEG, M, P)):
                        bt, lastrow, lastcol = parallel.sw_forward_pallas_relay_sharded(
                            self.mesh, ref_a, alt_a, reflen, altlen, parameters,
                            indel_boundary=indel_boundary,
                        )
                        bt = np.ascontiguousarray(np.asarray(bt))
                    elif pal_mesh and self._use_pallas(N, M, P):
                        # mesh path keeps the Pallas fast path: each shard
                        # runs the same kernel on its lanes (shard_map)
                        bt, lastrow, lastcol = parallel.sw_forward_pallas_sharded(
                            self.mesh, ref_a, alt_a, reflen, altlen, parameters,
                            indel_boundary=indel_boundary,
                        )
                        bt = np.ascontiguousarray(np.asarray(bt))
                    else:
                        bt, lastrow, lastcol = parallel.sw_forward_sharded(
                            self.mesh, ref_a, alt_a, reflen, altlen, parameters,
                            indel_boundary=indel_boundary,
                        )
                        # unsharded path below packs 2 codes/byte along rows;
                        # the sharded jnp engine returns unpacked codes —
                        # pack on host
                        bt = np.ascontiguousarray(np.asarray(bt))
                        bt = bt[:, 0::2, :] | (bt[:, 1::2, :] << 4)
            elif N > sw_pallas.SW_RELAY_SEG and self._use_pallas(
                    sw_pallas.SW_RELAY_SEG, M, P):
                bt, lastrow, lastcol = sw_pallas.sw_forward_pallas_relay(
                    ref_a, alt_a, reflen, altlen,
                    parameters.match_value,
                    parameters.mismatch_penalty,
                    parameters.gap_open_penalty,
                    parameters.gap_extend_penalty,
                    indel_boundary=indel_boundary,
                )
            elif self._use_pallas(N, M, P):
                bt, lastrow, lastcol = sw_pallas.sw_forward_pallas(
                    ref_a, alt_a, reflen, altlen,
                    parameters.match_value,
                    parameters.mismatch_penalty,
                    parameters.gap_open_penalty,
                    parameters.gap_extend_penalty,
                    indel_boundary=indel_boundary,
                )
            else:
                bt, lastrow, lastcol = sw_ops.sw_forward(
                    ref_a,
                    alt_a,
                    reflen,
                    altlen,
                    parameters.match_value,
                    parameters.mismatch_penalty,
                    parameters.gap_open_penalty,
                    parameters.gap_extend_penalty,
                    indel_boundary=indel_boundary,
                    pack_bt=True,  # halves the O(N*M) device->host transfer
                )
            bt = np.ascontiguousarray(np.asarray(bt))  # (P, N//2, M) row-packed
            lastrow = np.asarray(lastrow).astype(np.int32, copy=False)
            lastcol = np.ascontiguousarray(np.asarray(lastcol)).astype(np.int32, copy=False)

            for c, k in enumerate(idxs):
                n, m = int(reflen[c]), int(altlen[c])
                out[k] = self._postprocess(
                    bt[c], n, m, bt.shape[2],  # stride may exceed M (pow2 pad)
                    np.ascontiguousarray(lastrow[:, c]), lastcol[c], strategy
                )

        if scalar_idx:
            for k, r in zip(scalar_idx,
                            self._align_scalar_batch(
                                [refs[k] for k in scalar_idx],
                                [alts[k] for k in scalar_idx],
                                parameters, strategy)):
                out[k] = r

        if profiling.metrics_enabled():
            cells = sum(len(r) * len(a) for r, a in zip(refs, alts))
            profiling.METRICS.record(
                "smithwaterman", items=len(refs), cells=cells,
                seconds=_time.perf_counter() - t0,
            )

        return out  # type: ignore[return-value]

    # ------------------------------------------------------------------
    def _postprocess(self, bt_packed, n, m, stride, lastrow, lastcol, strategy) -> SWAlignerResult:
        """``bt_packed`` is the lane's (N//2, stride) row-pair-packed
        backtrack (rows 2k/2k+1 in the low/high nibble)."""
        if self._native is not None:
            cap = 2 * (n + m) + 16  # worst case: 2 chars per length-1 run
            buf = ctypes.create_string_buffer(cap)
            offset = ctypes.c_int32()
            score = ctypes.c_int32()
            if not bt_packed.flags["C_CONTIGUOUS"]:
                bt_packed = np.ascontiguousarray(bt_packed)
            self._native.sw_postprocess_packed(
                bt_packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int(n),
                ctypes.c_int(m),
                ctypes.c_long(stride),
                lastrow[:m].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                lastcol[:n].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int(int(strategy)),
                buf,
                ctypes.c_int(cap),
                ctypes.byref(offset),
                ctypes.byref(score),
            )
            return SWAlignerResult(buf.value.decode("ascii"), int(offset.value))
        # Python fallback: unpack row nibbles, then walk
        nrows_packed = (n + 1) // 2
        rows = bt_packed[:nrows_packed]
        codes = np.empty((2 * nrows_packed, stride), np.uint8)
        codes[0::2] = rows & 0xF
        codes[1::2] = rows >> 4
        _, max_i, max_j = sw_ref.select_max(lastrow[:m], lastcol[:n], n, m, int(strategy))
        bt1 = np.zeros((n + 1, m + 1), np.uint8)
        bt1[1:, 1:] = codes[:n, :m]
        cigar, offset = sw_ref.cigar_from_btrack(bt1, n, m, max_i, max_j, int(strategy))
        return SWAlignerResult(cigar, offset)

    def _align_scalar_batch(self, refs, alts, p: SWParameters,
                            strategy) -> list[SWAlignerResult]:
        """Beyond-device pairs through the native thread pool (the
        reference's OpenMP-over-pairs analogue); Python fallback is serial."""
        if self._native is None or len(refs) == 1:
            return [self._align_scalar(r, a, p, strategy) for r, a in zip(refs, alts)]
        from . import utils

        pool = self._threads or utils.default_host_threads()
        # each worker holds an n*m-byte backtrack vector (sw_runtime.cc):
        # clamp concurrency so peak host memory stays bounded (near the
        # 32767^2 validation limit one vector is ~1 GiB; an unclamped
        # 16-thread pool would allocate ~17 GiB at once)
        max_pair_bytes = max(len(r) * len(a) for r, a in zip(refs, alts))
        mem_cap = max(1, SW_SCALAR_POOL_BUDGET // max(1, max_pair_bytes))
        pool = max(1, min(pool, mem_cap))

        n = len(refs)
        ref_buf = np.concatenate([np.ascontiguousarray(r) for r in refs])
        alt_buf = np.concatenate([np.ascontiguousarray(a) for a in alts])
        ref_len = np.array([len(r) for r in refs], np.int32)
        alt_len = np.array([len(a) for a in alts], np.int32)
        ref_off = np.zeros(n, np.int64)
        alt_off = np.zeros(n, np.int64)
        np.cumsum(ref_len[:-1], out=ref_off[1:])
        np.cumsum(alt_len[:-1], out=alt_off[1:])
        stride = int(2 * (ref_len.max() + alt_len.max()) + 16)  # worst-case CIGAR
        cigars = ctypes.create_string_buffer(n * stride)
        offsets = np.zeros(n, np.int32)
        scores = np.zeros(n, np.int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        self._native.sw_align_scalar_batch(
            ref_buf.ctypes.data_as(u8p), ref_off.ctypes.data_as(i64p),
            ref_len.ctypes.data_as(i32p),
            alt_buf.ctypes.data_as(u8p), alt_off.ctypes.data_as(i64p),
            alt_len.ctypes.data_as(i32p),
            ctypes.c_int(n), ctypes.c_int(p.match_value),
            ctypes.c_int(p.mismatch_penalty), ctypes.c_int(p.gap_open_penalty),
            ctypes.c_int(p.gap_extend_penalty), ctypes.c_int(int(strategy)),
            cigars, ctypes.c_int64(stride),
            offsets.ctypes.data_as(i32p), scores.ctypes.data_as(i32p),
            ctypes.c_int(min(n, pool)),
        )
        res = []
        # string_at reads each lane's NUL-terminated CIGAR in place;
        # cigars.raw inside the loop would copy the whole n*stride buffer
        # once per pair (O(n^2 * stride) memcpy)
        base = ctypes.addressof(cigars)
        for k in range(n):
            cig = ctypes.string_at(base + k * stride)
            res.append(SWAlignerResult(cig.decode("ascii"), int(offsets[k])))
        return res

    def _align_scalar(self, ref, alt, p: SWParameters, strategy) -> SWAlignerResult:
        if self._native is not None:
            n, m = len(ref), len(alt)
            cap = 2 * (n + m) + 16
            buf = ctypes.create_string_buffer(cap)
            offset = ctypes.c_int32()
            score = ctypes.c_int32()
            ref_c = np.ascontiguousarray(ref)
            alt_c = np.ascontiguousarray(alt)
            self._native.sw_align_scalar(
                ref_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int(n),
                alt_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int(m),
                ctypes.c_int(p.match_value),
                ctypes.c_int(p.mismatch_penalty),
                ctypes.c_int(p.gap_open_penalty),
                ctypes.c_int(p.gap_extend_penalty),
                ctypes.c_int(int(strategy)),
                buf,
                ctypes.c_int(cap),
                ctypes.byref(offset),
                ctypes.byref(score),
            )
            return SWAlignerResult(buf.value.decode("ascii"), int(offset.value))
        r = sw_ref.sw_align(
            ref, alt, p.match_value, p.mismatch_penalty, p.gap_open_penalty,
            p.gap_extend_penalty, int(strategy),
        )
        return SWAlignerResult(r.cigar, r.offset)

"""Batch planning: padding/bucketing variable-length pairs into fixed shapes.

XLA compiles one program per static shape, so sequence lengths are padded to
a small ladder of buckets and lanes are padded to a lane-count bucket.  This
replaces the reference's per-pair dynamic allocation (PairWiseSW.h:462-468)
and PDHMM's memory-budgeted batch slicing (pdhmm/JavaData.h:83-97) with a
recompile-bounded scheme.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

# Length ladder: dense at small sizes, multiplicative afterwards.
_LEN_LADDER = [8, 16, 24, 32, 48, 64, 96, 128, 160, 192, 224, 256, 320, 384, 448, 512, 640, 768, 1024]


def bucket_length(n: int) -> int:
    """Smallest ladder value >= n (beyond the ladder: next multiple of 256)."""
    for b in _LEN_LADDER:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


def bucket_lanes(n: int, lane_multiple: int = 8) -> int:
    """Pad lane count to a multiple that keeps the VPU lane dim full."""
    return max(lane_multiple, ((n + lane_multiple - 1) // lane_multiple) * lane_multiple)


def default_lane_multiple() -> int:
    """128 on TPU (VPU lane width), 8 elsewhere (cheap for CPU tests)."""
    import jax

    return 128 if jax.default_backend() in ("tpu", "axon") else 8


@dataclasses.dataclass
class PackedPairs:
    """Column-major (length, lane) padded arrays for one shape bucket."""

    hap: np.ndarray  # (H, P) uint8
    read: np.ndarray  # (R, P) uint8
    q: np.ndarray  # (R, P) uint8
    iq: np.ndarray  # (R, P) uint8
    dq: np.ndarray  # (R, P) uint8
    gcp: np.ndarray  # (R, P) uint8
    haplen: np.ndarray  # (P,) int32
    rslen: np.ndarray  # (P,) int32
    n_real: int  # lanes [0, n_real) are real pairs


def _pad_columns(seqs: Sequence[np.ndarray], length: int, lanes: int, fill: int) -> np.ndarray:
    out = np.full((length, lanes), fill, dtype=np.uint8)
    n = len(seqs)
    if n and all(len(s) == len(seqs[0]) for s in seqs):
        # uniform-length fast path (the common streaming case: fixed-length
        # reads): one vectorized stack instead of a per-lane Python loop
        out[: len(seqs[0]), :n] = np.stack(seqs, axis=1)
        return out
    for k, s in enumerate(seqs):
        out[: len(s), k] = s
    return out


def pack_pairs(
    haps: Sequence[np.ndarray],
    reads: Sequence[np.ndarray],
    quals: Sequence[Sequence[np.ndarray]],
    lane_multiple: int | None = None,
    qual_fill: int = 40,
) -> PackedPairs:
    """Pack equal-bucket pairs into padded (len, lane) arrays.

    ``quals`` is a sequence of (q, iq, dq, gcp) per pair.  Padding quals use
    ``qual_fill`` (a benign mid-range phred) so padded rows neither overflow
    nor produce NaNs; padded rows/columns never contribute to results because
    per-lane lengths mask them.
    """
    if lane_multiple is None:
        lane_multiple = default_lane_multiple()
    n = len(haps)
    P = bucket_lanes(n, lane_multiple)
    H = bucket_length(max(len(h) for h in haps))
    R = bucket_length(max(len(r) for r in reads))

    hap = _pad_columns(haps, H, P, 0)
    read = _pad_columns(reads, R, P, 0)
    q = _pad_columns([qs[0] for qs in quals], R, P, qual_fill)
    iq = _pad_columns([qs[1] for qs in quals], R, P, qual_fill)
    dq = _pad_columns([qs[2] for qs in quals], R, P, qual_fill)
    gcp = _pad_columns([qs[3] for qs in quals], R, P, qual_fill)

    haplen = np.ones(P, np.int32)
    rslen = np.ones(P, np.int32)
    haplen[:n] = [len(h) for h in haps]
    rslen[:n] = [len(r) for r in reads]
    return PackedPairs(hap, read, q, iq, dq, gcp, haplen, rslen, n)


def group_by_bucket(haps: Sequence[np.ndarray], reads: Sequence[np.ndarray]):
    """Group pair indices by (R-bucket, H-bucket) shape class."""
    groups: dict[tuple[int, int], list[int]] = {}
    for k, (h, r) in enumerate(zip(haps, reads)):
        key = (bucket_length(len(r)), bucket_length(len(h)))
        groups.setdefault(key, []).append(k)
    return groups

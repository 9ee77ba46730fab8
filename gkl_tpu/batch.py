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

    def device_bytes(self) -> int:
        """Approximate device footprint while this batch is in flight:
        input planes plus the (3, P) f32 result stack."""
        P = self.hap.shape[1]
        return (self.hap.shape[0] + 5 * self.read.shape[0]) * P + 12 * P


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


@dataclasses.dataclass
class PackedPairsIndexed:
    """Cross-product batch with deduplicated planes + per-pair indices.

    The reference marshals each read and each haplotype ONCE and loops the
    cross product in the native kernel (pairhmm/JavaData.h:84-106 builds
    testcases as index pairs into the marshalled arrays).  The TPU-native
    analogue: upload unique (len, lane) planes plus two small int32 index
    vectors, and expand lanes on device with ``jnp.take`` — host→device
    bytes drop from ``(H + 5R)·nr·nh`` to ``5R·nr + H·nh``, which is what
    the (tunnel/PCIe) link actually charges for.  When every read shares
    constant insertion/deletion GOP and GCP planes (the GATK default-GOP
    flow), those three planes are synthesized on device and upload drops
    to ``2R·nr``.
    """

    hap_u: np.ndarray  # (H, nu_h) uint8 — unique haplotype columns
    readq_u: np.ndarray  # (2, R, nu_r) uint8 — [bases, quals] per unique read
    quals_u: np.ndarray | None  # (3, R, nu_r) uint8 [iq, dq, gcp]; None = const
    const_quals: tuple[int, int, int] | None  # (iq, dq, gcp) when constant
    ridx: np.ndarray  # (P,) int32 — pair lane -> unique read column
    hidx: np.ndarray  # (P,) int32 — pair lane -> unique hap column
    haplen: np.ndarray  # (P,) int32
    rslen: np.ndarray  # (P,) int32
    n_real: int
    # full-pattern mode: ridx == arange(P)//nh and hidx == arange(P)%nh for
    # EVERY lane (pads included) and the read planes pad to P//nh columns —
    # the property that lets a dp mesh shard unique reads and pair lanes
    # with the SAME cuts (each device's pairs reference only its own
    # reads).  None = compact padding (single-device layout).
    pattern_nh: int | None = None

    def device_bytes(self) -> int:
        """Approximate device footprint while this batch is in flight: the
        EXPANDED per-pair planes (the on-device ``jnp.take`` materializes
        them in HBM) plus the (3, P) f32 result stack."""
        P = self.ridx.shape[0]
        H = self.hap_u.shape[0]
        R = self.readq_u.shape[1]
        return (H + 5 * R) * P + 12 * P

    def materialize(self) -> PackedPairs:
        """Expand to the dense per-pair representation (host-side) — used by
        the f64 rescue and any engine that wants full planes."""
        hap = np.take(self.hap_u, self.hidx, axis=1)
        read = np.take(self.readq_u[0], self.ridx, axis=1)
        q = np.take(self.readq_u[1], self.ridx, axis=1)
        if self.const_quals is not None:
            iq = np.full_like(read, self.const_quals[0])
            dq = np.full_like(read, self.const_quals[1])
            gcp = np.full_like(read, self.const_quals[2])
        else:
            iq = np.take(self.quals_u[0], self.ridx, axis=1)
            dq = np.take(self.quals_u[1], self.ridx, axis=1)
            gcp = np.take(self.quals_u[2], self.ridx, axis=1)
        return PackedPairs(hap, read, q, iq, dq, gcp, self.haplen,
                           self.rslen, self.n_real)


def pack_pairs_indexed(
    haps: Sequence[np.ndarray],
    reads: Sequence[np.ndarray],
    read_quals: Sequence[tuple],
    *,
    lane_multiple: int | None = None,
    qual_fill: int = 40,
    const_quals: tuple[int, int, int] | None = None,
    full_pattern: bool = False,
) -> PackedPairsIndexed:
    """Pack the full ``reads`` × ``haps`` cross product (read-major) with
    deduplicated planes.  ``read_quals`` holds (q, iq, dq, gcp) per read —
    iq/dq/gcp are ignored when ``const_quals`` is given.  ``full_pattern``
    pads the read planes to P//nh columns so every lane (pads included)
    follows ridx = lane//nh, hidx = lane%nh — see PackedPairsIndexed."""
    if lane_multiple is None:
        lane_multiple = default_lane_multiple()
    nr, nh = len(reads), len(haps)
    H = bucket_length(max(len(h) for h in haps))
    R = bucket_length(max(len(r) for r in reads))
    # unique-plane lane padding only needs the sublane multiple (8); the
    # kernel sees the post-gather (R, P) arrays, which use lane_multiple
    nu_r = bucket_lanes(nr, 8)
    nu_h = bucket_lanes(nh, 8)
    if full_pattern:
        Pf = bucket_lanes(nr * nh, lane_multiple)
        if Pf % nh:
            raise ValueError("full_pattern needs nh | padded lane count")
        nu_r = Pf // nh

    readq_u = np.stack([
        _pad_columns(reads, R, nu_r, 0),
        _pad_columns([qs[0] for qs in read_quals], R, nu_r, qual_fill),
    ])
    quals_u = None
    if const_quals is None:
        quals_u = np.stack([
            _pad_columns([qs[1] for qs in read_quals], R, nu_r, qual_fill),
            _pad_columns([qs[2] for qs in read_quals], R, nu_r, qual_fill),
            _pad_columns([qs[3] for qs in read_quals], R, nu_r, qual_fill),
        ])
    hap_u = _pad_columns(haps, H, nu_h, 0)

    n = nr * nh
    P = bucket_lanes(n, lane_multiple)
    if full_pattern:
        ridx = (np.arange(P, dtype=np.int32) // nh)
        hidx = (np.arange(P, dtype=np.int32) % nh)
    else:
        ridx = np.zeros(P, np.int32)
        hidx = np.zeros(P, np.int32)
        ridx[:n] = np.repeat(np.arange(nr, dtype=np.int32), nh)
        hidx[:n] = np.tile(np.arange(nh, dtype=np.int32), nr)
    rlen = np.array([len(r) for r in reads], np.int32)
    hlen = np.array([len(h) for h in haps], np.int32)
    haplen = np.ones(P, np.int32)
    rslen = np.ones(P, np.int32)
    haplen[:n] = hlen[hidx[:n]]
    rslen[:n] = rlen[ridx[:n]]
    return PackedPairsIndexed(hap_u, readq_u, quals_u, const_quals,
                              ridx, hidx, haplen, rslen, n,
                              pattern_nh=nh if full_pattern else None)


@dataclasses.dataclass
class PackedPDHMMIndexed:
    """PDHMM batch with deduplicated planes + per-pair indices.

    Same link-budget design as PackedPairsIndexed: the object path
    (api_pdhmm.compute_likelihoods) appends the SAME array objects for
    every cross-product pair, so unique haplotype planes (bases, PD bytes,
    derived column states) and unique read planes (bases + 4 quality
    planes) upload once and lanes expand ON DEVICE with ``jnp.take`` —
    host→device bytes drop from ``(3H + 5R)·n`` to ``3H·nu_h + 5R·nu_r``.
    """

    hap_u: np.ndarray  # (H, nu_h) uint8
    happd_u: np.ndarray  # (H, nu_h) uint8 — PD bytes
    states_u: np.ndarray  # (H, nu_h) — column_states(happd_u)
    readq_u: np.ndarray  # (5, R, nu_r) uint8 [bases, q, iq, dq, gcp]
    ridx: np.ndarray  # (P,) int32
    hidx: np.ndarray  # (P,) int32
    haplen: np.ndarray  # (P,) int32
    rslen: np.ndarray  # (P,) int32
    n_real: int


def pack_pdhmm_indexed(
    uhaps: Sequence[np.ndarray],
    uhap_pds: Sequence[np.ndarray],
    ureads: Sequence[np.ndarray],
    uread_quals: Sequence[tuple],
    ridx: Sequence[int],
    hidx: Sequence[int],
    *,
    lane_multiple: int | None = None,
    qual_fill: int = 40,
) -> PackedPDHMMIndexed:
    """Pack UNIQUE haplotype/read planes plus per-pair index vectors.

    ``ridx``/``hidx`` map each real pair lane to its unique read / hap
    column (identity dedup is the caller's job — the object path shares
    array objects across pairs, pdhmm/JavaData.h:186-236)."""
    from .ops import pdhmm as pdhmm_ops

    if lane_multiple is None:
        lane_multiple = default_lane_multiple()
    H = bucket_length(max(len(h) for h in uhaps))
    R = bucket_length(max(len(r) for r in ureads))
    nu_h = bucket_lanes(len(uhaps), 8)
    nu_r = bucket_lanes(len(ureads), 8)
    hap_u = _pad_columns(uhaps, H, nu_h, 0)
    happd_u = _pad_columns(uhap_pds, H, nu_h, 0)
    states_u = pdhmm_ops.column_states(happd_u)
    readq_u = np.stack([
        _pad_columns(ureads, R, nu_r, 0),
        _pad_columns([qs[0] for qs in uread_quals], R, nu_r, qual_fill),
        _pad_columns([qs[1] for qs in uread_quals], R, nu_r, qual_fill),
        _pad_columns([qs[2] for qs in uread_quals], R, nu_r, qual_fill),
        _pad_columns([qs[3] for qs in uread_quals], R, nu_r, qual_fill),
    ])
    n = len(ridx)
    P = bucket_lanes(n, lane_multiple)
    ridx_p = np.zeros(P, np.int32)
    hidx_p = np.zeros(P, np.int32)
    ridx_p[:n] = np.asarray(ridx, np.int32)
    hidx_p[:n] = np.asarray(hidx, np.int32)
    haplen = np.ones(P, np.int32)
    rslen = np.ones(P, np.int32)
    hlen = np.array([len(h) for h in uhaps], np.int32)
    rlen = np.array([len(r) for r in ureads], np.int32)
    haplen[:n] = hlen[hidx_p[:n]]
    rslen[:n] = rlen[ridx_p[:n]]
    return PackedPDHMMIndexed(hap_u, happd_u, states_u, readq_u,
                              ridx_p, hidx_p, haplen, rslen, n)


def group_by_bucket(haps: Sequence[np.ndarray], reads: Sequence[np.ndarray]):
    """Group pair indices by (R-bucket, H-bucket) shape class."""
    groups: dict[tuple[int, int], list[int]] = {}
    for k, (h, r) in enumerate(zip(haps, reads)):
        key = (bucket_length(len(r)), bucket_length(len(h)))
        groups.setdefault(key, []).append(k)
    return groups

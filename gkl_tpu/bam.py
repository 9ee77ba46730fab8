"""Minimal BAM container parser (SAM spec §4.2) for the streaming pipeline.

The reference ships a 1 MB BAM only as test data for its deflater
(``DeflaterIntegrationTest.java:27-99``, via htsjdk).  Here BAM decoding is a
first-class pipeline stage: BGZF blocks are inflated by the parallel native
codec (``compression/bgzf.py``) and alignment records are decoded into numpy
arrays ready for the batch planner — no JVM / htsjdk in the loop.

Only the fields the kernels need are decoded (name, flag, seq, qual, cigar,
position); tags are kept as raw bytes.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from .compression import bgzf

# 4-bit seq nibble -> ASCII base (SAM spec: =ACMGRSVTWYHKDBN)
SEQ_NIBBLE = np.frombuffer(b"=ACMGRSVTWYHKDBN", dtype=np.uint8)
CIGAR_OPS = "MIDNSHP=X"

FLAG_UNMAPPED = 0x4
FLAG_SECONDARY = 0x100
FLAG_SUPPLEMENTARY = 0x800


@dataclasses.dataclass
class BamHeader:
    text: str
    ref_names: list[str]
    ref_lengths: list[int]


@dataclasses.dataclass
class BamRecord:
    name: str
    flag: int
    ref_id: int
    pos: int  # 0-based leftmost coordinate
    mapq: int
    cigar: list[tuple[int, str]]  # (length, op)
    seq: np.ndarray  # uint8 ASCII bases
    qual: np.ndarray  # uint8 phred (no +33 offset)

    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & FLAG_UNMAPPED)

    def cigar_string(self) -> str:
        return "".join(f"{n}{op}" for n, op in self.cigar) or "*"


def parse_header(payload: bytes) -> tuple[BamHeader, int]:
    """Parse the BAM header; returns (header, offset of first record)."""
    if payload[:4] != b"BAM\x01":
        raise ValueError("not a BAM payload (missing BAM\\1 magic)")
    l_text = struct.unpack_from("<i", payload, 4)[0]
    text = payload[8 : 8 + l_text].rstrip(b"\x00").decode("utf-8", "replace")
    off = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", payload, off)
    off += 4
    names, lengths = [], []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", payload, off)
        off += 4
        names.append(payload[off : off + l_name - 1].decode("ascii"))
        off += l_name
        (l_ref,) = struct.unpack_from("<i", payload, off)
        off += 4
        lengths.append(l_ref)
    return BamHeader(text, names, lengths), off


def parse_records(payload: bytes, offset: int, limit: int | None = None):
    """Yield BamRecords from a decompressed BAM payload."""
    n = len(payload)
    count = 0
    u = struct.unpack_from
    while offset + 4 <= n:
        (block_size,) = u("<i", payload, offset)
        start = offset + 4
        offset = start + block_size
        if offset > n:
            raise ValueError("truncated BAM record")
        (ref_id, pos) = u("<ii", payload, start)
        l_read_name = payload[start + 8]
        mapq = payload[start + 9]
        (n_cigar_op, flag) = u("<HH", payload, start + 12)
        (l_seq,) = u("<i", payload, start + 16)
        p = start + 32
        name = payload[p : p + l_read_name - 1].decode("ascii")
        p += l_read_name
        cigar = []
        for k in range(n_cigar_op):
            (c,) = u("<I", payload, p + 4 * k)
            cigar.append((c >> 4, CIGAR_OPS[c & 0xF]))
        p += 4 * n_cigar_op
        n_packed = (l_seq + 1) // 2
        packed = np.frombuffer(payload, np.uint8, n_packed, p)
        nibbles = np.empty(n_packed * 2, np.uint8)
        nibbles[0::2] = packed >> 4
        nibbles[1::2] = packed & 0xF
        seq = SEQ_NIBBLE[nibbles[:l_seq]]
        p += n_packed
        qual = np.frombuffer(payload, np.uint8, l_seq, p).copy()
        yield BamRecord(name, flag, ref_id, pos, mapq, cigar, seq, qual)
        count += 1
        if limit is not None and count >= limit:
            return


def read_bam(path: str, limit: int | None = None, threads: int | None = None):
    """Read a BAM file: (header, list of records).

    BGZF inflation runs on the parallel native codec.
    """
    with open(path, "rb") as fh:
        data = fh.read()
    payload = bgzf.decompress(data, threads=threads)
    header, off = parse_header(payload)
    return header, list(parse_records(payload, off, limit=limit))

"""Minimal BAM container parser (SAM spec §4.2) for the streaming pipeline.

The reference ships a 1 MB BAM only as test data for its deflater
(``DeflaterIntegrationTest.java:27-99``, via htsjdk).  Here BAM decoding is a
first-class pipeline stage: BGZF blocks are inflated by the parallel native
codec (``compression/bgzf.py``) and alignment records are decoded into numpy
arrays ready for the batch planner — no JVM / htsjdk in the loop.

Only the fields the kernels need are decoded (name, flag, seq, qual, cigar,
position).  Readers invoked with ``keep_raw=True`` additionally retain each
record's original bytes, so rewrite paths (``pipeline.bam_recompress``)
preserve tags, mate info, and bin verbatim.
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
    # full original record bytes (4-byte size prefix + block), kept only
    # when the reader is asked to (keep_raw=True): preserves tags, mate
    # info, bin — everything the decoded fields above do not carry — so
    # rewrite paths (bam_recompress) are lossless
    raw: bytes | None = None

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
    if l_text < 0:
        raise ValueError("corrupt BAM header (negative l_text)")
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


def _native_bam():
    from . import native_lib

    lib = native_lib.load("gkl_bam")
    if lib is not None and not hasattr(lib, "_bam_ready"):
        import ctypes

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.gkl_bam_count.restype = ctypes.c_int
        lib.gkl_bam_count.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, i64p, i64p, i64p]
        lib.gkl_bam_scan.restype = ctypes.c_int64
        lib.gkl_bam_scan.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64,
                                     i32p, i32p, i32p, i32p, i32p,
                                     i64p, u8p, i64p, u8p,
                                     i64p, i32p, u8p, i64p, i32p]
        lib._bam_ready = True
    return lib


def parse_records_native(payload: bytes, offset: int, limit: int | None = None,
                         keep_raw: bool = False):
    """Native two-pass record scan (C++): decodes fixed fields, unpacks
    sequences, and copies quals into flat buffers in one pass — the
    data-loader stage of the pipeline.  Returns a list of BamRecords whose
    seq/qual are views into shared buffers.  None if the native library is
    unavailable."""
    import ctypes

    lib = _native_bam()
    if lib is None:
        return None
    if limit is not None and limit <= 0:
        return []
    buf = np.frombuffer(payload, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    n_rec = i64()
    seq_bytes = i64()
    name_bytes = i64()
    maxr = i64(limit if limit is not None else 0)  # <= 0 = unlimited (C side)
    rc = lib.gkl_bam_count(buf.ctypes.data_as(u8p), len(buf), offset, maxr,
                           ctypes.byref(n_rec), ctypes.byref(seq_bytes),
                           ctypes.byref(name_bytes))
    if rc != 0:
        raise ValueError("truncated BAM record")
    n = n_rec.value
    a_i32 = lambda: np.empty(n, np.int32)
    a_i64 = lambda: np.empty(n, np.int64)
    ref_id, pos, flag, mapq, l_seq = a_i32(), a_i32(), a_i32(), a_i32(), a_i32()
    n_cigar, name_len = a_i32(), a_i32()
    seq_off, qual_off, name_off, cigar_off = a_i64(), a_i64(), a_i64(), a_i64()
    seq_buf = np.empty(seq_bytes.value, np.uint8)
    qual_buf = np.empty(seq_bytes.value, np.uint8)
    name_buf = np.empty(max(1, name_bytes.value), np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    wrote = lib.gkl_bam_scan(
        buf.ctypes.data_as(u8p), len(buf), offset, maxr,
        ref_id.ctypes.data_as(i32p), pos.ctypes.data_as(i32p),
        flag.ctypes.data_as(i32p), mapq.ctypes.data_as(i32p),
        l_seq.ctypes.data_as(i32p),
        seq_off.ctypes.data_as(i64p), seq_buf.ctypes.data_as(u8p),
        qual_off.ctypes.data_as(i64p), qual_buf.ctypes.data_as(u8p),
        name_off.ctypes.data_as(i64p), name_len.ctypes.data_as(i32p),
        name_buf.ctypes.data_as(u8p),
        cigar_off.ctypes.data_as(i64p), n_cigar.ctypes.data_as(i32p),
    )
    if wrote != n:
        raise ValueError("BAM scan inconsistency")
    u = struct.unpack_from
    records = []
    for k in range(n):
        s0 = seq_off[k]
        ls = l_seq[k]
        cigar = []
        co = cigar_off[k]
        for ci in range(n_cigar[k]):
            (c,) = u("<I", payload, co + 4 * ci)
            cigar.append((c >> 4, CIGAR_OPS[c & 0xF]))
        name = bytes(name_buf[name_off[k] : name_off[k] + name_len[k]]).decode("ascii")
        raw = None
        if keep_raw:
            # record block spans [prefix, prefix + 4 + block_size); the
            # cigar section sits at prefix + 4 + 32 + l_read_name
            prefix = int(co) - 32 - (name_len[k] + 1) - 4
            (bs,) = u("<i", payload, prefix)
            raw = bytes(payload[prefix : prefix + 4 + bs])
        records.append(BamRecord(
            name, int(flag[k]), int(ref_id[k]), int(pos[k]), int(mapq[k]),
            cigar, seq_buf[s0 : s0 + ls], qual_buf[s0 : s0 + ls], raw,
        ))
    return records


def parse_records(payload: bytes, offset: int, limit: int | None = None,
                  keep_raw: bool = False):
    """Yield BamRecords from a decompressed BAM payload."""
    n = len(payload)
    count = 0
    u = struct.unpack_from
    while offset + 4 <= n:
        if limit is not None and count >= limit:
            return
        (block_size,) = u("<i", payload, offset)
        start = offset + 4
        if block_size < 32:  # minimum fixed record size; also guards against
            # a corrupt non-positive block_size looping forever
            raise ValueError("truncated BAM record")
        offset = start + block_size
        if offset > n:
            raise ValueError("truncated BAM record")
        (ref_id, pos) = u("<ii", payload, start)
        l_read_name = payload[start + 8]
        mapq = payload[start + 9]
        (n_cigar_op, flag) = u("<HH", payload, start + 12)
        (l_seq,) = u("<i", payload, start + 16)
        if l_seq < 0 or l_read_name < 1 or (
            32 + l_read_name + 4 * n_cigar_op + (l_seq + 1) // 2 + l_seq > block_size
        ):
            raise ValueError("corrupt BAM record (sections exceed block size)")
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
        raw = bytes(payload[start - 4 : offset]) if keep_raw else None
        yield BamRecord(name, flag, ref_id, pos, mapq, cigar, seq, qual, raw)
        count += 1


def read_bam(path: str, limit: int | None = None, threads: int | None = None,
             keep_raw: bool = False):
    """Read a BAM file: (header, list of records).

    BGZF inflation runs on the parallel native codec.
    """
    with open(path, "rb") as fh:
        data = fh.read()
    payload = bgzf.decompress(data, threads=threads)
    header, off = parse_header(payload)
    records = parse_records_native(payload, off, limit=limit, keep_raw=keep_raw)
    if records is None:  # native loader unavailable: pure-Python fallback
        records = list(parse_records(payload, off, limit=limit,
                                     keep_raw=keep_raw))
    return header, records


# ---------------------------------------------------------------------------
# Writing (the htsjdk SAMFileWriter + IntelDeflater path,
# DeflaterIntegrationTest.java:27-99, without the JVM)
# ---------------------------------------------------------------------------

_SEQ_CODE = {b: i for i, b in enumerate(b"=ACMGRSVTWYHKDBN")}
_CIGAR_CODE = {op: i for i, op in enumerate(CIGAR_OPS)}


def encode_record(rec: BamRecord) -> bytes:
    """Serialize one alignment record to its BAM byte layout.

    Records carrying their original bytes (``keep_raw=True`` readers) are
    emitted VERBATIM — tags, mate info, and bin survive rewrites; records
    synthesized in Python encode from the decoded fields (no tags, mate
    fields unset)."""
    if rec.raw is not None:
        return rec.raw
    name = rec.name.encode("ascii") + b"\x00"
    l_seq = len(rec.seq)
    n_cigar = len(rec.cigar)
    packed = bytearray((l_seq + 1) // 2)
    for i, base in enumerate(bytes(rec.seq)):
        code = _SEQ_CODE.get(base, 15)
        if i % 2 == 0:
            packed[i // 2] = code << 4
        else:
            packed[i // 2] |= code
    # bin: unused by our readers; compute the spec's reg2bin for pos..pos+1
    body = struct.pack(
        "<iiBBHHHiiii",
        rec.ref_id,
        rec.pos,
        len(name),
        rec.mapq,
        0,  # bin (optional for writers per common practice; 0 accepted)
        n_cigar,
        rec.flag,
        l_seq,
        -1,  # next_refID
        -1,  # next_pos
        0,  # tlen
    )
    cigar = b"".join(
        struct.pack("<I", (n << 4) | _CIGAR_CODE[op]) for n, op in rec.cigar
    )
    qual = bytes(rec.qual) if len(rec.qual) == l_seq else b"\xff" * l_seq
    block = body + name + cigar + bytes(packed) + qual
    return struct.pack("<i", len(block)) + block


def encode_header(header: BamHeader) -> bytes:
    text = header.text.encode("utf-8")
    out = bytearray(b"BAM\x01")
    out += struct.pack("<i", len(text))
    out += text
    out += struct.pack("<i", len(header.ref_names))
    for name, length in zip(header.ref_names, header.ref_lengths):
        nb = name.encode("ascii") + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)
    return bytes(out)


def write_bam(path: str, header: BamHeader, records, level: int = 6,
              threads: int | None = None) -> None:
    """Write records to a BAM file (BGZF-compressed via the native codec)."""
    payload = encode_header(header) + b"".join(encode_record(r) for r in records)
    stream = bgzf.compress(payload, level=level, threads=threads)
    with open(path, "wb") as fh:
        fh.write(stream)


def write_bam_streaming(path: str, header: BamHeader, records, level: int = 6,
                        threads: int | None = None,
                        window_blocks: int = 64) -> int:
    """Streaming BAM writer: records → BGZF blocks → parallel deflate,
    bounded memory (the write-side counterpart of read_bam_streaming; the
    reference's deflater exists to write BAM this way,
    DeflaterIntegrationTest.java:27-99 through a SAMFileWriter).

    Encoded records accumulate until ``window_blocks`` full 64 KB BGZF
    blocks are ready, then that window compresses across the native
    thread pool and flushes to disk; a partial tail block is only emitted
    at end-of-stream, so every non-final block is maximal.  Returns the
    number of records written.
    """
    window_bytes = window_blocks * bgzf.MAX_BLOCK_DATA
    n_written = 0
    with open(path, "wb") as fh:
        buf = bytearray(encode_header(header))

        def flush(final: bool) -> None:
            nonlocal buf
            cut = len(buf) if final else (
                len(buf) // bgzf.MAX_BLOCK_DATA) * bgzf.MAX_BLOCK_DATA
            if cut > 0:
                fh.write(bgzf.compress(bytes(buf[:cut]), level=level,
                                       threads=threads, append_eof=False))
                del buf[:cut]
            if final:
                fh.write(bgzf.EOF_BLOCK)

        for rec in records:
            buf += encode_record(rec)
            n_written += 1
            if len(buf) >= window_bytes:
                flush(False)
        flush(True)
    return n_written


def try_parse_header(payload) -> tuple[BamHeader, int] | None:
    """parse_header that returns None when the buffer is still too short."""
    n = len(payload)
    if n < 12:
        return None
    if bytes(payload[:4]) != b"BAM\x01":
        raise ValueError("not a BAM payload (missing BAM\\1 magic)")
    (l_text,) = struct.unpack_from("<i", payload, 4)
    if l_text < 0:
        raise ValueError("corrupt BAM header (negative l_text)")
    off = 8 + l_text
    if off + 4 > n:
        return None
    (n_ref,) = struct.unpack_from("<i", payload, off)
    if n_ref < 0:
        raise ValueError("corrupt BAM header (negative n_ref)")
    probe = off + 4
    for _ in range(n_ref):
        if probe + 4 > n:
            return None
        (l_name,) = struct.unpack_from("<i", payload, probe)
        if l_name < 1:  # also guards the probe against a non-advancing loop
            raise ValueError("corrupt BAM header (non-positive ref name length)")
        probe += 4 + l_name + 4
    if probe > n:
        return None
    # reparse only the header prefix — bytes(payload) would copy the whole
    # rolling decode buffer just to read its first `probe` bytes
    return parse_header(bytes(memoryview(payload)[:probe]))


def complete_records_end(buf, start: int) -> int:
    """Offset just past the last COMPLETE alignment record in ``buf``."""
    off = start
    n = len(buf)
    while off + 4 <= n:
        bs = int.from_bytes(buf[off : off + 4], "little", signed=True)
        if bs < 32:
            raise ValueError("truncated BAM record")
        if off + 4 + bs > n:
            break
        off += 4 + bs
    return off


def read_bam_streaming(path: str, limit: int | None = None,
                       threads: int | None = None, read_size: int = 4 << 20,
                       keep_raw: bool = False):
    """Streaming form of :func:`read_bam`: returns (header, record iterator)
    with host memory bounded by ``read_size`` of compressed input plus one
    decode window — BGZF members inflate incrementally on the parallel
    codec and records parse per window (records may span BGZF blocks, so a
    rolling buffer carries partial tails)."""
    gen = bgzf.iter_decompressed(path, threads=threads, read_size=read_size)
    buf = bytearray()
    header = None
    off = 0
    for chunk in gen:
        buf += chunk
        parsed = try_parse_header(buf)
        if parsed is not None:
            header, off = parsed
            break
    if header is None:
        raise ValueError("truncated BAM header")

    def records():
        nonlocal buf, off
        count = 0

        def drain():
            nonlocal buf, off, count
            end = complete_records_end(buf, off)
            if end > off:
                want = None if limit is None else limit - count
                window = bytes(memoryview(buf)[off:end])  # ONE copy
                recs = parse_records_native(window, 0, limit=want,
                                            keep_raw=keep_raw)
                if recs is None:
                    recs = list(parse_records(window, 0, limit=want,
                                              keep_raw=keep_raw))
                count += len(recs)
                del buf[:end]
                off = 0
                yield from recs

        yield from drain()
        if limit is not None and count >= limit:
            return
        for chunk in gen:
            buf += chunk
            yield from drain()
            if limit is not None and count >= limit:
                return
        if off < len(buf):
            raise ValueError("truncated BAM record at end of stream")

    return header, records()

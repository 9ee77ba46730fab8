"""BGZF (blocked gzip) reader/writer for BAM files.

BAM files are streams of gzip members carrying a ``BC`` extra subfield with
the compressed block size (SAM spec §4.1); htsjdk's BlockCompressedStreams
produce/consume exactly this framing.  This module parses and emits that
framing on top of the parallel block codec, replacing the reference's
DeflaterIntegrationTest path (writing a BAM through htsjdk with the Intel
deflater, DeflaterIntegrationTest.java:27-99).
"""

from __future__ import annotations

import struct
import zlib

from . import deflate_blocks, inflate_blocks

MAX_BLOCK_DATA = 65280  # uncompressed payload cap per BGZF block (htsjdk)
# the canonical 28-byte BGZF EOF marker block
EOF_BLOCK = bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")

def split_blocks(data: bytes) -> list[bytes]:
    """Split a BGZF byte stream into raw gzip member byte strings.

    One BC-subfield scanner serves both this and the streaming form: a
    stream the tolerant scanner cannot fully consume is truncated, reported
    as the module's usual ValueError (not a struct.error escaping from a
    short unpack)."""
    blocks, consumed = split_blocks_partial(data)
    if consumed != len(data):
        raise ValueError(
            f"truncated BGZF stream: member at offset {consumed} is incomplete")
    return blocks


def decompress_block(block: bytes) -> bytes:
    """Decompress one BGZF block (raw DEFLATE payload inside gzip framing)."""
    xlen = struct.unpack_from("<H", block, 10)[0]
    cdata = block[12 + xlen : -8]
    isize = struct.unpack_from("<I", block, len(block) - 4)[0]
    out = inflate_blocks([cdata])[0]
    if len(out) != isize:
        raise ValueError(f"BGZF isize mismatch: got {len(out)}, expected {isize}")
    crc = struct.unpack_from("<I", block, len(block) - 8)[0]
    if zlib.crc32(out) & 0xFFFFFFFF != crc:
        raise ValueError("BGZF CRC mismatch")
    return out


def _inflate_verify_join(cdatas, metas, threads):
    """Decode + CRC-verify + assemble a batch of BGZF payloads.

    Fast path: the packed batch entry decodes into one strided buffer with
    the per-block CRC32 computed by the worker threads while the payload is
    cache-hot, then ONE scatter assembles the result (no per-block bytes +
    join + separate host CRC pass).  Returns a bytes-like (bytearray)."""
    import numpy as np

    from . import inflate_blocks_packed

    res = inflate_blocks_packed(cdatas, threads=threads, crcs=True)
    if res is None:
        # the packed entry already failed (no native codec, or a corrupt
        # block) — go straight to per-block zlib-semantics decode rather
        # than inflate_blocks, which would re-run the same packed batch
        from . import raw_inflate

        outs = [raw_inflate(b) for b in cdatas]
        for out, (crc, isize) in zip(outs, metas):
            if len(out) != isize or (zlib.crc32(out) & 0xFFFFFFFF) != crc:
                raise ValueError("BGZF block corrupt")
        return b"".join(outs)
    out, out_lens, stride, out_crcs = res
    want = np.asarray(metas, np.int64)  # (n, 2): crc, isize
    if (not np.array_equal(out_lens.astype(np.int64), want[:, 1])
            or not np.array_equal(out_crcs.astype(np.int64), want[:, 0])):
        raise ValueError("BGZF block corrupt")
    total = int(out_lens.sum())
    buf = bytearray(total)
    mv = memoryview(buf)
    ov = memoryview(out)
    o = 0
    for i in range(len(cdatas)):
        ln = int(out_lens[i])
        mv[o : o + ln] = ov[i * stride : i * stride + ln]
        o += ln
    ov.release()
    from . import release_blocks_buffer

    release_blocks_buffer(out)
    return buf


def decompress(data: bytes, threads: int | None = None) -> bytes | bytearray:
    """Decompress a whole BGZF stream (parallel across blocks).

    Returns a bytes-like: a bytearray on the native fast path (assembled
    once from the strided decode buffer — converting to bytes would add a
    full-payload copy), bytes on the fallback path.  Call ``bytes()`` on
    the result if immutability is required."""
    blocks = split_blocks(data)
    metas = []
    cdatas = []
    for b in blocks:
        xlen = struct.unpack_from("<H", b, 10)[0]
        cdatas.append(b[12 + xlen : -8])
        metas.append(struct.unpack_from("<II", b, len(b) - 8))
    return _inflate_verify_join(cdatas, metas, threads)


def _frame(cdata: bytes, raw: bytes) -> bytes:
    bsize = len(cdata) + 12 + 6 + 8
    if bsize > 65536:
        raise ValueError("BGZF block too large")
    header = (
        b"\x1f\x8b\x08\x04"  # magic, deflate, FEXTRA
        + b"\x00\x00\x00\x00"  # mtime
        + b"\x00\xff"  # xfl, os=unknown
        + struct.pack("<H", 6)  # xlen
        + b"BC"
        + struct.pack("<H", 2)
        + struct.pack("<H", bsize - 1)
    )
    footer = struct.pack("<II", zlib.crc32(raw) & 0xFFFFFFFF, len(raw))
    return header + cdata + footer


def compress(data: bytes, level: int = 6, threads: int | None = None, append_eof: bool = True) -> bytes:
    """Compress bytes into a BGZF stream (parallel across blocks)."""
    chunks = [data[i : i + MAX_BLOCK_DATA] for i in range(0, len(data), MAX_BLOCK_DATA)] or [b""]
    cdatas = deflate_blocks(list(chunks), level=level, nowrap=True, threads=threads)
    out = bytearray()
    for raw, cdata in zip(chunks, cdatas):
        out += _frame(cdata, raw)
    if append_eof:
        out += EOF_BLOCK
    return bytes(out)


def split_blocks_partial(data) -> tuple[list[bytes], int]:
    """Like :func:`split_blocks` but tolerant of a truncated tail: returns
    (complete member byte strings, bytes consumed); the caller carries the
    unconsumed remainder into the next read."""
    blocks = []
    pos = 0
    n = len(data)
    while pos + 18 <= n:  # minimum bytes to locate the BC subfield
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError(f"not a BGZF stream at offset {pos}")
        xlen = struct.unpack_from("<H", data, pos + 10)[0]
        if pos + 12 + xlen > n:
            break
        extra = data[pos + 12 : pos + 12 + xlen]
        bsize = None
        e = 0
        while e + 4 <= len(extra):
            si1, si2, slen = extra[e], extra[e + 1], struct.unpack_from("<H", extra, e + 2)[0]
            if si1 == 0x42 and si2 == 0x43 and slen == 2:
                bsize = struct.unpack_from("<H", extra, e + 4)[0] + 1
                break
            e += 4 + slen
        if bsize is None:
            raise ValueError(f"gzip member without BC subfield at offset {pos}")
        if pos + bsize > n:
            break
        blocks.append(bytes(data[pos : pos + bsize]))
        pos += bsize
    return blocks, pos


def iter_decompressed(path_or_file, threads: int | None = None,
                      read_size: int = 4 << 20):
    """Stream-decompress a BGZF file in bounded memory: reads ``read_size``
    compressed bytes at a time, inflates each batch of complete members on
    the parallel codec, and yields decompressed byte chunks.  This is the
    incremental form of :func:`decompress` (which loads the whole stream)."""
    fh = open(path_or_file, "rb") if isinstance(path_or_file, (str, bytes)) else path_or_file
    close = isinstance(path_or_file, (str, bytes))
    try:
        rem = b""
        while True:
            data = fh.read(read_size)
            if not data:
                break
            rem += data
            blocks, consumed = split_blocks_partial(rem)
            rem = rem[consumed:]
            if not blocks:
                continue
            cdatas = []
            metas = []
            for b in blocks:
                xlen = struct.unpack_from("<H", b, 10)[0]
                cdatas.append(b[12 + xlen : -8])
                metas.append(struct.unpack_from("<II", b, len(b) - 8))
            yield _inflate_verify_join(cdatas, metas, threads)
        if rem:
            raise ValueError("truncated BGZF stream (incomplete trailing member)")
    finally:
        if close:
            fh.close()

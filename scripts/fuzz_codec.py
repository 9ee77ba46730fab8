"""Time-budgeted fuzz of the native codec BATCH entries.

The in-suite fuzz (tests/test_compression.py) mutation-fuzzes the
single-stream decoder; this driver stresses the surfaces above it that the
suite only smoke-tests — the N-way gang (``gkl_fast_inflate_n``) and the
threaded strided batch (``gkl_inflate_batch2``) — where the round-4 review
found a real cross-margin overflow class.  Invariants per iteration:

* gang: every stream's output region is canary-padded; a mutant in one
  stream must never scribble another stream's canary or change a VALID
  sibling's decoded bytes (vs the zlib oracle), for every gang width 1-8
  and with per-stream caps both exact and undersized.
* batch2: in a batch mixing valid and corrupted blocks, every valid
  block's payload and worker-computed CRC32 must equal the zlib oracle's,
  regardless of its stride neighbors' fates (adjacent strides make any
  past-cap write visible as a neighbor mismatch); accepted mutants must
  byte-match the oracle.
* encoder: our fast streams at every level 1-9 (raw AND zlib-wrapped) must
  round-trip through stock zlib (encoder output is the decoder-independent
  contract).

Usage: python scripts/fuzz_codec.py [--seconds N] [--seed S]
Prints ``FUZZ_CODEC ok iters=... blocks=...`` or raises on first violation.
"""

from __future__ import annotations

import argparse
import ctypes
import os
import random
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from gkl_tpu import compression as comp  # noqa: E402
from gkl_tpu import native_lib  # noqa: E402


def _oracle(stream: bytes, cap: int):
    """zlib's verdict on a raw-deflate stream bounded to cap bytes:
    (payload, complete) or None if rejected."""
    d = zlib.decompressobj(-15)
    try:
        got = d.decompress(stream, cap) if cap else b""
        # complete iff the final block ended within cap bytes of output;
        # unconsumed TRAILING input after eof is fine (BGZF padding) — both
        # our decoder and zlib's Z_FINISH accept it
        complete = d.eof
    except zlib.error:
        return None
    return got, complete


def _make_corpus(rng: random.Random):
    """(payload, stream) pairs across data shapes x encoders."""
    out = []
    for kind in range(4):
        n = rng.randrange(200, 65280)
        if kind == 0:
            data = rng.randbytes(n)
        elif kind == 1:
            data = bytes(rng.choice(b"ACGTN") for _ in range(n))
        elif kind == 2:
            seed = bytes(rng.choice(b"ACGT")
                         for _ in range(rng.randrange(3, 400)))
            data = (seed * (n // len(seed) + 1))[:n]
        else:  # BAM-record-ish: binary fields + short text runs
            rec = rng.randbytes(rng.randrange(30, 120)) + bytes(
                rng.choice(b"ACGT!@IIIII") for _ in range(rng.randrange(40, 200)))
            data = (rec * (n // len(rec) + 1))[:n]
        for level in (0, 1, 6, 9):
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            out.append((data, co.compress(data) + co.flush()))
        for level in (1, 2, 4, 6, 9):
            out.append((data, comp.raw_deflate(data, level=level)))
    return out


def _mutate(rng: random.Random, stream: bytes) -> bytes:
    mut = bytearray(stream)
    op = rng.randrange(4)
    if op == 0:
        for _ in range(rng.randrange(1, 6)):
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
    elif op == 1:
        del mut[rng.randrange(1, len(mut)):]
    elif op == 2:
        at = rng.randrange(len(mut))
        for k in range(at, min(len(mut), at + rng.randrange(1, 12))):
            mut[k] = rng.randrange(256)
    else:  # append garbage past a valid stream (trailing-bits robustness)
        mut += rng.randbytes(rng.randrange(1, 32))
    return bytes(mut)


def fuzz_gang(lib, rng: random.Random, corpus) -> int:
    fn = lib.gkl_fast_inflate_n
    fn.restype = None
    fn.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                   ctypes.POINTER(ctypes.c_int32),
                   ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                   ctypes.POINTER(ctypes.c_int32),
                   ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    pad = 320
    m = rng.randrange(1, 9)
    picks = [corpus[rng.randrange(len(corpus))] for _ in range(m)]
    streams, caps, bufs, oracles = [], [], [], []
    for data, stream in picks:
        corrupt = rng.random() < 0.5
        s = _mutate(rng, stream) if corrupt else stream
        # exact cap usually; sometimes undersized (must fail, not overflow)
        cap = len(data) if rng.random() < 0.8 else rng.randrange(0, len(data) + 1)
        streams.append(s)
        caps.append(cap)
        bufs.append(ctypes.create_string_buffer(b"\xaa" * (cap + pad), cap + pad))
        oracles.append(_oracle(s, cap))
    ins = (ctypes.c_char_p * m)(*streams)
    ns = (ctypes.c_int32 * m)(*[len(s) for s in streams])
    outs = (ctypes.POINTER(ctypes.c_uint8) * m)(
        *[ctypes.cast(b, ctypes.POINTER(ctypes.c_uint8)) for b in bufs])
    cs = (ctypes.c_int32 * m)(*caps)
    rs = (ctypes.c_int32 * m)()
    fn(ins, ns, outs, cs, rs, m)
    for k in range(m):
        raw = bufs[k].raw
        assert raw[caps[k]:] == b"\xaa" * pad, (
            f"gang canary scribbled: stream {k}/{m} cap={caps[k]} "
            f"r={rs[k]} in_len={len(streams[k])}")
        if rs[k] < 0:
            continue
        ok = oracles[k]
        assert ok is not None, (
            f"gang accepted a stream zlib rejects (k={k} r={rs[k]})")
        want, complete = ok
        # the fast decoder only reports success for a COMPLETE in-cap decode
        assert complete and rs[k] == len(want) and raw[:rs[k]] == want, (
            f"gang output mismatch k={k} r={rs[k]} want={len(want)} "
            f"complete={complete}")
    return m


def fuzz_batch2(lib, rng: random.Random, corpus) -> int:
    fn = lib.gkl_inflate_batch2
    fn.restype = None
    n = rng.randrange(2, 33)
    stride = 65536
    picks = [corpus[rng.randrange(len(corpus))] for _ in range(n)]
    blocks, oracles = [], []
    for data, stream in picks:
        if rng.random() < 0.4:
            s = _mutate(rng, stream)
        else:
            s = stream
        blocks.append(s)
        oracles.append(_oracle(s, stride))
    ins = (ctypes.c_char_p * n)(*blocks)
    lens = np.array([len(b) for b in blocks], np.int32)
    out = np.full(n * stride, 0xAA, np.uint8)
    out_lens = np.empty(n, np.int32)
    out_crcs = np.empty(n, np.uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    fn(ctypes.cast(ins, ctypes.POINTER(ctypes.c_char_p)),
       lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
       out.ctypes.data_as(u8p), ctypes.c_int64(stride),
       out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       out_crcs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
       1, rng.randrange(1, 5))
    for k in range(n):
        got_len = int(out_lens[k])
        region = out[k * stride:(k + 1) * stride]
        ok = oracles[k]
        if got_len < 0:
            # rejection is always allowed for mutants; a pristine valid
            # block must never be rejected (zlib fallback is the oracle)
            assert ok is None or not ok[1] or len(ok[0]) > stride or \
                blocks[k] != picks[k][1], (
                f"batch2 rejected a valid block k={k}")
            continue
        assert ok is not None, f"batch2 accepted what zlib rejects (k={k})"
        want, complete = ok
        assert complete and got_len == len(want), (
            f"batch2 len mismatch k={k} got={got_len} want={len(want)} "
            f"complete={complete}")
        assert bytes(region[:got_len]) == want, f"batch2 payload mismatch k={k}"
        assert int(out_crcs[k]) == (zlib.crc32(want) & 0xFFFFFFFF), (
            f"batch2 crc mismatch k={k}")
    return n


def fuzz_encoder(rng: random.Random) -> int:
    n = rng.randrange(1, 70000)
    kind = rng.randrange(3)
    if kind == 0:
        data = rng.randbytes(n)
    elif kind == 1:
        data = bytes(rng.choice(b"ACGTN") for _ in range(n))
    else:
        seed = bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(1, 500)))
        data = (seed * (n // len(seed) + 1))[:n]
    for level in (1, 2, 3, 5, 7, 9):
        stream = comp.raw_deflate(data, level=level)
        got = zlib.decompressobj(-15).decompress(stream)
        assert got == data, (
            f"fast L{level} stream does not round-trip (n={n} kind={kind})")
        wrapped = comp.raw_deflate(data, level=level, nowrap=False)
        assert zlib.decompress(wrapped) == data, (
            f"fast L{level} wrapped stream does not round-trip (n={n} kind={kind})")
    return 12


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    lib = native_lib.load("gkl_codec")
    if lib is None:
        print("FUZZ_CODEC skip (native codec unavailable)")
        return 0
    rng = random.Random(args.seed)
    deadline = time.time() + args.seconds
    iters = blocks = 0
    corpus = _make_corpus(rng)
    while time.time() < deadline:
        if iters % 64 == 0:
            corpus = _make_corpus(rng)  # fresh shapes every so often
        blocks += fuzz_gang(lib, rng, corpus)
        blocks += fuzz_batch2(lib, rng, corpus)
        blocks += fuzz_encoder(rng)
        iters += 1
    print(f"FUZZ_CODEC ok iters={iters} blocks={blocks} seed={args.seed}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""DEFLATE block codec — parity with the reference's compression layer.

* :class:`Deflater` / :class:`Inflater` mirror ``IntelDeflater`` /
  ``IntelInflater`` (compression/IntelDeflater.java:80-233,
  IntelInflater.java:85-219): single-shot whole-block semantics, the
  level-1/2-requires-nowrap rule, and the inflater's nowrap-only rule.
* :func:`make_deflater` / :func:`make_inflater` mirror the factories'
  fallback behaviour (IntelDeflaterFactory.java:55-67): unsupported configs
  or a missing native codec fall back to Python ``zlib``.
* :func:`deflate_blocks` / :func:`inflate_blocks` are the multi-threaded
  batch stage feeding the TPU pipeline (replacing the reference's per-call
  JNI with a block-parallel C++ pool).

The native path wraps system zlib via ``native/codec.cc``; outputs are
valid DEFLATE streams interoperable with ``java.util.zip``/``zlib``
(byte-identity with ISA-L is not a contract — round-trip and
cross-implementation compatibility are, DeflaterUnitTest.java:192-248).
"""

from __future__ import annotations

import ctypes
import os
import zlib

import numpy as np

from .. import native_lib

DEFAULT_COMPRESSION = -1

_lib = None
_lib_checked = False


def _native():
    global _lib, _lib_checked
    if not _lib_checked:
        _lib_checked = True
        lib = native_lib.load("gkl_codec")
        if lib is not None:
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.gkl_deflate.restype = ctypes.c_int
            lib.gkl_deflate.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.gkl_inflate.restype = ctypes.c_int
            lib.gkl_inflate.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int]
            lib.gkl_deflate_bound.restype = ctypes.c_int
            lib.gkl_deflate_bound.argtypes = [ctypes.c_int]
            lib.gkl_deflate_batch.restype = None
            lib.gkl_inflate_batch.restype = None
            lib.gkl_inflate_batch2.restype = None
        _lib = lib
    return _lib


def is_native_available() -> bool:
    return _native() is not None


def _deflate_bound(n: int) -> int:
    lib = _native()
    if lib is not None:
        return int(lib.gkl_deflate_bound(n))
    return n + (n >> 9) + 64


def raw_deflate(data: bytes, level: int, nowrap: bool = True) -> bytes:
    """One-shot DEFLATE of a whole block (native if available)."""
    lib = _native()
    if lib is None:
        c = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS if nowrap else zlib.MAX_WBITS)
        return c.compress(data) + c.flush()
    buf = np.frombuffer(data, np.uint8) if data else np.zeros(0, np.uint8)
    cap = _deflate_bound(len(data))
    out = np.empty(cap, np.uint8)
    n = lib.gkl_deflate(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if len(buf) else None,
        len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
        level,
        1 if nowrap else 0,
    )
    if n < 0:
        raise RuntimeError("deflate failed")
    return out[:n].tobytes()


def raw_inflate(data: bytes, nowrap: bool = True, initial_size: int | None = None) -> bytes:
    """One-shot INFLATE of a whole block (native if available)."""
    lib = _native()
    if lib is None:
        return zlib.decompress(data, -zlib.MAX_WBITS if nowrap else zlib.MAX_WBITS)
    cap = initial_size or max(4 * len(data), 1 << 16)
    buf = np.frombuffer(data, np.uint8)
    for _ in range(8):
        out = np.empty(cap, np.uint8)
        n = lib.gkl_inflate(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(buf),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
            1 if nowrap else 0,
        )
        if n >= 0:
            return out[:n].tobytes()
        cap *= 4
    raise RuntimeError("inflate failed")


class Deflater:
    """Single-shot block deflater (IntelDeflater semantics).

    Levels 1-2 require nowrap (the reference routes them to ISA-L which only
    emits raw DEFLATE, IntelDeflater.java:95-97).
    """

    def __init__(self, level: int = DEFAULT_COMPRESSION, nowrap: bool = True):
        if (level < 0 or level > 9) and level != DEFAULT_COMPRESSION:
            raise ValueError("Illegal compression level")
        if level in (1, 2) and not nowrap:
            raise ValueError("Compression configuration requested not supported")
        self.level = level
        self.nowrap = nowrap
        self._input: bytes | None = None
        self._end_of_stream = False
        self._finished = False

    def reset(self) -> None:
        self._input = None
        self._end_of_stream = False
        self._finished = False

    def set_input(self, b, off: int = 0, length: int | None = None) -> None:
        if b is None:
            raise TypeError("Input buffer is null")
        length = len(b) - off if length is None else length
        if off < 0 or length < 0 or off > len(b) - length:
            raise IndexError("Offset/length out of range")
        self._input = bytes(b[off : off + length])
        self._finished = False

    def finish(self) -> None:
        self._end_of_stream = True

    def deflate(self, out: bytearray | memoryview, off: int = 0, length: int | None = None) -> int:
        if out is None:
            raise TypeError("Output buffer is null")
        if off != 0:
            raise ValueError("The only accepted offset value is 0")
        length = len(out) if length is None else length
        if length <= 0:
            raise IndexError("Length value is less or equal than zero")
        if not self._input:
            raise TypeError("Input buffer is null")
        compressed = raw_deflate(self._input, self.level, self.nowrap)
        if len(compressed) > length:
            raise ValueError(
                f"Output buffer too small: need {len(compressed)}, have {length}"
            )
        out[: len(compressed)] = compressed
        if self._end_of_stream:
            self._finished = True
        return len(compressed)

    def finished(self) -> bool:
        return self._finished

    def end(self) -> None:
        self._input = None


class Inflater:
    """Single-shot block inflater (IntelInflater semantics: nowrap only)."""

    def __init__(self, nowrap: bool = True):
        if not nowrap:
            raise ValueError("ZLIB format is not supported at this time with GKL TPU")
        self.nowrap = nowrap
        self._input: bytes | None = None
        self._pending: bytes | None = None  # decompressed-but-undelivered tail

    def reset(self) -> None:
        self._input = None
        self._pending = None

    def set_input(self, b, off: int = 0, length: int | None = None) -> None:
        if b is None:
            raise TypeError("Input buffer is null")
        length = len(b) - off if length is None else length
        if off < 0 or length < 0 or off > len(b) - length:
            raise IndexError("Offset/length out of range")
        self._input = bytes(b[off : off + length])
        self._pending = None

    def inflate(self, out: bytearray | memoryview, off: int = 0, length: int | None = None) -> int:
        """Fill ``out``; an undersized buffer keeps the remainder as state
        for the next call (java.util.zip semantics — data is never silently
        dropped; ``finished()`` stays False until fully drained)."""
        if out is None:
            raise TypeError("Output buffer is null")
        length = (len(out) - off) if length is None else length
        if off < 0 or length < 0 or off > len(out) - length:
            raise IndexError("Offset/length out of range")
        if self._pending is None:
            if not self._input:
                raise TypeError("Input buffer is null")
            self._pending = raw_inflate(self._input, self.nowrap,
                                        initial_size=max(length, 1 << 16))
        n = min(len(self._pending), length)
        out[off : off + n] = self._pending[:n]
        self._pending = self._pending[n:]
        return n

    def finished(self) -> bool:
        return self._pending is not None and len(self._pending) == 0

    def end(self) -> None:
        self._input = None


def make_deflater(level: int = DEFAULT_COMPRESSION, nowrap: bool = True):
    """Factory with java.util.zip-style fallback (IntelDeflaterFactory.java:55-67)."""
    try:
        if (1 <= level <= 2 and not nowrap):
            raise ValueError("unsupported configuration")
        return Deflater(level, nowrap)
    except ValueError:
        import zlib as _z

        class _ZlibDeflater:
            def __init__(self):
                self._data = None
                self._finished = False

            def set_input(self, b, off=0, length=None):
                length = len(b) - off if length is None else length
                self._data = bytes(b[off : off + length])

            def finish(self):
                pass

            def deflate(self, out, off=0, length=None):
                c = _z.compressobj(level, _z.DEFLATED, -_z.MAX_WBITS if nowrap else _z.MAX_WBITS)
                comp = c.compress(self._data) + c.flush()
                out[: len(comp)] = comp
                self._finished = True
                return len(comp)

            def finished(self):
                return self._finished

            def end(self):
                pass

            def reset(self):
                self._finished = False

        return _ZlibDeflater()


def make_inflater(nowrap: bool = True):
    """Factory with fallback (IntelInflaterFactory.java:49-55)."""
    if nowrap:
        return Inflater(True)

    import zlib as _z

    class _ZlibInflater:
        def __init__(self):
            self._data = None
            self._finished = False

        def set_input(self, b, off=0, length=None):
            length = len(b) - off if length is None else length
            self._data = bytes(b[off : off + length])

        def inflate(self, out, off=0, length=None):
            dec = _z.decompress(self._data, _z.MAX_WBITS)
            length = (len(out) - off) if length is None else length
            n = min(len(dec), length)
            out[off : off + n] = dec[:n]
            self._finished = True
            return n

        def finished(self):
            return self._finished

        def end(self):
            pass

        def reset(self):
            self._finished = False

    return _ZlibInflater()


# ---------------------------------------------------------------------------
# Batch (multi-threaded) block codec — the pipeline stage
# ---------------------------------------------------------------------------


def _default_threads() -> int:
    from .. import utils

    return utils.default_host_threads()


def deflate_blocks(blocks: list[bytes], level: int = 6, nowrap: bool = True, threads: int | None = None) -> list[bytes]:
    """Compress many independent blocks in parallel (C++ thread pool)."""
    lib = _native()
    if lib is None or not blocks:
        return [raw_deflate(b, level, nowrap) for b in blocks]
    threads = threads or _default_threads()
    n = len(blocks)
    packed = np.frombuffer(b"".join(blocks) or b"\0", np.uint8)
    lens = np.array([len(b) for b in blocks], np.int32)
    offsets = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    stride = _deflate_bound(int(lens.max(initial=0)))
    out = np.empty(n * stride, np.uint8)
    out_lens = np.empty(n, np.int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gkl_deflate_batch(
        packed.ctypes.data_as(u8p),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        out.ctypes.data_as(u8p),
        ctypes.c_int64(stride),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        level,
        1 if nowrap else 0,
        threads,
    )
    if np.any(out_lens < 0):
        raise RuntimeError("batch deflate failed")
    return [out[i * stride : i * stride + out_lens[i]].tobytes() for i in range(n)]


# Strided-buffer reuse pool for inflate_blocks_packed: the BGZF reader calls
# it once per chunk with identical sizing, and a fresh 4 MB np.empty pays
# ~5% of the decode time in first-touch page faults.  Callers hand buffers
# back with release_blocks_buffer once they have scattered/copied out.
import threading as _threading

_POOL_LOCK = _threading.Lock()
_BUF_POOL: dict = {}
_POOL_MAX_PER_SIZE = 2
_POOL_MAX_BYTES = 1 << 26
_pool_bytes = 0


def _pool_get(nbytes: int):
    global _pool_bytes
    with _POOL_LOCK:
        lst = _BUF_POOL.get(nbytes)
        if lst:
            _pool_bytes -= nbytes
            return lst.pop()
    return np.empty(nbytes, np.uint8)


def release_blocks_buffer(out) -> None:
    """Return a strided buffer obtained from :func:`inflate_blocks_packed`
    to the reuse pool.  Only call once every view into it is dead; callers
    that skip this are merely slower (the pool is an optimization, capped
    at 64 MB)."""
    global _pool_bytes
    if not isinstance(out, np.ndarray) or out.dtype != np.uint8 \
            or out.base is not None or not out.flags.c_contiguous:
        return
    nbytes = out.nbytes
    with _POOL_LOCK:
        lst = _BUF_POOL.setdefault(nbytes, [])
        if len(lst) < _POOL_MAX_PER_SIZE and _pool_bytes + nbytes <= _POOL_MAX_BYTES:
            lst.append(out)
            _pool_bytes += nbytes


def inflate_blocks_packed(blocks: list[bytes], nowrap: bool = True,
                          threads: int | None = None,
                          max_block: int = 1 << 16, crcs: bool = False):
    """Decompress many independent blocks in parallel into ONE strided
    buffer — the zero-assembly entry the BGZF reader consumes.

    Returns ``(out, out_lens, stride, out_crcs)``: block ``i``'s payload is
    ``out[i*stride : i*stride + out_lens[i]]``.  Inputs are passed by
    pointer (no host-side join), and with ``crcs=True`` each block's CRC32
    is computed by the worker threads while the payload is cache-hot, so
    the BGZF verify needs no second host pass.  Returns None when native
    code is unavailable or any block fails (callers fall back)."""
    lib = _native()
    if lib is None or not blocks:
        return None
    threads = threads or _default_threads()
    n = len(blocks)
    ins = (ctypes.c_char_p * n)(*blocks)
    lens = np.array([len(b) for b in blocks], np.int32)
    out = _pool_get(n * max_block)
    out_lens = np.empty(n, np.int32)
    out_crcs = np.empty(n, np.uint32) if crcs else None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.gkl_inflate_batch2(
        ctypes.cast(ins, ctypes.POINTER(ctypes.c_char_p)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        out.ctypes.data_as(u8p),
        ctypes.c_int64(max_block),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_crcs.ctypes.data_as(u32p) if crcs else None,
        1 if nowrap else 0,
        threads,
    )
    if np.any(out_lens < 0):
        release_blocks_buffer(out)
        return None
    return out, out_lens, max_block, out_crcs


def inflate_blocks(blocks: list[bytes], nowrap: bool = True, threads: int | None = None, max_block: int = 1 << 16) -> list[bytes]:
    """Decompress many independent blocks in parallel."""
    res = inflate_blocks_packed(blocks, nowrap, threads, max_block)
    if res is None:
        # no native codec, or a block failed: one by one (growing buffers,
        # zlib error semantics)
        return [raw_inflate(b, nowrap) for b in blocks]
    out, out_lens, stride, _ = res
    payloads = [out[i * stride : i * stride + out_lens[i]].tobytes()
                for i in range(len(blocks))]
    release_blocks_buffer(out)
    return payloads

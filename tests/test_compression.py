"""Compression contract tests (DeflaterUnitTest / InflaterUnitTest /
DeflaterIntegrationTest equivalents): lossless round-trips at all levels,
cross-compatibility with the zlib oracle, factory fallbacks, and a BAM BGZF
round-trip on the bundled 1 MB BAM."""

import os
import zlib

import numpy as np
import pytest

from gkl_tpu import compression as comp
from gkl_tpu.compression import bgzf

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _dna(n, seed=0):
    rng = np.random.default_rng(seed)
    return bytes(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)])


CORPUS = _dna(1 << 20)  # 1 MB random DNA (CompressionUnitTestBase uses 4 MB)


@pytest.mark.parametrize("level", range(0, 10))
def test_roundtrip_ours_to_ours(level):
    d = comp.Deflater(level, nowrap=True)
    d.set_input(CORPUS)
    d.finish()
    out = bytearray(len(CORPUS) + (len(CORPUS) >> 1) + 1024)
    n = d.deflate(out)
    assert d.finished()
    i = comp.Inflater(nowrap=True)
    i.set_input(bytes(out[:n]))
    dec = bytearray(len(CORPUS))
    m = i.inflate(dec)
    assert m == len(CORPUS)
    assert bytes(dec) == CORPUS


@pytest.mark.parametrize("level", range(0, 10))
def test_ours_to_zlib(level):
    """Our compressed stream inflates with the independent zlib oracle."""
    data = CORPUS[: 1 << 18]
    compressed = comp.raw_deflate(data, level, nowrap=True)
    assert zlib.decompress(compressed, -zlib.MAX_WBITS) == data


@pytest.mark.parametrize("level", [1, 5, 9])
def test_zlib_to_ours(level):
    """zlib-compressed streams inflate through our inflater."""
    data = CORPUS[: 1 << 18]
    c = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS)
    compressed = c.compress(data) + c.flush()
    assert comp.raw_inflate(compressed, nowrap=True) == data


def test_zlib_wrapped_roundtrip():
    data = CORPUS[: 1 << 16]
    compressed = comp.raw_deflate(data, 6, nowrap=False)
    assert zlib.decompress(compressed) == data
    assert comp.raw_inflate(compressed, nowrap=False) == data


def test_level_validation():
    with pytest.raises(ValueError):
        comp.Deflater(10, True)
    with pytest.raises(ValueError):
        comp.Deflater(-2, True)
    # levels 1-2 with zlib wrapping are rejected (IntelDeflater.java:95-97)
    with pytest.raises(ValueError):
        comp.Deflater(1, False)
    with pytest.raises(ValueError):
        comp.Deflater(2, False)
    comp.Deflater(1, True)
    # inflater only supports nowrap (IntelInflater.java:87-89)
    with pytest.raises(ValueError):
        comp.Inflater(False)


def test_factory_fallback():
    d = comp.make_deflater(1, nowrap=False)  # unsupported -> zlib-based fallback
    d.set_input(CORPUS[:4096])
    d.finish()
    out = bytearray(8192)
    n = d.deflate(out)
    assert zlib.decompress(bytes(out[:n])) == CORPUS[:4096]
    i = comp.make_inflater(nowrap=False)
    dec = bytearray(4096)
    i.set_input(bytes(out[:n]))
    assert i.inflate(dec) == 4096


def test_input_validation():
    d = comp.Deflater(6, True)
    with pytest.raises(TypeError):
        d.set_input(None)
    with pytest.raises(IndexError):
        d.set_input(b"abc", off=-1)
    with pytest.raises(IndexError):
        d.set_input(b"abc", off=2, length=2)
    d.set_input(b"abc")
    with pytest.raises(ValueError):
        d.deflate(bytearray(8), off=1)
    with pytest.raises(IndexError):
        d.deflate(bytearray(8), length=0)
    i = comp.Inflater(True)
    with pytest.raises(TypeError):
        i.inflate(bytearray(8))


@pytest.mark.parametrize("threads", [1, 4])
def test_batch_blocks(threads):
    blocks = [_dna(1000 + 37 * k, seed=k) for k in range(64)]
    compressed = comp.deflate_blocks(blocks, level=4, threads=threads)
    restored = comp.inflate_blocks(compressed, threads=threads, max_block=1 << 14)
    assert restored == blocks
    # oracle check on one block
    assert zlib.decompress(compressed[3], -zlib.MAX_WBITS) == blocks[3]


def test_batch_gang_shapes():
    """The batch inflate workers decode GANGS of up to four interleaved
    streams (gkl_fast_inflate_n).  Every gang width (and the tail widths of
    a non-multiple-of-4 batch) must round-trip, including gangs that mix
    stored/fixed/dynamic blocks and wildly unequal lengths — the gang
    driver shrinks as streams finish and must drain the remainder."""
    rng = np.random.default_rng(11)
    shapes = [
        b"",                              # stored, empty
        b"x",                             # fixed-Huffman, tiny
        _dna(60000, seed=1),              # dynamic, big
        bytes(range(7)) * 3000,           # short-period RLE
        bytes(rng.integers(0, 256, 50000, dtype=np.uint8)),  # stored (L0-ish)
        _dna(200, seed=2),
        _dna(30000, seed=3),
        b"ACGT" * 5,
        _dna(1000, seed=4),
    ]
    for n in range(1, len(shapes) + 1):
        blocks = shapes[:n]
        for level in (0, 1, 6):
            compressed = []
            for b in blocks:
                zo = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS)
                compressed.append(zo.compress(b) + zo.flush())
            assert comp.inflate_blocks(compressed, threads=1) == blocks, (n, level)


def test_batch_gang_corrupt_block_falls_back():
    """A malformed block inside a gang must not poison its gang-mates: the
    batch path reports the failure (zlib error semantics via the per-block
    fallback) while the same batch without the bad block round-trips."""
    blocks = [_dna(5000 + 777 * k, seed=20 + k) for k in range(6)]
    compressed = []
    for b in blocks:
        zo = zlib.compressobj(1, zlib.DEFLATED, -zlib.MAX_WBITS)
        compressed.append(zo.compress(b) + zo.flush())
    bad = list(compressed)
    bad[2] = b"\x07\xff" + bad[2][:40]  # garbage header mid-gang
    assert comp.inflate_blocks_packed(bad, threads=1) is None
    # the per-block fallback surfaces the failure (native raw_inflate raises
    # RuntimeError; the pure-zlib path raises zlib.error)
    with pytest.raises((zlib.error, RuntimeError)):
        comp.inflate_blocks(bad, threads=1)
    good = compressed[:2] + compressed[3:]
    assert comp.inflate_blocks(good, threads=1) == blocks[:2] + blocks[3:]


def test_bgzf_roundtrip_synthetic():
    data = CORPUS[: 200_000]
    stream = bgzf.compress(data, level=5)
    assert stream.endswith(bgzf.EOF_BLOCK)
    assert bgzf.decompress(stream) == data
    # gzip module can read BGZF streams too (gzip members concatenated)
    import gzip

    assert gzip.decompress(stream) == data


@pytest.mark.parametrize("level", [1, 6, 9])
def test_bam_bgzf_recompress(level):
    """Decode the bundled BAM's BGZF blocks, recompress at each level, and
    verify record-level (byte) equality after re-decode — the
    DeflaterIntegrationTest.java:27-99 equivalent without the JVM."""
    with open(os.path.join(DATA_DIR, "HiSeq.1mb.1RG.2k_lines.bam"), "rb") as fh:
        bam = fh.read()
    payload = bgzf.decompress(bam)
    assert payload[:4] == b"BAM\x01"
    restream = bgzf.compress(payload, level=level)
    assert bgzf.decompress(restream) == payload


def test_fast_deflate_disabled_mode():
    """GKL_TPU_FAST_DEFLATE=0 restores zlib for levels 1-2 (the fast
    dynamic-Huffman encoder is the default, mirroring the reference routing
    levels 1-2 to ISA-L).  The env is read once per process by the native
    lib, so this drives the zlib mode through a subprocess."""
    import subprocess
    import sys

    code = (
        "import zlib, numpy as np\n"
        "from gkl_tpu import compression as comp\n"
        "rng = np.random.default_rng(1)\n"
        "data = bytes(np.frombuffer(b'ACGT', np.uint8)[rng.integers(0,4,100000)])\n"
        "for level in (1, 2):\n"
        "    c = comp.raw_deflate(data, level, nowrap=True)\n"
        "    assert zlib.decompress(c, -zlib.MAX_WBITS) == data\n"
        "    z = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS)\n"
        "    assert c == z.compress(data) + z.flush(), 'expected zlib output'\n"
        "print('OK')\n"
    )
    env = dict(os.environ, GKL_TPU_FAST_DEFLATE="0", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, cwd=os.path.dirname(DATA_DIR) + "/..")
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr[-2000:]


def test_fast_deflate_fuzz():
    """The default levels 1-2 fast encoder round-trips adversarial content
    through the zlib oracle: Huffman depth-overflow clamping, stored-block
    fallback, empty/tiny inputs, long zero runs, mixed corpora."""
    # Fibonacci-weighted symbol frequencies force optimal Huffman depths far
    # beyond 15, exercising the bl_count overflow adjustment
    fib = [1, 1]
    while len(fib) < 32:
        fib.append(fib[-1] + fib[-2])
    skew = b"".join(bytes([i]) * fib[i] for i in range(30))
    rng = np.random.default_rng(7)
    skew = bytes(np.frombuffer(skew, np.uint8)[rng.permutation(len(skew))])
    cases = [b"", b"a", b"abc", b"\x00" * 139 + b"x", skew,
             bytes(rng.integers(0, 256, 70000, dtype=np.uint8))]
    for seed in range(12):
        r = np.random.default_rng(seed)
        n = int(r.integers(0, 60000))
        cases.append(bytes(np.frombuffer(b"ACGT", np.uint8)[r.integers(0, 4, n)]))
    for data in cases:
        for level in (1, 2):
            c = comp.raw_deflate(data, level, nowrap=True)
            assert zlib.decompress(c, -zlib.MAX_WBITS) == data


def test_fast_deflate_lazy_levels():
    """Levels 3-9 run the lazy hash-chain engine (the otc_zlib replacement:
    IntelDeflater.cc:276-361 routes these to Intel's patched zlib).  Both
    raw and zlib-wrapped streams must round-trip through stock zlib, and
    the level-6 ratio must match or beat zlib-6 on genomic content AND on
    text-like content (the lazy chain is a general-purpose parse, not a
    DNA special case)."""
    with open(os.path.join(DATA_DIR, "HiSeq.1mb.1RG.2k_lines.bam"), "rb") as fh:
        payload = bgzf.decompress(fh.read())
    rng = np.random.default_rng(3)
    text = (b"the quick brown fox jumps over the lazy dog %d. " * 200) % tuple(
        range(200)) + bytes(rng.integers(32, 127, 4096, dtype=np.uint8))
    for data in (CORPUS[: 1 << 20], payload[: 1 << 20], text):
        for level in (3, 5, 6, 9):
            c = comp.raw_deflate(data, level, nowrap=True)
            assert zlib.decompress(c, -zlib.MAX_WBITS) == data
            w = comp.raw_deflate(data, level, nowrap=False)
            assert zlib.decompress(w) == data
        zo = zlib.compressobj(6, zlib.DEFLATED, -zlib.MAX_WBITS)
        z6 = len(zo.compress(data) + zo.flush())
        f6 = len(comp.raw_deflate(data, 6, nowrap=True))
        assert f6 <= 1.02 * z6, (f6, z6, len(data))


def test_fast_deflate_probe_mixed_content():
    """The L1 sample probe decides from the first 8 KB; blocks whose head
    and tail differ wildly (DNA head, binary/text tail and vice versa)
    must still round-trip exactly, and a compressible tail must not
    balloon past the input."""
    rng = np.random.default_rng(13)
    dna = bytes(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 9000)])
    text = b"the quick brown fox jumps over the lazy dog. " * 1200
    rand = bytes(rng.integers(0, 256, 40000, dtype=np.uint8))
    for data in (dna + rand, dna + text, text[:9000] + dna * 6,
                 rand[:9000] + dna * 6):
        c = comp.raw_deflate(data, 1, nowrap=True)
        assert zlib.decompress(c, -zlib.MAX_WBITS) == data
        assert len(c) <= len(data) + 64  # stored-block escape caps blowup


def test_fast_deflate_entropy_fallback_ratio():
    """The cost-aware parse must beat zlib-1 on 2-bit-entropy DNA at the
    fast levels (VERDICT r4 weak #2: the greedy parse trailed zlib-1 by
    11% because short matches cost more bits than 2-bit literals)."""
    for level in (1, 2):
        f = len(comp.raw_deflate(CORPUS, level, nowrap=True))
        zo = zlib.compressobj(1, zlib.DEFLATED, -zlib.MAX_WBITS)
        z1 = len(zo.compress(CORPUS) + zo.flush())
        assert f <= z1, (level, f, z1)


def test_fast_deflate_ratio():
    """Level-2 fast-encoder ratio must stay within 10% of zlib-1 on genomic
    content (the reference's ISA-L levels trade ratio for speed but stay
    igzip-class, not fixed-Huffman-class)."""
    with open(os.path.join(DATA_DIR, "HiSeq.1mb.1RG.2k_lines.bam"), "rb") as fh:
        payload = bgzf.decompress(fh.read())
    for data in (CORPUS, payload):
        zo = zlib.compressobj(1, zlib.DEFLATED, -zlib.MAX_WBITS)
        z1 = len(zo.compress(data) + zo.flush())
        f2 = len(comp.raw_deflate(data, 2, nowrap=True))
        assert f2 <= 1.10 * z1, (f2, z1)


def test_inflater_undersized_buffer_keeps_remainder():
    """An undersized output buffer must not lose data: the remainder stays
    as inflater state and drains on subsequent calls (java.util.zip
    semantics; the single-shot form previously truncated silently)."""
    data = CORPUS[:10000]
    c = comp.raw_deflate(data, 6, nowrap=True)
    i = comp.Inflater(nowrap=True)
    i.set_input(c)
    out = bytearray()
    buf = bytearray(3000)
    while not i.finished():
        n = i.inflate(buf)
        out += buf[:n]
    assert bytes(out) == data


def test_fast_inflate_stream_shapes():
    """The native fast inflate (inflate_fast.cc, the ISA-L-inflate analogue,
    IntelInflater.cc) must round-trip every DEFLATE block shape the spec
    allows: stored blocks (level 0, incl. the zero-length final block),
    fixed-Huffman (tiny streams), deep dynamic tables, >32 KB distances,
    and short-period RLE matches."""
    rng = np.random.default_rng(7)
    cases = []
    # stored blocks, incl. empty payload
    cases += [b"", b"x", bytes(rng.integers(0, 256, 70000, dtype=np.uint8))]
    # fixed-Huffman territory: tiny low-entropy inputs
    cases += [b"AAAA", b"ACGTACGTACGT" * 3]
    # short-period runs (dist 1..7 copy paths)
    for period in (1, 2, 3, 5, 7):
        cases.append(bytes(range(period)) * 4000)
    # long-range matches: repeat a 40 KB chunk so distances exceed 32 KB
    chunk = bytes(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 40000)])
    cases.append(chunk + b"\x00" * 100 + chunk)
    for data in cases:
        for level in (0, 1, 6, 9):
            zo = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS)
            stream = zo.compress(data) + zo.flush()
            assert comp.raw_inflate(stream, nowrap=True) == data, (len(data), level)


def test_fast_inflate_no_overread_at_page_boundary():
    """The fast-inflate hot loop must never read past the input buffer:
    valid raw-DEFLATE streams placed flush against a PROT_NONE guard page
    must decode (not SIGSEGV), and truncated streams must return the zlib
    fallback's answer, not garbage.  Regression for the mid-iteration
    refill overread (the refill memcpys 8 bytes at pos; pos could reach
    n-1 between top-of-loop checks)."""
    import ctypes
    import mmap as mmap_mod
    import random
    import zlib

    from gkl_tpu import native_lib

    lib = native_lib.load("gkl_codec")
    if lib is None:
        pytest.skip("native codec unavailable")
    fn = lib.gkl_fast_inflate
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                   ctypes.c_int]
    libc = ctypes.CDLL(None, use_errno=True)
    libc.mmap.restype = ctypes.c_void_p
    libc.mmap.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
                          ctypes.c_int, ctypes.c_int, ctypes.c_long]
    libc.mprotect.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
    page = mmap_mod.PAGESIZE
    npages = 17
    base = libc.mmap(None, npages * page, 0x3, 0x22, -1, 0)
    assert base not in (None, -1)
    assert libc.mprotect(base + (npages - 1) * page, page, 0) == 0
    out = ctypes.create_string_buffer(1 << 17)
    rng = random.Random(3)
    for trial in range(60):
        kind = trial % 3
        nlen = rng.randrange(1, 40000)
        if kind == 0:
            data = bytes(rng.randrange(0, 64) for _ in range(nlen))
        elif kind == 1:
            data = bytes(rng.choice(b"ACGT") for _ in range(nlen))
        else:
            data = (b"ACGTACGGT" * (nlen // 9 + 1))[:nlen]
        co = zlib.compressobj(rng.choice([1, 6]), zlib.DEFLATED, -15)
        stream = co.compress(data) + co.flush()
        addr = base + (npages - 1) * page - len(stream)
        ctypes.memmove(addr, stream, len(stream))
        r = fn(addr, len(stream), out, len(out))
        assert r == len(data) and out.raw[:r] == data, (trial, kind, nlen, r)
        cut = rng.randrange(1, len(stream))
        ctypes.memmove(base + (npages - 1) * page - cut, stream, cut)
        r = fn(base + (npages - 1) * page - cut, cut, out, len(out))
        # truncated input: decline (-1, the zlib-fallback path) — or, when
        # the cut only removed trailing byte-alignment padding, the full
        # correct decode; never a garbage accept
        assert r == -1 or (r == len(data) and out.raw[:r] == data), (
            trial, cut, r)


class _BitWriter:
    """LSB-first DEFLATE bit emitter for hand-crafted streams."""

    def __init__(self):
        self.bits = []

    def put(self, value, nbits):  # LSB-first, per the DEFLATE spec
        for k in range(nbits):
            self.bits.append((value >> k) & 1)

    def put_code(self, code, nbits):  # Huffman codes go MSB-first
        for k in reversed(range(nbits)):
            self.bits.append((code >> k) & 1)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def test_fast_inflate_rejects_reserved_symbol_headers():
    """Dynamic headers declaring reserved symbols (HLIT > 286 / HDIST > 30,
    RFC 1951 3.2.7) must be rejected like zlib ("too many length or distance
    symbols").  Regression: a complete litlen code that assigns lengths to
    286/287 used to count them for completeness but skip their table
    entries, leaving stale/uninitialized root slots reachable from the
    decode loop (heap-overwrite risk on crafted BGZF input)."""
    import ctypes

    from gkl_tpu import native_lib

    lib = native_lib.load("gkl_codec")
    if lib is None:
        pytest.skip("native codec unavailable")
    fn = lib.gkl_fast_inflate
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                   ctypes.c_int]

    BitWriter = _BitWriter

    def craft(hlit_field, hdist_field):
        w = BitWriter()
        w.put(1, 1)            # BFINAL
        w.put(2, 2)            # BTYPE = dynamic
        w.put(hlit_field, 5)   # HLIT: nsym = field + 257
        w.put(hdist_field, 5)  # HDIST: nsym = field + 1
        # CL code over symbols {0,1,2,3}, all length 2 (complete):
        # codes 00/01/10/11.  HCLEN order is the kClPerm permutation.
        perm = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                11, 4, 12, 3, 13, 2, 14, 1, 15]
        cl_lens = {0: 2, 1: 2, 2: 2, 3: 2}
        w.put(19 - 4, 4)       # HCLEN: all 19 slots
        for s in perm:
            w.put(cl_lens.get(s, 0), 3)
        cl_code = {0: 0b00, 1: 0b01, 2: 0b10, 3: 0b11}
        nlit = hlit_field + 257
        ndist = hdist_field + 1
        # litlen lens: sym0 -> 1, sym256 -> 2, last two litlen syms -> 3
        # (Kraft-complete: 1/2 + 1/4 + 2/8 = 1); dist lens: sym0 -> 1.
        lens = [0] * (nlit + ndist)
        lens[0] = 1
        lens[256] = 2
        lens[nlit - 2] = lens[nlit - 1] = 3
        lens[nlit] = 1
        for v in lens:
            w.put_code(cl_code[v], 2)
        w.put_code(0b10, 2)    # end-of-block (canonical code for sym 256)
        return w.bytes()

    out = ctypes.create_string_buffer(1 << 12)
    for hlit_field, hdist_field in ((31, 0), (30, 0), (29, 31), (29, 30)):
        stream = craft(hlit_field, hdist_field)
        assert fn(stream, len(stream), out, len(out)) == -1, (
            hlit_field, hdist_field)
        with pytest.raises(zlib.error):
            zlib.decompressobj(-15).decompress(stream)
    # sanity: the same construction inside the legal bounds decodes to the
    # empty payload on both decoders
    legal = craft(29, 29)
    assert fn(legal, len(legal), out, len(out)) == 0
    assert zlib.decompressobj(-15).decompress(legal) == b""


def test_fast_inflate_zlib_header_strictness():
    """The fast decoder's acceptance set must never EXCEED zlib's
    (do_inflate treats r >= 0 as final; the generic Inflater path has no
    CRC behind it).  Regressions found by scripts/fuzz_codec.py:

    * INCOMPLETE Huffman codes: zlib (inftrees.c) errors at header-build
      time unless the code has exactly one 1-bit symbol; the fast decoder
      used to build the partial table and decode merrily until (unless!)
      the stream referenced a missing code — accepting mutants zlib
      rejects ("invalid literal/lengths set").
    * STATIC blocks referencing reserved symbols (litlen 286/287, dist
      30/31): the static tables count them for completeness, and the
      builder used to SKIP their slots, leaving uninitialized entries
      reachable from the decode loop (the dynamic-header analogue was
      fixed in round 3; the static path needs written-invalid markers)."""
    import ctypes

    from gkl_tpu import native_lib

    lib = native_lib.load("gkl_codec")
    if lib is None:
        pytest.skip("native codec unavailable")
    fn = lib.gkl_fast_inflate
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                   ctypes.c_int]
    out = ctypes.create_string_buffer(1 << 12)

    def both_reject(stream, why):
        assert fn(stream, len(stream), out, len(out)) == -1, why
        with pytest.raises(zlib.error):
            d = zlib.decompressobj(-15)
            d.decompress(stream)
            if not d.eof:
                raise zlib.error("truncated")  # pragma: no cover

    perm = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
            11, 4, 12, 3, 13, 2, 14, 1, 15]
    cl_code = {0: 0b00, 1: 0b01, 2: 0b10, 3: 0b11}

    def craft_dynamic(lit_lens, dist_lens, tail_codes=()):
        """Dynamic block: CL code {0,1,2,3} all len 2; explicit per-symbol
        litlen/dist lengths (0 elsewhere); then ``tail_codes`` emitted."""
        w = _BitWriter()
        w.put(1, 1)
        w.put(2, 2)
        nlit = max(list(lit_lens) + [256]) + 1
        ndist = max(list(dist_lens) + [0]) + 1
        w.put(nlit - 257, 5)
        w.put(ndist - 1, 5)
        w.put(19 - 4, 4)
        for s in perm:
            w.put(2 if s in (0, 1, 2, 3) else 0, 3)
        for s in range(nlit):
            w.put_code(cl_code[lit_lens.get(s, 0)], 2)
        for s in range(ndist):
            w.put_code(cl_code[dist_lens.get(s, 0)], 2)
        for code, nbits in tail_codes:
            w.put_code(code, nbits)
        return w.bytes()

    # incomplete litlen (two len-2 codes: Kraft 1/2 < 1, max=2): zlib
    # rejects at header; stream would otherwise decode cleanly to empty
    # (EOB = canonical code 01 for sym 256)
    both_reject(craft_dynamic({0: 2, 256: 2}, {0: 1}, [(0b01, 2)]),
                "incomplete litlen accepted")
    # incomplete dist set (one len-2 code over 2 declared symbols)
    both_reject(craft_dynamic({0: 1, 256: 1}, {0: 2, 1: 0}, [(0b1, 1)]),
                "incomplete dist accepted")
    # the ALLOWED incomplete shape: a single 1-bit dist code (real encoders
    # emit this); both decoders accept, empty payload
    ok = craft_dynamic({0: 1, 256: 1}, {0: 1}, [(0b1, 1)])
    assert fn(ok, len(ok), out, len(out)) == 0
    assert zlib.decompressobj(-15).decompress(ok) == b""

    def craft_static(codes):
        w = _BitWriter()
        w.put(1, 1)
        w.put(1, 2)  # BTYPE = static
        for code, nbits in codes:
            w.put_code(code, nbits)
        return w.bytes()

    static_lit = lambda s: (  # noqa: E731 - fixed litlen code (RFC 3.2.6)
        (0b00110000 + s, 8) if s < 144 else
        (0b110010000 + s - 144, 9) if s < 256 else
        (s - 256, 7) if s < 280 else
        (0b11000000 + s - 280, 8))
    # reserved litlen 286 / 287 in a static block
    both_reject(craft_static([static_lit(286)]), "static litlen 286")
    both_reject(craft_static([static_lit(287)]), "static litlen 287")
    # reserved dist 30/31 after a real literal + len-3 match
    for dcode in (30, 31):
        both_reject(craft_static([static_lit(65), static_lit(257),
                                  (dcode, 5)]), f"static dist {dcode}")
    # sanity: literal + EOB static block decodes on both
    good = craft_static([static_lit(65), static_lit(256)])
    assert fn(good, len(good), out, len(out)) == 1 and out.raw[:1] == b"A"
    assert zlib.decompressobj(-15).decompress(good) == b"A"


def test_fast_inflate_never_writes_past_out_cap():
    """Undersized out_cap is a documented -1 path (the caller's zlib
    fallback handles it), but the decoder must STILL never write past
    out + out_cap.  Regression: the hot loop's lit->match fast transition
    skipped the output-margin recheck, so a literal burst followed by a
    long match could write up to ~27 bytes past the cap (heap overflow on
    corrupt/oversized BGZF input)."""
    import ctypes
    import random

    from gkl_tpu import native_lib

    lib = native_lib.load("gkl_codec")
    if lib is None:
        pytest.skip("native codec unavailable")
    fn = lib.gkl_fast_inflate
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                   ctypes.c_int]

    rng = random.Random(11)
    # corpora chosen to exercise both hot-loop literal forms before a long
    # match: raw bytes (plain literals) and DNA (fused literal quads under
    # the dynamic 2-3 bit codes), each a 258-byte unique prefix followed by
    # dist-258 len-258 matches
    seeds = [bytes(rng.randrange(256) for _ in range(258)),
             bytes(rng.choice(b"ACGT") for _ in range(258))]
    pad = 512
    for seed in seeds:
        data = seed * 24
        for level in (1, 6):
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            stream = co.compress(data) + co.flush()
            caps = list(range(1, 700)) + [rng.randrange(700, len(data))
                                          for _ in range(64)] + [len(data)]
            for cap in caps:
                buf = ctypes.create_string_buffer(b"\xaa" * (cap + pad),
                                                  cap + pad)
                r = fn(stream, len(stream), buf, cap)
                assert buf.raw[cap:cap + pad] == b"\xaa" * pad, (
                    len(seed), level, cap, r)
                if cap == len(data):
                    assert r == cap and buf.raw[:r] == data


def test_fast_inflate_n_wider_than_gang():
    """gkl_fast_inflate_n with n above the gang width must decode EVERY
    block and write every rs[] slot (regression: n used to be silently
    clamped to 4, leaving rs[4:] uninitialized)."""
    import ctypes
    import random

    from gkl_tpu import native_lib

    lib = native_lib.load("gkl_codec")
    if lib is None:
        pytest.skip("native codec unavailable")
    fn = lib.gkl_fast_inflate_n
    fn.restype = None
    c_u8pp = ctypes.POINTER(ctypes.c_char_p)
    fn.argtypes = [c_u8pp, ctypes.POINTER(ctypes.c_int32), c_u8pp,
                   ctypes.POINTER(ctypes.c_int32),
                   ctypes.POINTER(ctypes.c_int32), ctypes.c_int]

    rng = random.Random(7)
    datas = [bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(1, 30000)))
             for _ in range(11)]
    streams = []
    for d in datas:
        co = zlib.compressobj(1, zlib.DEFLATED, -15)
        streams.append(co.compress(d) + co.flush())
    n = len(datas)
    ins = (ctypes.c_char_p * n)(*streams)
    ns = (ctypes.c_int32 * n)(*[len(s) for s in streams])
    bufs = [ctypes.create_string_buffer(1 << 16) for _ in range(n)]
    outs = (ctypes.c_char_p * n)(*[ctypes.cast(b, ctypes.c_char_p)
                                   for b in bufs])
    caps = (ctypes.c_int32 * n)(*[1 << 16] * n)
    rs = (ctypes.c_int32 * n)(*[-777] * n)
    fn(ins, ns, outs, caps, rs, n)
    for i, d in enumerate(datas):
        assert rs[i] == len(d), (i, rs[i], len(d))
        assert bufs[i].raw[:len(d)] == d, i


def test_fast_inflate_mutation_fuzz():
    """Randomized mutation fuzz of the fast decoder: bit flips, truncations
    and byte edits over DEFLATE streams from three corpora shapes x two
    encoders (zlib and the repo's fast L1).  Invariants, for EVERY mutant:
    (a) no byte is ever written past out_cap (canary pad); (b) an accepted
    decode (r >= 0) agrees byte-for-byte with the zlib oracle on the same
    mutant — the decoder may decline where zlib accepts (the caller falls
    back), never the reverse with different bytes."""
    import ctypes
    import random

    from gkl_tpu import native_lib

    lib = native_lib.load("gkl_codec")
    if lib is None:
        pytest.skip("native codec unavailable")
    fn = lib.gkl_fast_inflate
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                   ctypes.c_int]

    rng = random.Random(2024)
    pad = 320
    corpora = []
    for kind in range(3):
        n = rng.randrange(500, 30000)
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            data = bytes(rng.choice(b"ACGTN") for _ in range(n))
        else:
            seed = bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(4, 300)))
            data = (seed * (n // len(seed) + 1))[:n]
        for level in (1, 6):
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            corpora.append((data, co.compress(data) + co.flush()))
        fast = comp.raw_deflate(data, level=1)
        corpora.append((data, fast))

    checked = accepted = 0
    for data, stream in corpora:
        cap = len(data)
        for trial in range(40):
            mut = bytearray(stream)
            op = trial % 3
            if op == 0:  # flip 1-4 bits
                for _ in range(rng.randrange(1, 5)):
                    mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            elif op == 1:  # truncate
                del mut[rng.randrange(1, len(mut)):]
            else:  # overwrite a random short span
                at = rng.randrange(len(mut))
                for k in range(at, min(len(mut), at + rng.randrange(1, 9))):
                    mut[k] = rng.randrange(256)
            mut = bytes(mut)
            buf = ctypes.create_string_buffer(b"\xaa" * (cap + pad), cap + pad)
            r = fn(mut, len(mut), buf, cap)
            assert buf.raw[cap:] == b"\xaa" * pad, (len(data), trial, r)
            checked += 1
            if r < 0:
                continue
            accepted += 1
            d = zlib.decompressobj(-15)
            try:
                want = d.decompress(mut, cap)
            except zlib.error:
                pytest.fail(f"fast accepted a mutant zlib rejects "
                            f"(len={len(data)} trial={trial} r={r})")
            assert buf.raw[:r] == want[:r] and r == len(want), (
                len(data), trial, r, len(want))
    assert checked == len(corpora) * 40

"""BAM parser + streaming pipeline tests on the bundled 1 MB BAM."""

import os

import numpy as np
import pytest

from gkl_tpu import bam as bam_mod
from gkl_tpu import pipeline
from gkl_tpu.api import HaplotypeData, PairHMM, ReadData
from gkl_tpu.compression import bgzf as bgzf_mod

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
BAM = os.path.join(DATA_DIR, "HiSeq.1mb.1RG.2k_lines.bam")


def test_bam_parse_header_and_records():
    header, records = bam_mod.read_bam(BAM)
    assert header.ref_names, "expected reference sequences in header"
    assert len(records) >= 1000
    r = records[0]
    assert len(r.seq) == len(r.qual) > 0
    assert set(bytes(r.seq)) <= set(b"=ACMGRSVTWYHKDBN")
    # CIGAR lengths must cover the read for mapped reads without hard clips
    for rec in records[:50]:
        if rec.is_unmapped or not rec.cigar:
            continue
        span = sum(n for n, op in rec.cigar if op in "MIS=X")
        assert span == len(rec.seq), (rec.name, rec.cigar_string())


def test_bam_qualities_phred_range():
    _, records = bam_mod.read_bam(BAM, limit=200)
    quals = np.concatenate([r.qual for r in records])
    assert quals.max() < 60  # raw phred, not +33 ASCII


def test_pipeline_stream_matches_direct_api():
    header, records = bam_mod.read_bam(BAM, limit=64)
    mapped = [
        r for r in records
        if not (r.flag & (bam_mod.FLAG_UNMAPPED | bam_mod.FLAG_SECONDARY | bam_mod.FLAG_SUPPLEMENTARY))
        and len(r.seq)
    ][:24]
    # haplotypes synthesized from read sequences (a realistic assembled-hap stand-in)
    haps = [HaplotypeData(mapped[i].seq) for i in (0, 1, 2)]

    chunks = list(
        pipeline.pairhmm_stream(BAM, haps, chunk_reads=10, limit=64)
    )
    assert len(chunks) >= 2  # streaming actually chunked
    names = [n for c in chunks for n in c.read_names]
    lik = np.concatenate([c.likelihoods for c in chunks], axis=0)
    assert lik.shape == (len(names), 3)
    assert np.all(np.isfinite(lik)) and np.all(lik <= 0.0)

    # oracle: the same reads through the PairHMM API directly
    direct = PairHMM().compute_likelihoods(
        pipeline.reads_from_records(mapped[:10]), haps
    ).reshape(10, 3)
    np.testing.assert_allclose(lik[:10], direct, atol=1e-12)

    # a read scored against a haplotype equal to itself should dominate
    self_scores = np.diagonal(lik[:3])
    assert np.all(self_scores >= lik[:3].min(axis=1))


def test_pairhmm_bam_convenience():
    _, records = bam_mod.read_bam(BAM, limit=8)
    haps = [HaplotypeData(records[0].seq)]
    res = pipeline.pairhmm_bam(BAM, haps, limit=16, chunk_reads=8)
    assert res.likelihoods.shape[1] == 1
    assert len(res.read_names) == res.likelihoods.shape[0] > 0


def test_sw_align_stream():
    _, records = bam_mod.read_bam(BAM, limit=16)
    ref = records[0].seq  # align reads against one read's sequence window
    chunks = list(pipeline.sw_align_stream(BAM, ref, chunk_reads=6, limit=16))
    assert len(chunks) >= 2
    names, results = chunks[0]
    assert len(names) == len(results) == 6
    # the self-alignment read gets a full-length match CIGAR
    assert results[0].cigar == f"{len(ref)}M"
    for r in results:
        assert r.cigar and r.alignment_offset >= -len(ref)


def test_bam_write_read_roundtrip(tmp_path):
    """Record-for-record write->read equality at multiple compression levels
    (the DeflaterIntegrationTest.java:27-99 contract without the JVM)."""
    header, records = bam_mod.read_bam(BAM, limit=300)
    for level in (1, 6):
        out = str(tmp_path / f"rt{level}.bam")
        bam_mod.write_bam(out, header, records, level=level)
        h2, r2 = bam_mod.read_bam(out)
        assert h2.ref_names == header.ref_names
        assert h2.ref_lengths == header.ref_lengths
        assert len(r2) == len(records)
        for a, b in zip(records, r2):
            assert a.name == b.name and a.flag == b.flag
            assert a.ref_id == b.ref_id and a.pos == b.pos and a.mapq == b.mapq
            assert a.cigar == b.cigar
            np.testing.assert_array_equal(a.seq, b.seq)
            np.testing.assert_array_equal(a.qual, b.qual)


def test_native_scanner_matches_python():
    """The C++ record scanner and the Python parser produce identical
    records (fields, CIGARs, sequences, quals)."""
    with open(BAM, "rb") as fh:
        data = fh.read()
    payload = bam_mod.bgzf.decompress(data)
    _, off = bam_mod.parse_header(payload)
    native = bam_mod.parse_records_native(payload, off, limit=400)
    assert native is not None, "native BAM scanner should build here"
    py = list(bam_mod.parse_records(payload, off, limit=400))
    assert len(native) == len(py) == 400
    for a, b in zip(native, py):
        assert (a.name, a.flag, a.ref_id, a.pos, a.mapq) == (b.name, b.flag, b.ref_id, b.pos, b.mapq)
        assert a.cigar == b.cigar
        np.testing.assert_array_equal(a.seq, b.seq)
        np.testing.assert_array_equal(a.qual, b.qual)


def _mk_record(name=b"r1", n_cigar=0, l_seq=4, block_size=None):
    """Serialize one BAM alignment record with controllable (possibly
    corrupt) sizes."""
    import struct

    body = struct.pack(
        "<iiBBHHHiiii", 0, 100, len(name) + 1, 30, 0, n_cigar, 0, l_seq, -1, -1, 0
    )
    body += name + b"\x00"
    body += b"\x00\x00\x00\x00" * n_cigar
    body += b"\x12" * ((l_seq + 1) // 2)
    body += b"\x20" * l_seq
    bs = len(body) if block_size is None else block_size
    return struct.pack("<i", bs) + body


def test_corrupt_bam_record_rejected():
    """Oversized variable sections / bogus block_size must error, not walk
    past the record (native scanner) or loop forever (pure Python)."""
    import pytest

    good = _mk_record()
    rec = bam_mod.parse_records_native(good, 0)
    if rec is not None:
        assert len(rec) == 1 and rec[0].seq.tobytes() == b"AC" * 2

    # l_seq far larger than the record block
    bad_seq = _mk_record()  # well-formed layout...
    import struct as _s
    bad_seq = bytearray(bad_seq)
    _s.pack_into("<i", bad_seq, 4 + 16, 10_000)  # l_seq field
    bad_seq = bytes(bad_seq)
    with pytest.raises(ValueError):
        list(bam_mod.parse_records(bad_seq, 0))
    if rec is not None:
        with pytest.raises(ValueError):
            bam_mod.parse_records_native(bad_seq, 0)

    # non-positive block_size: must raise, not loop forever
    bad_bs = _mk_record(block_size=-4)
    with pytest.raises(ValueError):
        list(bam_mod.parse_records(bad_bs, 0))
    if rec is not None:
        with pytest.raises(ValueError):
            bam_mod.parse_records_native(bad_bs, 0)


def test_streaming_reader_matches_whole_file():
    """read_bam_streaming (bounded-memory incremental BGZF + record parse)
    must produce exactly the records of the whole-file reader, including
    when the read window is tiny enough that records span windows."""
    header, rec_iter = bam_mod.read_bam_streaming(BAM, limit=300, read_size=1 << 15)
    streamed = list(rec_iter)
    _, whole = bam_mod.read_bam(BAM, limit=300)
    assert header.ref_names == bam_mod.read_bam(BAM, limit=1)[0].ref_names
    assert len(streamed) == len(whole)
    for a, b in zip(streamed, whole):
        assert a.name == b.name and a.flag == b.flag and a.pos == b.pos
        np.testing.assert_array_equal(a.seq, b.seq)
        np.testing.assert_array_equal(a.qual, b.qual)
        assert a.cigar == b.cigar


def test_pipeline_golden_snapshot():
    """gatkIntegration.sh analogue (scripts/gatkIntegration.sh:26-31): the
    end-to-end BAM -> codec -> batch -> PairHMM pipeline must reproduce a
    committed snapshot of likelihoods for the bundled BAM's first reads."""
    from gkl_tpu.api import HaplotypeData

    _, records = bam_mod.read_bam(BAM, limit=8)
    haps = [HaplotypeData(records[i].seq) for i in (0, 1, 2, 3)]
    res = pipeline.pairhmm_bam(BAM, haps, limit=24, chunk_reads=8)

    golden_path = os.path.join(DATA_DIR, "pipeline_golden.txt")
    names, rows = [], []
    with open(golden_path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            parts = line.split()
            names.append(parts[0])
            rows.append([float(v) for v in parts[1:]])
    assert res.read_names == names
    np.testing.assert_allclose(res.likelihoods, np.array(rows), atol=1e-5)


def test_region_pipeline_golden_snapshot():
    """Mixed-kernel region pipeline (the GATK active-region shape,
    BASELINE config 5): ONE BAM stream through PairHMM scoring, SW
    realignment against each read's best haplotype, and PDHMM scoring
    against partially-determined haplotypes — all asserted against a
    committed snapshot.  The PairHMM block of the snapshot equals
    pipeline_golden.txt (cross-validated at generation time)."""
    from gkl_tpu.api import HaplotypeData
    from gkl_tpu.api_pdhmm import PDHaplotypeData

    _, records = bam_mod.read_bam(BAM, limit=8)
    haps = [HaplotypeData(records[i].seq) for i in (0, 1, 2, 3)]
    pd0 = np.zeros(len(records[0].seq), np.uint8)
    pd0[10] = 2  # DEL_START
    pd0[13] = 4  # DEL_END
    pd_haps = [
        PDHaplotypeData(records[0].seq, haplotype_pdbases=pd0),
        PDHaplotypeData(records[1].seq,
                        haplotype_pdbases=np.zeros(len(records[1].seq),
                                                   np.uint8)),
    ]
    res = pipeline.region_bam(BAM, haps, pd_haplotypes=pd_haps, limit=24,
                              chunk_reads=8)

    names, bests, offs, cigars, liks, pdliks = [], [], [], [], [], []
    with open(os.path.join(DATA_DIR, "region_golden.txt")) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            p = line.split()
            names.append(p[0])
            bests.append(int(p[1]))
            offs.append(int(p[2]))
            cigars.append(p[3])
            liks.append([float(v) for v in p[4:8]])
            pdliks.append([float(v) for v in p[8:10]])
    assert res.read_names == names
    assert list(res.best_haplotype) == bests
    assert list(res.offsets) == offs
    assert res.cigars == cigars
    np.testing.assert_allclose(res.likelihoods, np.array(liks), atol=1e-5)
    np.testing.assert_allclose(res.pd_likelihoods, np.array(pdliks),
                               atol=1e-4)


def test_streaming_writer_recompress_roundtrip(tmp_path):
    """Full-BAM streaming recompress (decode → records → streaming writer,
    bounded memory): record-for-record equality on re-read at levels 1 and
    6, with every non-final BGZF block maximal (the write-side streaming
    stage completing the DeflaterIntegrationTest loop)."""
    from gkl_tpu import pipeline
    from gkl_tpu.compression import bgzf

    header, records = bam_mod.read_bam(BAM)
    for level in (1, 6):
        out = str(tmp_path / f"rc{level}.bam")
        n = pipeline.bam_recompress(BAM, out, level=level,
                                    window_blocks=4 if level == 1 else 64)
        assert n == len(records)
        h2, r2 = bam_mod.read_bam(out)
        assert h2.ref_names == header.ref_names
        assert len(r2) == len(records)
        for a, b in zip(records, r2):
            assert a.name == b.name and a.flag == b.flag
            assert a.ref_id == b.ref_id and a.pos == b.pos and a.mapq == b.mapq
            assert a.cigar == b.cigar
            np.testing.assert_array_equal(a.seq, b.seq)
            np.testing.assert_array_equal(a.qual, b.qual)
        # non-final data blocks are maximal (the writer only emits a
        # partial block at end-of-stream)
        with open(out, "rb") as fh:
            blocks = bgzf.split_blocks(fh.read())
        sizes = [len(bgzf.decompress_block(b)) for b in blocks]
        assert sizes[-1] == 0  # EOF marker
        assert all(s == bgzf.MAX_BLOCK_DATA for s in sizes[:-2]), sizes[:8]

        # LOSSLESS: the record byte stream survives verbatim — tags, mate
        # info (next_refID/next_pos/tlen), and bin are preserved, not just
        # the decoded fields above (regression: encode_record used to
        # re-serialize from decoded fields, silently dropping all of them)
        with open(BAM, "rb") as fh:
            src_payload = bytes(bgzf.decompress(fh.read()))
        with open(out, "rb") as fh:
            dst_payload = bytes(bgzf.decompress(fh.read()))
        _, src_off = bam_mod.parse_header(src_payload)
        _, dst_off = bam_mod.parse_header(dst_payload)
        assert src_payload[src_off:] == dst_payload[dst_off:]


def test_reads_from_records_share_const_planes():
    """The pipeline's ReadData construction must keep GOP/GCP planes
    identity-shared per length so api._const_quals_of detects the
    constant-plane flow in O(unique planes) and the device synthesizes
    them (docs/DESIGN.md 'Host link rules')."""
    from gkl_tpu import api

    _, records = bam_mod.read_bam(BAM, limit=32)
    reads = pipeline.reads_from_records(records)
    by_len = {}
    for rd in reads:
        n = len(rd.read_bases)
        assert rd.insertion_gop is rd.deletion_gop
        if n in by_len:
            assert rd.insertion_gop is by_len[n]
        by_len[n] = rd.insertion_gop
    assert api._const_quals_of(reads) == (45, 45, 10)


def test_stream_abandoned_producer_terminates():
    """Breaking out of pairhmm_stream (or closing it) must stop the
    producer thread — it may not stay blocked on the full prefetch queue
    holding the BAM handle open (leak regression)."""
    import threading
    import time

    from gkl_tpu import bam as bam_mod
    from gkl_tpu.api import HaplotypeData
    from gkl_tpu.pipeline import pairhmm_stream

    _, records = bam_mod.read_bam(BAM, limit=4)
    haps = [HaplotypeData(records[0].seq)]
    before = set(threading.enumerate())
    gen = pairhmm_stream(BAM, haps, chunk_reads=8, limit=256, prefetch=1)
    next(gen)  # producer running, queue full
    gen.close()  # GeneratorExit -> finally -> stop event
    deadline = time.time() + 10.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer thread leaked: {leaked}"


def test_read_bam_limit_semantics():
    """limit=0 returns zero records on every reader (regression: the native
    scanner treated <= 0 as unlimited, the Python fallback returned one),
    and limit=N returns exactly N on all three paths."""
    h0, r0 = bam_mod.read_bam(BAM, limit=0)
    assert r0 == []
    _, it0 = bam_mod.read_bam_streaming(BAM, limit=0)
    assert list(it0) == []
    with open(BAM, "rb") as fh:
        payload = bytes(bgzf_mod.decompress(fh.read()))
    _, off = bam_mod.parse_header(payload)
    assert list(bam_mod.parse_records(payload, off, limit=0)) == []

    _, r3 = bam_mod.read_bam(BAM, limit=3)
    _, it3 = bam_mod.read_bam_streaming(BAM, limit=3)
    py3 = list(bam_mod.parse_records(payload, off, limit=3))
    assert len(r3) == len(list(it3)) == len(py3) == 3
    assert [r.name for r in r3] == [r.name for r in py3]


def test_split_blocks_truncated_raises_valueerror():
    """A stream cut mid-member reports the module's ValueError contract,
    not a struct.error escaping from a short unpack."""
    import pytest

    with open(BAM, "rb") as fh:
        data = fh.read()
    for cut in (5, 11, 20, len(data) - 7):
        with pytest.raises(ValueError):
            bgzf_mod.split_blocks(data[:cut])


def test_parse_header_rejects_negative_l_text():
    import pytest

    bad = b"BAM\x01" + (-5).to_bytes(4, "little", signed=True) + b"\x00" * 64
    with pytest.raises(ValueError, match="l_text"):
        bam_mod.parse_header(bad)
    with pytest.raises(ValueError, match="l_text"):
        bam_mod.try_parse_header(bytearray(bad))

"""Multi-host helper tests (single-process degradation + global assembly)."""

import jax
import numpy as np
import pytest

from gkl_tpu import parallel


def test_initialize_single_process_noop():
    parallel.initialize(num_processes=1)  # must not raise
    assert jax.process_count() == 1


def test_host_local_slice_single_process():
    s = parallel.host_local_slice(64)
    assert (s.start, s.stop) == (0, 64)


def test_make_global_array_roundtrip():
    mesh = parallel.global_mesh()
    n_dev = mesh.size
    shard = np.arange(16 * 4 * n_dev, dtype=np.float32).reshape(16, 4 * n_dev)
    arr = parallel.make_global_array(shard, mesh, axis=-1)
    assert arr.shape == shard.shape  # single process: global == local
    np.testing.assert_array_equal(np.asarray(arr), shard)


def test_sharded_pairhmm_on_global_mesh():
    from gkl_tpu.batch import PackedPairs
    from gkl_tpu.ops.pairhmm import pairhmm_raw

    mesh = parallel.global_mesh()
    P = 8 * mesh.size
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, (24, P))]
    read = hap[:16].copy()
    q = rng.integers(20, 40, (16, P)).astype(np.uint8)
    iq = rng.integers(30, 45, (16, P)).astype(np.uint8)
    dq = rng.integers(30, 45, (16, P)).astype(np.uint8)
    gcp = np.full((16, P), 10, np.uint8)
    haplen = np.full(P, 24, np.int32)
    rslen = np.full(P, 16, np.int32)
    packed = PackedPairs(hap, read, q, iq, dq, gcp, haplen, rslen, P)
    with mesh:
        out = np.asarray(parallel.pairhmm_raw_sharded(mesh, packed))
    ref = np.asarray(pairhmm_raw(hap, read, q, iq, dq, gcp, haplen, rslen, dtype="float32"))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_pairhmm_variant_aliases():
    from gkl_tpu.api import PairHMM, PairHMMFpga, PairHMMOMP

    assert issubclass(PairHMMOMP, PairHMM)
    assert issubclass(PairHMMFpga, PairHMM)


def test_pairhmm_api_with_mesh():
    """PairHMM(mesh=...) shards batches across the dp mesh transparently and
    matches single-device results (incl. the rescue chain)."""
    import golden
    from gkl_tpu import HaplotypeData, PairHMM, ReadData

    mesh = parallel.global_mesh()
    cases = golden.load_pairhmm_cases()[:12]
    reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases]
    haps = [HaplotypeData(c.hap) for c in cases]
    sharded = PairHMM(mesh=mesh).compute_likelihoods(reads, haps)
    single = PairHMM().compute_likelihoods(reads, haps)
    np.testing.assert_allclose(sharded, single, atol=1e-9)
    expected = np.array([c.expected for c in cases])
    np.testing.assert_allclose(
        sharded.reshape(12, 12).diagonal(), expected, atol=1e-5)


def test_pdhmm_api_with_mesh():
    import golden
    from gkl_tpu.api import ReadData
    from gkl_tpu.api_pdhmm import PDHaplotypeData, PDHMM

    mesh = parallel.global_mesh()
    cases = golden.load_pdhmm_cases("pdhmm_syn_199_68_51.txt")[:6]
    reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases]
    haps = [PDHaplotypeData(c.hap, haplotype_pdbases=c.hap_pd) for c in cases]
    sharded = PDHMM(mesh=mesh).compute_likelihoods(reads, haps)
    single = PDHMM().compute_likelihoods(reads, haps)
    np.testing.assert_allclose(sharded, single, atol=1e-9)
    expected = np.array([c.expected for c in cases])
    np.testing.assert_allclose(sharded.reshape(6, 6).diagonal(), expected, atol=1e-4)


def test_sw_api_with_mesh():
    from gkl_tpu.api_sw import OverhangStrategy, SmithWaterman, SWParameters

    mesh = parallel.global_mesh()
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    refs, alts = [], []
    for _ in range(12):
        n = int(rng.integers(10, 40))
        r = bases[rng.integers(0, 4, n)]
        a = r.copy()
        a[rng.integers(0, n)] = bases[rng.integers(0, 4)]
        refs.append(r)
        alts.append(a)
    params = SWParameters(200, -150, -260, -11)
    got = SmithWaterman(mesh=mesh).align_batch(refs, alts, params, OverhangStrategy.SOFTCLIP)
    want = SmithWaterman().align_batch(refs, alts, params, OverhangStrategy.SOFTCLIP)
    assert [(g.cigar, g.alignment_offset) for g in got] == [
        (w.cigar, w.alignment_offset) for w in want]


def _packed_batch(P, H=24, R=16, seed=0):
    from gkl_tpu.batch import PackedPairs

    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, (H, P))]
    read = hap[:R].copy()
    mut = rng.random((R, P)) < 0.1
    read[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
    q = rng.integers(20, 40, (R, P)).astype(np.uint8)
    iq = rng.integers(30, 45, (R, P)).astype(np.uint8)
    dq = rng.integers(30, 45, (R, P)).astype(np.uint8)
    gcp = np.full((R, P), 10, np.uint8)
    haplen = np.full(P, H, np.int32)
    rslen = np.full(P, R, np.int32)
    return PackedPairs(hap, read, q, iq, dq, gcp, haplen, rslen, P)


def test_pallas_sharded_bit_parity():
    """The Pallas kernels run per-shard under shard_map (interpret mode on
    the CPU mesh) and reproduce the unsharded Pallas results bit-for-bit —
    the mesh path must keep the fast kernels, not the jnp engines."""
    from gkl_tpu.ops import pairhmm_pallas

    mesh = parallel.data_parallel_mesh(8)
    packed = _packed_batch(8 * 8)
    with mesh:
        out = np.asarray(parallel.pairhmm_raw_pallas_sharded(
            mesh, packed, lane_block=8, interpret=True))
    ref = np.asarray(pairhmm_pallas.pairhmm_raw_pallas(
        packed.hap, packed.read, packed.q, packed.iq, packed.dq, packed.gcp,
        packed.haplen, packed.rslen, lane_block=8, interpret=True))
    np.testing.assert_array_equal(out, ref)

    with mesh:
        m, e, f = parallel.pairhmm_raw_pallas_scaled_sharded(
            mesh, packed, lane_block=8, interpret=True)
    m2, e2, f2 = pairhmm_pallas.pairhmm_raw_pallas_scaled(
        packed.hap, packed.read, packed.q, packed.iq, packed.dq, packed.gcp,
        packed.haplen, packed.rslen, lane_block=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(f), np.asarray(f2))


def test_pallas_sharded_sw_pdhmm_bit_parity():
    from gkl_tpu.api_sw import SWParameters
    from gkl_tpu.ops import pdhmm as pdhmm_ops
    from gkl_tpu.ops import pdhmm_pallas, sw_pallas

    mesh = parallel.data_parallel_mesh(8)
    packed = _packed_batch(8 * 8)
    params = SWParameters(200, -150, -260, -11)
    with mesh:
        bt, lr, lc = parallel.sw_forward_pallas_sharded(
            mesh, packed.hap, packed.read, packed.haplen, packed.rslen,
            params, lane_block=8, interpret=True)
    bt2, lr2, lc2 = sw_pallas.sw_forward_pallas(
        packed.hap, packed.read, packed.haplen, packed.rslen,
        200, -150, -260, -11, indel_boundary=False, lane_block=8,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(bt), np.asarray(bt2))
    np.testing.assert_array_equal(np.asarray(lr), np.asarray(lr2))
    np.testing.assert_array_equal(np.asarray(lc), np.asarray(lc2))

    hap_pd = np.zeros_like(packed.hap)
    hap_pd[4, ::2] = 2  # DEL_START
    hap_pd[7, ::2] = 4  # DEL_END
    states = pdhmm_ops.column_states(hap_pd)
    with mesh:
        raw = np.asarray(parallel.pdhmm_raw_pallas_sharded(
            mesh, packed, hap_pd, states, lane_block=8, interpret=True))
    raw2 = np.asarray(pdhmm_pallas.pdhmm_raw_pallas(
        packed.hap, hap_pd, states, packed.read, packed.q, packed.iq,
        packed.dq, packed.gcp, packed.haplen, packed.rslen, lane_block=8,
        interpret=True))
    np.testing.assert_array_equal(raw, raw2)


def test_api_mesh_selects_pallas(monkeypatch):
    """PairHMM(mesh=...) must route through the Pallas sharded kernels when
    Pallas is available (the mesh path may not silently lose the fast
    path).  TPU availability is faked; kernels run in interpret mode."""
    import functools

    import golden
    from gkl_tpu import HaplotypeData, PairHMM, ReadData, utils
    from gkl_tpu.ops import pairhmm_pallas

    monkeypatch.setattr(utils, "is_tpu_available", lambda: True)
    calls = {"scaled": 0}
    orig = pairhmm_pallas.pairhmm_raw_pallas_scaled

    def counting(*a, **kw):
        calls["scaled"] += 1
        kw["interpret"] = True  # CPU mesh: no Mosaic compile
        return orig(*a, **kw)

    monkeypatch.setattr(pairhmm_pallas, "pairhmm_raw_pallas_scaled", counting)

    mesh = parallel.data_parallel_mesh(8)
    cases = golden.load_pairhmm_cases()[:3]
    reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases]
    haps = [HaplotypeData(c.hap) for c in cases]
    # lane_multiple=8*mesh.size keeps the interpret-mode batch small; the
    # scaled kernel requires lanes % 128*mesh.size == 0 only on real TPU,
    # so pass an explicit multiple that satisfies the kernel's lane_block
    hmm = PairHMM(mesh=mesh, lane_multiple=128 * mesh.size)
    out = hmm.compute_likelihoods(reads, haps)
    assert calls["scaled"] >= 1, "mesh path did not use the Pallas scaled kernel"
    expected = np.array([c.expected for c in cases])
    np.testing.assert_allclose(out.reshape(3, 3).diagonal(), expected, atol=1e-5)


def test_sw_relay_sharded_bit_parity():
    """The segment-relayed SW under shard_map must match the unsharded
    relay bit-for-bit (integer DP)."""
    from gkl_tpu.api_sw import SWParameters
    from gkl_tpu.ops import sw_pallas

    mesh = parallel.data_parallel_mesh(8)
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    N, M, P = 32, 16, 64
    ref = bases[rng.integers(0, 4, (N, P))]
    alt = bases[rng.integers(0, 4, (M, P))]
    alt[: M, ::2] = ref[:M, ::2]
    reflen = rng.integers(4, N + 1, P).astype(np.int32)
    altlen = rng.integers(4, M + 1, P).astype(np.int32)
    params = SWParameters(200, -150, -260, -11)
    got = parallel.sw_forward_pallas_relay_sharded(
        mesh, ref, alt, reflen, altlen, params, seg=8, lane_block=8,
        interpret=True)
    want = sw_pallas.sw_forward_pallas_relay(
        ref, alt, reflen, altlen, 200, -150, -260, -11,
        indel_boundary=False, seg=8, lane_block=8, interpret=True)
    for x, y in zip(got, want):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pdhmm_chunked_sharded_bit_parity():
    """The read-axis-chunked PDHMM under shard_map must match the unsharded
    chunked path bit-for-bit (same kernel per shard)."""
    from gkl_tpu.ops import pdhmm as pdhmm_ops
    from gkl_tpu.ops import pdhmm_pallas

    mesh = parallel.data_parallel_mesh(8)
    packed = _packed_batch(8 * 8, H=40, R=24)
    hap_pd = np.zeros_like(packed.hap)
    hap_pd[6, ::2] = 2
    hap_pd[9, ::2] = 4
    states = pdhmm_ops.column_states(hap_pd)
    # r_chunk=8 forces multiple relayed chunks on both sides
    got = np.asarray(parallel.pdhmm_raw_pallas_chunked_sharded(
        mesh, packed, hap_pd, states, r_chunk=8, lane_block=8, interpret=True))
    want = np.asarray(pdhmm_pallas.pdhmm_raw_pallas_chunked(
        packed.hap, hap_pd, states, packed.read, packed.q, packed.iq,
        packed.dq, packed.gcp, packed.haplen, packed.rslen, r_chunk=8,
        lane_block=8, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_api_mesh_deep_lane_rescue_policies(monkeypatch):
    """Mesh + deep-lane rescue equivalence across the three GKL_TPU_RESCUE
    policies: each policy's mesh result must match the same policy WITHOUT
    a mesh, and all must agree with the host-f64 engine to policy-level
    tolerance (device policy trusts the scaled kernel: 1e-4; flagged/host
    recompute deep lanes exactly)."""
    from gkl_tpu import HaplotypeData, PairHMM, ReadData, utils
    from gkl_tpu.api import PairHMMNativeArguments
    from gkl_tpu.ops import pairhmm_pallas

    monkeypatch.setattr(utils, "is_tpu_available", lambda: True)

    def force_interpret(orig):
        def f(*a, **kw):
            kw["interpret"] = True  # CPU mesh: no Mosaic compile
            return orig(*a, **kw)

        return f

    for name in ("pairhmm_raw_pallas_scaled", "pairhmm_raw_pallas"):
        monkeypatch.setattr(pairhmm_pallas, name,
                            force_interpret(getattr(pairhmm_pallas, name)))

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, 320)]
    # random read vs random hap at high qual -> deep underflow (~ -250)
    reads = [ReadData(bases[rng.integers(0, 4, 256)],
                      np.full(256, 50, np.uint8), np.full(256, 50, np.uint8),
                      np.full(256, 50, np.uint8), np.full(256, 10, np.uint8))
             for _ in range(3)]
    haps = [HaplotypeData(hap)]

    mesh = parallel.data_parallel_mesh(8)
    f64 = PairHMM(PairHMMNativeArguments(use_double_precision=True),
                  lane_multiple=8).compute_likelihoods(reads, haps)
    assert np.max(f64) < -200  # genuinely deep lanes

    # host recomputes every deep lane in exact f64; flagged only rescues
    # lanes whose window-spread flag fired (these shallow-deep lanes stay
    # on the scaled kernel), so flagged/device carry f32-class accuracy
    for policy, tol in (("flagged", 1e-4), ("device", 1e-4), ("host", 1e-9)):
        monkeypatch.setenv("GKL_TPU_RESCUE", policy)
        no_mesh = PairHMM(lane_multiple=128).compute_likelihoods(reads, haps)
        with_mesh = PairHMM(mesh=mesh, lane_multiple=128 * mesh.size
                            ).compute_likelihoods(reads, haps)
        np.testing.assert_allclose(with_mesh, no_mesh, rtol=0, atol=1e-9,
                                   err_msg=policy)
        np.testing.assert_allclose(with_mesh, f64, rtol=0, atol=tol,
                                   err_msg=policy)


def test_indexed_sharded_bit_parity():
    """The deduplicated (device-expanded) batch under the dp mesh matches
    the unsharded scaled kernel bit-for-bit: the full-pattern layout
    shards unique reads and pair lanes with the same cuts, so per-shard
    inputs are identical to the dense path's."""
    from gkl_tpu import batch as batch_mod
    from gkl_tpu.ops import pairhmm_pallas

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    haps = [bases[rng.integers(0, 4, 24)] for _ in range(2)]
    reads = [bases[rng.integers(0, 4, 16)] for _ in range(32)]
    rquals = [(rng.integers(20, 40, 16).astype(np.uint8),
               rng.integers(30, 45, 16).astype(np.uint8),
               rng.integers(30, 45, 16).astype(np.uint8),
               np.full(16, 10, np.uint8)) for _ in range(32)]
    mesh = parallel.data_parallel_mesh(8)
    for const in (None, (45, 45, 10)):
        pk = batch_mod.pack_pairs_indexed(haps, reads, rquals,
                                          lane_multiple=8 * mesh.size,
                                          const_quals=const,
                                          full_pattern=True)
        assert pk.pattern_nh == 2 and pk.readq_u.shape[2] % mesh.size == 0
        with mesh:
            stacked = np.asarray(parallel.pairhmm_scaled_indexed_sharded(
                mesh, pk, lane_block=8, interpret=True))
        dense = pk.materialize()
        m2, e2, f2 = pairhmm_pallas.pairhmm_raw_pallas_scaled(
            dense.hap, dense.read, dense.q, dense.iq, dense.dq, dense.gcp,
            dense.haplen, dense.rslen, lane_block=8, interpret=True)
        np.testing.assert_array_equal(stacked[0], np.asarray(m2))
        np.testing.assert_array_equal(stacked[1],
                                      np.asarray(e2).astype(np.float32))
        np.testing.assert_array_equal(stacked[2],
                                      np.asarray(f2).astype(np.float32))


def test_raw_global_auto_engine_binds_per_device():
    """engine='auto' must size the Pallas lane-block check per DEVICE, not
    per host: 16 host lanes over an 8-device mesh give 2 lanes/device —
    too few for the 8-lane interpret block — so auto must take the jnp
    engine (the old per-host check picked Pallas and crashed in trace).
    Also: an explicit engine='pallas' with dtype='float64' must raise
    rather than silently compute float32."""
    from gkl_tpu.batch import PackedPairs
    from gkl_tpu.ops.pairhmm import pairhmm_raw
    from gkl_tpu.parallel import distributed

    mesh = parallel.global_mesh()
    P = 2 * mesh.size  # 2 lanes per device < interpret lane block (8)
    rng = np.random.default_rng(4)
    bases = np.frombuffer(b"ACGT", np.uint8)
    hap = bases[rng.integers(0, 4, (24, P))]
    read = hap[:16].copy()
    q = rng.integers(20, 40, (16, P)).astype(np.uint8)
    iq = rng.integers(30, 45, (16, P)).astype(np.uint8)
    dq = rng.integers(30, 45, (16, P)).astype(np.uint8)
    gcp = np.full((16, P), 10, np.uint8)
    haplen = np.full(P, 24, np.int32)
    rslen = np.full(P, 16, np.int32)
    packed = PackedPairs(hap, read, q, iq, dq, gcp, haplen, rslen, P)
    out = distributed.pairhmm_raw_global(mesh, packed)  # auto -> jnp
    ref = np.asarray(pairhmm_raw(hap, read, q, iq, dq, gcp, haplen, rslen,
                                 dtype="float32"))
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    with pytest.raises(ValueError, match="float32"):
        distributed.pairhmm_raw_global(mesh, packed, dtype="float64",
                                       engine="pallas")


def test_relay_chunked_global_entries_match_local():
    """Pod entries for LONG sequences: sw_relay_global / pdhmm_chunked_global
    keep carried state device-resident and dp-sharded across segment/chunk
    calls (a multi-process mesh cannot host-fetch mid-loop) and must match
    the single-device relay engines bit-for-bit."""
    from gkl_tpu.api_sw import SWParameters
    from gkl_tpu.ops import pdhmm as pdhmm_ops
    from gkl_tpu.ops import pdhmm_pallas, sw_pallas
    from gkl_tpu.parallel import distributed

    mesh = parallel.data_parallel_mesh(8)
    P = 8 * 8
    packed = _packed_batch(P, H=24, R=16)
    params = SWParameters(200, -150, -260, -11)
    bt, lr, lc = distributed.sw_relay_global(
        mesh, packed.hap, packed.read, packed.haplen, packed.rslen, params,
        seg=8, lane_block=8, interpret=True)
    bt2, lr2, lc2 = sw_pallas.sw_forward_pallas_relay(
        packed.hap, packed.read, packed.haplen, packed.rslen,
        200, -150, -260, -11, indel_boundary=False, seg=8, lane_block=8,
        interpret=True)
    np.testing.assert_array_equal(bt, np.asarray(bt2))
    np.testing.assert_array_equal(lr, np.asarray(lr2))
    np.testing.assert_array_equal(lc, np.asarray(lc2))

    hap_pd = np.zeros_like(packed.hap)
    hap_pd[4, ::2] = 2  # DEL_START
    hap_pd[7, ::2] = 4  # DEL_END
    states = pdhmm_ops.column_states(hap_pd)
    raw_g = distributed.pdhmm_chunked_global(
        mesh, packed, hap_pd, states, r_chunk=8, lane_block=8,
        interpret=True)
    raw_l = np.asarray(pdhmm_pallas.pdhmm_raw_pallas_chunked(
        packed.hap, hap_pd, states, packed.read, packed.q, packed.iq,
        packed.dq, packed.gcp, packed.haplen, packed.rslen, r_chunk=8,
        lane_block=8, interpret=True))
    np.testing.assert_array_equal(raw_g, raw_l)

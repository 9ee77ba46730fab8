"""Worker for the 2-process jax.distributed CPU test (run as a subprocess).

Usage: python distributed_worker.py <coordinator> <num_processes> <pid>
Prints "RESULT <json list>" with this process's result lanes plus
"REF <json list>" with the locally-computed full-batch reference.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc

    from gkl_tpu import parallel
    from gkl_tpu.batch import PackedPairs
    from gkl_tpu.ops.pairhmm import pairhmm_raw

    # identical global batch on every process (seeded), then slice my lanes
    P = 8 * len(jax.devices())
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    H, R = 24, 16
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

    sl = parallel.host_local_slice(P)
    local = PackedPairs(
        hap[:, sl], read[:, sl], q[:, sl], iq[:, sl], dq[:, sl], gcp[:, sl],
        haplen[sl], rslen[sl], sl.stop - sl.start,
    )
    mesh = parallel.global_mesh()
    mine = parallel.pairhmm_raw_global(mesh, local, engine="jnp")

    ref = np.asarray(pairhmm_raw(hap, read, q, iq, dq, gcp, haplen, rslen,
                                 dtype="float32"))[sl]
    print("RESULT", json.dumps([float(v) for v in mine]))
    print("REF", json.dumps([float(v) for v in ref]))

    # --- the production path: Pallas kernels per shard across processes
    # (interpret mode on CPU; bit-parity vs the same kernel run unsharded —
    # the fast kernel is what gets parallelized, IntelPairHmm.cc:151-153)
    from gkl_tpu.ops import pairhmm_pallas

    mant_l, ex_l, flag_l = parallel.pairhmm_scaled_global(
        mesh, local, lane_block=8, interpret=True)
    mant_r, ex_r, flag_r = (
        np.asarray(a)[sl] for a in pairhmm_pallas.pairhmm_raw_pallas_scaled(
            hap, read, q, iq, dq, gcp, haplen, rslen, lane_block=8,
            interpret=True))
    assert np.array_equal(mant_l, mant_r), "scaled mant mismatch"
    assert np.array_equal(ex_l, ex_r), "scaled exp mismatch"
    assert np.array_equal(flag_l, flag_r), "scaled flag mismatch"
    print("SCALED_BITPARITY ok")

    # --- deduplicated (indexed) marshalling across processes: haplotype
    # planes replicate, each host feeds only ITS slab of the unique-read
    # planes; result must be bit-identical to the unsharded scaled kernel
    # on the materialized dense batch
    from gkl_tpu import batch as batch_mod

    rng3 = np.random.default_rng(11)
    haps_u = [bases[rng3.integers(0, 4, 24)] for _ in range(4)]
    reads_u = [bases[rng3.integers(0, 4, 16)] for _ in range(16)]
    rquals_u = [(rng3.integers(20, 40, 16).astype(np.uint8),
                 rng3.integers(30, 45, 16).astype(np.uint8),
                 rng3.integers(30, 45, 16).astype(np.uint8),
                 np.full(16, 10, np.uint8)) for _ in range(16)]
    for const in (None, (45, 45, 10)):
        pk = batch_mod.pack_pairs_indexed(
            haps_u, reads_u, rquals_u, lane_multiple=8 * len(jax.devices()),
            const_quals=const, full_pattern=True)
        stacked = parallel.pairhmm_scaled_indexed_sharded(
            mesh, pk, lane_block=8, interpret=True)
        dense = pk.materialize()
        m_r, e_r, f_r = pairhmm_pallas.pairhmm_raw_pallas_scaled(
            dense.hap, dense.read, dense.q, dense.iq, dense.dq, dense.gcp,
            dense.haplen, dense.rslen, lane_block=8, interpret=True)
        assert np.array_equal(stacked[0], np.asarray(m_r)), "indexed mant"
        assert np.array_equal(stacked[1],
                              np.asarray(e_r).astype(np.float32)), "indexed exp"
        assert np.array_equal(stacked[2],
                              np.asarray(f_r).astype(np.float32)), "indexed flag"
    print("INDEXED_BITPARITY ok")

    rows_l = parallel.pairhmm_raw_global(mesh, local, engine="pallas",
                                         lane_block=8, interpret=True)
    rows_r = np.asarray(pairhmm_pallas.pairhmm_raw_pallas(
        hap, read, q, iq, dq, gcp, haplen, rslen, lane_block=8,
        interpret=True))[sl]
    assert np.array_equal(rows_l, rows_r), "rows kernel mismatch"
    print("ROWS_BITPARITY ok")

    from gkl_tpu.ops import pdhmm as pdhmm_ops
    from gkl_tpu.ops import pdhmm_pallas

    hap_pd = np.zeros_like(hap)
    hap_pd[4, ::2] = 2  # DEL_START
    hap_pd[7, ::2] = 4  # DEL_END
    states = pdhmm_ops.column_states(hap_pd)
    pd_l = parallel.pdhmm_raw_global(mesh, local, hap_pd[:, sl],
                                     states[:, sl], lane_block=8,
                                     interpret=True)
    pd_r = np.asarray(pdhmm_pallas.pdhmm_raw_pallas(
        hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen,
        lane_block=8, interpret=True))[sl]
    assert np.array_equal(pd_l, pd_r), "pdhmm mismatch"
    print("PDHMM_BITPARITY ok")

    from gkl_tpu.api_sw import SWParameters
    from gkl_tpu.ops import sw_pallas

    params = SWParameters(200, -150, -260, -11)
    bt_l, lr_l, lc_l = parallel.sw_forward_global(
        mesh, hap[:, sl], read[:, sl], haplen[sl], rslen[sl], params,
        lane_block=8, interpret=True)
    bt_r, lr_r, lc_r = sw_pallas.sw_forward_pallas(
        hap, read, haplen, rslen, 200, -150, -260, -11,
        indel_boundary=False, lane_block=8, interpret=True)
    assert np.array_equal(bt_l, np.asarray(bt_r)[sl]), "sw bt mismatch"
    assert np.array_equal(lr_l, np.asarray(lr_r)[:, sl]), "sw lastrow mismatch"
    assert np.array_equal(lc_l, np.asarray(lc_r)[sl]), "sw lastcol mismatch"
    print("SW_BITPARITY ok")

    # --- pod entries for LONG sequences (SURVEY §5.8 covers them too):
    # relay/chunked with carried state device-resident and dp-sharded
    # between segment/chunk calls — no mid-loop host fetch
    bt_g, lr_g, lc_g = parallel.sw_relay_global(
        mesh, hap[:, sl], read[:, sl], haplen[sl], rslen[sl], params,
        seg=8, lane_block=8, interpret=True)
    bt_r2, lr_r2, lc_r2 = sw_pallas.sw_forward_pallas_relay(
        hap, read, haplen, rslen, 200, -150, -260, -11,
        indel_boundary=False, seg=8, lane_block=8, interpret=True)
    assert np.array_equal(bt_g, np.asarray(bt_r2)[sl]), "sw relay bt"
    assert np.array_equal(lr_g, np.asarray(lr_r2)[:, sl]), "sw relay lastrow"
    assert np.array_equal(lc_g, np.asarray(lc_r2)[sl]), "sw relay lastcol"
    print("SW_RELAY_BITPARITY ok")

    pdc_g = parallel.pdhmm_chunked_global(
        mesh, local, hap_pd[:, sl], states[:, sl], r_chunk=8, lane_block=8,
        interpret=True)
    pdc_r = np.asarray(pdhmm_pallas.pdhmm_raw_pallas_chunked(
        hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen,
        r_chunk=8, lane_block=8, interpret=True))[sl]
    assert np.array_equal(pdc_g, pdc_r), "pdhmm chunked mismatch"
    print("PDHMM_CHUNKED_BITPARITY ok")

    # API-level: PairHMM(mesh=global_mesh) — the full engine (packing +
    # scaled kernel path or jnp fallback + rescue) transparently multi-host
    from gkl_tpu import HaplotypeData, PairHMM, ReadData

    rng2 = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = [ReadData(bases[rng2.integers(0, 4, 20)],
                      np.full(20, 30, np.uint8), np.full(20, 45, np.uint8),
                      np.full(20, 45, np.uint8), np.full(20, 10, np.uint8))
             for _ in range(4)]
    hps = [HaplotypeData(bases[rng2.integers(0, 4, 32)]) for _ in range(2)]
    api_global = PairHMM(mesh=mesh).compute_likelihoods(reads, hps)
    api_local = PairHMM().compute_likelihoods(reads, hps)
    np.testing.assert_allclose(api_global, api_local, rtol=0, atol=5e-5)
    print("API_GLOBAL ok")

    # --- streaming + multi-host composed: the BAM pipeline runs with a
    # multi-process mesh (each process decodes the stream identically and
    # feeds its lane slab per chunk via _feed_global/host_local_slice) and
    # must reproduce the single-process pipeline's numbers
    from gkl_tpu import pipeline

    bam_path = os.path.join(os.path.dirname(__file__), "data",
                            "HiSeq.1mb.1RG.2k_lines.bam")
    hps2 = [HaplotypeData(bases[rng2.integers(0, 4, 48)]) for _ in range(2)]
    got = list(pipeline.pairhmm_stream(
        bam_path, hps2, chunk_reads=64, limit=128, hmm=PairHMM(mesh=mesh)))
    want = list(pipeline.pairhmm_stream(
        bam_path, hps2, chunk_reads=64, limit=128, hmm=PairHMM()))
    assert [c.read_names for c in got] == [c.read_names for c in want]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g.likelihoods, w.likelihoods,
                                   rtol=0, atol=5e-5)
    print("PIPELINE_GLOBAL ok")
    sys.stdout.flush()


if __name__ == "__main__":
    main()

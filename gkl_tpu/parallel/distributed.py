"""Multi-host runtime: jax.distributed init + per-host input feeding.

The reference has no distributed layer (OpenMP shared memory only,
SURVEY.md §2.8); this is the TPU-native equivalent designed for pod
slices: chips within a host communicate over ICI, hosts over DCN.  The
batch axis (pairs) shards across *all* chips; each host feeds only its own
shard (`host_local_slice`) and results gather once at the end — likelihood
vectors are tiny relative to inputs so the gather is cheap.

On a single-process deployment every helper degrades to the local mesh, so
the same driver code runs from one chip to a multi-host slice.
"""

from __future__ import annotations

import jax
import numpy as np

from .mesh import data_parallel_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host run.

    No-op when single-process (the common local case).  On TPU pods the
    arguments are discovered from the environment automatically.
    """
    if num_processes is not None and num_processes <= 1:
        return
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # single-process / already-initialized environments
        pass


def global_mesh():
    """1-D dp mesh over every chip in the slice (all hosts)."""
    return data_parallel_mesh(devices=jax.devices())


def host_local_slice(n_total: int) -> slice:
    """The [start, stop) range of a length-``n_total`` pair batch this host
    is responsible for feeding (contiguous block partitioning).

    ``n_total`` must be a multiple of process_count (the batch planner's
    lane bucketing guarantees this when lane_multiple is a multiple of the
    global device count).
    """
    p = jax.process_count()
    i = jax.process_index()
    per = (n_total + p - 1) // p
    return slice(i * per, min(n_total, (i + 1) * per))


def make_global_array(host_shard: np.ndarray, mesh, axis: int = -1):
    """Assemble a globally-sharded jax.Array from this host's shard.

    ``host_shard`` is the (len, lanes_per_host) block produced by the local
    batch planner; the result is a global (len, lanes_total) array sharded
    over the ``dp`` mesh axis along ``axis``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndim = host_shard.ndim
    axis = axis % ndim
    spec = P(*[None] * axis, "dp", *[None] * (ndim - axis - 1))
    sharding = NamedSharding(mesh, spec)
    global_shape = list(host_shard.shape)
    global_shape[axis] *= jax.process_count()
    local_devices = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    n_local = len(local_devices)
    per_dev = host_shard.shape[axis] // n_local
    shards = [
        jax.device_put(
            np.take(host_shard, range(k * per_dev, (k + 1) * per_dev), axis=axis), d
        )
        for k, d in enumerate(local_devices)
    ]
    return jax.make_array_from_single_device_arrays(tuple(global_shape), sharding, shards)


def make_replicated_array(value: np.ndarray, mesh) -> "jax.Array":
    """Assemble a fully-replicated global jax.Array from a host-local value
    every process holds identically (e.g. the unique-haplotype planes of an
    indexed batch: tiny next to the read planes, so replication is the
    right sharding — SURVEY.md §2.8's gather-at-end logic in reverse)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    value = np.asarray(value)
    me = jax.process_index()
    shards = [jax.device_put(value, d)
              for d in mesh.devices.flat if d.process_index == me]
    return jax.make_array_from_single_device_arrays(
        value.shape, NamedSharding(mesh, P()), shards)


def _fetch_local(arr, axis: int = 0) -> np.ndarray:
    """This process's addressable shards of a dp-sharded global array,
    concatenated in lane order along ``axis``."""
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[axis].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=axis)


def _default_lane_block(interpret: bool | None):
    """Pallas lane block per shard: 128 on TPU (the hardware lane width), 8
    under CPU interpret (tests / dry runs)."""
    from .. import utils

    if interpret is None:
        interpret = not utils.is_tpu_available()
    return (8 if interpret else 128), interpret


def _feed(mesh, packed_local):
    def ga(a, axis):
        return make_global_array(np.asarray(a), mesh, axis=axis)

    return (
        ga(packed_local.hap, -1), ga(packed_local.read, -1),
        ga(packed_local.q, -1), ga(packed_local.iq, -1),
        ga(packed_local.dq, -1), ga(packed_local.gcp, -1),
        ga(packed_local.haplen, 0), ga(packed_local.rslen, 0),
    )


def pairhmm_raw_global(mesh, packed_local, dtype: str = "float32", *,
                       engine: str = "auto", lane_block: int | None = None,
                       interpret: bool | None = None) -> np.ndarray:
    """Multi-host SPMD PairHMM forward: every process feeds ITS lane shard,
    the jit runs collectively over the global mesh, and each process gets
    back its own result lanes.

    ``packed_local`` is this host's (len, lanes_per_host) PackedPairs block
    (the batch planner runs per host on its slice of the pair list, see
    ``host_local_slice``).  ``engine='pallas'`` runs the Pallas rows kernel
    per shard — the production path (the reference parallelizes its *fast*
    kernel, IntelPairHmm.cc:151-153); ``'jnp'`` is the non-TPU fallback;
    ``'auto'`` picks Pallas whenever the local lane count fills its lane
    blocks.  The kernels are collective-free, so the only cross-host
    traffic is XLA's launch coordination — the ≥85%-scaling design claim
    made checkable (tests/test_distributed2.py runs this across two real
    processes, asserting per-shard Pallas bit-parity).
    """
    lb, interp = _default_lane_block(interpret)
    lane_block = lane_block or lb
    P_local = packed_local.hap.shape[1]
    # shard_map hands each LOCAL DEVICE P_local / n_local lanes — the
    # Pallas kernel's lane-block contract binds per device, not per host
    n_local = sum(1 for d in mesh.devices.flat
                  if d.process_index == jax.process_index())
    if engine == "auto":
        per_dev_ok = (n_local > 0 and P_local % n_local == 0
                      and (P_local // n_local) % lane_block == 0)
        engine = "pallas" if dtype == "float32" and per_dev_ok else "jnp"
        from .. import utils

        if (engine == "jnp" and dtype == "float32"
                and utils.is_tpu_available()):
            # never degrade to the ~50x-slower jnp engine silently on a
            # pod: one misconfigured lane count should be loud
            # (GKL_TPU_STRICT_PALLAS=1 raises, api._warn_pallas_falloff).
            # f64 requests legitimately resolve to jnp (the only f64
            # engine) and stay quiet.
            from ..api import _warn_pallas_falloff

            _warn_pallas_falloff("pod-auto", dtype=dtype, P_local=P_local,
                                 n_local=n_local, lane_block=lane_block)
    if engine == "pallas" and dtype != "float32":
        raise ValueError(
            "engine='pallas' runs the float32 kernel; request "
            "dtype='float32' or engine='jnp' for float64")
    if engine == "pallas":
        from .mesh import _pairhmm_pallas_sharded_fn

        fn = _pairhmm_pallas_sharded_fn(mesh, "rows", lane_block, interp)
        with mesh:
            raw = fn(*_feed(mesh, packed_local))
        return _fetch_local(raw)
    from .mesh import _pairhmm_raw_jit

    with mesh:
        raw = _pairhmm_raw_jit(*_feed(mesh, packed_local), dtype)
    return _fetch_local(raw)


def pairhmm_scaled_global(mesh, packed_local, *, lane_block: int | None = None,
                          interpret: bool | None = None):
    """Multi-host scaled-f32 PairHMM (mantissa, exp2, flag per lane) — the
    production pod entry: one pass at unlimited dynamic range, so the
    float→double rescue (IntelPairHmm.cc:157-165) needs no second device
    sweep.  Returns this host's (mant, ex, flag) lane slabs."""
    from .mesh import _pairhmm_pallas_sharded_fn

    lb, interp = _default_lane_block(interpret)
    fn = _pairhmm_pallas_sharded_fn(mesh, "scaled", lane_block or lb, interp)
    with mesh:
        mant, ex, flag = fn(*_feed(mesh, packed_local))
    return _fetch_local(mant), _fetch_local(ex), _fetch_local(flag)


def pdhmm_raw_global(mesh, packed_local, hap_pd_local, states_local, *,
                     lane_block: int | None = None,
                     interpret: bool | None = None) -> np.ndarray:
    """Multi-host Pallas PDHMM forward; every process feeds its lane shard
    and gets back its own raw forward probabilities."""
    from .mesh import _pdhmm_pallas_sharded_fn

    lb, interp = _default_lane_block(interpret)
    fn = _pdhmm_pallas_sharded_fn(mesh, lane_block or lb, interp)

    def ga(a, axis):
        return make_global_array(np.asarray(a), mesh, axis=axis)

    with mesh:
        raw = fn(
            ga(packed_local.hap, -1), ga(hap_pd_local, -1),
            ga(states_local, -1), ga(packed_local.read, -1),
            ga(packed_local.q, -1), ga(packed_local.iq, -1),
            ga(packed_local.dq, -1), ga(packed_local.gcp, -1),
            ga(packed_local.haplen, 0), ga(packed_local.rslen, 0),
        )
    return _fetch_local(raw)


def sw_forward_global(mesh, ref_local, alt_local, reflen_local, altlen_local,
                      params, *, indel_boundary: bool = False,
                      lane_block: int | None = None,
                      interpret: bool | None = None):
    """Multi-host Pallas SW score+backtrack DP.  Each host feeds its lane
    shard and fetches ONLY its own backtrack block — the O(N·M) tensor
    never crosses hosts; the host-side CIGAR walk runs on local lanes
    (the multi-host form of api_sw's mesh path)."""
    from .mesh import _sw_pallas_sharded_fn

    lb, interp = _default_lane_block(interpret)
    key = (int(params.match_value), int(params.mismatch_penalty),
           int(params.gap_open_penalty), int(params.gap_extend_penalty))
    fn = _sw_pallas_sharded_fn(mesh, key, indel_boundary, lane_block or lb,
                               interp)

    def ga(a, axis, dt=None):
        a = np.asarray(a) if dt is None else np.asarray(a, dt)
        return make_global_array(a, mesh, axis=axis)

    with mesh:
        bt, lastrow, lastcol = fn(
            ga(ref_local, -1), ga(alt_local, -1),
            ga(reflen_local, 0, np.int32), ga(altlen_local, 0, np.int32),
        )
    return _fetch_local(bt, 0), _fetch_local(lastrow, 1), _fetch_local(lastcol, 0)


def sw_relay_global(mesh, ref_local, alt_local, reflen_local, altlen_local,
                    params, *, indel_boundary: bool = False,
                    seg: int | None = None, lane_block: int | None = None,
                    interpret: bool | None = None):
    """Multi-host segment-relayed SW for references beyond one kernel span.

    Pod form of ``parallel.sw_forward_pallas_relay_sharded``: the carried
    H/F/lastrow state stays DEVICE-RESIDENT and dp-sharded across segment
    calls (globally-sharded arrays fed straight back into the next jit —
    no mid-loop host fetch, which a multi-process mesh cannot do), while
    each host fetches only ITS addressable backtrack/lastcol shards per
    segment.  Returns this host's (bt, lastrow, lastcol) lane slabs in the
    relay layout ((P_local, N//2, M'), (M', P_local), (P_local, N))."""
    from ..ops import sw_pallas
    from .mesh import _sw_relay_segment_sharded_fn

    lb, interp = _default_lane_block(interpret)
    lane_block = lane_block or lb
    if seg is None:
        seg = sw_pallas.SW_RELAY_SEG
    ref_local = np.asarray(ref_local)
    N, P_local = ref_local.shape
    assert N % seg == 0, (N, seg)

    ref_i, alt_i, h0, f0, lr0, reflen2, altlen2, M = sw_pallas.relay_prolog(
        ref_local, alt_local, reflen_local, altlen_local,
        params.gap_open_penalty, params.gap_extend_penalty, indel_boundary)
    key = (int(params.match_value), int(params.mismatch_penalty),
           int(params.gap_open_penalty), int(params.gap_extend_penalty))
    fn = _sw_relay_segment_sharded_fn(mesh, key, indel_boundary, lane_block,
                                      interp)

    def ga(a):
        return make_global_array(np.asarray(a), mesh, axis=-1)

    alt_g, reflen_g, altlen_g = ga(alt_i), ga(reflen2), ga(altlen2)
    h, f, lr = ga(h0), ga(f0), ga(lr0)
    bt_host = np.empty((P_local, N // 2, M), np.uint8)
    lc_host = np.empty((P_local, N), np.int32)
    # double-buffered readback, like the single-host relay_drive: segment
    # s+1 is dispatched (and s's per-shard D2H copies started async) BEFORE
    # s's slabs are materialised, so the O(N*M/2) backtrack DMA rides under
    # the next segment's compute instead of blocking it
    pending = None  # (s0, bt_s, lc_s) dispatched but not yet materialised
    with mesh:
        for s0 in range(0, N, seg):
            bt_s, lastrow, lc_s, h, f = fn(
                ga(ref_i[s0 : s0 + seg]), alt_g, reflen_g, altlen_g,
                h, f, lr, ga(np.full((1, P_local), s0, np.int32)))
            lr = lastrow
            for a in (bt_s, lc_s):
                for sh in a.addressable_shards:
                    start = getattr(sh.data, "copy_to_host_async", None)
                    if start is not None:
                        start()
            if pending is not None:
                p0, pbt, plc = pending
                bt_host[:, p0 // 2 : (p0 + seg) // 2] = _fetch_local(pbt, 0)
                lc_host[:, p0 : p0 + seg] = _fetch_local(plc, 0)
            pending = (s0, bt_s, lc_s)
        if pending is not None:
            p0, pbt, plc = pending
            bt_host[:, p0 // 2 : (p0 + seg) // 2] = _fetch_local(pbt, 0)
            lc_host[:, p0 : p0 + seg] = _fetch_local(plc, 0)
    return bt_host, _fetch_local(lr, 1), lc_host


def pdhmm_chunked_global(mesh, packed_local, hap_pd_local, states_local, *,
                         r_chunk: int | None = None,
                         lane_block: int | None = None,
                         interpret: bool | None = None) -> np.ndarray:
    """Multi-host read-axis-chunked PDHMM (any read length on a pod).

    Pod form of ``parallel.pdhmm_raw_pallas_chunked_sharded``: every
    process preps its own lane slab, the 6 boundary planes stay
    device-resident and dp-sharded between chunk calls, and only the tiny
    (1, P) partial sums come back per chunk.  Returns this host's raw
    forward probabilities."""
    from ..ops import pdhmm_pallas
    from .mesh import _pdhmm_chunk_sharded_fn

    lb, interp = _default_lane_block(interpret)
    lane_block = lane_block or lb
    fn = _pdhmm_chunk_sharded_fn(mesh, lane_block, interp)
    P_local = packed_local.hap.shape[1]

    (flags, hap_i, pd_i, st_i, rows, ic, haplen2, rslen_i, bnd0, n_chunks,
     r_chunk) = pdhmm_pallas.chunked_prep(
        packed_local.hap, np.asarray(hap_pd_local), np.asarray(states_local),
        packed_local.read, packed_local.q, packed_local.iq, packed_local.dq,
        packed_local.gcp, packed_local.haplen, packed_local.rslen,
        r_chunk=r_chunk, lane_block=lane_block)

    def ga(a, axis=-1):
        return make_global_array(np.asarray(a), mesh, axis=axis)

    flags_g = ga(flags, 0)  # (blocks, H): block axis shards over dp
    hap_g, pd_g, st_g = ga(hap_i), ga(pd_i), ga(st_i)
    ic_g, haplen_g = ga(ic), ga(haplen2)
    bnd = [ga(b) for b in bnd0]
    rslen_np = np.asarray(rslen_i)
    # materialize the row planes ONCE: np.asarray inside the chunk loop
    # would re-fetch every full (R_pad, P) plane from device per chunk —
    # O(n_chunks^2) D2H traffic, quadratic in read length
    rows_np = [np.asarray(a) for a in rows]
    out_local = np.zeros((1, P_local), np.float32)
    with mesh:
        for c in range(n_chunks):
            r0 = c * r_chunk
            sl = slice(r0, r0 + r_chunk)
            first = ga(np.full((1, P_local), 1 if c == 0 else 0, np.int32))
            rslen_local = ga((rslen_np - r0)[None, :])
            part, bnd = fn(flags_g, hap_g, pd_g, st_g,
                           *[ga(a[sl]) for a in rows_np],
                           ic_g, haplen_g, rslen_local, first, *bnd)
            out_local += _fetch_local(part, 1)
    return out_local[0]

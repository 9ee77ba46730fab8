"""Device mesh construction and data-parallel sharding of pair batches.

Axes:

* ``dp`` — data parallel over the pair/lane axis.  This is the TPU-native
  replacement for the reference's OpenMP ``parallel for`` over independent
  (read, haplotype) pairs (IntelPairHmm.cc:151-153, pdhmm.h:1218-1248).
* ``sp`` — sequence-parallel column split of very long haplotypes
  (SURVEY.md §5.7): ``pairhmm_raw_sp`` shards the hap axis over an ``sp``
  mesh with the DP carry relayed between neighbors per read row
  (``sequence_parallel_mesh``).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import pairhmm as pairhmm_ops


def data_parallel_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D ``dp`` mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("dp",))


def is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices owned by other processes (a
    multi-host pod slice): inputs must then be fed per host via
    ``distributed.make_global_array`` and results gathered collectively."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


@functools.lru_cache(maxsize=8)
def _replicate_fn(mesh: Mesh):
    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))


def replicate_to_host(arr, mesh: Mesh) -> np.ndarray:
    """All-gather a dp-sharded global array so every host holds the full
    value (SURVEY.md §5.8: likelihood vectors are tiny relative to inputs,
    so the end-of-batch gather is cheap)."""
    with mesh:
        return np.asarray(_replicate_fn(mesh)(arr))


def _feed_global(mesh: Mesh, full: np.ndarray, axis: int):
    """Build the global dp-sharded array for ``full`` (the SAME full batch
    on every host) by feeding only this host's lane slab."""
    from .distributed import host_local_slice, make_global_array

    full = np.asarray(full)
    axis = axis % full.ndim
    sl = host_local_slice(full.shape[axis])
    idx = [slice(None)] * full.ndim
    idx[axis] = sl
    return make_global_array(full[tuple(idx)], mesh, axis=axis)


def lane_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (length, lane) arrays: lanes split across ``dp``."""
    return NamedSharding(mesh, P(None, "dp"))


def vec_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def shard_pairs(mesh: Mesh, packed):
    """Place a PackedPairs batch lane-sharded on the mesh.

    Lane counts must be a multiple of the mesh size; the batch planner's
    lane bucketing guarantees this when ``lane_multiple`` is a multiple of
    ``mesh.size``.
    """
    ls = lane_sharding(mesh)
    vs = vec_sharding(mesh)
    put = jax.device_put
    return type(packed)(
        hap=put(packed.hap, ls),
        read=put(packed.read, ls),
        q=put(packed.q, ls),
        iq=put(packed.iq, ls),
        dq=put(packed.dq, ls),
        gcp=put(packed.gcp, ls),
        haplen=put(packed.haplen, vs),
        rslen=put(packed.rslen, vs),
        n_real=packed.n_real,
    )


@functools.partial(jax.jit, static_argnames=("dtype",))
def _pairhmm_raw_jit(hap, read, q, iq, dq, gcp, haplen, rslen, dtype):
    return pairhmm_ops.pairhmm_raw(hap, read, q, iq, dq, gcp, haplen, rslen, dtype=dtype)


# ---------------------------------------------------------------------------
# Pallas kernels under the dp mesh.
#
# Every DP kernel is lane-local (no cross-lane dependency), so the SPMD form
# is a plain ``jax.shard_map`` over the lane axis: each device runs the SAME
# Pallas kernel on its 1/n slice of the lanes, zero collectives.  This is
# the direct analogue of the reference parallelizing its *fast* AVX kernel
# with OpenMP (IntelPairHmm.cc:151-153) — the mesh path must not fall back
# to the ~50x-slower jnp scan engines.  Local lane counts (P / mesh.size)
# must be a multiple of ``lane_block``; the APIs guarantee this by setting
# ``lane_multiple = lane_block * mesh.size`` when a mesh is attached.


def _shard_lanes(mesh: Mesh, fn, n_in: int, n_vec_in: int, out_specs):
    """shard_map ``fn`` over ``dp``: the first ``n_in`` args are (len, P)
    lane-major arrays, the next ``n_vec_in`` are (P,) vectors."""
    lane = P(None, "dp")
    vec = P("dp")
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(lane,) * n_in + (vec,) * n_vec_in,
        out_specs=out_specs,
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )


@functools.lru_cache(maxsize=128)
def _pairhmm_pallas_sharded_fn(mesh: Mesh, kernel: str, lane_block: int,
                               interpret: bool):
    """Cached jitted shard_map wrapper (a fresh jit per call would retrace
    and recompile every batch — measured 1.5 s/call vs 0.9 ms)."""
    from ..ops import pairhmm_pallas, pairhmm_pallas_cols

    if kernel == "scaled":
        inner = functools.partial(
            pairhmm_pallas.pairhmm_raw_pallas_scaled,
            lane_block=lane_block, interpret=interpret)
        out = (P("dp"),) * 3
    elif kernel == "cols":
        inner = functools.partial(
            pairhmm_pallas_cols.pairhmm_raw_pallas_cols,
            lane_block=lane_block, interpret=interpret)
        out = P("dp")
    elif kernel == "cols_relay":
        # any-length path: relay state stays device-resident and dp-sharded
        # across chunk calls (no host fetch), so it composes with
        # multi-process meshes like every fixed-span kernel
        inner = functools.partial(
            pairhmm_pallas_cols.pairhmm_raw_pallas_cols_relay,
            lane_block=lane_block, interpret=interpret)
        out = P("dp")
    else:
        inner = functools.partial(
            pairhmm_pallas.pairhmm_raw_pallas,
            lane_block=lane_block, interpret=interpret)
        out = P("dp")

    def local(hap, read, q, iq, dq, gcp, haplen, rslen):
        return inner(hap, read, q, iq, dq, gcp, haplen, rslen)

    # host->device transfer rides the jit dispatch fast path via
    # in_shardings: eight eager device_puts per call cost ~3.7 ms where the
    # jit-managed transfer is overlapped (~1 ms total)
    ls, vs = lane_sharding(mesh), vec_sharding(mesh)
    return jax.jit(_shard_lanes(mesh, local, 6, 2, out),
                   in_shardings=(ls,) * 6 + (vs,) * 2)


def _run_pairhmm_sharded(mesh, packed, kernel, lane_block, interpret):
    fn = _pairhmm_pallas_sharded_fn(mesh, kernel, lane_block, interpret)
    if is_multiprocess(mesh):
        # multi-host: every host holds the same full batch; each feeds its
        # lane slab and the (tiny) result replicates back to every host, so
        # the API contract is identical from one chip to a pod slice
        args = tuple(_feed_global(mesh, a, -1) for a in (
            packed.hap, packed.read, packed.q, packed.iq, packed.dq,
            packed.gcp)) + tuple(_feed_global(mesh, a, 0)
                                 for a in (packed.haplen, packed.rslen))
        out = fn(*args)
        if kernel == "scaled":
            return tuple(replicate_to_host(o, mesh) for o in out)
        return replicate_to_host(out, mesh)
    return fn(packed.hap, packed.read, packed.q, packed.iq, packed.dq,
              packed.gcp, packed.haplen, packed.rslen)


def pairhmm_raw_pallas_sharded(mesh: Mesh, packed, *, lane_block: int = 128,
                               interpret: bool = False):
    """Plain-f32 Pallas PairHMM forward, lane-sharded over the dp mesh."""
    return _run_pairhmm_sharded(mesh, packed, "rows", lane_block, interpret)


def pairhmm_raw_pallas_scaled_sharded(mesh: Mesh, packed, *,
                                      lane_block: int = 128,
                                      interpret: bool = False):
    """Scaled-f32 Pallas PairHMM (mantissa, exp2, flag), lane-sharded.

    This is the production multi-chip path: one pass computes every lane at
    unlimited dynamic range, so the rescue logic needs no second device
    sweep (api.PairHMM._forward_scaled)."""
    return _run_pairhmm_sharded(mesh, packed, "scaled", lane_block, interpret)


@functools.lru_cache(maxsize=64)
def _pairhmm_indexed_sharded_fn(mesh: Mesh, const_quals, lane_block: int,
                                interpret: bool):
    """Cached jit(shard_map) for the deduplicated batch on a single-process
    dp mesh.  Requires the full-pattern layout (batch.PackedPairsIndexed
    with ``pattern_nh`` set): unique read planes shard with the SAME cuts
    as the pair lanes, so each device's pairs reference only its own read
    slab — zero collectives, and each unique read crosses the host link
    once (the link-aware marshalling of docs/DESIGN.md 'Host link rules'
    applied to the mesh path)."""
    import jax.numpy as jnp

    from ..ops import pairhmm_pallas

    inner = functools.partial(pairhmm_pallas.pairhmm_raw_pallas_scaled,
                              lane_block=lane_block, interpret=interpret)

    def local(hap_u, readq_u, ridx, hidx, haplen, rslen, *rest):
        # rebase global read indices onto this shard's read slab; the
        # expansion itself is shared with the single-device wrapper
        # (haps replicate — tiny — so hidx needs no rebase)
        shard = jax.lax.axis_index("dp")
        ridx_l = ridx - shard * readq_u.shape[2]
        hap, read, q, iq, dq, gcp = pairhmm_pallas.expand_indexed_planes(
            hap_u, readq_u, ridx_l, hidx, const_quals=const_quals,
            quals_u=rest[0] if const_quals is None else None)
        m, e, fl = inner(hap, read, q, iq, dq, gcp, haplen, rslen)
        return jnp.stack([m, e.astype(jnp.float32), fl.astype(jnp.float32)])

    rep = P()
    planes = P(None, None, "dp")
    vec = P("dp")
    in_specs = (rep, planes, vec, vec, vec, vec)
    if const_quals is None:
        in_specs = in_specs + (planes,)
    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=P(None, "dp"), check_vma=False)
    rs = NamedSharding(mesh, rep)
    ps = NamedSharding(mesh, planes)
    vs = vec_sharding(mesh)
    in_sh = (rs, ps, vs, vs, vs, vs) + ((ps,) if const_quals is None else ())
    return jax.jit(fn, in_shardings=in_sh)


def pairhmm_scaled_indexed_sharded(mesh: Mesh, pk, *, lane_block: int = 128,
                                   interpret: bool = False):
    """Scaled PairHMM forward over a PackedPairsIndexed batch on a dp mesh;
    returns the stacked (3, P) result (a device array single-process, a
    replicated host array multi-process).  Needs ``pk.pattern_nh``
    (full-pattern layout), read columns divisible by the mesh and local
    pair lanes divisible by ``lane_block``.

    Multi-process: every host packs the SAME full batch; the haplotype
    planes replicate (tiny), and each host feeds only ITS slab of the
    unique-read planes and pair lanes — each unique read crosses its own
    host's link exactly once, the pod form of the link-budget marshalling
    (docs/DESIGN.md 'Host link rules')."""
    if pk.pattern_nh is None:
        raise ValueError("indexed sharding needs full_pattern packing")
    fn = _pairhmm_indexed_sharded_fn(mesh, pk.const_quals, lane_block,
                                     interpret)
    if is_multiprocess(mesh):
        from .distributed import make_replicated_array

        args = (
            make_replicated_array(pk.hap_u, mesh),
            _feed_global(mesh, pk.readq_u, -1),
            _feed_global(mesh, pk.ridx, 0),
            _feed_global(mesh, pk.hidx, 0),
            _feed_global(mesh, pk.haplen, 0),
            _feed_global(mesh, pk.rslen, 0),
        )
        if pk.const_quals is None:
            args = args + (_feed_global(mesh, pk.quals_u, -1),)
        return replicate_to_host(fn(*args), mesh)
    args = (pk.hap_u, pk.readq_u, pk.ridx, pk.hidx, pk.haplen, pk.rslen)
    if pk.const_quals is None:
        args = args + (pk.quals_u,)
    return fn(*args)


def pairhmm_raw_pallas_cols_sharded(mesh: Mesh, packed, *,
                                    lane_block: int = 128,
                                    interpret: bool = False):
    """Column-sweep Pallas PairHMM (long haplotypes), lane-sharded."""
    return _run_pairhmm_sharded(mesh, packed, "cols", lane_block, interpret)


def pairhmm_raw_pallas_cols_relay_sharded(mesh: Mesh, packed, *,
                                          lane_block: int = 128,
                                          interpret: bool = False):
    """Read-relayed column-sweep Pallas PairHMM (any H, any R),
    lane-sharded.  The relay's (H, P) boundary planes live on device,
    sharded lane-wise like every other plane."""
    return _run_pairhmm_sharded(mesh, packed, "cols_relay", lane_block,
                                interpret)


@functools.lru_cache(maxsize=128)
def _pdhmm_pallas_sharded_fn(mesh: Mesh, lane_block: int, interpret: bool):
    from ..ops import pdhmm_pallas

    def local(hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen):
        return pdhmm_pallas.pdhmm_raw_pallas(
            hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen,
            lane_block=lane_block, interpret=interpret,
        )

    ls, vs = lane_sharding(mesh), vec_sharding(mesh)
    return jax.jit(_shard_lanes(mesh, local, 8, 2, P("dp")),
                   in_shardings=(ls,) * 8 + (vs,) * 2)


def pdhmm_raw_pallas_sharded(mesh: Mesh, packed, hap_pd, states, *,
                             lane_block: int = 128, interpret: bool = False):
    """Pallas PDHMM forward, lane-sharded over the dp mesh."""
    fn = _pdhmm_pallas_sharded_fn(mesh, lane_block, interpret)
    if is_multiprocess(mesh):
        args = tuple(_feed_global(mesh, a, -1) for a in (
            packed.hap, np.asarray(hap_pd), np.asarray(states), packed.read,
            packed.q, packed.iq, packed.dq, packed.gcp)) + tuple(
            _feed_global(mesh, a, 0) for a in (packed.haplen, packed.rslen))
        return replicate_to_host(fn(*args), mesh)
    return fn(packed.hap, np.asarray(hap_pd), np.asarray(states),
              packed.read, packed.q, packed.iq, packed.dq, packed.gcp,
              packed.haplen, packed.rslen)


@functools.lru_cache(maxsize=128)
def _sw_pallas_sharded_fn(mesh: Mesh, params_key: tuple, indel_boundary: bool,
                          lane_block: int, interpret: bool):
    from ..ops import sw_pallas

    match, mismatch, gap_open, gap_extend = params_key

    def local(ref, alt, reflen, altlen):
        return sw_pallas.sw_forward_pallas(
            ref, alt, reflen, altlen, match, mismatch, gap_open, gap_extend,
            indel_boundary=indel_boundary, lane_block=lane_block,
            interpret=interpret,
        )

    ls, vs = lane_sharding(mesh), vec_sharding(mesh)
    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "dp"), P(None, "dp"), P("dp"), P("dp")),
        out_specs=(P("dp", None, None), P(None, "dp"), P("dp", None)),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    ), in_shardings=(ls, ls, vs, vs))


def sw_forward_pallas_sharded(mesh: Mesh, ref, alt, reflen, altlen, params,
                              *, indel_boundary: bool = False,
                              lane_block: int = 128,
                              interpret: bool = False):
    """Pallas SW score+backtrack DP, lane-sharded; returns the kernel's
    row-pair-packed layout ((P, N//2, M') u8, (M', P) i32, (P, N) i32) with
    the backtrack tensor sharded over its lane axis."""
    key = (int(params.match_value), int(params.mismatch_penalty),
           int(params.gap_open_penalty), int(params.gap_extend_penalty))
    fn = _sw_pallas_sharded_fn(mesh, key, indel_boundary, lane_block, interpret)
    return fn(np.asarray(ref), np.asarray(alt),
              np.asarray(reflen, np.int32), np.asarray(altlen, np.int32))


def pairhmm_raw_sharded(mesh: Mesh, packed, dtype: str = "float32"):
    """Run the PairHMM forward on a lane-sharded batch; returns (P,) sharded.

    The kernel is purely elementwise over lanes, so under ``jit`` the
    sharded inputs execute SPMD with zero collectives until the caller
    gathers the (tiny) result vector.
    """
    if is_multiprocess(mesh):
        args = tuple(_feed_global(mesh, a, -1) for a in (
            packed.hap, packed.read, packed.q, packed.iq, packed.dq,
            packed.gcp)) + tuple(_feed_global(mesh, a, 0)
                                 for a in (packed.haplen, packed.rslen))
        with mesh:
            return replicate_to_host(_pairhmm_raw_jit(*args, dtype), mesh)
    sharded = shard_pairs(mesh, packed)
    return _pairhmm_raw_jit(
        sharded.hap,
        sharded.read,
        sharded.q,
        sharded.iq,
        sharded.dq,
        sharded.gcp,
        sharded.haplen,
        sharded.rslen,
        dtype,
    )


@functools.partial(jax.jit, static_argnames=("dtype",))
def _pdhmm_raw_jit(hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen, dtype):
    from ..ops import pdhmm as pdhmm_ops

    return pdhmm_ops.pdhmm_raw(
        hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen, dtype=dtype
    )


def pdhmm_raw_sharded(mesh: Mesh, packed, hap_pd, states, dtype: str = "float32"):
    """PDHMM forward on a lane-sharded batch (the OpenMP loop of
    pdhmm/pdhmm.h:1218-1248 mapped to SPMD lanes); returns (P,) sharded."""
    ls = lane_sharding(mesh)
    sharded = shard_pairs(mesh, packed)
    hap_pd = jax.device_put(hap_pd, ls)
    states = jax.device_put(states, ls)
    return _pdhmm_raw_jit(
        sharded.hap, hap_pd, states, sharded.read, sharded.q, sharded.iq,
        sharded.dq, sharded.gcp, sharded.haplen, sharded.rslen, dtype,
    )


@functools.partial(jax.jit, static_argnames=("indel_boundary",))
def _sw_forward_jit(ref, alt, reflen, altlen, match, mismatch, gap_open, gap_extend, indel_boundary):
    from ..ops import sw as sw_ops

    return sw_ops.sw_forward(
        ref, alt, reflen, altlen, match, mismatch, gap_open, gap_extend,
        indel_boundary=indel_boundary,
    )


def sw_forward_sharded(mesh: Mesh, ref, alt, reflen, altlen, params,
                       indel_boundary: bool = False):
    """Smith-Waterman score+backtrack DP on a lane-sharded batch.

    ``ref``/``alt`` are (len, P) uint8; the (P, N, M) backtrack tensor comes
    back sharded over its lane axis so each host only fetches its shard for
    the CIGAR walk.
    """
    ls = lane_sharding(mesh)
    vs = vec_sharding(mesh)
    ref = jax.device_put(ref, ls)
    alt = jax.device_put(alt, ls)
    reflen = jax.device_put(np.asarray(reflen, np.int32), vs)
    altlen = jax.device_put(np.asarray(altlen, np.int32), vs)
    return _sw_forward_jit(
        ref, alt, reflen, altlen,
        params.match_value, params.mismatch_penalty,
        params.gap_open_penalty, params.gap_extend_penalty,
        indel_boundary,
    )


@functools.lru_cache(maxsize=128)
def _sw_relay_segment_sharded_fn(mesh: Mesh, params_key: tuple,
                                 indel_boundary: bool, lane_block: int,
                                 interpret: bool):
    from ..ops import sw_pallas

    match, mismatch, gap_open, gap_extend = params_key

    def local(ref_seg, alt, reflen, altlen, h, f, lr, rowbase):
        import jax.numpy as jnp

        P_loc = ref_seg.shape[1]
        wm = jnp.full((1, P_loc), match, jnp.int32)
        wx = jnp.full((1, P_loc), mismatch, jnp.int32)
        wo = jnp.full((1, P_loc), gap_open, jnp.int32)
        we = jnp.full((1, P_loc), gap_extend, jnp.int32)
        return sw_pallas._sw_relay_segment(
            ref_seg, alt, reflen, altlen, wm, wx, wo, we, h, f, lr, rowbase,
            indel_boundary=indel_boundary, lane_block=lane_block,
            interpret=interpret,
        )

    lane = P(None, "dp")
    vec1 = P(None, "dp")  # (1, P) rows shard over lanes too
    ls = lane_sharding(mesh)
    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(lane, lane, vec1, vec1, lane, lane, lane, vec1),
        out_specs=(P("dp", None, None), lane, P("dp", None), lane, lane),
        check_vma=False,
    ), in_shardings=(ls,) * 2 + (ls,) * 2 + (ls,) * 3 + (ls,))


def sw_forward_pallas_relay_sharded(mesh: Mesh, ref, alt, reflen, altlen,
                                    params, *, indel_boundary: bool = False,
                                    seg: int | None = None,
                                    lane_block: int = 128,
                                    interpret: bool = False):
    """Segment-relayed SW under the dp mesh: each shard runs the relay
    segment kernel on its lanes; the carried H/F/lastrow state stays
    device-resident and sharded between segments.  Output contract matches
    ``sw_pallas.sw_forward_pallas_relay``."""
    from ..ops import sw_pallas

    if seg is None:
        seg = sw_pallas.SW_RELAY_SEG
    N, Pn = np.asarray(ref).shape
    assert N % seg == 0 and Pn % (lane_block * mesh.size) == 0

    ref_i, alt_i, h0, f0, lr0, reflen2, altlen2, M = sw_pallas.relay_prolog(
        ref, alt, reflen, altlen, params.gap_open_penalty,
        params.gap_extend_penalty, indel_boundary)
    key = (int(params.match_value), int(params.mismatch_penalty),
           int(params.gap_open_penalty), int(params.gap_extend_penalty))
    fn = _sw_relay_segment_sharded_fn(mesh, key, indel_boundary, lane_block,
                                      interpret)

    def segment_call(ref_seg, h, f, lr, rowbase):
        return fn(ref_seg, alt_i, reflen2, altlen2, h, f, lr, rowbase)

    with mesh:
        return sw_pallas.relay_drive(segment_call, ref_i, N, M, Pn, seg,
                                     h0, f0, lr0)


@functools.lru_cache(maxsize=128)
def _pdhmm_chunk_sharded_fn(mesh: Mesh, lane_block: int, interpret: bool):
    from ..ops import pdhmm_pallas

    def local(flags, hap, pd, st, read_c, rbit_c, tmm, tmi, tmd, tim, tdd,
              pmatch, pmis, ic, haplen2, rslen_local, first, *bnd):
        return pdhmm_pallas._pdhmm_chunk_call(
            flags, hap, pd, st, read_c, rbit_c, tmm, tmi, tmd, tim, tdd,
            pmatch, pmis, ic, haplen2, rslen_local, first, list(bnd),
            lane_block=lane_block, interpret=interpret,
        )

    lane = P(None, "dp")
    # flags are per (lane-block, column): block axis shards over dp
    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", None),) + (lane,) * 16 + (lane,) * 6,
        out_specs=(lane, [lane] * 6),
        check_vma=False,
    ))


def pdhmm_raw_pallas_chunked_sharded(mesh: Mesh, packed, hap_pd, states, *,
                                     r_chunk: int | None = None,
                                     lane_block: int = 128,
                                     interpret: bool = False):
    """Read-axis-chunked PDHMM under the dp mesh: each shard relays its own
    chunks; the boundary planes stay device-resident and lane-sharded."""
    from ..ops import pdhmm_pallas

    # reuse the single-device wrapper's prep by monkey-free delegation: the
    # wrapper is pure host-side prep + a loop over _pdhmm_chunk_call, so we
    # substitute the sharded chunk call for the local one
    fn = _pdhmm_chunk_sharded_fn(mesh, lane_block, interpret)

    def chunk_call(flags, hap_i, pd_i, st_i, read_c, rbit_c, tmm, tmi, tmd,
                   tim, tdd, pmatch, pmis, ic, haplen2, rslen_local, first,
                   bnd, **_kw):
        with mesh:
            return fn(flags, hap_i, pd_i, st_i, read_c, rbit_c, tmm, tmi,
                      tmd, tim, tdd, pmatch, pmis, ic, haplen2, rslen_local,
                      first, *bnd)

    return pdhmm_pallas.pdhmm_raw_pallas_chunked(
        packed.hap, hap_pd, states, packed.read, packed.q, packed.iq,
        packed.dq, packed.gcp, packed.haplen, packed.rslen, r_chunk=r_chunk,
        lane_block=lane_block, interpret=interpret, _chunk_call=chunk_call,
    )


def sequence_parallel_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D ``sp`` mesh: sequence-parallel column split of the haplotype
    axis (SURVEY.md §5.7's ring/blockwise mapping for very long
    haplotypes)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("sp",))


def pairhmm_raw_sp(mesh: Mesh, hap, read, q, iq, dq, gcp, haplen, rslen, *,
                   dtype: str = "float32"):
    """Sequence-parallel PairHMM forward: the HAPLOTYPE axis split across
    the mesh's ``sp`` axis, with the DP carry relayed between neighbor
    devices each read row — the §5.7 blockwise/ring decomposition of the
    column state for haplotypes too long for one device.

    Per row step each device computes its column slab like the jnp engine
    (``ops.pairhmm.pairhmm_raw``); the cross-slab terms travel over the
    mesh: (a) the slab-edge M/X/Y values of the previous row (one
    ``ppermute`` toward higher ``sp``), (b) the current row's edge M for
    the Y-scan input (a second ``ppermute``), and (c) the Y affine scan's
    cross-device prefix, composed from each slab's total affine transform
    (``all_gather`` of one (1, P) triple, then an exclusive left-fold).
    Device 0's zero-filled ``ppermute`` receives ARE the column-0 boundary
    (M = X = 0; Y row-0 boundary applied only on device 0).

    The Y scan is block-reassociated relative to the single-device
    associative scan, so results agree to rounding (f64 ~1e-12 relative),
    not bit-for-bit; the f32 golden 1e-5 contract holds.
    """
    import jax.numpy as jnp

    from .. import context as ctx_mod
    from ..ops.pairhmm import _N_CHAR, _affine_combine, _mant_exp

    nsp = mesh.shape["sp"]
    H, Pn = hap.shape
    assert H % nsp == 0, (H, nsp)
    ctx = ctx_mod.pairhmm_context(dtype)
    f = jnp.dtype(dtype)
    perm = [(i, i + 1) for i in range(nsp - 1)]

    def shard_fn(hap_l, read, q, iq, dq, gcp, haplen, rslen):
        idx = jax.lax.axis_index("sp")
        H_loc = hap_l.shape[0]
        R = read.shape[0]

        ph2pr = jnp.asarray(ctx.ph2pr, f)
        m2m = jnp.asarray(ctx.match_to_match, f)
        qm = (q & 127).astype(jnp.int32)
        im = (iq & 127).astype(jnp.int32)
        dm = (dq & 127).astype(jnp.int32)
        cm = (gcp & 127).astype(jnp.int32)
        max_q = jnp.maximum(im, dm)
        min_q = jnp.minimum(im, dm)
        p_mm = m2m[((max_q * (max_q + 1)) >> 1) + min_q]
        p_gapm = f.type(1.0) - ph2pr[cm]
        p_mx = ph2pr[im]
        p_xx = ph2pr[cm]
        p_my = ph2pr[dm]
        p_yy = ph2pr[cm]
        distm = ph2pr[qm]
        distm_match = f.type(1.0) - distm
        distm_mis = distm / f.type(3.0)
        init_y = jnp.asarray(ctx.INITIAL_CONSTANT, f) / haplen.astype(f)
        hap_is_n = hap_l == _N_CHAR
        zero_row = jnp.zeros((1, Pn), f)
        col_global = idx * H_loc + jnp.arange(1, H_loc + 1, dtype=jnp.int32)
        col_valid = (col_global[:, None] <= haplen[None, :]).astype(f)

        def shift_down(arr, first_row):
            return jnp.concatenate([first_row, arr[:-1]], axis=0)

        def edge_from_left(row):
            # (1, P) last row of the LEFT neighbor's slab; device 0 gets
            # ppermute's zero fill = the DP's column-0 boundary
            return jax.lax.ppermute(row, "sp", perm)

        def row_step(carry, xs):
            m_prev, x_prev, y_prev, acc = carry
            rc, dmatch, dmis, pmm, pgapm, pmx, pxx, pmy, pyy, row_idx = xs

            m_first = edge_from_left(m_prev[-1:])
            x_first = edge_from_left(x_prev[-1:])
            y0 = jnp.where(row_idx == 1, init_y, f.type(0.0))[None, :]
            y_first = jnp.where(idx == 0, y0, edge_from_left(y_prev[-1:]))

            match = (hap_l == rc[None, :]) | hap_is_n | (rc == _N_CHAR)[None, :]
            prior = jnp.where(match, dmatch[None, :], dmis[None, :])

            m_new = prior * (pmm[None, :] * shift_down(m_prev, m_first)
                             + pgapm[None, :] * (shift_down(x_prev, x_first)
                                                 + shift_down(y_prev, y_first)))
            x_new = pmx[None, :] * m_prev + pxx[None, :] * x_prev

            # Y scan: local associative scan, then the cross-device prefix
            b_first = edge_from_left(m_new[-1:])
            b = pmy[None, :] * shift_down(m_new, b_first)
            am, ae = _mant_exp(jnp.broadcast_to(pyy[None, :], (H_loc, Pn)))
            aml, ael, yl = jax.lax.associative_scan(
                _affine_combine, (am, ae, b), axis=0)
            tot = (aml[-1:], ael[-1:], yl[-1:])  # this slab's full transform
            am_all = jax.lax.all_gather(tot[0], "sp")  # (nsp, 1, P)
            ae_all = jax.lax.all_gather(tot[1], "sp")
            y_all = jax.lax.all_gather(tot[2], "sp")
            carry_t = (jnp.ones((1, Pn), f), jnp.zeros((1, Pn), jnp.int32),
                       jnp.zeros((1, Pn), f))  # identity affine map
            for k in range(nsp - 1):  # exclusive left-fold over devices < idx
                cand = _affine_combine(carry_t, (am_all[k], ae_all[k], y_all[k]))
                use = jnp.int32(k) < idx
                carry_t = tuple(jnp.where(use, c, o)
                                for c, o in zip(cand, carry_t))
            _, _, y_new = _affine_combine(carry_t, (aml, ael, yl))

            row_sum = jnp.sum((m_new + x_new) * col_valid, axis=0)
            acc = acc + jnp.where(row_idx == rslen, row_sum, f.type(0.0))
            return (m_new, x_new, y_new, acc), None

        m0 = jnp.zeros((H_loc, Pn), f)
        x0 = jnp.zeros((H_loc, Pn), f)
        y0 = jnp.broadcast_to(init_y[None, :], (H_loc, Pn)).astype(f)
        acc0 = jnp.zeros((Pn,), f)
        xs = (read.astype(jnp.uint8), distm_match, distm_mis, p_mm, p_gapm,
              p_mx, p_xx, p_my, p_yy, jnp.arange(1, R + 1, dtype=jnp.int32))
        (_, _, _, acc), _ = jax.lax.scan(row_step, (m0, x0, y0, acc0), xs)
        return jax.lax.psum(acc, "sp")

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("sp", None),) + (P(None, None),) * 5 + (P(None),) * 2,
        out_specs=P(None),
        check_vma=False,
    )
    with jax.enable_x64(dtype == "float64"), mesh:
        return fn(hap, read, q, iq, dq, gcp,
                  jnp.asarray(haplen, jnp.int32), jnp.asarray(rslen, jnp.int32))

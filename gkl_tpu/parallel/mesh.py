"""Device mesh construction and data-parallel sharding of pair batches.

Axes:

* ``dp`` — data parallel over the pair/lane axis.  This is the TPU-native
  replacement for the reference's OpenMP ``parallel for`` over independent
  (read, haplotype) pairs (IntelPairHmm.cc:151-153, pdhmm.h:1218-1248).
* ``sp`` — reserved for sequence-parallel column splits of very long
  haplotypes (SURVEY.md §5.7); currently size 1.
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


def pairhmm_raw_sharded(mesh: Mesh, packed, dtype: str = "float32"):
    """Run the PairHMM forward on a lane-sharded batch; returns (P,) sharded.

    The kernel is purely elementwise over lanes, so under ``jit`` the
    sharded inputs execute SPMD with zero collectives until the caller
    gathers the (tiny) result vector.
    """
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

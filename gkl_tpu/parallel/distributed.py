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


def pairhmm_raw_global(mesh, packed_local, dtype: str = "float32") -> np.ndarray:
    """Multi-host SPMD PairHMM forward: every process feeds ITS lane shard,
    the jit runs collectively over the global mesh, and each process gets
    back its own result lanes.

    ``packed_local`` is this host's (len, lanes_per_host) PackedPairs block
    (the batch planner runs per host on its slice of the pair list, see
    ``host_local_slice``).  The kernel is collective-free, so the only
    cross-host traffic is XLA's program launch coordination — this is the
    ≥85%-scaling design claim made checkable (tests/test_distributed2.py
    runs it across two real processes).
    """
    from .mesh import _pairhmm_raw_jit

    def ga(a, axis):
        return make_global_array(np.asarray(a), mesh, axis=axis)

    with mesh:
        raw = _pairhmm_raw_jit(
            ga(packed_local.hap, -1), ga(packed_local.read, -1),
            ga(packed_local.q, -1), ga(packed_local.iq, -1),
            ga(packed_local.dq, -1), ga(packed_local.gcp, -1),
            ga(packed_local.haplen, 0), ga(packed_local.rslen, 0), dtype,
        )
    shards = sorted(raw.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])

"""Multi-chip / multi-host runtime (the layer the reference lacks).

The reference's only multi-worker mechanism is OpenMP shared memory
(``pairhmm/IntelPairHmm.cc:151-153``).  Here batches of pairs are sharded
data-parallel across a ``jax.sharding.Mesh`` (chips over ICI, hosts over
DCN) and per-lane results are gathered — likelihood vectors are tiny
relative to inputs so gather-at-end is cheap.
"""

from .distributed import (
    global_mesh,
    host_local_slice,
    initialize,
    make_global_array,
    pairhmm_raw_global,
    pairhmm_scaled_global,
    pdhmm_chunked_global,
    pdhmm_raw_global,
    sw_forward_global,
    sw_relay_global,
)
from .mesh import (
    data_parallel_mesh,
    is_multiprocess,
    replicate_to_host,
    pairhmm_raw_pallas_scaled_sharded,
    pairhmm_scaled_indexed_sharded,
    pairhmm_raw_pallas_sharded,
    pairhmm_raw_pallas_cols_relay_sharded,
    pairhmm_raw_pallas_cols_sharded,
    pairhmm_raw_sharded,
    pdhmm_raw_pallas_chunked_sharded,
    pdhmm_raw_pallas_sharded,
    pdhmm_raw_sharded,
    shard_pairs,
    sw_forward_pallas_relay_sharded,
    sw_forward_pallas_sharded,
    sw_forward_sharded,
)

__all__ = [
    "data_parallel_mesh",
    "global_mesh",
    "host_local_slice",
    "initialize",
    "is_multiprocess",
    "make_global_array",
    "pairhmm_raw_global",
    "pairhmm_scaled_global",
    "pdhmm_chunked_global",
    "pdhmm_raw_global",
    "replicate_to_host",
    "sw_forward_global",
    "sw_relay_global",
    "pairhmm_raw_pallas_scaled_sharded",
    "pairhmm_scaled_indexed_sharded",
    "pairhmm_raw_pallas_sharded",
    "pairhmm_raw_pallas_cols_relay_sharded",
    "pairhmm_raw_pallas_cols_sharded",
    "pairhmm_raw_sharded",
    "pdhmm_raw_pallas_chunked_sharded",
    "pdhmm_raw_pallas_sharded",
    "pdhmm_raw_sharded",
    "shard_pairs",
    "sw_forward_pallas_relay_sharded",
    "sw_forward_pallas_sharded",
    "sw_forward_sharded",
]

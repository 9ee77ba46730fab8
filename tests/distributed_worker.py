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
    mine = parallel.pairhmm_raw_global(mesh, local)

    ref = np.asarray(pairhmm_raw(hap, read, q, iq, dq, gcp, haplen, rslen,
                                 dtype="float32"))[sl]
    print("RESULT", json.dumps([float(v) for v in mine]))
    print("REF", json.dumps([float(v) for v in ref]))
    sys.stdout.flush()


if __name__ == "__main__":
    main()

"""Java-API-parity surface: PairHMM / PDHMM / SmithWaterman / Deflater classes.

Mirrors the reference's public bindings:

* ``IntelPairHmm`` (``pairhmm/IntelPairHmm.java:41-167``) →  :class:`PairHMM`
* ``IntelPDHMM``   (``pdhmm/IntelPDHMM.java:46-220``)     →  :class:`PDHMM`
* ``IntelSmithWaterman`` (``smithwaterman/IntelSmithWaterman.java:44-191``)
  → :class:`SmithWaterman` (in ``api_sw.py`` to avoid import cycles)

The per-pair likelihood batch is the reference's read × haplotype cross
product in read-major order (``pairhmm/JavaData.h:84-106``).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Sequence

import numpy as np

from . import batch as batch_mod
from . import utils
from .context import MIN_ACCEPTED
from .ops import pairhmm as pairhmm_ops


def _as_u8(x) -> np.ndarray:
    if isinstance(x, (bytes, bytearray, str)):
        if isinstance(x, str):
            x = x.encode("ascii")
        return np.frombuffer(bytes(x), dtype=np.uint8)
    # no copy when already uint8 (the pipeline shares constant GOP rows
    # across reads; the reference pins caller arrays without copying too)
    return np.asarray(x).astype(np.uint8, copy=False)


@dataclasses.dataclass
class ReadData:
    """Equivalent of GATK's ReadDataHolder (pairhmm/JavaData.h:55-60)."""

    read_bases: np.ndarray
    read_quals: np.ndarray
    insertion_gop: np.ndarray
    deletion_gop: np.ndarray
    overall_gcp: np.ndarray

    def __post_init__(self):
        self.read_bases = _as_u8(self.read_bases)
        self.read_quals = _as_u8(self.read_quals)
        self.insertion_gop = _as_u8(self.insertion_gop)
        self.deletion_gop = _as_u8(self.deletion_gop)
        self.overall_gcp = _as_u8(self.overall_gcp)


@dataclasses.dataclass
class HaplotypeData:
    """Equivalent of HaplotypeDataHolder (pairhmm/JavaData.h:61-62)."""

    haplotype_bases: np.ndarray

    def __post_init__(self):
        self.haplotype_bases = _as_u8(self.haplotype_bases)


@dataclasses.dataclass
class PairHMMNativeArguments:
    """Mirror of PairHMMNativeArguments (pairhmm/IntelPairHmm.java:85-119).

    ``max_number_of_threads`` is the reference's OpenMP worker clamp; the
    TPU-native worker is a dp-mesh shard, so the knob caps how many local
    devices the engine spans: 1 (default) = single device, 0 = every
    local device, N = at most N devices.  An explicit ``mesh=`` argument
    always wins (the caller already chose its topology).
    """

    use_double_precision: bool = False
    max_number_of_threads: int = 1


@functools.lru_cache(maxsize=4)
def _scaled_stacked_jit(inner_fn):
    """Jit wrapper around the scaled kernel that stacks (mant, ex, flag)
    into ONE (3, P) f32 device array — a single device→host transfer per
    batch instead of three (each fetch pays a full relay round trip).
    Exponents and flags are exact in f32 (|ex| < 2^24).  Keyed on the
    kernel fn so test monkeypatches get their own cache entry."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(hap, read, q, iq, dq, gcp, haplen, rslen):
        m, e, fl = inner_fn(hap, read, q, iq, dq, gcp, haplen, rslen,
                            lane_block=128)
        return jnp.stack([m, e.astype(jnp.float32), fl.astype(jnp.float32)])

    return f


def _scaled_inner_fn():
    """The scaled-kernel entry used by the stacked/indexed jit wrappers.
    Module-level so tests can monkeypatch in an interpret-mode wrapper."""
    from .ops import pairhmm_pallas

    return pairhmm_pallas.pairhmm_raw_pallas_scaled


def _scaled_stacked(*args):
    return _scaled_stacked_jit(_scaled_inner_fn())(*args)


@functools.lru_cache(maxsize=8)
def _scaled_indexed_jit(inner_fn, const_quals):
    """Jit wrapper for the deduplicated batch (PackedPairsIndexed): unique
    read/hap planes come in once, the cross-product lanes are expanded ON
    DEVICE with ``jnp.take``, and constant iq/dq/gcp planes (the GATK
    default-GOP flow) are synthesized on device — host→device traffic is
    what the reference's JNI marshalling sends (each read and hap once,
    JavaData.h:84-106), not the nr×nh cross product."""
    import jax
    import jax.numpy as jnp

    from .ops.pairhmm_pallas import expand_indexed_planes

    @jax.jit
    def f(hap_u, readq_u, ridx, hidx, haplen, rslen, quals_u=None):
        hap, read, q, iq, dq, gcp = expand_indexed_planes(
            hap_u, readq_u, ridx, hidx, const_quals=const_quals,
            quals_u=quals_u)
        m, e, fl = inner_fn(hap, read, q, iq, dq, gcp, haplen, rslen,
                            lane_block=128)
        return jnp.stack([m, e.astype(jnp.float32), fl.astype(jnp.float32)])

    return f


def _const_quals_of(reads: Sequence["ReadData"]):
    """(iq, dq, gcp) constants when every read's planes are uniform (the
    GATK default-GOP flow), else None.  Deduplicates by object identity
    first — the pipeline shares one cached plane per length — so the scan
    is O(unique planes), not O(reads)."""
    first = reads[0]
    if len(first.insertion_gop) == 0:
        return None
    c = (int(first.insertion_gop[0]), int(first.deletion_gop[0]),
         int(first.overall_gcp[0]))
    seen: set = set()
    for rd in reads:
        for plane, cv in ((rd.insertion_gop, c[0]), (rd.deletion_gop, c[1]),
                          (rd.overall_gcp, c[2])):
            key = (id(plane), cv)  # an object may serve several roles
            if key in seen:
                continue
            seen.add(key)
            # an empty plane (dense packing pads with qual_fill) can't be
            # asserted constant — fall back to the dense path
            if len(plane) == 0 or plane[0] != cv or not (plane == cv).all():
                return None
    return c


_PALLAS_FALLOFF_SEEN: set = set()


def _warn_pallas_falloff(where: str, **detail) -> None:
    """One-line diagnostic whenever a TPU batch degrades to the jnp scan
    engine (~50x slower than the Pallas kernels) — the silent failure mode
    rounds 1-2 fought.  ``GKL_TPU_STRICT_PALLAS=1`` raises instead (the
    KernelLevel.PALLAS-style contract for production fleets).  Deduplicated
    per (where, detail) so a streaming pipeline emits one line per distinct
    configuration condition, not one per batch."""
    import os
    import sys

    msg = (f"gkl_tpu: PairHMM batch fell off the Pallas fast path "
           f"({where}: {detail}) — running the ~50x-slower jnp engine. "
           f"Align lane counts to 128*mesh or unset GKL_TPU_PALLAS=0.")
    if os.environ.get("GKL_TPU_STRICT_PALLAS") == "1":
        raise RuntimeError(msg)
    key = (where, repr(sorted(detail.items())))
    if key in _PALLAS_FALLOFF_SEEN:
        return
    _PALLAS_FALLOFF_SEEN.add(key)
    print(msg, file=sys.stderr)


def _extract_lanes(packed, lanes):
    """Per-lane variable-length (haps, reads, quals) views for a lane subset
    of a packed batch — the compaction step of the lane-granular rescue (the
    reference recomputes only the underflowed pair, IntelPairHmm.cc:157-165).
    Works on dense and indexed batches without materializing the group."""
    haps, reads, quals = [], [], []
    indexed = isinstance(packed, batch_mod.PackedPairsIndexed)
    for k in lanes:
        k = int(k)
        hl, rl = int(packed.haplen[k]), int(packed.rslen[k])
        if indexed:
            ri, hi = int(packed.ridx[k]), int(packed.hidx[k])
            haps.append(packed.hap_u[:hl, hi])
            reads.append(packed.readq_u[0][:rl, ri])
            if packed.const_quals is not None:
                iq = np.full(rl, packed.const_quals[0], np.uint8)
                dq = np.full(rl, packed.const_quals[1], np.uint8)
                gcp = np.full(rl, packed.const_quals[2], np.uint8)
            else:
                iq = packed.quals_u[0][:rl, ri]
                dq = packed.quals_u[1][:rl, ri]
                gcp = packed.quals_u[2][:rl, ri]
            quals.append((packed.readq_u[1][:rl, ri], iq, dq, gcp))
        else:
            haps.append(packed.hap[:hl, k])
            reads.append(packed.read[:rl, k])
            quals.append((packed.q[:rl, k], packed.iq[:rl, k],
                          packed.dq[:rl, k], packed.gcp[:rl, k]))
    return haps, reads, quals


def _slice_lanes(packed, lanes) -> batch_mod.PackedPairs:
    """Dense sub-batch holding only ``lanes`` (the jnp-f64 fallback path of
    the lane-granular rescue)."""
    if isinstance(packed, batch_mod.PackedPairsIndexed):
        hi = packed.hidx[lanes]
        ri = packed.ridx[lanes]
        hap = np.take(packed.hap_u, hi, axis=1)
        read = np.take(packed.readq_u[0], ri, axis=1)
        q = np.take(packed.readq_u[1], ri, axis=1)
        if packed.const_quals is not None:
            iq = np.full_like(read, packed.const_quals[0])
            dq = np.full_like(read, packed.const_quals[1])
            gcp = np.full_like(read, packed.const_quals[2])
        else:
            iq = np.take(packed.quals_u[0], ri, axis=1)
            dq = np.take(packed.quals_u[1], ri, axis=1)
            gcp = np.take(packed.quals_u[2], ri, axis=1)
        return batch_mod.PackedPairs(hap, read, q, iq, dq, gcp,
                                     packed.haplen[lanes],
                                     packed.rslen[lanes], len(lanes))
    return batch_mod.PackedPairs(
        packed.hap[:, lanes], packed.read[:, lanes], packed.q[:, lanes],
        packed.iq[:, lanes], packed.dq[:, lanes], packed.gcp[:, lanes],
        packed.haplen[lanes], packed.rslen[lanes], len(lanes))


class PairHMM:
    """PairHMM forward-likelihood engine (float-first with double rescue).

    ``compute_likelihoods`` follows ``pairhmm/IntelPairHmm.cc:125-181``:
    compute every (read, hap) pair in float32; any raw probability below
    ``MIN_ACCEPTED`` (1e-28) is recomputed in float64.  With
    ``use_double_precision=True`` everything runs in float64.
    """

    def __init__(self, args: PairHMMNativeArguments | None = None, *,
                 lane_multiple: int | None = None, mesh=None):
        """``mesh``: an optional ``jax.sharding.Mesh`` with a ``dp`` axis;
        batches shard across it lane-wise (the OpenMP-over-pairs analogue,
        see ``gkl_tpu.parallel``).  The f32 jnp engine runs SPMD; lane
        counts pad to a multiple of the mesh size."""
        self.args = args or PairHMMNativeArguments()
        self._user_lane_multiple = lane_multiple
        self._lane_multiple = lane_multiple
        self._user_mesh = mesh is not None
        self.mesh = mesh
        if mesh is None:
            self.mesh = self._mesh_from_thread_cap(self.args)
        if self.mesh is not None and lane_multiple is None:
            # lanes must split evenly across dp shards, and each shard's
            # local lane count must fill the Pallas kernel's lane block on
            # TPU (the mesh path runs the SAME Pallas kernels per shard)
            self._lane_multiple = (128 if self._use_pallas(0) else 8) * self.mesh.size

    @staticmethod
    def _mesh_from_thread_cap(args: PairHMMNativeArguments):
        """max_number_of_threads → dp-mesh width (the OpenMP thread clamp of
        IntelPairHmm.cc:88-91 mapped to devices): 0 = all local devices,
        N = at most N; a 1-device span needs no mesh at all."""
        cap = args.max_number_of_threads
        if cap < 0:
            raise ValueError("maxNumberOfThreads must be >= 0")
        if cap == 1:
            return None
        import jax

        # LOCAL devices only: the thread clamp is a per-process concept
        # (one OpenMP pool per JVM in the reference).  An auto-mesh must
        # never span processes — each process feeds its own batches, so a
        # cross-process collective program would deadlock; multi-host
        # meshes are an explicit opt-in via PairHMM(mesh=...).
        devs = jax.local_devices()
        n = len(devs) if cap == 0 else min(cap, len(devs))
        if n <= 1:
            return None
        from . import parallel

        return parallel.data_parallel_mesh(devices=devs[:n])

    def initialize(self, args: PairHMMNativeArguments) -> None:
        """Re-reads the thread clamp like the reference's initializeNative
        does on every call (IntelPairHmm.cc:88-91): an auto-built mesh is
        rebuilt (or dropped) to match the new cap.  A mesh the caller
        passed explicitly is never touched."""
        self.args = args
        if not self._user_mesh:
            self.mesh = self._mesh_from_thread_cap(args)
            if self._user_lane_multiple is None:
                self._lane_multiple = (
                    None if self.mesh is None else
                    (128 if self._use_pallas(0) else 8) * self.mesh.size)

    def done(self) -> None:  # parity with IntelPairHmm.done()
        pass

    # Longest haplotype bucket the Pallas kernel holds in VMEM scratch
    # (3 state tiles of (H, 128) f32 plus inputs; 16 MB VMEM on v5e).
    PALLAS_MAX_HAP = 2048

    # compute_likelihoods_async keeps at most this many input-plane bytes
    # in flight on device; further bucket groups dispatch lazily from
    # result(), one group ahead of the fetch (bounds HBM for huge
    # heterogeneous batches without losing the overlap)
    _ASYNC_INFLIGHT_BYTES = 256 << 20

    @classmethod
    def _use_pallas(cls, hap_len: int = 0) -> bool:
        """Pallas fast path: on TPU unless GKL_TPU_PALLAS=0 (lanes must be
        multiples of 128, which the TPU lane bucketing guarantees).  Very
        long haplotypes exceed VMEM scratch and take the jnp scan path."""
        import os

        if os.environ.get("GKL_TPU_PALLAS") == "0":
            return False
        if hap_len > cls.PALLAS_MAX_HAP:
            return False
        return utils.is_tpu_available()

    def _f64_lanes(self, packed, lanes, kernel: str | None = None) -> np.ndarray:
        """Reference-exact f64 log10 results for a lane subset.

        The threaded native oracle (native/pairhmm_oracle.cc — sequential
        double DP with gradual underflow, the IntelPairHmm.cc:157-165 rescue
        engine) runs over the COMPACTED lanes, so rescue work scales with
        ``len(lanes)``, not the packed group; the jnp f64 engine on sliced
        columns is the no-native fallback.  ``kernel`` names a METRICS
        counter to record (items = lanes recomputed)."""
        import time as _time

        from . import native_lib, profiling

        t0 = _time.perf_counter() if profiling.metrics_enabled() else 0.0
        lanes = np.asarray(lanes, np.int64)
        if native_lib.load("gkl_pairhmm_oracle") is not None:
            from .ops import pairhmm_ref

            haps, reads, quals = _extract_lanes(packed, lanes)
            threads = (self.args.max_number_of_threads
                       or utils.default_host_threads())
            res = pairhmm_ref.pairhmm_scalar_batch(haps, reads, quals,
                                                   threads=threads)
        else:
            sub = _slice_lanes(packed, lanes)
            raw64 = self._raw_batch(sub, "float64")
            res = pairhmm_ops.pairhmm_log10_from_raw_f64(raw64)
        if kernel is not None and profiling.metrics_enabled():
            cells = int(np.sum(packed.haplen[lanes].astype(np.int64)
                               * packed.rslen[lanes].astype(np.int64)))
            profiling.METRICS.record(kernel, items=len(lanes), cells=cells,
                                     seconds=_time.perf_counter() - t0)
        return res

    # -- functional core ---------------------------------------------------
    def _raw_batch(self, packed: batch_mod.PackedPairs, dtype: str) -> np.ndarray:
        if dtype == "float64" and not utils.supports_native_float64():
            # TPUs do not execute f64 at full range; the double paths
            # (pure-double mode and the rescue pass) run on the host CPU
            # backend — the analogue of the reference's scalar fallback.
            with utils.f64_scope():
                return self._raw_batch_impl(packed, dtype)
        return self._raw_batch_impl(packed, dtype)

    # Probed on v5e (scripts/probe_cols_relay.py): the streamed-hap cols
    # kernel compiles and matches the jnp engine at H=32768 and R=512 (any
    # H — the hap axis pages through a sequential grid dimension); R=1024
    # Measured crossover, not a VMEM cap: past R=128 the read-RELAY
    # variant (device-resident boundary planes between shallow read
    # chunks) is FASTER than one tall column sweep — shallow state tiles
    # mean fewer X-scan ladder levels and cheaper sublane rolls (v5e,
    # H=4096: plain cols 133/81/54 Gcells/s at R=128/256/512 vs relay
    # ~100-111 with r_chunk=64).  There is no length cliff left in the
    # Pallas path either way.
    COLS_MAX_READ = 128

    @classmethod
    def _cols_kernel_fits(cls, H: int, R: int) -> bool:
        """Streamed-hap column kernel: VMEM holds only (R, 128) tiles; the
        haplotype axis streams in chunks, so any H runs at full speed
        (the reference's stripes cover any length the same way,
        avx-pairhmm-template.h:291-323).  Longer reads relay (see
        _raw_batch_impl)."""
        return R <= cls.COLS_MAX_READ

    def _raw_batch_impl(self, packed: batch_mod.PackedPairs, dtype: str) -> np.ndarray:
        H, R = packed.hap.shape[0], packed.read.shape[0]
        if self.mesh is not None and dtype == "float32":
            from . import parallel

            P = packed.hap.shape[1]
            pallas_ok = self._use_pallas(0) and P % (128 * self.mesh.size) == 0
            with self.mesh:
                # mesh path keeps the Pallas fast path (the reference
                # parallelizes its fast kernel, IntelPairHmm.cc:151-153);
                # jnp engines are only the non-TPU fallback
                if pallas_ok and H <= self.PALLAS_MAX_HAP:
                    raw = parallel.pairhmm_raw_pallas_sharded(self.mesh, packed)
                elif pallas_ok and self._cols_kernel_fits(H, R):
                    raw = parallel.pairhmm_raw_pallas_cols_sharded(self.mesh, packed)
                elif pallas_ok:
                    # long reads AND long haplotypes: read-relayed column
                    # sweep — any length at full speed (the reference's
                    # stripes, avx-pairhmm-template.h:291-323)
                    raw = parallel.pairhmm_raw_pallas_cols_relay_sharded(
                        self.mesh, packed)
                else:
                    if utils.is_tpu_available():
                        # only loud on TPU backends — on a CPU mesh the
                        # jnp engine IS the engine, not a degradation
                        _warn_pallas_falloff("mesh", H=H, R=R,
                                             P=packed.hap.shape[1],
                                             mesh_size=self.mesh.size)
                    raw = parallel.pairhmm_raw_sharded(self.mesh, packed, dtype="float32")
            return np.asarray(raw)[: packed.n_real]
        if dtype == "float32" and self._use_pallas(0):
            if H <= self.PALLAS_MAX_HAP:
                from .ops import pairhmm_pallas

                raw = pairhmm_pallas.pairhmm_raw_pallas(
                    packed.hap,
                    packed.read,
                    packed.q,
                    packed.iq,
                    packed.dq,
                    packed.gcp,
                    packed.haplen,
                    packed.rslen,
                    lane_block=128,
                )
                return np.asarray(raw)[: packed.n_real]
            if self._cols_kernel_fits(H, R):
                # long-haplotype path: (R, 128) state, haplotype streamed —
                # faster per cell than the row sweep at these shapes (~90
                # Gcells/s at H=4096 on v5e)
                from .ops import pairhmm_pallas_cols

                raw = pairhmm_pallas_cols.pairhmm_raw_pallas_cols(
                    packed.hap,
                    packed.read,
                    packed.q,
                    packed.iq,
                    packed.dq,
                    packed.gcp,
                    packed.haplen,
                    packed.rslen,
                    lane_block=128,
                )
                return np.asarray(raw)[: packed.n_real]
            # long reads AND long haplotypes (PacBio/ONT-class pairs): the
            # read-relayed column sweep removes the last jnp cliff
            from .ops import pairhmm_pallas_cols

            raw = pairhmm_pallas_cols.pairhmm_raw_pallas_cols_relay(
                packed.hap,
                packed.read,
                packed.q,
                packed.iq,
                packed.dq,
                packed.gcp,
                packed.haplen,
                packed.rslen,
                lane_block=128,
            )
            return np.asarray(raw)[: packed.n_real]
        if dtype == "float32" and utils.is_tpu_available():
            # Pallas disabled or lanes misaligned on a TPU backend: this is
            # the ~50x-slower jnp scan — say so instead of degrading
            # silently (GKL_TPU_STRICT_PALLAS=1 raises)
            _warn_pallas_falloff("single", H=H, R=R, P=packed.hap.shape[1])
        raw = pairhmm_ops.pairhmm_raw(
            packed.hap,
            packed.read,
            packed.q,
            packed.iq,
            packed.dq,
            packed.gcp,
            packed.haplen,
            packed.rslen,
            dtype=dtype,
        )
        return np.asarray(raw)[: packed.n_real]

    def _forward_scaled_dispatch(self, packed: batch_mod.PackedPairs):
        """Dispatch the scaled kernel WITHOUT fetching (JAX async dispatch:
        the returned device arrays are futures).  None when the fast path
        does not apply."""
        H, R = packed.hap.shape[0], packed.read.shape[0]
        if not (self._use_pallas(H) and R % 8 == 0):
            return None
        if self.mesh is not None:
            if packed.hap.shape[1] % (128 * self.mesh.size):
                return None
            from . import parallel

            with self.mesh:
                handles = parallel.pairhmm_raw_pallas_scaled_sharded(
                    self.mesh, packed
                )
        else:
            handles = _scaled_stacked(packed.hap, packed.read, packed.q,
                                      packed.iq, packed.dq, packed.gcp,
                                      packed.haplen, packed.rslen)
        for a in handles if isinstance(handles, tuple) else (handles,):
            start = getattr(a, "copy_to_host_async", None)
            if start is not None:
                start()
        return handles

    def _forward_scaled_dispatch_indexed(self, pk: batch_mod.PackedPairsIndexed):
        """Async-dispatch the scaled kernel on a deduplicated batch (lanes
        expanded on device).  None when the fast path does not apply — the
        caller materializes and takes the dense route."""
        H, R = pk.hap_u.shape[0], pk.readq_u.shape[1]
        if not (self._use_pallas(H) and R % 8 == 0):
            return None
        if self.mesh is not None:
            from . import parallel

            P = len(pk.ridx)
            if (pk.pattern_nh is None
                    or pk.readq_u.shape[2] % self.mesh.size
                    or P % (128 * self.mesh.size)):
                return None
            with self.mesh:
                handles = parallel.pairhmm_scaled_indexed_sharded(
                    self.mesh, pk)
            start = getattr(handles, "copy_to_host_async", None)
            if start is not None:
                start()
            return handles
        f = _scaled_indexed_jit(_scaled_inner_fn(), pk.const_quals)
        if pk.const_quals is None:
            handles = f(pk.hap_u, pk.readq_u, pk.ridx, pk.hidx,
                        pk.haplen, pk.rslen, pk.quals_u)
        else:
            handles = f(pk.hap_u, pk.readq_u, pk.ridx, pk.hidx,
                        pk.haplen, pk.rslen)
        start = getattr(handles, "copy_to_host_async", None)
        if start is not None:
            start()
        return handles

    def _forward_scaled(self, packed: batch_mod.PackedPairs):
        """One-pass f32 forward via the scaled kernel.

        Returns ``(res, needs_host)`` or None when the fast path does not
        apply.  In-range lanes reproduce the plain float pipeline
        bit-for-bit (power-of-two rescales are exact, and the log10 is
        taken on the reconstructed f32 raw value); underflowed lanes get
        the scaled result directly — f32 precision at any depth, the
        reference's float->double rescue without a second pass.  Lanes in
        the f64-subnormal parity zone (res < -600) are flagged for the
        reference-exact host f64 recompute; GKL_TPU_EXACT_RESCUE=1 forces
        all underflowed lanes onto that path.
        """
        handles = self._forward_scaled_dispatch(packed)
        if handles is None:
            return None
        return self._forward_scaled_finalize(packed, handles)

    def _forward_scaled_finalize(self, packed, handles):
        """Materialise a dispatched scaled forward: fetch, reconstruct the
        f32 raw value, and classify lanes for the host-f64 rescue."""
        import os

        if isinstance(handles, tuple):
            mant, ex, flag = handles
        else:
            # single stacked (3, P) device array: ONE device→host transfer
            # instead of three (each fetch pays a full relay round trip)
            stacked = np.asarray(handles)
            mant, ex, flag = stacked[0], stacked[1], stacked[2]
        mant = np.asarray(mant, dtype=np.float64)[: packed.n_real]
        ex = np.asarray(ex, dtype=np.float64)[: packed.n_real]
        flag = np.asarray(flag)[: packed.n_real]
        raw32 = np.ldexp(mant, ex.astype(np.int64)).astype(np.float32)
        in_range = raw32 >= MIN_ACCEPTED
        with np.errstate(divide="ignore"):
            res_in = pairhmm_ops.pairhmm_log10_from_raw_f32(raw32)
            # the scaled kernel's IC is 2^120, removed here exactly
            res_deep = np.log10(mant) + (ex - 120.0) * np.log10(2.0)
        res = np.where(in_range, res_in, res_deep)
        # host-f64 rescue policy (GKL_TPU_RESCUE):
        #   flagged (default) — rescue deep lanes whose column spread
        #     exceeded the scaled kernel's f32 window (a flushed path may
        #     have been dominant; the flag is conservative and fires for
        #     most long-read deep lanes, matching the reference's
        #     rescue-every-deep-lane architecture, IntelPairHmm.cc:157-165);
        #   device  — trust the scaled kernel everywhere (fastest; exact
        #     for in-range lanes, heuristic-accurate for deep ones);
        #   host    — rescue every deep lane (reference-exact).
        deep = ~in_range & (~np.isfinite(res_deep) | (res_deep < -600.0))
        mode = os.environ.get("GKL_TPU_RESCUE", "flagged")
        if os.environ.get("GKL_TPU_EXACT_RESCUE") == "1" or mode == "host":
            deep = ~in_range
        elif mode != "device":
            deep = deep | (~in_range & (flag != 0))
        return res, deep

    def compute_likelihoods_async(
        self,
        reads: Sequence[ReadData],
        haplotypes: Sequence[HaplotypeData],
    ) -> "PendingLikelihoods":
        """Dispatch the cross-product batch WITHOUT waiting for the device.

        Packs every bucket group and launches the scaled Pallas kernel
        (JAX async dispatch); the returned handle materialises results —
        including the float→double rescue — on ``.result()``.  This is the
        streaming-pipeline building block: chunk N+1's host decode/pack
        overlaps chunk N's device time.
        """
        if reads is None or haplotypes is None:
            raise TypeError("readDataArray/haplotypeDataArray is null")
        if len(reads) == 0 or len(haplotypes) == 0:
            raise ValueError("readDataArray/haplotypeDataArray is empty")
        for rd in reads:
            if rd.read_bases is None or len(rd.read_bases) == 0:
                raise ValueError("read bases are null or empty")
            if not (
                len(rd.read_bases) == len(rd.read_quals) == len(rd.insertion_gop)
                == len(rd.deletion_gop) == len(rd.overall_gcp)
            ):
                raise ValueError("read arrays must all have the read's length")
        for hp in haplotypes:
            if hp.haplotype_bases is None or len(hp.haplotype_bases) == 0:
                raise ValueError("haplotype bases are null or empty")
        nr, nh = len(reads), len(haplotypes)
        n = nr * nh
        from . import profiling

        t0 = time.perf_counter() if profiling.metrics_enabled() else 0.0
        rlens = [len(rd.read_bases) for rd in reads]
        hlens = [len(hp.haplotype_bases) for hp in haplotypes]
        # Σ_pairs len_r·len_h over the full cross product
        cells = sum(rlens) * sum(hlens)

        if not self.args.use_double_precision and self._use_pallas(0):
            # deduplicated marshalling: group reads and haps by their OWN
            # length buckets (each read-group × hap-group pair is one shape
            # class), upload unique planes once, expand lanes on device
            const_quals = _const_quals_of(reads)
            rgroups: dict = {}
            for i, ln in enumerate(rlens):
                rgroups.setdefault(batch_mod.bucket_length(ln), []).append(i)
            hgroups: dict = {}
            for j, ln in enumerate(hlens):
                hgroups.setdefault(batch_mod.bucket_length(ln), []).append(j)
            work = []
            inflight = 0
            for rids in rgroups.values():
                rq = [(reads[i].read_quals, reads[i].insertion_gop,
                       reads[i].deletion_gop, reads[i].overall_gcp)
                      for i in rids]
                rbases = [reads[i].read_bases for i in rids]
                for hids in hgroups.values():
                    # on a mesh, the full-pattern layout lets unique reads
                    # shard with the same cuts as pair lanes — only usable
                    # when the group's nh divides the padded lane count
                    # (multi-process meshes included: every host packs the
                    # same full batch and feeds its own read slab,
                    # parallel.pairhmm_scaled_indexed_sharded)
                    lm = self._lane_multiple or batch_mod.default_lane_multiple()
                    Pg = batch_mod.bucket_lanes(len(rids) * len(hids), lm)
                    full_pattern = (self.mesh is not None
                                    and Pg % len(hids) == 0
                                    and (Pg // len(hids)) % self.mesh.size == 0)
                    pk = batch_mod.pack_pairs_indexed(
                        [haplotypes[j].haplotype_bases for j in hids],
                        rbases, rq,
                        lane_multiple=self._lane_multiple,
                        const_quals=const_quals,
                        full_pattern=full_pattern,
                    )
                    idxs = (np.asarray(rids, np.int64)[:, None] * nh
                            + np.asarray(hids, np.int64)[None, :]).ravel()
                    # device-memory bound: groups beyond the in-flight
                    # byte budget stay undispatched ("lazy"); result()
                    # dispatches them one group ahead of the fetch so the
                    # overlap survives without the whole batch resident
                    est = pk.device_bytes()
                    if inflight + est > self._ASYNC_INFLIGHT_BYTES and work:
                        work.append(("lazy", idxs, pk, None))
                        continue
                    inflight += est
                    handles = self._forward_scaled_dispatch_indexed(pk)
                    if handles is not None:
                        work.append(("scaled", idxs, pk, handles))
                        continue
                    dense = pk.materialize()
                    handles = self._forward_scaled_dispatch(dense)
                    if handles is not None:
                        work.append(("scaled", idxs, dense, handles))
                    else:
                        work.append(("f32", idxs, dense, None))
            return PendingLikelihoods(self, n, work, t0, cells)

        pairs_read = []
        pairs_hap = []
        quals = []
        for rd in reads:
            for hp in haplotypes:
                pairs_read.append(rd.read_bases)
                pairs_hap.append(hp.haplotype_bases)
                quals.append((rd.read_quals, rd.insertion_gop, rd.deletion_gop, rd.overall_gcp))

        groups = batch_mod.group_by_bucket(pairs_hap, pairs_read)
        work = []
        inflight = 0
        for idxs in groups.values():
            packed = batch_mod.pack_pairs(
                [pairs_hap[i] for i in idxs],
                [pairs_read[i] for i in idxs],
                [quals[i] for i in idxs],
                lane_multiple=self._lane_multiple,
            )
            if self.args.use_double_precision:
                work.append(("f64", idxs, packed, None))
                continue
            est = packed.device_bytes()
            if inflight + est > self._ASYNC_INFLIGHT_BYTES and work:
                work.append(("lazy", idxs, packed, None))
                continue
            inflight += est
            handles = self._forward_scaled_dispatch(packed)
            if handles is not None:
                # single pass: the scaled kernel is bit-identical to the
                # plain f32 kernel for in-range lanes AND carries the
                # rescue (IntelPairHmm.cc:157-165) in the same call
                work.append(("scaled", idxs, packed, handles))
            else:
                work.append(("f32", idxs, packed, None))
        return PendingLikelihoods(self, n, work, t0, cells)

    def compute_likelihoods(
        self,
        reads: Sequence[ReadData],
        haplotypes: Sequence[HaplotypeData],
        likelihoods: np.ndarray | None = None,
    ) -> np.ndarray:
        """Cross-product likelihoods, read-major (JavaData.h:84-106)."""
        out = self.compute_likelihoods_async(reads, haplotypes).result()
        if likelihoods is not None:
            likelihoods[: len(out)] = out
            return likelihoods
        return out


class PendingLikelihoods:
    """Handle for a dispatched likelihood batch (compute_likelihoods_async).

    Holds the per-bucket device futures; ``result()`` fetches them,
    applies the float→double rescue policy, and returns the (n,) float64
    log10 likelihoods in pair order.  Safe to resolve exactly once.
    """

    def __init__(self, hmm: PairHMM, n: int, work, t0: float, cells: int):
        self._hmm = hmm
        self._n = n
        self._work = work
        self._t0 = t0
        self._cells = cells
        self._out: np.ndarray | None = None

    def _dispatch_lazy(self, entry):
        """Dispatch a budget-deferred group now; returns the live entry."""
        hmm = self._hmm
        _, idxs, packed, _ = entry
        if isinstance(packed, batch_mod.PackedPairsIndexed):
            handles = hmm._forward_scaled_dispatch_indexed(packed)
            if handles is not None:
                return ("scaled", idxs, packed, handles)
            packed = packed.materialize()
        handles = hmm._forward_scaled_dispatch(packed)
        if handles is not None:
            return ("scaled", idxs, packed, handles)
        return ("f32", idxs, packed, None)

    def result(self) -> np.ndarray:
        if self._out is not None:
            return self._out
        hmm = self._hmm
        out = np.zeros(self._n, np.float64)
        work = list(self._work)
        for k in range(len(work)):
            if work[k][0] == "lazy":
                work[k] = self._dispatch_lazy(work[k])
            # keep one lazy group dispatched ahead of this fetch so its
            # upload/compute overlaps the readback below
            if k + 1 < len(work) and work[k + 1][0] == "lazy":
                work[k + 1] = self._dispatch_lazy(work[k + 1])
            kind, idxs, packed, handles = work[k]
            if kind == "f64":
                # pure-double mode: the native oracle IS the engine (exact
                # f64 with gradual underflow, like the reference's double
                # kernel); jnp f64 is the no-native fallback inside
                res = hmm._f64_lanes(packed, np.arange(packed.n_real))
            else:
                if kind == "scaled":
                    res, needs_rescue = hmm._forward_scaled_finalize(
                        packed, handles)
                else:
                    raw32 = hmm._raw_batch(packed, "float32")
                    res = pairhmm_ops.pairhmm_log10_from_raw_f32(raw32)
                    needs_rescue = raw32 < MIN_ACCEPTED
                if np.any(needs_rescue):
                    # lane-granular rescue: ONLY the flagged lanes are
                    # compacted and recomputed in exact f64 (the reference
                    # recomputes only the underflowed pair,
                    # IntelPairHmm.cc:157-165) — rescue cost scales with
                    # the deep-lane count, not the packed group
                    lanes = np.nonzero(needs_rescue)[0]
                    res[lanes] = hmm._f64_lanes(packed, lanes,
                                                kernel="pairhmm_rescue")
            out[np.asarray(idxs)] = res
        self._work = ()
        self._out = out

        from . import profiling

        if profiling.metrics_enabled():
            profiling.METRICS.record(
                "pairhmm", items=self._n, cells=self._cells,
                seconds=time.perf_counter() - self._t0,
            )
        return out


class PairHMMOMP(PairHMM):
    """Parity alias for IntelPairHmmOMP (pairhmm/IntelPairHmmOMP.java:29-35).

    The reference variant only swaps in an OpenMP-enabled native library;
    here batch parallelism is always on (SPMD lanes + the dp mesh), so this
    is the same engine under the reference's other name.
    """


class PairHMMFpga(PairHMM):
    """Parity alias for IntelPairHmmFpga (pairhmm/IntelPairHmmFpga.java:36-39).

    The reference class warns that FPGA is unsupported and falls back to
    software; here the accelerator is the TPU, so ``load`` semantics are
    "supported" and the engine is identical.
    """

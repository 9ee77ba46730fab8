"""PDHMM public API — parity with IntelPDHMM (pdhmm/IntelPDHMM.java:46-220).

Two compute paths like the reference:

* :meth:`PDHMM.compute_pdhmm` — flat batch arrays (+ per-pair lengths),
  mirroring ``computePDHMM`` (IntelPDHMM.java:163-204) including its size
  validation.
* :meth:`PDHMM.compute_likelihoods` — object path over reads x haplotypes
  (read-major cross product, pdhmm/JavaData.h:186-236) with memory-budgeted
  batch slicing (pdhmm/JavaData.h:83-97).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import numpy as np

from . import batch as batch_mod
from . import utils
from .api import HaplotypeData, ReadData
from .context import MIN_ACCEPTED
from .ops import pdhmm as pdhmm_ops


def _pdhmm_indexed_inner(kernel: str):
    """The Pallas kernel for the deduplicated-batch jit wrapper.
    Module-level so tests can monkeypatch in an interpret-mode wrapper."""
    from .ops import pdhmm_pallas as _pp

    return (_pp.pdhmm_raw_pallas if kernel == "single"
            else _pp.pdhmm_raw_pallas_chunked)


@functools.lru_cache(maxsize=8)
def _pdhmm_indexed_jit(inner_fn):
    """Jit wrapper for a PackedPDHMMIndexed batch: unique hap/read planes
    come in once, lanes expand ON DEVICE with ``jnp.take`` — host→device
    traffic is what the reference's JNI marshalling sends (each read and
    hap once, pdhmm/JavaData.h:186-236), not the cross product."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(hap_u, happd_u, states_u, readq_u, ridx, hidx, haplen, rslen):
        hap = jnp.take(hap_u, hidx, axis=1)
        hap_pd = jnp.take(happd_u, hidx, axis=1)
        states = jnp.take(states_u, hidx, axis=1)
        read = jnp.take(readq_u[0], ridx, axis=1)
        q = jnp.take(readq_u[1], ridx, axis=1)
        iq = jnp.take(readq_u[2], ridx, axis=1)
        dq = jnp.take(readq_u[3], ridx, axis=1)
        gcp = jnp.take(readq_u[4], ridx, axis=1)
        return inner_fn(hap, hap_pd, states, read, q, iq, dq, gcp,
                        haplen, rslen)

    return f


@dataclasses.dataclass
class PDHaplotypeData(HaplotypeData):
    """Haplotype with partially-determined flag bytes."""

    haplotype_pdbases: np.ndarray = None

    def __post_init__(self):
        super().__post_init__()
        if self.haplotype_pdbases is None:
            raise ValueError(
                "haplotype_pdbases is required (the PD flag bytes; pass an "
                "all-zero array for a fully determined haplotype)")
        self.haplotype_pdbases = np.asarray(self.haplotype_pdbases).astype(np.uint8)


class KernelLevel(int):
    """AVXLevel analogue (pdhmm-implementation.h:45-58): which engine tier.

    FASTEST_AVAILABLE picks Pallas on TPU, the jnp scan elsewhere; SCALAR
    forces the jnp engine (the reference's scalar_impl equivalent).
    """


KernelLevel.FASTEST_AVAILABLE = KernelLevel(0)
KernelLevel.SCALAR = KernelLevel(1)
KernelLevel.PALLAS = KernelLevel(2)


class ParallelSetting(int):
    """OpenMPSetting analogue (pdhmm-implementation.h:45-50)."""


ParallelSetting.FASTEST_AVAILABLE = ParallelSetting(0)
ParallelSetting.ENABLE = ParallelSetting(1)
ParallelSetting.DISABLE = ParallelSetting(2)


@dataclasses.dataclass
class PDHMMNativeArguments:
    """Mirror of PDHMMNativeArguments (IntelPDHMM.java:79-89)."""

    max_number_of_threads: int = 0  # 0 = all devices (FASTEST_AVAILABLE)
    max_memory_in_mb: int = 512
    kernel_level: int = KernelLevel.FASTEST_AVAILABLE  # avxLevel analogue
    parallel_setting: int = ParallelSetting.FASTEST_AVAILABLE
    # The reference kernel is double-only; here the default is the
    # float-first-with-double-rescue architecture (the reference's own
    # PairHMM pattern, pairhmm/IntelPairHmm.cc:157-165) because f64 is
    # emulated on TPU.  The rescue chain (f64 recompute below MIN_ACCEPTED,
    # scalar-oracle recompute for subnormal-range lanes) preserves the
    # 1e-4 golden contract.  Set True for reference-exact double-only mode.
    use_double_precision: bool = False


class PDHMM:
    def __init__(self, args: PDHMMNativeArguments | None = None, *,
                 lane_multiple: int | None = None, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis;
        float batches shard lane-wise across it (see ``gkl_tpu.parallel``)."""
        self.args = args or PDHMMNativeArguments()
        self._lane_multiple = lane_multiple
        self.mesh = mesh
        if mesh is not None and lane_multiple is None:
            # per-shard lanes must fill the Pallas lane block on TPU
            pallas = (
                utils.is_tpu_available()
                and __import__("os").environ.get("GKL_TPU_PALLAS") != "0"
            )
            self._lane_multiple = (128 if pallas else 8) * mesh.size
        self._effective_threads()  # validate the parallel setting eagerly

    def initialize(self, args: PDHMMNativeArguments) -> None:
        self.args = args
        self._effective_threads()  # validate eagerly, like initializeNative

    def done(self) -> None:
        pass

    def _effective_threads(self) -> int:
        """ComputeConfig's OpenMP resolution (pdhmm-implementation.h:96-133)
        mapped to the native thread pools: DISABLE → 1 worker; ENABLE
        requires the native pool engine and raises when it is unavailable
        (the reference throws when OpenMP is requested but absent);
        otherwise the requested count clamps to the host's cores
        (0 = FASTEST_AVAILABLE = all cores)."""
        import os as _os

        setting = self.args.parallel_setting
        if setting == ParallelSetting.ENABLE:
            from . import native_lib

            if native_lib.load("gkl_pdhmm_oracle") is None:
                raise RuntimeError(
                    "ParallelSetting.ENABLE requires the native thread-pool"
                    " engine, which failed to load"
                )
        if setting == ParallelSetting.DISABLE:
            return 1
        cores = _os.cpu_count() or 1
        req = self.args.max_number_of_threads
        return cores if req <= 0 else min(req, cores)

    @property
    def _dtype(self) -> str:
        return "float64" if self.args.use_double_precision else "float32"

    # ------------------------------------------------------------------
    _EXACT_FALLBACK_LOG10 = -590.0  # below this, subnormal quantization matters

    def _run_packed(self, hap, hap_pd, read, q, iq, dq, gcp, haplen, rslen, dtype):
        """Run the kernel on packed (len, lane) arrays; returns log10 result."""
        states = pdhmm_ops.column_states(hap_pd)
        if dtype == "float64" and not utils.supports_native_float64():
            scope = utils.f64_scope()
        else:
            import contextlib

            scope = contextlib.nullcontext()
        # VMEM caps the single-pass kernel's read bucket (pdhmm_single_fits,
        # measured on v5e); longer reads relay through the chunked kernel.
        from .ops import pdhmm_pallas as _pp

        pallas_on = (
            dtype == "float32"
            and self.args.kernel_level != KernelLevel.SCALAR
            and utils.is_tpu_available()
            and hap.shape[1] % 128 == 0
            and __import__("os").environ.get("GKL_TPU_PALLAS") != "0"
        )
        use_pallas = pallas_on and _pp.pdhmm_single_fits(
            hap.shape[0], read.shape[0])
        # long reads: the chunked kernel relays the read axis with carried
        # boundary rows (one compile per hap bucket, any read length)
        use_chunked = (
            pallas_on
            and not use_pallas
            and _pp.pdhmm_chunked_fits(hap.shape[0])
        )
        if self.args.kernel_level == KernelLevel.PALLAS and not (
            use_pallas or use_chunked
        ):
            # forcing semantics mirror the reference's explicit AVX level:
            # an unsatisfiable request throws instead of silently degrading
            # (pdhmm-implementation.h:96-133)
            raise RuntimeError(
                "KernelLevel.PALLAS requested but the Pallas engine cannot"
                f" run this batch (dtype={dtype}, tpu="
                f"{utils.is_tpu_available()}, lanes={hap.shape[1]},"
                f" hap_bucket={hap.shape[0]}, read_bucket={read.shape[0]})"
            )
        with scope:
            if self.mesh is not None and dtype == "float32":
                from . import parallel
                from .batch import PackedPairs

                packed = PackedPairs(hap, read, q, iq, dq, gcp,
                                     haplen.astype(np.int32),
                                     rslen.astype(np.int32), hap.shape[1])
                with self.mesh:
                    mesh_lanes_ok = hap.shape[1] % (128 * self.mesh.size) == 0
                    if (use_pallas or use_chunked) and not mesh_lanes_ok:
                        # misaligned lanes drop the mesh path to the jnp
                        # scan: forced PALLAS keeps its raise-on-
                        # unsatisfiable contract, auto is loud like
                        # PairHMM's falloff diagnostic
                        if self.args.kernel_level == KernelLevel.PALLAS:
                            raise RuntimeError(
                                "KernelLevel.PALLAS requested but lanes "
                                f"({hap.shape[1]}) do not fill 128 * "
                                f"mesh.size ({128 * self.mesh.size})")
                        if utils.is_tpu_available():
                            from .api import _warn_pallas_falloff

                            _warn_pallas_falloff(
                                "pdhmm-mesh", lanes=hap.shape[1],
                                mesh_size=self.mesh.size)
                    if use_pallas and mesh_lanes_ok:
                        # mesh path keeps the Pallas fast path per shard
                        raw = np.asarray(
                            parallel.pdhmm_raw_pallas_sharded(
                                self.mesh, packed, hap_pd, states)
                        )
                    elif use_chunked and mesh_lanes_ok:
                        raw = np.asarray(
                            parallel.pdhmm_raw_pallas_chunked_sharded(
                                self.mesh, packed, hap_pd, states)
                        )
                    else:
                        raw = np.asarray(
                            parallel.pdhmm_raw_sharded(self.mesh, packed, hap_pd,
                                                       states, dtype="float32")
                        )
            elif use_pallas:
                raw = np.asarray(
                    _pp.pdhmm_raw_pallas(
                        hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen
                    )
                )
            elif use_chunked:
                raw = np.asarray(
                    _pp.pdhmm_raw_pallas_chunked(
                        hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen
                    )
                )
            else:
                raw = np.asarray(
                    pdhmm_ops.pdhmm_raw(
                        hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen,
                        dtype=dtype,
                    )
                )
        import gkl_tpu.context as ctx_mod

        ctx = ctx_mod.pdhmm_context(dtype)
        with np.errstate(divide="ignore", invalid="ignore"):
            if dtype == "float32":
                res = (np.log10(raw.astype(np.float32)) - ctx.INITIAL_CONDITION_LOG10).astype(np.float64)
            else:
                res = np.log10(raw) - ctx.INITIAL_CONDITION_LOG10
        return res, raw

    def _try_indexed(self, idxs, haps, hap_pds, reads, quals, lane_multiple):
        """Deduplicated device-expanded dispatch for one lane slice
        (docs/DESIGN.md 'Host link rules' applied to PDHMM): unique planes
        upload once, lanes expand on device.  None when the fast path does
        not apply — the caller packs dense."""
        import os

        from .ops import pdhmm_pallas as _pp

        if (self.mesh is not None
                or self.args.kernel_level == KernelLevel.SCALAR
                or not utils.is_tpu_available()
                or os.environ.get("GKL_TPU_PALLAS") == "0"):
            return None
        # identity dedup: the object path appends the SAME array objects
        # for every cross-product pair (pdhmm/JavaData.h:186-236)
        hmap: dict = {}
        rmap: dict = {}
        uh, uhpd, ur, urq = [], [], [], []
        hidx, ridx = [], []
        for i in idxs:
            hk = (id(haps[i]), id(hap_pds[i]))
            rk = (id(reads[i]),) + tuple(id(a) for a in quals[i])
            if hk not in hmap:
                hmap[hk] = len(uh)
                uh.append(haps[i])
                uhpd.append(hap_pds[i])
            if rk not in rmap:
                rmap[rk] = len(ur)
                ur.append(reads[i])
                urq.append(quals[i])
            hidx.append(hmap[hk])
            ridx.append(rmap[rk])
        n = len(idxs)
        if len(uh) + len(ur) > max(16, n // 2):
            return None  # no meaningful dedup — dense costs the same
        H = batch_mod.bucket_length(max(len(h) for h in uh))
        R = batch_mod.bucket_length(max(len(r) for r in ur))
        P = batch_mod.bucket_lanes(n, lane_multiple)
        # kernel lane-block contract: 128 on TPU (the hardware lane width),
        # 8 under CPU interpret (tests)
        if P % batch_mod.default_lane_multiple():
            return None
        if _pp.pdhmm_single_fits(H, R):
            kernel = "single"
        elif _pp.pdhmm_chunked_fits(H):
            kernel = "chunked"
        else:
            return None
        pk = batch_mod.pack_pdhmm_indexed(uh, uhpd, ur, urq, ridx, hidx,
                                          lane_multiple=lane_multiple)
        raw = np.asarray(_pdhmm_indexed_jit(_pdhmm_indexed_inner(kernel))(
            pk.hap_u, pk.happd_u, pk.states_u, pk.readq_u,
            pk.ridx, pk.hidx, pk.haplen, pk.rslen))
        import gkl_tpu.context as ctx_mod

        ctx = ctx_mod.pdhmm_context("float32")
        with np.errstate(divide="ignore", invalid="ignore"):
            res = (np.log10(raw.astype(np.float32))
                   - ctx.INITIAL_CONDITION_LOG10).astype(np.float64)
        return res[:n], raw[:n]

    def _compute_pairs(
        self,
        haps: Sequence[np.ndarray],
        hap_pds: Sequence[np.ndarray],
        reads: Sequence[np.ndarray],
        quals: Sequence[tuple],
        rescue: bool = True,
    ) -> np.ndarray:
        import time as _time

        from . import profiling

        t0 = _time.perf_counter() if profiling.metrics_enabled() else 0.0
        n = len(haps)
        out = np.zeros(n, np.float64)
        lane_multiple = self._lane_multiple or batch_mod.default_lane_multiple()

        # Non-TPU backends: the native batch oracle IS the engine — serial
        # f64 with gradual underflow (the reference's exact numeric
        # envelope, pdhmm-serial.cc) on a thread pool.  It outruns the jnp
        # scan engine ~10x on CPU and needs no rescue ladder at all.  The
        # jnp engine remains the no-native fallback and the TPU comparison
        # baseline; KernelLevel.SCALAR forces it explicitly.
        if (
            self.mesh is None
            and not utils.is_tpu_available()
            and self.args.kernel_level == KernelLevel.FASTEST_AVAILABLE
            and rescue
        ):
            from . import native_lib
            from .ops import pdhmm_ref

            if native_lib.load("gkl_pdhmm_oracle") is not None:
                out = pdhmm_ref.pdhmm_scalar_batch(
                    haps, hap_pds, reads, quals,
                    threads=self._effective_threads())
                if profiling.metrics_enabled():
                    cells = sum(len(r) * len(h) for r, h in zip(reads, haps))
                    profiling.METRICS.record(
                        "pdhmm", items=n, cells=cells,
                        seconds=_time.perf_counter() - t0,
                    )
                bad = ~np.isfinite(out) & ~np.isneginf(out) | (out > 0.0)
                if np.any(bad):
                    raise RuntimeError(
                        f"PDHMM produced invalid log10 probabilities at indices {np.nonzero(bad)[0][:10]}"
                    )
                return out

        # Lane planning for the Pallas fast/slow column split: primary key
        # clusters lanes by FIRST PD-event column (heterogeneous haps then
        # share slow columns per 128-lane block instead of poisoning every
        # block; event-free lanes form all-fast blocks), secondary keys
        # group identical haplotypes so cross-product batches align their
        # event columns exactly.  Results are written back through the
        # permutation.
        order = sorted(range(n), key=lambda i: (
            pdhmm_ops.lane_event_key(hap_pds[i]),
            haps[i].tobytes(), hap_pds[i].tobytes()))
        haps = [haps[i] for i in order]
        hap_pds = [hap_pds[i] for i in order]
        reads = [reads[i] for i in order]
        quals = [quals[i] for i in order]
        inv = np.empty(n, np.int64)
        inv[np.asarray(order)] = np.arange(n)
        # memory-budgeted lane slicing (pdhmm/JavaData.h:83-97): the device
        # working set per lane is ~ 8 carried doubles per read row plus the
        # packed inputs.
        max_r = batch_mod.bucket_length(max(len(r) for r in reads))
        max_h = batch_mod.bucket_length(max(len(h) for h in haps))
        bytes_per_lane = max_r * (6 * 8 + 5) + max_h * 3 + 64
        max_lanes = max(
            lane_multiple,
            int(self.args.max_memory_in_mb * 1024 * 1024 // max(1, bytes_per_lane)),
        )
        for start in range(0, n, max_lanes):
            idxs = list(range(start, min(n, start + max_lanes)))
            dtype = self._dtype
            ind = None
            if dtype == "float32":
                ind = self._try_indexed(idxs, haps, hap_pds, reads, quals,
                                        lane_multiple)
            if ind is not None:
                res, raw_n = ind
            else:
                packed = batch_mod.pack_pairs(
                    [haps[i] for i in idxs],
                    [reads[i] for i in idxs],
                    [quals[i] for i in idxs],
                    lane_multiple=lane_multiple,
                    qual_fill=40,
                )
                # pack PD bytes alongside (zero-padded, JavaData.h:225-227)
                H, P = packed.hap.shape
                hap_pd = np.zeros((H, P), np.uint8)
                for k, i in enumerate(idxs):
                    hap_pd[: len(hap_pds[i]), k] = hap_pds[i]

                res, raw = self._run_packed(
                    packed.hap, hap_pd, packed.read, packed.q, packed.iq,
                    packed.dq, packed.gcp, packed.haplen, packed.rslen, dtype,
                )
                res = res[: packed.n_real]
                raw_n = raw[: packed.n_real]
            # Underflow rescue (the reference's float->double recompute,
            # IntelPairHmm.cc:157-165 applied to PDHMM): every lane below
            # MIN_ACCEPTED reruns through the native batch oracle — exact
            # serial f64 WITH gradual underflow (the reference's own
            # numeric envelope; device/XLA backends flush subnormals), on a
            # thread pool.  One stage replaces the previous f64-jnp-pass +
            # per-lane-oracle ladder: the oracle is both more exact than
            # the reassociated f64 scans and fast enough to be the only
            # rescue engine.  (A scaled-f32 on-device rescue like PairHMM's
            # is architecturally unavailable here: the column sweep's state
            # tile simultaneously holds fresh ic-scale rows and fully
            # decayed rows, so intra-tile dynamic range exceeds any single
            # per-lane scale — docs/DESIGN.md.)
            if rescue:
                if dtype == "float32":
                    needs = raw_n < MIN_ACCEPTED
                else:
                    # double-only mode: lanes whose f64 scan underflowed to
                    # flush-zero or into the subnormal parity zone still
                    # need the gradual-underflow oracle
                    needs = (raw_n == 0.0) | (res < self._EXACT_FALLBACK_LOG10)
                if np.any(needs):
                    from . import native_lib
                    from .ops import pdhmm_ref

                    ks = np.nonzero(needs)[0]
                    ids = [idxs[k] for k in ks]
                    if (dtype == "float32"
                            and native_lib.load("gkl_pdhmm_oracle") is None):
                        # no native oracle on this host: bound the per-lane
                        # Python scalar fallback with a compact f64 jnp pass
                        # first (the pre-oracle rescue ladder) — routine f32
                        # underflow resolves there; only lanes that STILL
                        # flush to zero (or land in the subnormal parity
                        # zone) pay the scalar DP
                        sub = batch_mod.pack_pairs(
                            [haps[i] for i in ids], [reads[i] for i in ids],
                            [quals[i] for i in ids],
                            lane_multiple=lane_multiple, qual_fill=40)
                        Hs, Ps = sub.hap.shape
                        sub_pd = np.zeros((Hs, Ps), np.uint8)
                        for k2, i in enumerate(ids):
                            sub_pd[: len(hap_pds[i]), k2] = hap_pds[i]
                        res64, raw64 = self._run_packed(
                            sub.hap, sub_pd, sub.read, sub.q, sub.iq, sub.dq,
                            sub.gcp, sub.haplen, sub.rslen, "float64")
                        res[ks] = res64[: sub.n_real]
                        deep = ((raw64[: sub.n_real] == 0.0)
                                | (res64[: sub.n_real]
                                   < self._EXACT_FALLBACK_LOG10))
                        ks = ks[deep]
                        ids = [i for i, d in zip(ids, deep) if d]
                    if len(ids):
                        res[ks] = pdhmm_ref.pdhmm_scalar_batch(
                            [haps[i] for i in ids], [hap_pds[i] for i in ids],
                            [reads[i] for i in ids], [quals[i] for i in ids],
                            threads=self._effective_threads(),
                        )
            out[np.asarray(idxs)] = res

        if profiling.metrics_enabled():
            cells = sum(len(r) * len(h) for r, h in zip(reads, haps))
            profiling.METRICS.record(
                "pdhmm", items=n, cells=cells, seconds=_time.perf_counter() - t0
            )

        out = out[inv]  # undo the haplotype grouping
        # Validity checks (pdhmm-serial.cc:432-442): log10 prob must be <= 0.
        # Run in caller order so reported indices match the caller's pairs.
        bad = ~np.isfinite(out) & ~np.isneginf(out) | (out > 0.0)
        if np.any(bad):
            raise RuntimeError(
                f"PDHMM produced invalid log10 probabilities at indices {np.nonzero(bad)[0][:10]}"
            )
        return out

    # ------------------------------------------------------------------
    def compute_pdhmm(
        self,
        hap_bases,
        hap_pdbases,
        read_bases,
        read_qual,
        read_ins_qual,
        read_del_qual,
        gcp,
        hap_lengths,
        read_lengths,
        batch_size: int | None = None,
        max_hap_length: int | None = None,
        max_read_length: int | None = None,
    ) -> np.ndarray:
        """Flat-array path (IntelPDHMM.java:163-204).

        Accepts flat 1-D arrays of length batch*maxLen (Java layout) or 2-D
        (batch, maxLen) arrays.
        """
        hap_lengths = np.asarray(hap_lengths, np.int64)
        read_lengths = np.asarray(read_lengths, np.int64)
        t = batch_size if batch_size is not None else len(hap_lengths)
        if t <= 0:
            raise ValueError("batchSize must be positive")

        def to2d(x, maxlen, name):
            x = np.asarray(x)
            if x.ndim == 2:
                # 2-D inputs get the SAME contract checks as the flat
                # layout: batchSize rows and (when the caller's declared or
                # sibling-derived max length is known) exactly that width —
                # a narrower qual/PD plane would otherwise silently
                # truncate and produce wrong likelihoods
                if x.shape[0] != t:
                    raise ValueError(
                        f"{name} has {x.shape[0]} rows, expected batchSize = {t}")
                if maxlen is not None and x.shape[1] != maxlen:
                    raise ValueError(
                        f"{name} has width {x.shape[1]}, expected maxLength = {maxlen}")
                return x.astype(np.uint8)
            if maxlen is None:
                if x.size % t:
                    raise ValueError(f"{name} length {x.size} is not a multiple of batchSize {t}")
                maxlen = x.size // t
            if x.size != t * maxlen:
                raise ValueError(
                    f"{name} has {x.size} elements, expected batchSize*maxLength = {t * maxlen}"
                )
            return x.reshape(t, maxlen).astype(np.uint8)

        hap2 = to2d(hap_bases, max_hap_length, "hap_bases")
        pd2 = to2d(hap_pdbases, hap2.shape[1], "hap_pdbases")
        read2 = to2d(read_bases, max_read_length, "read_bases")
        q2 = to2d(read_qual, read2.shape[1], "read_qual")
        iq2 = to2d(read_ins_qual, read2.shape[1], "read_ins_qual")
        dq2 = to2d(read_del_qual, read2.shape[1], "read_del_qual")
        g2 = to2d(gcp, read2.shape[1], "gcp")
        if len(hap_lengths) != t or len(read_lengths) != t:
            raise ValueError("hap_lengths/read_lengths must have batchSize elements")
        if np.any(hap_lengths <= 0) or np.any(read_lengths <= 0):
            raise ValueError("sequence lengths must be positive")
        if np.any(hap_lengths > hap2.shape[1]) or np.any(read_lengths > read2.shape[1]):
            raise ValueError("per-pair length exceeds the padded max length")

        haps = [hap2[i, : hap_lengths[i]] for i in range(t)]
        pds = [pd2[i, : hap_lengths[i]] for i in range(t)]
        reads = [read2[i, : read_lengths[i]] for i in range(t)]
        quals = [
            (
                q2[i, : read_lengths[i]],
                iq2[i, : read_lengths[i]],
                dq2[i, : read_lengths[i]],
                g2[i, : read_lengths[i]],
            )
            for i in range(t)
        ]
        return self._compute_pairs(haps, pds, reads, quals)

    # ------------------------------------------------------------------
    def compute_likelihoods(
        self,
        reads: Sequence[ReadData],
        haplotypes: Sequence[PDHaplotypeData],
        likelihoods: np.ndarray | None = None,
    ) -> np.ndarray:
        """Object path: read-major cross product (pdhmm/JavaData.h:186-236)."""
        if not reads or not haplotypes:
            raise ValueError("Input arrays are empty.")
        haps, pds, rds, quals = [], [], [], []
        for rd in reads:
            for hp in haplotypes:
                haps.append(hp.haplotype_bases)
                pds.append(hp.haplotype_pdbases)
                rds.append(rd.read_bases)
                quals.append((rd.read_quals, rd.insertion_gop, rd.deletion_gop, rd.overall_gcp))
        out = self._compute_pairs(haps, pds, rds, quals)
        if likelihoods is not None:
            likelihoods[: len(out)] = out
            return likelihoods
        return out

"""Platform probes and runtime helpers — the IntelGKLUtils equivalent.

The reference probes CPUID for AVX/AVX2/AVX-512 and controls the FPU's
flush-to-zero mode (``utils/utils.cc:42-113``, ``common/avx.h:69-112``,
``IntelGKLUtils.java:81-107``).  The TPU-native equivalents:

* feature probe -> which JAX backends/devices are present and whether the
  accelerator natively supports float64 (TPUs do not; the double-precision
  paths run on the host CPU backend instead, mirroring how the reference
  falls back from AVX-512 to AVX).
* flush-to-zero -> TPUs always flush f32 subnormals; ``get_flush_to_zero``
  reports the effective semantics instead of toggling MXCSR.
* ``getAvailableOmpThreads`` -> device count / host CPU count.
"""

from __future__ import annotations

import functools
import os

import jax


def is_tpu_available() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def default_backend() -> str:
    return jax.default_backend()


@functools.lru_cache(maxsize=None)
def cpu_devices() -> tuple:
    """Host CPU devices (used for f64 fallback paths); always available."""
    try:
        return tuple(jax.devices("cpu"))
    except RuntimeError:
        return tuple(d for d in jax.devices() if d.platform == "cpu")


def supports_native_float64() -> bool:
    """Whether the default backend executes f64 at full range.

    TPU backends emulate or demote f64; values like 2^1020 overflow there.
    Overridable with GKL_TPU_F64_ON_DEVICE=1 for platforms that do support
    it.
    """
    if os.environ.get("GKL_TPU_F64_ON_DEVICE") == "1":
        return True
    return jax.default_backend() == "cpu"


def f64_scope():
    """Context manager placing computation on an f64-capable device."""
    if supports_native_float64():
        import contextlib

        return contextlib.nullcontext()
    cpus = cpu_devices()
    if not cpus:
        import contextlib

        return contextlib.nullcontext()
    return jax.default_device(cpus[0])


def x32_scope():
    """Trace-scope with x64 disabled.

    The library enables x64 globally for the f64 rescue paths, but x64 mode
    costs ~2.5x inside Pallas TPU kernels (i64 scalar plumbing); the f32
    fast paths trace under this scope.
    """
    import jax

    return jax.enable_x64(False)


def get_flush_to_zero() -> bool:
    """TPU VPU flushes f32 subnormals (the reference sets FTZ explicitly,
    IntelPairHmm.cc:93-96); reported for observability parity."""
    return is_tpu_available()


def set_flush_to_zero(value: bool) -> bool:
    """No-op on TPU (hardware is always-FTZ); returns the effective mode."""
    return get_flush_to_zero()


def available_parallelism() -> int:
    """Device-level parallelism (the OpenMP thread-count analogue)."""
    return jax.device_count()


def default_host_threads() -> int:
    """Worker count for the host-side native thread pools (codec, scalar
    SW, PDHMM oracle).  ``GKL_TPU_THREADS`` overrides; otherwise every
    core, capped at 16 (pool scaling flattens past that on these stages)."""
    env = os.environ.get("GKL_TPU_THREADS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return min(16, os.cpu_count() or 1)


def path_to_test_resource(filename: str, base_dir: str | None = None) -> str:
    """Resolve a test-resource path with filename sanitization.

    Mirrors ``IntelGKLUtils.pathToTestResource`` (IntelGKLUtils.java:64-79):
    the filename must be a plain name (letters, digits, ``.-_``), rejecting
    path separators / traversal.
    """
    import os
    import re

    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", filename):
        raise ValueError(f"unsafe test resource name: {filename!r}")
    if base_dir is None:
        base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tests", "data")
    return os.path.join(base_dir, filename)

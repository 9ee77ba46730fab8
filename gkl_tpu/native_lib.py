"""Native runtime loader — the NativeLibraryLoader equivalent.

The reference extracts ``libgkl_*.so`` from its jar and ``System.load``s it,
with a ``USE_LIBRARY_PATH`` env override and a name allowlist
(``NativeLibraryLoader.java:45,88-141``).  Here the C++ runtime pieces are
compiled on first use from the sources shipped in ``gkl_tpu/native/`` into a
per-user cache, with:

* ``GKL_TPU_LIBRARY_PATH`` — load prebuilt libraries from this directory
  instead of compiling (the USE_LIBRARY_PATH analogue),
* ``GKL_TPU_NATIVE=0`` — disable native code entirely (callers fall back to
  pure-Python implementations),
* an allowlist of known library names.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_ALLOWED = ("gkl_sw_runtime", "gkl_codec", "gkl_bam", "gkl_pdhmm_oracle",
            "gkl_pairhmm_oracle")

_SRC = {
    "gkl_sw_runtime": ["sw_runtime.cc"],
    "gkl_codec": ["codec.cc", "deflate_fast.cc", "inflate_fast.cc"],
    "gkl_bam": ["bam_scan.cc"],
    "gkl_pdhmm_oracle": ["pdhmm_oracle.cc"],
    "gkl_pairhmm_oracle": ["pairhmm_oracle.cc"],
}

_LINK = {
    "gkl_codec": ["-lz"],
    "gkl_sw_runtime": [],
    "gkl_bam": [],
    "gkl_pdhmm_oracle": [],
    "gkl_pairhmm_oracle": [],
}

_cache: dict[str, ctypes.CDLL | None] = {}
_lock = threading.Lock()


def native_enabled() -> bool:
    return os.environ.get("GKL_TPU_NATIVE", "1") != "0"


def _native_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "native")


def _march_tag() -> str:
    """Short host-microarchitecture digest for the build-cache key.

    -march=native binaries are only valid on hosts with the same ISA
    extensions; on NFS-shared home directories (common for TPU-pod
    frontends) a library built on a newer host would SIGILL on an older
    one.  Keying the cache directory on platform + cpuinfo flags makes
    each microarchitecture build its own copy."""
    import hashlib
    import platform

    bits = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def _build_dir() -> str:
    d = os.environ.get(
        "GKL_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gkl_tpu"),
    )
    d = os.path.join(d, _march_tag())
    os.makedirs(d, exist_ok=True)
    return d


def _needs_rebuild(so_path: str, sources: list[str]) -> bool:
    if not os.path.exists(so_path):
        return True
    so_mtime = os.path.getmtime(so_path)
    return any(os.path.getmtime(os.path.join(_native_dir(), s)) > so_mtime for s in sources)


def load(name: str) -> ctypes.CDLL | None:
    """Load (building if needed) a native runtime library by allowlisted name."""
    if name not in _ALLOWED:
        raise ValueError(f"unknown native library: {name!r}")
    if not native_enabled():
        return None
    with _lock:
        if name in _cache:
            return _cache[name]

        override = os.environ.get("GKL_TPU_LIBRARY_PATH")
        if override:
            path = os.path.join(override, f"lib{name}.so")
            lib = ctypes.CDLL(path) if os.path.exists(path) else None
            _cache[name] = lib
            return lib

        sources = _SRC[name]
        so_path = os.path.join(_build_dir(), f"lib{name}.so")
        try:
            if _needs_rebuild(so_path, sources):
                cmd = (
                    # -march=native is safe: the library compiles on the
                    # deployment host at first use (no prebuilt binaries)
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-o", so_path]
                    + [os.path.join(_native_dir(), s) for s in sources]
                    + _LINK[name]
                )
                subprocess.run(cmd, check=True, capture_output=True)
            lib = ctypes.CDLL(so_path)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"gkl_tpu: native build of {name} failed ({e}); using Python fallback", file=sys.stderr)
            lib = None
        _cache[name] = lib
        return lib

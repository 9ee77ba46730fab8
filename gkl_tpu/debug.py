"""Runtime validation / sanitizer analogue.

The reference's closest equivalents are ``-Xcheck:jni`` test flags and
hardening compile flags (SURVEY.md §5.2); the TPU-native counterparts:

* :func:`debug_context` — enables ``jax_debug_nans`` (aborts on NaN
  production inside jitted code) and optionally disables jit so Python-level
  tracebacks point at the defective op.
* :func:`check_batch` — host-side invariant checks on packed batches
  (shape/dtype/length consistency, qual ranges) used by the APIs when
  ``GKL_TPU_DEBUG=1``.
"""

from __future__ import annotations

import contextlib
import os

import numpy as np


def debug_enabled() -> bool:
    return os.environ.get("GKL_TPU_DEBUG") == "1"


@contextlib.contextmanager
def debug_context(disable_jit: bool = False):
    """NaN-checked (optionally unjitted) execution scope."""
    import jax

    ctx = [jax.debug_nans(True)]
    if disable_jit:
        ctx.append(jax.disable_jit())
    with contextlib.ExitStack() as stack:
        for c in ctx:
            stack.enter_context(c)
        yield


def check_batch(packed) -> None:
    """Invariant checks on a PackedPairs batch; raises AssertionError."""
    H, P = packed.hap.shape
    R = packed.read.shape[0]
    assert packed.q.shape == packed.iq.shape == packed.dq.shape == packed.gcp.shape == (R, P)
    assert packed.haplen.shape == packed.rslen.shape == (P,)
    assert packed.hap.dtype == np.uint8 and packed.read.dtype == np.uint8
    assert 0 < packed.n_real <= P
    assert np.all(packed.haplen >= 1) and np.all(packed.haplen <= H)
    assert np.all(packed.rslen >= 1) and np.all(packed.rslen <= R)

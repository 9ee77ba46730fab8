"""Scalar reference + native batch oracle for the PairHMM forward DP.

The reference recomputes ONLY the underflowed pair in double
(``pairhmm/IntelPairHmm.cc:157-165``) through its sequential double kernel
(``avx-pairhmm-template.h`` instantiated at double width).  This module is
that engine here: :func:`pairhmm_scalar` is the per-pair Python oracle
(tests pin the native DP against it bit-for-bit) and
:func:`pairhmm_scalar_batch` drives the threaded native oracle
(``native/pairhmm_oracle.cc``) over a compacted lane batch — exact f64 with
IEEE gradual underflow, which XLA backends flush.

All probability tables are computed HERE from the same context tables the
jnp engine gathers from (``ops/pairhmm.py``), so native and Python paths
share identical arithmetic inputs.
"""

from __future__ import annotations

import numpy as np

from .. import context as ctx_mod
from .. import utils as utils_mod


def _trans_rows(q, iq, dq, gcp, ctx) -> np.ndarray:
    """(R, 8) f64 per-row probabilities {p_mm, p_gapm, p_mx, p_xx, p_my,
    p_yy, distm_match, distm_mis} — the gathers of ops/pairhmm.py:114-133
    evaluated on host."""
    ph2pr = ctx.ph2pr
    m2m = ctx.match_to_match
    qm = np.asarray(q).astype(np.int32) & 127
    im = np.asarray(iq).astype(np.int32) & 127
    dm = np.asarray(dq).astype(np.int32) & 127
    cm = np.asarray(gcp).astype(np.int32) & 127
    max_q = np.maximum(im, dm)
    min_q = np.minimum(im, dm)
    out = np.empty((len(qm), 8), np.float64)
    out[:, 0] = m2m[((max_q * (max_q + 1)) >> 1) + min_q]
    out[:, 1] = 1.0 - ph2pr[cm]
    out[:, 2] = ph2pr[im]
    out[:, 3] = ph2pr[cm]
    out[:, 4] = ph2pr[dm]
    out[:, 5] = ph2pr[cm]
    distm = ph2pr[qm]
    out[:, 6] = 1.0 - distm
    out[:, 7] = distm / 3.0
    return out


def pairhmm_scalar(hap, read, q, iq, dq, gcp) -> float:
    """log10 likelihood for a single (hap, read) pair — sequential f64 DP in
    the exact evaluation order of the native oracle (rolling rows, columns
    ascending, result summed in column order)."""
    ctx = ctx_mod.pairhmm_context("float64")
    hap = np.asarray(hap, np.uint8)
    read = np.asarray(read, np.uint8)
    Hl, Rl = len(hap), len(read)
    trans = _trans_rows(q, iq, dq, gcp, ctx)
    init_y = np.float64(ctx.INITIAL_CONSTANT) / np.float64(Hl)

    n = ord("N")
    Mp = np.zeros(Hl + 1)
    Xp = np.zeros(Hl + 1)
    Yp = np.full(Hl + 1, init_y)
    Mc = np.zeros(Hl + 1)
    Xc = np.zeros(Hl + 1)
    Yc = np.zeros(Hl + 1)
    for r in range(1, Rl + 1):
        p_mm, p_gapm, p_mx, p_xx, p_my, p_yy, dmatch, dmis = trans[r - 1]
        x = int(read[r - 1])
        Mc[0] = Xc[0] = Yc[0] = 0.0
        for j in range(1, Hl + 1):
            y = int(hap[j - 1])
            match = x == y or x == n or y == n
            prior = dmatch if match else dmis
            Mc[j] = prior * (p_mm * Mp[j - 1] + p_gapm * (Xp[j - 1] + Yp[j - 1]))
            Xc[j] = p_mx * Mp[j] + p_xx * Xp[j]
            Yc[j] = p_my * Mc[j - 1] + p_yy * Yc[j - 1]
        Mp, Mc = Mc, Mp
        Xp, Xc = Xc, Xp
        Yp, Yc = Yc, Yp

    total = 0.0
    for j in range(1, Hl + 1):
        total += Mp[j] + Xp[j]
    with np.errstate(divide="ignore"):
        return float(np.log10(total) - ctx.LOG10_INITIAL_CONSTANT)


def pairhmm_scalar_batch(haps, reads, quals, threads=None):
    """Batch oracle: native thread-pool f64 DP (gradual underflow preserved),
    per-lane Python fallback.  ``quals`` is a sequence of (q, iq, dq, gcp)
    per pair; returns log10 likelihoods (float64 array)."""
    from .. import native_lib

    lib = native_lib.load("gkl_pairhmm_oracle")
    n = len(haps)
    if lib is None:
        return np.array([
            pairhmm_scalar(haps[k], reads[k], *quals[k]) for k in range(n)
        ])

    import ctypes

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    if not hasattr(lib, "_pairhmm_ready"):
        lib.gkl_pairhmm_oracle_batch.restype = None
        lib.gkl_pairhmm_oracle_batch.argtypes = [
            u8p, i64p, i32p, u8p, i64p, i32p, f64p, f64p,
            ctypes.c_int, f64p, ctypes.c_int,
        ]
        lib._pairhmm_ready = True

    ctx = ctx_mod.pairhmm_context("float64")
    hap_len = np.array([len(h) for h in haps], np.int32)
    read_len = np.array([len(r) for r in reads], np.int32)
    hap_off = np.zeros(n, np.int64)
    read_off = np.zeros(n, np.int64)
    np.cumsum(hap_len[:-1], out=hap_off[1:])
    np.cumsum(read_len[:-1], out=read_off[1:])
    hap_buf = np.concatenate([np.ascontiguousarray(h, np.uint8) for h in haps])
    read_buf = np.concatenate([np.ascontiguousarray(r, np.uint8) for r in reads])
    trans = np.empty((int(read_len.sum()), 8), np.float64)
    for k in range(n):
        o, L = int(read_off[k]), int(read_len[k])
        trans[o : o + L] = _trans_rows(*quals[k], ctx)
    init_y = np.float64(ctx.INITIAL_CONSTANT) / hap_len.astype(np.float64)

    out_raw = np.zeros(n, np.float64)
    lib.gkl_pairhmm_oracle_batch(
        hap_buf.ctypes.data_as(u8p), hap_off.ctypes.data_as(i64p),
        hap_len.ctypes.data_as(i32p), read_buf.ctypes.data_as(u8p),
        read_off.ctypes.data_as(i64p), read_len.ctypes.data_as(i32p),
        np.ascontiguousarray(trans).ctypes.data_as(f64p),
        init_y.ctypes.data_as(f64p), ctypes.c_int(n),
        out_raw.ctypes.data_as(f64p),
        ctypes.c_int(threads or utils_mod.default_host_threads()),
    )
    with np.errstate(divide="ignore"):
        return np.log10(out_raw) - float(ctx.LOG10_INITIAL_CONSTANT)

"""PairHMM forward-likelihood kernel, lane-batched for TPU.

Semantics match the reference AVX kernel
(``src/main/native/pairhmm/avx-pairhmm-template.h:208-223,334-371`` and
``Context.h``): for read row ``r`` (1-based) and haplotype column ``c``::

    M[r][c] = prior[r][c] * (pMM[r]*M[r-1][c-1] + pGAPM[r]*(X[r-1][c-1] + Y[r-1][c-1]))
    X[r][c] = pMX[r]*M[r-1][c] + pXX[r]*X[r-1][c]
    Y[r][c] = pMY[r]*M[r][c-1] + pYY[r]*Y[r][c-1]

with ``Y[0][c] = INITIAL_CONSTANT / haplen``, everything else on row 0 and
column 0 zero, ``prior = match ? 1-ph2pr[q] : ph2pr[q]/3`` and the transition
probabilities gathered from quality scores
(``avx-pairhmm-template.h:106-152``).  The result is
``sum_c M[rslen][c] + X[rslen][c]``.

TPU mapping — instead of the reference's anti-diagonal SIMD wavefront we
vectorise across *pairs* (lanes) and across *columns*:

* ``M`` and ``X`` rows depend only on the previous row → elementwise VPU ops
  on ``(H, P)`` tiles.
* The intra-row ``Y`` recurrence is a first-order affine recurrence, solved
  with ``jax.lax.associative_scan`` along the column axis (log2(H) steps).

The whole matrix therefore needs only ``R`` sequential steps instead of the
reference's ``R*H/AVX_LENGTH``, and every step is a wide elementwise op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import context as ctx_mod

_N_CHAR = np.uint8(ord("N"))


def _mant_exp(a):
    """``(m, e)`` with ``a == m * 2^e`` and ``m`` in [1, 2), for positive
    normal ``a`` — bitwise frexp.  ``jnp.frexp``/``jnp.ldexp`` route through
    ``pow()`` and produce wrong values at extreme exponents under XLA
    fusion; exponent-field bit math is exact and fusion-proof."""
    if a.dtype == jnp.float64:
        ib, sh, bias, mask = jnp.int64, 52, 1023, 0x7FF
    else:
        ib, sh, bias, mask = jnp.int32, 23, 127, 0xFF
    bits = jax.lax.bitcast_convert_type(a, ib)
    e = ((bits >> sh) & mask) - bias
    m = a * jax.lax.bitcast_convert_type((bias - e) << sh, a.dtype)
    return m, e.astype(jnp.int32)


def _pow2_mul(x, e):
    """``x * 2^e`` for ``e <= 0`` (i32) far below the normal-exponent range:
    two exact power-of-two factors cover ``e >= -2*(bias-1)``; smaller
    coefficients are zeroed (their scan contributions are provably below
    any representable result of interest)."""
    if x.dtype == jnp.float64:
        ib, sh, bias = jnp.int64, 52, 1023
    else:
        ib, sh, bias = jnp.int32, 23, 127
    eh = e >> 1
    el = e - eh

    def pow2(v):
        return jax.lax.bitcast_convert_type(
            jnp.clip(v + bias, 1, 2 * bias).astype(ib) << sh, x.dtype)

    return jnp.where(e < -(2 * (bias - 1)), x.dtype.type(0), (x * pow2(eh)) * pow2(el))


def _affine_combine(left, right):
    """Compose affine maps y -> a*y + b (left applied first).

    The coefficient rides as a (mantissa, exponent) pair: composed
    coefficients are products over column spans and underflow f32 long
    before their contributions become immaterial (16 columns of Q40 gap
    quals is already 10^-64); exponent-split power-of-two factors apply
    them at full range, exactly, so in-range results are bit-identical."""
    m_l, e_l, b_l = left
    m_r, e_r, b_r = right
    m, d = _mant_exp(m_l * m_r)  # product in [1, 4) -> d in {0, 1}
    return m, e_l + e_r + d, _pow2_mul(m_r * b_l, e_r) + b_r


@functools.partial(jax.jit, static_argnames=("dtype",))
def pairhmm_raw(hap, read, q, iq, dq, gcp, haplen, rslen, *, dtype: str = "float32"):
    """Forward probability (pre-log, scaled by INITIAL_CONSTANT) per lane.

    Args:
      hap:    (H, P) uint8 haplotype bases (ASCII), padded arbitrarily.
      read:   (R, P) uint8 read bases (ASCII).
      q/iq/dq/gcp: (R, P) uint8 base/insertion/deletion/GCP quals (raw bytes;
        masked ``& 127`` on device like ``avx-pairhmm-template.h:134-150``).
      haplen: (P,) int32 per-lane haplotype length.
      rslen:  (P,) int32 per-lane read length.
      dtype:  "float32" or "float64".

    Returns:
      (P,) raw forward probability in ``dtype``.
    """
    ctx = ctx_mod.pairhmm_context(dtype)
    f = jnp.dtype(dtype)
    H, P = hap.shape
    R = read.shape[0]

    ph2pr = jnp.asarray(ctx.ph2pr, f)
    m2m = jnp.asarray(ctx.match_to_match, f)

    qm = (q & 127).astype(jnp.int32)
    im = (iq & 127).astype(jnp.int32)
    dm = (dq & 127).astype(jnp.int32)
    cm = (gcp & 127).astype(jnp.int32)

    # Per-row transition probabilities (avx-pairhmm-template.h:132-151).
    max_q = jnp.maximum(im, dm)
    min_q = jnp.minimum(im, dm)
    p_mm = m2m[((max_q * (max_q + 1)) >> 1) + min_q]
    p_gapm = f.type(1.0) - ph2pr[cm]
    p_mx = ph2pr[im]
    p_xx = ph2pr[cm]
    p_my = ph2pr[dm]
    p_yy = ph2pr[cm]

    # Per-row priors: distm (match) and distm/3 (mismatch)
    # (avx-pairhmm-template.h:180-183).
    distm = ph2pr[qm]
    distm_match = f.type(1.0) - distm
    distm_mis = distm / f.type(3.0)

    init_y = jnp.asarray(ctx.INITIAL_CONSTANT, f) / haplen.astype(f)

    hap_is_n = hap == _N_CHAR

    zero_row = jnp.zeros((1, P), f)

    def shift_down(arr, first_row):
        return jnp.concatenate([first_row, arr[:-1]], axis=0)

    col_valid = (jnp.arange(1, H + 1, dtype=jnp.int32)[:, None] <= haplen[None, :]).astype(f)

    def row_step(carry, xs):
        m_prev, x_prev, y_prev, acc = carry
        rc, dmatch, dmis, pmm, pgapm, pmx, pxx, pmy, pyy, row_idx = xs

        match = (hap == rc[None, :]) | hap_is_n | (rc == _N_CHAR)[None, :]
        prior = jnp.where(match, dmatch[None, :], dmis[None, :])

        m_sh = shift_down(m_prev, zero_row)
        x_sh = shift_down(x_prev, zero_row)
        # Y[r-1][0] is init_y on row 0 and 0 afterwards.
        y0 = jnp.where(row_idx == 1, init_y, f.type(0.0))[None, :]
        y_sh = shift_down(y_prev, y0)

        m_new = prior * (pmm[None, :] * m_sh + pgapm[None, :] * (x_sh + y_sh))
        x_new = pmx[None, :] * m_prev + pxx[None, :] * x_prev

        # Y via affine associative scan along columns:
        #   Y[c] = pYY*Y[c-1] + pMY*M[c-1],  Y[0] = 0.
        b = pmy[None, :] * shift_down(m_new, zero_row)
        am, ae = _mant_exp(jnp.broadcast_to(pyy[None, :], (H, P)))
        _, _, y_new = jax.lax.associative_scan(_affine_combine, (am, ae, b), axis=0)

        row_sum = jnp.sum((m_new + x_new) * col_valid, axis=0)
        acc = acc + jnp.where(row_idx == rslen, row_sum, f.type(0.0))
        return (m_new, x_new, y_new, acc), None

    m0 = jnp.zeros((H, P), f)
    x0 = jnp.zeros((H, P), f)
    y0 = jnp.broadcast_to(init_y[None, :], (H, P)).astype(f)
    acc0 = jnp.zeros((P,), f)

    xs = (
        read.astype(jnp.uint8),
        distm_match,
        distm_mis,
        p_mm,
        p_gapm,
        p_mx,
        p_xx,
        p_my,
        p_yy,
        jnp.arange(1, R + 1, dtype=jnp.int32),
    )
    (_, _, _, acc), _ = jax.lax.scan(row_step, (m0, x0, y0, acc0), xs)
    return acc


def pairhmm_log10_from_raw_f32(raw_f32: np.ndarray) -> np.ndarray:
    """Float path postprocess: ``(double)(log10f(p) - LOG10_INITIAL_CONSTANT)``.

    Reference: ``pairhmm/IntelPairHmm.cc:163-166``.
    """
    ctx = ctx_mod.pairhmm_context("float32")
    raw = np.asarray(raw_f32, np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        res = np.log10(raw).astype(np.float32) - ctx.LOG10_INITIAL_CONSTANT
    return res.astype(np.float64)


def pairhmm_log10_from_raw_f64(raw_f64: np.ndarray) -> np.ndarray:
    """Double path postprocess (``IntelPairHmm.cc:159-162``)."""
    ctx = ctx_mod.pairhmm_context("float64")
    raw = np.asarray(raw_f64, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.log10(raw) - ctx.LOG10_INITIAL_CONSTANT

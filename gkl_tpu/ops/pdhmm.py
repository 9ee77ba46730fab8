"""PDHMM (partially-determined-haplotype HMM), lane-batched for TPU.

Semantics follow the reference serial kernel
(``src/main/native/pdhmm/pdhmm-serial.cc:279-412``); see ``pdhmm_ref.py``
for the scalar oracle.  The reference vectorises across testcases with a
row-major cell loop (``pdhmm/pdhmm.h:468-852``).  The TPU mapping here is
different: we scan over *haplotype columns* with all read rows and all
pairs vectorised, exploiting two structural facts:

1. The NORMAL/INSIDE_DEL/AFTER_DEL jump-state machine depends only on the
   haplotype PD bytes, i.e. it is *column-indexed and row-invariant*
   (pdhmm-serial.cc:370-385).  Its per-column predicates are precomputed.
2. Processing column-by-column, every left/diag dependency (M, D, and the
   three branch matrices) lives in the carried previous column ->
   elementwise VPU ops over (rows, lanes).  The only within-column
   recurrence is the insertion matrix I[r] which composes maps of the form
   ``x -> max(c, a*x + b)`` — closed under composition (all quantities are
   nonnegative), hence solvable with ``jax.lax.associative_scan`` over the
   row axis in log2(R) steps.

This turns the reference's R*H sequential cells into H sequential column
steps of (R, P)-wide vector ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import context as ctx_mod
from .pairhmm import _mant_exp, _pow2_mul

SNP = 1
DEL_START = 2
DEL_END = 4

_N_CODE = 78

# read byte -> base class (A=0, C=1, G=2, T=3, other=4), case-folded, for the
# PD SNP-matching bits A=8, C=16, G=32, T=64 (pdhmm/MathUtils.h:66-76).
_BASE_CLASS = np.full(256, 4, np.int32)
for _c, _k in ((65, 0), (97, 0), (67, 1), (99, 1), (71, 2), (103, 2), (84, 3), (116, 3)):
    _BASE_CLASS[_c] = _k

_ST_NORMAL, _ST_INSIDE, _ST_AFTER = 0, 1, 2


def column_states(hap_pd: np.ndarray) -> np.ndarray:
    """Per-column jump state (uint8), from PD flag bytes.

    ``hap_pd`` is (H, P) uint8; returns (H, P) with the state *when
    processing column j+1* (0-based index j), following the update order in
    pdhmm-serial.cc:370-385: AFTER_DEL resets to NORMAL, DEL_START enters
    INSIDE_DEL, DEL_END (overriding) enters AFTER_DEL.
    """
    H, P = hap_pd.shape
    out = np.zeros((H, P), np.uint8)
    state = np.zeros(P, np.uint8)
    for j in range(H):
        out[j] = state
        pd = hap_pd[j]
        nxt = np.where(state == _ST_AFTER, _ST_NORMAL, state).astype(np.uint8)
        nxt = np.where(pd & DEL_START, _ST_INSIDE, nxt).astype(np.uint8)
        nxt = np.where(pd & DEL_END, _ST_AFTER, nxt).astype(np.uint8)
        state = nxt
    return out


def lane_event_key(hap_pd: np.ndarray) -> int:
    """Batch-planner sort key for one lane's PD bytes: the first eventful
    column (or a sentinel past any column when event-free).

    The Pallas kernel's slow flag is per (128-lane block, column) — one
    lane's PD event drags its whole block through the branch machinery for
    that column.  Ordering lanes by first event position clusters lanes
    whose events hit nearby columns into the same blocks (and event-free
    lanes into all-fast blocks), so heterogeneous flat batches keep the
    grouped-batch throughput instead of halving (the planner-level
    equivalent of the reference's per-lane masks, pdhmm.h:384-466)."""
    nz = np.flatnonzero(hap_pd)
    return int(nz[0]) if nz.size else 1 << 30


def _maxaffine_combine(left, right):
    """Compose x -> max(c, a*x + b) maps (left applied first, all args >= 0).

    The ``a`` coefficient rides as a (mantissa, exponent) pair: composed
    coefficients are products over row spans and underflow f32 while their
    contributions can still dominate (see pairhmm._affine_combine);
    exponent-split power-of-two factors apply them at full range,
    bit-identically in range."""
    c1, m1, e1, b1 = left
    c2, m2, e2, b2 = right
    m, d = _mant_exp(m1 * m2)  # product in [1, 4) -> d in {0, 1}
    return (
        jnp.maximum(c2, _pow2_mul(m2 * c1, e2) + b2),
        m,
        e1 + e2 + d,
        _pow2_mul(m2 * b1, e2) + b2,
    )


@functools.partial(jax.jit, static_argnames=("dtype", "boost_log2"))
def pdhmm_raw(
    hap,
    hap_pd,
    states,
    read,
    q,
    iq,
    dq,
    gcp,
    haplen,
    rslen,
    boost_row=None,
    boost_log2: float = 0.0,
    *,
    dtype: str = "float64",
):
    """Forward probability (pre-log, scaled by INITIAL_CONDITION) per lane.

    Args:
      hap:     (H, P) uint8 haplotype bases.
      hap_pd:  (H, P) uint8 PD flag bytes.
      states:  (H, P) uint8 per-column jump states from :func:`column_states`.
      read:    (R, P) uint8 read bases.
      q/iq/dq/gcp: (R, P) uint8 quals (PDHMM uses the full 0..254 range).
      haplen/rslen: (P,) int32 true lengths.
      boost_row/boost_log2: optional per-lane dynamic-range rescue.  XLA
        flushes subnormals (the reference instead relies on f64 gradual
        underflow for very long reads), so underflowed lanes are recomputed
        with the row->row transition at ``boost_row`` premultiplied by
        ``2**boost_log2`` — an exact power-of-two rescale of all rows below
        it; the caller subtracts ``boost_log2*log10(2)`` from the result.
    """
    ctx = ctx_mod.pdhmm_context(dtype)
    f = jnp.dtype(dtype)
    H, P = hap.shape
    R = read.shape[0]

    q2e = jnp.asarray(ctx.qual_to_error_prob, f)
    m2m = jnp.asarray(ctx.match_to_match, f)

    def qidx(x):
        return jnp.minimum(x.astype(jnp.int32), ctx_mod.MAX_QUAL)

    im = qidx(iq)
    dm = qidx(dq)
    cm = qidx(gcp)
    qm = qidx(q)

    # transitions per row (pdhmm-serial.cc:181-226)
    max_q = jnp.maximum(im, dm)
    min_q = jnp.minimum(im, dm)
    t_mm = m2m[((max_q * (max_q + 1)) >> 1) + min_q]  # (R, P)
    t_mi = q2e[im]
    t_md = q2e[dm]
    t_im = f.type(1.0) - q2e[cm]
    t_dd = q2e[cm]
    t_ii = t_dd  # same value; t_ii feeds row->row and may get boosted

    if boost_row is not None:
        row_ids = jnp.arange(1, R + 1, dtype=jnp.int32)[:, None]
        boostf = jnp.where(
            row_ids == boost_row[None, :].astype(jnp.int32),
            f.type(2.0) ** f.type(boost_log2),
            f.type(1.0),
        )
        # every transition that carries row r-1 into row r gets the boost
        t_mm = t_mm * boostf
        t_im = t_im * boostf
        t_mi = t_mi * boostf
        t_ii = t_ii * boostf

    err = q2e[qm]
    p_match = f.type(1.0) - err  # (R, P)
    p_mis = err / f.type(3.0)

    read_i = read.astype(jnp.int32)
    read_cls = jnp.asarray(_BASE_CLASS)[read_i]  # (R, P)
    read_is_n = read_i == _N_CODE

    ic = jnp.asarray(ctx.INITIAL_CONDITION, f) / haplen.astype(f)

    # previous-row views are row-shifted; rows are 1..R at index 0..R-1
    def shift_rows(arr, first):
        return jnp.concatenate([first, arr[:-1]], axis=0)

    row_idx = jnp.arange(1, R + 1, dtype=jnp.int32)[:, None]  # (R, 1)
    row_is_last = (row_idx == rslen[None, :]).astype(f)  # (R, P)

    col_idx = jnp.arange(1, H + 1, dtype=jnp.int32)

    def col_step(carry, xs):
        # carry: previous column (rows 1..R plus implied row-0 boundary)
        m_l, i_l, d_l, bm_l, bi_l, bd_l, d0_l, acc = carry
        # d0_l: previous column's row-0 D value (ic on col 0..H of row 0)
        hap_b, pd_b, st_b, jcol = xs  # (P,) each
        st_n = (st_b == _ST_NORMAL)[None, :]
        st_i = (st_b == _ST_INSIDE)[None, :]
        st_a = (st_b == _ST_AFTER)[None, :]
        del_end = (pd_b & DEL_END).astype(jnp.bool_)[None, :]

        # prior for this column, all rows (pdhmm-serial.cc:254-277)
        y = hap_b.astype(jnp.int32)[None, :]
        pd_match = ((pd_b & SNP) != 0)[None, :] & (
            ((pd_b.astype(jnp.int32)[None, :] >> (3 + read_cls)) & 1) != 0
        ) & (read_cls < 4)
        match = (read_i == y) | read_is_n | (y == _N_CODE) | pd_match
        prior = jnp.where(match, p_match, p_mis)  # (R, P)

        # branch matrices for this column (elementwise from previous column)
        bm = jnp.where(st_n, m_l, jnp.where(st_i, bm_l, jnp.maximum(bm_l, m_l)))
        bd = jnp.where(st_n, d_l, jnp.where(st_i, bd_l, jnp.maximum(bd_l, d_l)))
        bi = jnp.where(st_n, i_l, jnp.where(st_i, bi_l, jnp.maximum(bi_l, i_l)))

        # diagonal values: previous column shifted down one row; row-0
        # boundary is 0 for everything except D (ic on row 0).
        zrow = jnp.zeros((1, P), f)
        m_dg = shift_rows(m_l, zrow)
        i_dg = shift_rows(i_l, zrow)
        d_dg = shift_rows(d_l, d0_l[None, :])
        bm_dg = shift_rows(bm_l, zrow)
        bi_dg = shift_rows(bi_l, zrow)
        bd_dg = shift_rows(bd_l, zrow)

        m_dg_e = jnp.where(st_a, jnp.maximum(m_dg, bm_dg), m_dg)
        i_dg_e = jnp.where(st_a, jnp.maximum(i_dg, bi_dg), i_dg)
        d_dg_e = jnp.where(st_a, jnp.maximum(d_dg, bd_dg), d_dg)

        m = prior * (m_dg_e * t_mm + i_dg_e * t_im + d_dg_e * t_im)

        # deletion: left values, AFTER_DEL max-merges with branch
        m_left_e = jnp.where(st_a, jnp.maximum(m_l, bm_l), m_l)
        d_left_e = jnp.where(st_a, jnp.maximum(d_l, bd_l), d_l)
        d = m_left_e * t_md + d_left_e * t_dd

        # insertion: within-column recurrence over rows,
        #   I[r] = t_mi[r]*top_m + t_ii[r]*(del_end ? max(BI[r-1], I[r-1]) : I[r-1])
        # with top_m = del_end ? max(BM[r-1], M[r-1]) : M[r-1]; composed as
        # max-affine maps x -> max(c, a*x + b).
        m_top = shift_rows(m, zrow)
        bm_top = shift_rows(bm, zrow)
        bi_top = shift_rows(bi, zrow)
        b_aff = t_mi * jnp.where(del_end, jnp.maximum(bm_top, m_top), m_top)
        a_aff = t_ii
        c_aff = jnp.where(del_end, b_aff + t_ii * bi_top, f.type(0.0))
        am, ae = _mant_exp(a_aff)
        cc, _, _, bb = jax.lax.associative_scan(
            _maxaffine_combine, (c_aff, am, ae, b_aff), axis=0
        )
        ins = jnp.maximum(cc, bb)  # applied to I[0] = 0

        valid = (jcol <= haplen).astype(f)[None, :]
        acc = acc + jnp.sum((m + ins) * row_is_last * valid, axis=0)

        # row 0 of D is ic at every column, so the next column's row-0
        # boundary stays ic.
        return (m, ins, d, bm, bi, bd, ic, acc), None

    zeros = jnp.zeros((R, P), f)
    carry0 = (zeros, zeros, zeros, zeros, zeros, zeros, ic, jnp.zeros((P,), f))
    xs = (hap, hap_pd, states, col_idx)
    (_, _, _, _, _, _, _, acc), _ = jax.lax.scan(col_step, carry0, xs)
    return acc

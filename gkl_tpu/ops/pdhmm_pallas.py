"""PDHMM forward kernel in Pallas: VMEM-resident column-scan DP (float32).

Same recurrence as ``ops/pdhmm.py`` (semantics from the reference serial
kernel, ``src/main/native/pdhmm/pdhmm-serial.cc:279-412``), but the six DP
matrices live in VMEM scratch across a ``fori_loop`` over haplotype columns
instead of being rematerialised in HBM between ``lax.scan`` steps:

* grid over lane blocks; each program owns six (R, LANE_BLOCK) state tiles
  (match / insertion / deletion and their branch variants);
* the NORMAL / INSIDE_DEL / AFTER_DEL jump-state machine is row-invariant
  (column-indexed, pdhmm-serial.cc:370-385), so its per-column predicates are
  (1, LANE_BLOCK) scalars-per-lane and all branch merges fuse into
  elementwise selects;
* diagonal dependencies are sublane ``pltpu.roll``s of the *merged*
  previous-column values (the AFTER_DEL max-merge commutes with the row
  shift because the state is row-invariant), 3 rolls per column instead
  of 6;
* the within-column insertion recurrence ``I[r] = t_mi*top + t_ii*I[r-1]``
  (with DEL_END max-merges) is the max-affine map composition solved by a
  Hillis-Steele scan over rows — identical math to the
  ``jax.lax.associative_scan`` in ``ops/pdhmm.py``, log2(R) levels in VMEM;
* **fast/slow column split**: a column whose PD bytes are zero and whose
  jump state is NORMAL for *every* lane in the block (the common case —
  PD deletion events are sparse) skips the branch-matrix selects entirely
  and runs a plain affine insertion scan (no max-merges).  Branch matrices
  are neither read nor written on fast columns; every read of them happens
  on slow columns, where the last slow-column write is still the correct
  value (NORMAL lanes recompute from the carried M/I/D, INSIDE lanes hold,
  AFTER lanes merge).  Per-column flags are precomputed on host and read
  from SMEM.

Scaling: float32 uses INITIAL_CONDITION = 2^120 (like the reference's float
PairHMM context) instead of the double kernel's 2^1020; lanes that underflow
``MIN_ACCEPTED`` are recomputed by the caller in float64 (the reference's
float->double rescue pattern, pairhmm/IntelPairHmm.cc:157-165).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import context as ctx_mod
from .pairhmm_pallas import _renorm_mant, _split_coeff
from .pdhmm import DEL_END, SNP, _N_CODE

LANE_BLOCK = 128

# read byte -> PD SNP-match bit {A:8, C:16, G:32, T:64}, case-folded; bases
# outside ACGT get 0 so the (pd & bit) test is false (pdhmm/MathUtils.h:66-76).
_READ_BIT_PAIRS = ((65, 8), (97, 8), (67, 16), (99, 16), (71, 32), (103, 32), (84, 64), (116, 64))

_ST_NORMAL, _ST_INSIDE, _ST_AFTER = 0, 1, 2



_LN10 = float(np.log(10.0))


def _q2e_arith(qual_i32):
    """``10^(-q/10)`` in f32 (<= 2 ulp of the f64-built table; the one-hot
    lookup's materialised (R*P, 255) one-hots are HBM-bound and cost more
    than the DP kernel)."""
    f32 = jnp.float32
    return jnp.exp2(qual_i32.astype(f32) * f32(-_LN10 / np.log(2.0) / 10.0))


@functools.lru_cache(maxsize=1)
def _jac_hi_lo_2d() -> np.ndarray:
    """The 256 reachable f64 Jacobian entries (index = 1000*delta) as a
    (16, 32) grid: row = delta>>4, columns interleave the f32 (hi, lo)
    split of delta&15, so two 16-wide one-hot contractions reconstruct the
    f64 value to ~1e-15 (a flat 255-wide one-hot costs ~4x the HBM
    traffic)."""
    jt = ctx_mod.jacobian_log_table("float64")
    idx = np.minimum(np.arange(256) * 1000, len(jt) - 1)
    vals = jt[idx]
    hi = vals.astype(np.float32)
    lo = (vals - hi.astype(np.float64)).astype(np.float32)
    out = np.empty((16, 32), np.float32)
    out[:, 0::2] = hi.reshape(16, 16)
    out[:, 1::2] = lo.reshape(16, 16)
    return out


def _m2m_pdhmm_arith(im, dm):
    """matchToMatchProb (pdhmm-common.h:175-184) without f64 transcendental
    chains: with PDHMM's *exact* 1/ln(10), ``10^(log1p(-p)/ln10)`` is
    identically ``1 - p``, so the value is ``-expm1(ls * ln10)`` with
    ``ls = -0.1*mn + jac`` — one emulated-f64 transcendental.  The Jacobian
    entry depends only on ``mx - mn`` and is reconstructed in f64 from a
    two-level hi/lo-split one-hot lookup."""
    f32 = jnp.float32
    f64 = jnp.float64
    mx = jnp.maximum(im, dm)
    mn = jnp.minimum(im, dm)
    delta = mx - mn
    tab = jnp.asarray(_jac_hi_lo_2d(), f32)  # (16, 32)
    dflat = delta.reshape(-1, 1)
    r16 = jnp.arange(16, dtype=jnp.int32)[None, :]
    oh_hi = ((dflat >> 4) == r16).astype(f32)  # (RP, 16)
    rows = jax.lax.dot_general(
        oh_hi, tab, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (RP, 32)
    oh_lo = ((dflat & 15) == r16).astype(f32)
    hi = jnp.sum(rows[:, 0::2] * oh_lo, axis=1)
    lo = jnp.sum(rows[:, 1::2] * oh_lo, axis=1)
    jac = (hi.astype(f64) + lo.astype(f64)).reshape(delta.shape)
    # replicate the table's f64 operand construction exactly (the >= 8.0
    # branch can flip either way at delta == 80 depending on mn's rounding)
    small = f64(-0.1) * mx.astype(f64)
    big = f64(-0.1) * mn.astype(f64)
    diff = big - small
    ls = jnp.where(diff >= f64(8.0), big, big + jac)
    # 1 - 10^ls via exact range reduction u = m*ln2 + v (|v| <= ln2/2): the
    # cancellation zone (p -> 1) is entirely m == 0, where the f32 expm1
    # polynomial is relatively accurate; m != 0 has 1-p >= 0.29.  The f64
    # part is 3 cheap mul/adds — no emulated-f64 transcendental (~0.2 ms).
    u = ls * f64(_LN10)
    m = jnp.round(u * f64(1.4426950408889634))
    mi = m.astype(jnp.int32)
    v = (u - m * f64(np.log(2.0))).astype(f32)
    poly = f32(1.0) + v * (f32(1 / 2) + v * (f32(1 / 6) + v * (f32(1 / 24)
           + v * (f32(1 / 120) + v * (f32(1 / 720) + v * f32(1 / 5040))))))
    em1 = v * poly
    pow2 = jax.lax.bitcast_convert_type(
        jnp.clip(mi + 127, 1, 254) << 23, jnp.float32)
    one_minus_p = jnp.where(mi == 0, -em1, f32(1.0) - pow2 * (f32(1.0) + em1))
    return jnp.clip(one_minus_p, f32(0.0), f32(1.0))



def _ins_ladder_levels(t_dd, row_iota, R):
    """(span, q, p2) coefficient levels for the Hillis-Steele insertion
    scans, shared by the single-pass and chunked kernels (ONE definition so
    the engines cannot silently diverge).  Span products ride as exact
    (mantissa, exponent) factor pairs applied as two f32 multiplies — raw
    span products underflow f32 while their contributions can still
    dominate (see pairhmm_pallas._split_coeff).  Span 1 cannot underflow
    (t_ii >= 2^-85 at MAX_QUAL 254), so its exact single-factor form skips
    the extra in-loop multiply; span-2 products already can (2^-169)."""
    f32 = jnp.float32
    levels = []
    am, ae = _renorm_mant(t_dd)  # t_ii == t_dd
    span = 1
    while span < R:
        if span == 1:
            levels.append((span, t_dd, None))
        else:
            levels.append((span,) + _split_coeff(am, ae))
        m2 = am * jnp.where(row_iota >= span,
                            pltpu.roll(am, jnp.int32(span), 0), f32(1.0))
        e2 = ae + jnp.where(row_iota >= span,
                            pltpu.roll(ae, jnp.int32(span), 0), jnp.int32(0))
        am, d = _renorm_mant(m2)
        ae = e2 + d
        span <<= 1
    return levels


def _affine_scan(b, a_levels, row_iota):
    """Plain affine insertion scan: b[r] += a_span * b[r - span] per level."""
    f32 = jnp.float32
    for k, q_k, p2_k in a_levels:
        b_sh = jnp.where(row_iota >= k, pltpu.roll(b, jnp.int32(k), 0), f32(0.0))
        t = q_k * b_sh
        if p2_k is not None:
            t = t * p2_k
        b = t + b
    return b


def _max_affine_scan(b, c, a_levels, row_iota):
    """Dual max-affine ladder composing x -> max(c, a*x + b) maps (the
    DEL_END insertion recurrence); returns the composed (b, c)."""
    f32 = jnp.float32
    for k, q_k, p2_k in a_levels:
        in_range = row_iota >= k
        c_sh = jnp.where(in_range, pltpu.roll(c, jnp.int32(k), 0), f32(0.0))
        b_sh = jnp.where(in_range, pltpu.roll(b, jnp.int32(k), 0), f32(0.0))
        tc = q_k * c_sh
        tb = q_k * b_sh
        if p2_k is not None:
            tc = tc * p2_k
            tb = tb * p2_k
        c = jnp.maximum(c, tc + b)
        b = tb + b
    return b, c


def _kernel(flags_ref, hap_ref, pd_ref, st_ref, read_ref, rbit_ref, tmm_ref,
            tmi_ref, tmd_ref, tim_ref, tdd_ref, pmatch_ref, pmis_ref, ic_ref,
            haplen_ref, rslen_ref, out_ref,
            m_ref, i_ref, d_ref, bm_ref, bi_ref, bd_ref):
    R, LP = m_ref.shape
    H = hap_ref.shape[0]
    f32 = jnp.float32

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LP), 0)
    read_i = read_ref[:]
    rbit = rbit_ref[:]
    read_is_n = read_i == _N_CODE
    p_match = pmatch_ref[:]
    p_mis = pmis_ref[:]
    t_mm = tmm_ref[:]
    t_mi = tmi_ref[:]
    t_md = tmd_ref[:]
    t_im = tim_ref[:]
    t_dd = tdd_ref[:]
    ic = ic_ref[:]  # (1, LP)
    haplen = haplen_ref[:]
    # mask selecting each lane's last real read row (result accumulation row)
    last_row = jnp.where((row_iota + 1) == rslen_ref[:], f32(1.0), f32(0.0))

    zero = jnp.zeros((R, LP), f32)
    m_ref[:] = zero
    i_ref[:] = zero
    d_ref[:] = zero
    bm_ref[:] = zero
    bi_ref[:] = zero
    bd_ref[:] = zero
    out_ref[:] = jnp.zeros((1, LP), f32)

    def shift1(v, first):
        # i32 shift operand (i64 is rejected by tpu.dynamic_rotate)
        return jnp.where(row_iota == 0, first, pltpu.roll(v, jnp.int32(1), 0))

    zrow = jnp.zeros((1, LP), f32)

    # Hillis-Steele ``a`` products are column-invariant (t_ii depends only on
    # row quals), so the per-level accumulated products are hoisted out of
    # the column loop: level l applies the product of a over the 2^l-row
    # span (range-extension details: _ins_ladder_levels).
    a_levels = _ins_ladder_levels(t_dd, row_iota, R)

    block = pl.program_id(0)

    def body(j, carry):
        hap_b = hap_ref[pl.ds(j, 1), :]  # (1, LP) i32
        flag = flags_ref[block, j]

        # base prior: sequence match / N wildcards (common to both paths)
        match_basic = (read_i == hap_b) | read_is_n | (hap_b == _N_CODE)

        m_l = m_ref[:]
        i_l = i_ref[:]
        d_l = d_ref[:]

        @pl.when(flag == 0)
        def _fast():
            # every lane NORMAL, no PD bytes: plain PDHMM column, branch
            # matrices untouched (not read again until the next slow column
            # rewrites them)
            prior = jnp.where(match_basic, p_match, p_mis)
            m_dg = shift1(m_l, zrow)
            i_dg = shift1(i_l, zrow)
            d_dg = shift1(d_l, ic)
            m = prior * (m_dg * t_mm + (i_dg + d_dg) * t_im)
            d = m_l * t_md + d_l * t_dd
            # affine insertion scan (no max-merges): b[r] += a_span * b[r-2^k]
            b = _affine_scan(t_mi * shift1(m, zrow), a_levels, row_iota)
            m_ref[:] = m
            i_ref[:] = b
            d_ref[:] = d

        def eventful_column(has_del_end):
            pd_b = pd_ref[pl.ds(j, 1), :]
            st_b = st_ref[pl.ds(j, 1), :]
            st_n = st_b == _ST_NORMAL
            st_i = st_b == _ST_INSIDE
            st_a = st_b == _ST_AFTER

            # prior with PD SNP-match bits (pdhmm-serial.cc:254-277)
            pd_match = ((pd_b & SNP) != 0) & ((pd_b & rbit) != 0)
            prior = jnp.where(match_basic | pd_match, p_match, p_mis)

            bm_l = bm_ref[:]
            bi_l = bi_ref[:]
            bd_l = bd_ref[:]

            # branch matrices for this column (pdhmm-serial.cc:331-368)
            bm = jnp.where(st_n, m_l, jnp.where(st_i, bm_l, jnp.maximum(bm_l, m_l)))
            bi = jnp.where(st_n, i_l, jnp.where(st_i, bi_l, jnp.maximum(bi_l, i_l)))
            bd = jnp.where(st_n, d_l, jnp.where(st_i, bd_l, jnp.maximum(bd_l, d_l)))

            # AFTER_DEL max-merged left values; the state is row-invariant,
            # so the merge commutes with the diagonal row shift.
            m_left_e = jnp.where(st_a, jnp.maximum(m_l, bm_l), m_l)
            i_left_e = jnp.where(st_a, jnp.maximum(i_l, bi_l), i_l)
            d_left_e = jnp.where(st_a, jnp.maximum(d_l, bd_l), d_l)

            m_dg = shift1(m_left_e, zrow)
            i_dg = shift1(i_left_e, zrow)
            d_dg = shift1(d_left_e, ic)  # row 0 of D is ic at every column

            m = prior * (m_dg * t_mm + (i_dg + d_dg) * t_im)
            d = m_left_e * t_md + d_left_e * t_dd

            if not has_del_end:
                # tier 1: PD/state-eventful column with NO DEL_END anywhere
                # in the block — branch bookkeeping + PD priors, but the
                # insertion recurrence stays the PLAIN affine scan (the
                # dual max-affine ladder below is the expensive half of the
                # slow path and only DEL_END columns need it).  Scattered
                # per-lane events are mostly tier-1 columns.
                ins = _affine_scan(t_mi * shift1(m, zrow), a_levels,
                                   row_iota)
            else:
                del_end = (pd_b & DEL_END) != 0
                # insertion: I[r] = t_mi[r]*top_m + t_ii[r]*(del_end ?
                # max(BI[r-1], I[r-1]) : I[r-1]) composed as max-affine maps
                # x -> max(c, a*x + b) (identity (0, 1, 0) valid on the
                # nonnegative domain).
                m_eff = jnp.where(del_end, jnp.maximum(bm, m), m)
                b = t_mi * shift1(m_eff, zrow)
                c = jnp.where(del_end, b + t_dd * shift1(bi, zrow), zero)
                b, c = _max_affine_scan(b, c, a_levels, row_iota)
                ins = jnp.maximum(c, b)  # applied to I[0] = 0

            m_ref[:] = m
            i_ref[:] = ins
            d_ref[:] = d
            bm_ref[:] = bm
            bi_ref[:] = bi
            bd_ref[:] = bd

        @pl.when(flag == 1)
        def _mid():
            eventful_column(False)

        @pl.when(flag >= 2)
        def _slow():
            eventful_column(True)

        valid = jnp.where((j + 1) <= haplen, f32(1.0), f32(0.0))  # (1, LP)
        col_sum = jnp.sum((m_ref[:] + i_ref[:]) * last_row, axis=0, keepdims=True)
        out_ref[:] += col_sum * valid
        return carry

    # 8-column unrolled chunks pipeline measurably better than single-column
    # iterations (H buckets are multiples of 8)
    if H % 8 == 0:
        def chunk(c, carry):
            for k in range(8):
                body(c * 8 + jnp.int32(k), carry)
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(H // 8), chunk, jnp.int32(0))
    else:
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(H), body, jnp.int32(0))



def _host_prep(hap, hap_pd, states, read, q, iq, dq, gcp, haplen, lane_block):
    """Host-side prep shared by the single-pass and chunked drivers (ONE
    definition so the engines cannot silently diverge): per-row transition
    and prior rows (pdhmm-serial.cc:181-226, computed via closed forms —
    one-hot/table lookups are HBM- or scalar-core-bound and cost more than
    the whole DP kernel), PD SNP-match bits, the initial condition row,
    i32 casts, and the per-(block, column) tier flags:
      0 — no PD byte / non-NORMAL state in the block (plain column);
      1 — eventful but NO DEL_END (branch bookkeeping, plain ins scan);
      2 — DEL_END present (full dual max-affine ladder).
    (AFTER_DEL merge columns have pd == 0, hence the state term.)"""
    ctx = ctx_mod.pdhmm_context("float32")
    f = jnp.float32
    H, P = hap.shape
    assert P % lane_block == 0, (P, lane_block)

    def qidx(x):
        return jnp.minimum(x.astype(jnp.int32), ctx_mod.MAX_QUAL)

    im = qidx(iq)
    dm = qidx(dq)
    cm = qidx(gcp)
    qm = qidx(q)
    t_mm = _m2m_pdhmm_arith(im, dm)
    t_mi = _q2e_arith(im)
    t_md = _q2e_arith(dm)
    q2e_cm = _q2e_arith(cm)
    t_im = f(1.0) - q2e_cm
    t_dd = q2e_cm
    err = _q2e_arith(qm)
    p_match = f(1.0) - err
    p_mis = err / f(3.0)

    read_i = read.astype(jnp.int32)
    # PD SNP-match bit per read base, via comparisons (no table gather)
    rbit = jnp.zeros_like(read_i)
    for _c, _b in _READ_BIT_PAIRS:
        rbit = jnp.where(read_i == _c, _b, rbit)
    ic = (jnp.asarray(ctx.INITIAL_CONDITION, f) / haplen.astype(f))[None, :]
    hap_i = hap.astype(jnp.int32)
    pd_i = hap_pd.astype(jnp.int32)
    st_i = states.astype(jnp.int32)
    haplen2 = haplen.astype(jnp.int32)[None, :]

    nblocks = P // lane_block
    eventful = (pd_i != 0) | (st_i != 0)  # (H, P) bool
    has_de = (pd_i & DEL_END) != 0
    f1 = eventful.reshape(H, nblocks, lane_block).any(axis=2)
    f2 = has_de.reshape(H, nblocks, lane_block).any(axis=2)
    flags = (f1.astype(jnp.int32) + f2.astype(jnp.int32)).T  # (nblocks, H)
    return (flags, hap_i, pd_i, st_i, read_i, rbit, t_mm, t_mi, t_md, t_im,
            t_dd, p_match, p_mis, ic, haplen2)


@functools.partial(jax.jit, static_argnames=("lane_block", "interpret"))
def pdhmm_raw_pallas(hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen,
                     *, lane_block: int = LANE_BLOCK, interpret: bool = False):
    """float32 PDHMM forward probability per lane (TPU Pallas path).

    Same contract as ``pdhmm.pdhmm_raw(..., dtype='float32')`` without the
    boost arguments (underflow rescue is the caller's float64 pass); lanes
    must be a multiple of ``lane_block``.
    """
    H, P = hap.shape
    R = read.shape[0]
    (flags, hap_i, pd_i, st_i, read_i, rbit, t_mm, t_mi, t_md, t_im, t_dd,
     p_match, p_mis, ic, haplen2) = _host_prep(
        hap, hap_pd, states, read, q, iq, dq, gcp, haplen, lane_block)
    rslen2 = rslen.astype(jnp.int32)[None, :]

    grid = (P // lane_block,)

    def lane_spec(length):
        return pl.BlockSpec(
            (length, lane_block),
            lambda i, flags: (jnp.int32(0), i),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        lane_spec(H),  # hap
        lane_spec(H),  # pd
        lane_spec(H),  # states
        lane_spec(R),  # read
        lane_spec(R),  # rbit
        lane_spec(R),  # t_mm
        lane_spec(R),  # t_mi
        lane_spec(R),  # t_md
        lane_spec(R),  # t_im
        lane_spec(R),  # t_dd
        lane_spec(R),  # p_match
        lane_spec(R),  # p_mis
        lane_spec(1),  # ic
        lane_spec(1),  # haplen
        lane_spec(1),  # rslen
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=lane_spec(1),
        scratch_shapes=[pltpu.VMEM((R, lane_block), jnp.float32)] * 6,
    )
    # x64 trace mode costs ~2.5x inside the Mosaic kernel (i64 scalar
    # plumbing); the kernel is all-i32/f32, so trace it with x64 off.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=int(60 * H * R) * P,
                bytes_accessed=int((3 * H + 9 * R) * 4) * P,
                transcendentals=0,
            ),
            interpret=interpret,
        )(flags, hap_i, pd_i, st_i, read_i, rbit, t_mm, t_mi, t_md, t_im, t_dd,
          p_match, p_mis, ic, haplen2, rslen2)
    return out[0]


def _chunk_kernel(flags_ref, hap_ref, pd_ref, st_ref, read_ref, rbit_ref,
                  tmm_ref, tmi_ref, tmd_ref, tim_ref, tdd_ref, pmatch_ref,
                  pmis_ref, ic_ref, haplen_ref, rslen_ref, first_ref,
                  bm_in, bi_in, bd_in, bbm_in, bbi_in, bbd_in,
                  out_ref, bm_out, bi_out, bd_out, bbm_out, bbi_out, bbd_out,
                  m_ref, i_ref, d_ref, brm_ref, bri_ref, brd_ref):
    """Read-axis-chunked PDHMM column sweep.

    Same DP as ``_kernel`` for a band of read rows [r0, r0+Rc), resuming
    from the previous chunk's last-row values per column (the ``*_in``
    boundary tiles: M/I/D and branch BM/BI/BD at row r0-1 for every
    column) and emitting this chunk's last row as ``*_out``.  ``first``
    marks chunk 0, whose virtual boundary row is the DP initial row
    (M=I=branches=0, D=ic).  Result sums accumulate into ``out`` only for
    lanes whose (chunk-local) result row lands in this chunk.
    """
    R, LP = m_ref.shape
    H = hap_ref.shape[0]
    f32 = jnp.float32

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LP), 0)
    read_i = read_ref[:]
    rbit = rbit_ref[:]
    read_is_n = read_i == _N_CODE
    p_match = pmatch_ref[:]
    p_mis = pmis_ref[:]
    t_mm = tmm_ref[:]
    t_mi = tmi_ref[:]
    t_md = tmd_ref[:]
    t_im = tim_ref[:]
    t_dd = tdd_ref[:]
    t_dd0 = t_dd[0:1]  # chunk row 0's insertion-continuation coefficient
    ic = ic_ref[:]
    haplen = haplen_ref[:]
    is_first = first_ref[:] != 0  # (1, LP)
    last_row = jnp.where((row_iota + 1) == rslen_ref[:], f32(1.0), f32(0.0))

    zero = jnp.zeros((R, LP), f32)
    zrow = jnp.zeros((1, LP), f32)
    m_ref[:] = zero
    i_ref[:] = zero
    d_ref[:] = zero
    brm_ref[:] = zero
    bri_ref[:] = zero
    brd_ref[:] = zero
    out_ref[:] = jnp.zeros((1, LP), f32)

    def shift1(v, first):
        return jnp.where(row_iota == 0, first, pltpu.roll(v, jnp.int32(1), 0))

    a_levels = _ins_ladder_levels(t_dd, row_iota, R)

    block = pl.program_id(0)

    def body(j, carry):
        # carry: previous column's boundary tops (diag deps for row 0)
        ptm, pti, ptd, ptbm, ptbi, ptbd = carry
        hap_b = hap_ref[pl.ds(j, 1), :]
        flag = flags_ref[block, j]
        # this column's boundary tops (same-column top deps)
        tm = bm_in[pl.ds(j, 1), :]
        ti = bi_in[pl.ds(j, 1), :]
        td = bd_in[pl.ds(j, 1), :]
        tbm = bbm_in[pl.ds(j, 1), :]
        tbi = bbi_in[pl.ds(j, 1), :]
        tbd = bbd_in[pl.ds(j, 1), :]

        match_basic = (read_i == hap_b) | read_is_n | (hap_b == _N_CODE)

        m_l = m_ref[:]
        i_l = i_ref[:]
        d_l = d_ref[:]

        @pl.when(flag == 0)
        def _fast():
            prior = jnp.where(match_basic, p_match, p_mis)
            m_dg = shift1(m_l, ptm)
            i_dg = shift1(i_l, pti)
            d_dg = shift1(d_l, ptd)
            m = prior * (m_dg * t_mm + (i_dg + d_dg) * t_im)
            d = m_l * t_md + d_l * t_dd
            # affine insertion scan; the chunk's top I folds into row 0's
            # inhomogeneous term: b[0] = t_mi*M_top + t_ii*I_top
            b = _affine_scan(
                t_mi * shift1(m, tm)
                + jnp.where(row_iota == 0, t_dd0 * ti, f32(0.0)),
                a_levels, row_iota)
            m_ref[:] = m
            i_ref[:] = b
            d_ref[:] = d

        def eventful_column(has_del_end):
            pd_b = pd_ref[pl.ds(j, 1), :]
            st_b = st_ref[pl.ds(j, 1), :]
            st_n = st_b == _ST_NORMAL
            st_i = st_b == _ST_INSIDE
            st_a = st_b == _ST_AFTER

            pd_match = ((pd_b & SNP) != 0) & ((pd_b & rbit) != 0)
            prior = jnp.where(match_basic | pd_match, p_match, p_mis)

            bm_l = brm_ref[:]
            bi_l = bri_ref[:]
            bd_l = brd_ref[:]

            bm = jnp.where(st_n, m_l, jnp.where(st_i, bm_l, jnp.maximum(bm_l, m_l)))
            bi = jnp.where(st_n, i_l, jnp.where(st_i, bi_l, jnp.maximum(bi_l, i_l)))
            bd = jnp.where(st_n, d_l, jnp.where(st_i, bd_l, jnp.maximum(bd_l, d_l)))

            m_left_e = jnp.where(st_a, jnp.maximum(m_l, bm_l), m_l)
            i_left_e = jnp.where(st_a, jnp.maximum(i_l, bi_l), i_l)
            d_left_e = jnp.where(st_a, jnp.maximum(d_l, bd_l), d_l)
            # row-0 diag values: the same AFTER_DEL merge applied to the
            # previous column's boundary tops
            ptm_e = jnp.where(st_a, jnp.maximum(ptm, ptbm), ptm)
            pti_e = jnp.where(st_a, jnp.maximum(pti, ptbi), pti)
            ptd_e = jnp.where(st_a, jnp.maximum(ptd, ptbd), ptd)

            m_dg = shift1(m_left_e, ptm_e)
            i_dg = shift1(i_left_e, pti_e)
            d_dg = shift1(d_left_e, ptd_e)

            m = prior * (m_dg * t_mm + (i_dg + d_dg) * t_im)
            d = m_left_e * t_md + d_left_e * t_dd

            if not has_del_end:
                # tier 1 (see _kernel): no DEL_END in the block at this
                # column — plain affine insertion scan
                ins = _affine_scan(
                    t_mi * shift1(m, tm)
                    + jnp.where(row_iota == 0, t_dd0 * ti, f32(0.0)),
                    a_levels, row_iota)
            else:
                del_end = (pd_b & DEL_END) != 0
                m_eff = jnp.where(del_end, jnp.maximum(bm, m), m)
                m_eff_top = jnp.where(del_end, jnp.maximum(tbm, tm), tm)
                b_base = t_mi * shift1(m_eff, m_eff_top)
                b = b_base + jnp.where(row_iota == 0, t_dd0 * ti, f32(0.0))
                c = jnp.where(del_end, b_base + t_dd * shift1(bi, tbi), zero)
                b, c = _max_affine_scan(b, c, a_levels, row_iota)
                ins = jnp.maximum(c, b)

            m_ref[:] = m
            i_ref[:] = ins
            d_ref[:] = d
            brm_ref[:] = bm
            bri_ref[:] = bi
            brd_ref[:] = bd
            bbm_out[pl.ds(j, 1), :] = bm[R - 1 : R]
            bbi_out[pl.ds(j, 1), :] = bi[R - 1 : R]
            bbd_out[pl.ds(j, 1), :] = bd[R - 1 : R]

        @pl.when(flag == 1)
        def _mid():
            eventful_column(False)

        @pl.when(flag >= 2)
        def _slow():
            eventful_column(True)

        # boundary out: this chunk's last row (branch tiles only change on
        # slow columns, and fast columns are never read back — the flags
        # are column properties, identical for every chunk)
        bm_out[pl.ds(j, 1), :] = m_ref[R - 1 : R]
        bi_out[pl.ds(j, 1), :] = i_ref[R - 1 : R]
        bd_out[pl.ds(j, 1), :] = d_ref[R - 1 : R]

        valid = jnp.where((j + 1) <= haplen, f32(1.0), f32(0.0))
        col_sum = jnp.sum((m_ref[:] + i_ref[:]) * last_row, axis=0, keepdims=True)
        out_ref[:] += col_sum * valid
        return (tm, ti, td, tbm, tbi, tbd)

    # DP column 0: zero except D = ic on the virtual initial row (chunk 0)
    d0 = jnp.where(is_first, ic, zrow)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(H), body,
                      (zrow, zrow, d0, zrow, zrow, zrow))


# Measured VMEM model for the chunked kernel on v5e (16 MB scoped limit):
# 15 f32 lane tiles scale with the read chunk (9 row inputs + 6 state) and
# 15 with the haplotype bucket (3 hap + 12 boundary planes), and Mosaic
# multi-buffers them ~2.9x — (Rc=512, H=224) measured at 16.13 MB, i.e.
# ~174 B per (row-or-column) x lane.  Budget 15 MB with that coefficient.
PDHMM_R_CHUNK = 512


def pdhmm_single_fits(H: int, R: int, lane_block: int = LANE_BLOCK) -> bool:
    """VMEM model for the single-pass kernel: 15 read-row tiles (9 inputs +
    6 state) and 3 hap tiles at ~3.5x Mosaic buffering against the 16 MB
    limit.  Measured on v5e at H=224: R=512 compiles, R=768 OOMs (20.8 MB)
    — the previous flat R<=1024 gate was never exercised on hardware."""
    return (15 * R + 3 * H) * lane_block <= 8400 * 128


def _chunk_rc(H: int, lane_block: int = LANE_BLOCK) -> int:
    """Largest POWER-OF-TWO read-chunk length the VMEM model admits for
    this hap bucket (non-pow2 sublane counts cost Mosaic extra roll
    temporaries — Rc=448 measured LARGER than Rc=512)."""
    total = (15 << 20) // (174 * lane_block)  # rows + columns allowance
    rc = PDHMM_R_CHUNK
    while rc >= 128 and rc + H > total:
        rc //= 2
    return rc if rc >= 128 else 0


def pdhmm_chunked_fits(H: int, lane_block: int = LANE_BLOCK) -> bool:
    return _chunk_rc(H, lane_block) >= 128


@functools.partial(jax.jit, static_argnames=("lane_block", "interpret"))
def _pdhmm_chunk_call(flags, hap_i, pd_i, st_i, read_c, rbit_c, tmm, tmi, tmd,
                      tim, tdd, pmatch, pmis, ic, haplen2, rslen_local, first,
                      bnd, *, lane_block: int, interpret: bool):
    """One read-chunk: returns (partial out (1,P), boundary out [6 x (H,P)])."""
    H, P = hap_i.shape
    R = read_c.shape[0]

    def lane_spec(length):
        return pl.BlockSpec(
            (length, lane_block),
            lambda i, flags: (jnp.int32(0), i),
            memory_space=pltpu.VMEM,
        )

    in_specs = (
        [lane_spec(H)] * 3
        + [lane_spec(R)] * 9
        + [lane_spec(1)] * 4
        + [lane_spec(H)] * 6
    )
    out_specs = [lane_spec(1)] + [lane_spec(H)] * 6
    out_shapes = [jax.ShapeDtypeStruct((1, P), jnp.float32)] + [
        jax.ShapeDtypeStruct((H, P), jnp.float32)
    ] * 6

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // lane_block,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((R, lane_block), jnp.float32)] * 6,
    )

    with jax.enable_x64(False):
        res = pl.pallas_call(
            _chunk_kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
        )(flags, hap_i, pd_i, st_i, read_c, rbit_c, tmm, tmi, tmd, tim, tdd,
          pmatch, pmis, ic, haplen2, rslen_local, first, *bnd)
    return res[0], list(res[1:7])


def chunked_prep(hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen,
                 *, r_chunk: int | None, lane_block: int):
    """Host-side prep shared by the single-process chunked driver and the
    multi-host ``pdhmm_chunked_global``: transition/prior rows, PD flags,
    read-axis padding, initial boundary planes.  Pure per-lane work — on a
    pod every process preps its OWN lane slab."""
    H, P = hap.shape
    R = read.shape[0]
    if r_chunk is None:
        r_chunk = _chunk_rc(H, lane_block)
    assert r_chunk > 0, (H, lane_block)
    (flags, hap_i, pd_i, st_i, read_i, rbit, t_mm, t_mi, t_md, t_im, t_dd,
     p_match, p_mis, ic, haplen2) = _host_prep(
        hap, hap_pd, states, read, q, iq, dq, gcp, haplen, lane_block)
    rslen_i = rslen.astype(jnp.int32)

    n_chunks = -(-R // r_chunk)
    R_pad = n_chunks * r_chunk
    if R_pad != R:
        padr = ((0, R_pad - R), (0, 0))
        read_i = jnp.pad(read_i, padr)
        rbit = jnp.pad(rbit, padr)
        # benign pad transitions (any finite value works: padded rows never
        # reach a lane's result row and only feed rows past it)
        t_mm = jnp.pad(t_mm, padr, constant_values=0.5)
        t_mi = jnp.pad(t_mi, padr, constant_values=0.1)
        t_md = jnp.pad(t_md, padr, constant_values=0.1)
        t_im = jnp.pad(t_im, padr, constant_values=0.9)
        t_dd = jnp.pad(t_dd, padr, constant_values=0.1)
        p_match = jnp.pad(p_match, padr, constant_values=0.9)
        p_mis = jnp.pad(p_mis, padr, constant_values=0.03)

    zerof = jnp.zeros((H, P), jnp.float32)
    ic_plane = jnp.broadcast_to(ic, (H, P))
    bnd0 = [zerof, zerof, ic_plane, zerof, zerof, zerof]
    rows = (read_i, rbit, t_mm, t_mi, t_md, t_im, t_dd, p_match, p_mis)
    return (flags, hap_i, pd_i, st_i, rows, ic, haplen2, rslen_i, bnd0,
            n_chunks, r_chunk)


def pdhmm_raw_pallas_chunked(hap, hap_pd, states, read, q, iq, dq, gcp,
                             haplen, rslen, *, r_chunk: int | None = None,
                             lane_block: int = LANE_BLOCK,
                             interpret: bool = False, _chunk_call=None):
    """PDHMM forward for reads beyond the single-kernel VMEM ceiling.

    The read axis relays in ``r_chunk``-row chunks: each chunk's kernel
    resumes from the previous chunk's last-row values per column (6
    boundary planes in HBM), the compile-once analogue of the reference
    kernel handling any read length in one pass (pdhmm.h:1133-1290).
    Same contract as ``pdhmm_raw_pallas``.  ``r_chunk`` defaults to the
    largest VMEM-admissible chunk for this hap bucket (_chunk_rc).
    """
    H, P = hap.shape
    (flags, hap_i, pd_i, st_i, rows, ic, haplen2, rslen_i, bnd, n_chunks,
     r_chunk) = chunked_prep(hap, hap_pd, states, read, q, iq, dq, gcp,
                             haplen, rslen, r_chunk=r_chunk,
                             lane_block=lane_block)
    out = jnp.zeros((1, P), jnp.float32)
    for c in range(n_chunks):
        r0 = c * r_chunk
        sl = slice(r0, r0 + r_chunk)
        first = jnp.full((1, P), 1 if c == 0 else 0, jnp.int32)
        rslen_local = (rslen_i - r0)[None, :]
        call = _chunk_call or _pdhmm_chunk_call
        part, bnd = call(
            flags, hap_i, pd_i, st_i, *[a[sl] for a in rows],
            ic, haplen2, rslen_local, first, bnd,
            lane_block=lane_block, interpret=interpret,
        )
        out = out + part
    return out[0]

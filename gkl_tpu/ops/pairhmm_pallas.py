"""PairHMM forward kernel in Pallas: VMEM-resident DP state.

The pure-jnp row scan (ops/pairhmm.py) is algorithmically right for TPU but
XLA materialises every shifted array in HBM between scan steps (concat
breaks fusion), measuring ~1.4 Gcells/s on v5e.  This kernel keeps the
M/X/Y rows in VMEM scratch across a ``fori_loop`` over read rows and does
the column shifts as cheap sublane rolls:

* grid over lane blocks; each program owns (H, LANE_BLOCK) state tiles;
* per row: one fused elementwise pass for the M/X updates (the three
  shifted previous-row terms are pre-combined so only one roll is needed);
* the intra-row Y recurrence runs as a Hillis-Steele affine scan with
  ``pltpu.roll`` (log2 H levels), entirely in VMEM;
* per-lane results accumulate into the output row when the lane's read
  length is reached.

Numerics are identical to ops/pairhmm.py up to float reassociation within
the same formulas (golden tolerance 1e-5 holds for both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import context as ctx_mod

_N_CODE = 78
# 128 measured fastest on v5e (vs 256/512: better cross-program pipelining,
# lower VMEM pressure)
LANE_BLOCK = 128


def _renorm_mant(m):
    """``(m2, e)`` with ``m == m2 * 2^e`` and ``m2`` in [1, 2), for positive
    normal ``m`` (the power-of-two multiply is exact)."""
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    return m * jax.lax.bitcast_convert_type((127 - e) << 23, jnp.float32), e


def _split_coeff(m, e):
    """Split a scan coefficient ``m * 2^e`` (m in [1, 2), e <= 0) into two
    f32 factors ``(q, p2)`` whose product applies it exactly.

    Hoisted Hillis-Steele span coefficients are PRODUCTS of per-step decay
    factors and underflow f32 long before their contributions become
    immaterial: a 16-row span of Q40 gap quals is already 10^-64, yet times
    a huge early-row M it can be 40% of an in-contract result (fuzz-caught;
    TPU flushes subnormals to zero).  Two power-of-two factors cover
    e >= -252; smaller coefficients are zeroed, bounding each lost
    contribution by 2^-124 at INITIAL_CONSTANT scale — ten decades below
    the f32 rescue threshold."""
    eh = e >> 1  # floor halves: both parts >= -126 whenever e >= -252
    el = e - eh

    def pow2(x):
        return jax.lax.bitcast_convert_type(jnp.clip(x + 127, 1, 254) << 23, jnp.float32)

    q = jnp.where(e < -252, jnp.float32(0.0), m * pow2(eh))
    return q, pow2(el)


def _scaled_kernel(hap_ref, packed_ref, inity_ref, rslen_ref, haplen_ref,
                   out_ref, exp_ref, flag_ref, m_ref, x_ref, y_ref, live_ref):
    """Rows kernel with per-lane power-of-two renormalisation every 8 rows.

    Power-of-two multiplies are exact, so in-range lanes match the plain
    kernel bit-for-bit while deep lanes keep full f32 precision at any
    depth: the result is ``out * 2^exp`` per lane.  This replaces the
    host-CPU f64 rescue pass for underflowed lanes (the reference's
    float->double rescue, IntelPairHmm.cc:157-165) with an on-device one.

    ``flag`` marks lanes whose column-value spread exceeded the per-lane
    f32 window (~65 decades): a valid column's M/X/Y died relative to the
    window, so a flushed path may have mattered — the caller must rescue
    those lanes in f64 if their result is deep (fuzz-caught: a path 53
    decades under the max flushed mid-DP, then resurfaced dominant).
    """
    H, LP = m_ref.shape
    R = packed_ref.shape[0] // 8
    assert R % 8 == 0, R
    f32 = jnp.float32

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (H, LP), 0)
    hap = hap_ref[:]
    hap_match_n = hap == _N_CODE
    inity = inity_ref[:]
    col_valid = jnp.where((row_iota + 1) <= haplen_ref[:], f32(1.0), f32(0.0))
    rslen = rslen_ref[:]

    m_ref[:] = jnp.zeros((H, LP), f32)
    x_ref[:] = jnp.zeros((H, LP), f32)
    y_ref[:] = jnp.broadcast_to(inity, (H, LP))
    # liveness bit per column as of the last rescale: Y starts nonzero
    # everywhere (inity), so every valid column begins alive
    live_ref[:] = jnp.where(col_valid > f32(0.0), jnp.int32(1), jnp.int32(0))
    flag_ref[:] = jnp.zeros((1, LP), jnp.int32)

    levels = []
    k = 1
    while k < H:
        levels.append(k)
        k <<= 1

    def shift1(v, first):
        return jnp.where(row_iota == 0, first, pltpu.roll(v, jnp.int32(1), 0))

    def row_body(r, acc):
        rows8 = packed_ref[pl.ds(8 * r, 8), :]
        rc = rows8[0:1].astype(jnp.int32)
        dmatch = rows8[1:2]
        dmis = rows8[2:3]
        pmm = rows8[3:4]
        pgapm = rows8[4:5]
        pmx = rows8[5:6]
        pmy = rows8[6:7]
        pxx = rows8[7:8]
        pyy = pxx

        match = (hap == rc) | hap_match_n | (rc == _N_CODE)
        prior = jnp.where(match, dmatch, dmis)
        m_prev = m_ref[:]
        x_prev = x_ref[:]
        y_prev = y_ref[:]
        t_comb = pmm * m_prev + pgapm * (x_prev + y_prev)
        y0 = jnp.where(r == 0, inity, jnp.zeros((1, LP), f32))
        m_new = prior * shift1(t_comb, pgapm * y0)
        x_new = pmx * m_prev + pxx * x_prev
        b = pmy * shift1(m_new, jnp.zeros((1, LP), f32))
        # spans 1-2 are plain multiplies (pYY >= 2^-43 for &127 quals, so
        # pYY^2 cannot underflow); wider-span powers ride as (mantissa,
        # exponent) pairs applied as two exact factors (see _split_coeff)
        alpha = pyy
        am = ae = None
        for k in levels:
            b_sh = jnp.where(row_iota < k, f32(0.0), pltpu.roll(b, jnp.int32(k), 0))
            if k == 1:
                b = alpha * b_sh + b
            elif k == 2:
                alpha = alpha * alpha
                b = alpha * b_sh + b
            else:
                if am is None:
                    am, ae = _renorm_mant(alpha)
                am, d = _renorm_mant(am * am)
                ae = ae * 2 + d
                q_a, p2_a = _split_coeff(am, ae)
                b = (q_a * b_sh) * p2_a + b
        m_ref[:] = m_new
        x_ref[:] = x_new
        y_ref[:] = b
        row_sum = jnp.sum((m_new + x_new) * col_valid, axis=0, keepdims=True)
        return acc + jnp.where(rslen == (r + 1), row_sum, f32(0.0))

    def exponent_of(v):
        bits = jax.lax.bitcast_convert_type(v, jnp.int32)
        return jnp.clip(((bits >> 23) & 0xFF) - 127, -126, 126)

    def pow2m(d):
        # 2^d for d <= 0, exact, flushing below ~2^-252 (immaterial terms)
        d1 = jnp.maximum(d, -126)
        d2 = jnp.clip(d - d1, -126, 0)
        f1 = jax.lax.bitcast_convert_type((d1 + 127) << 23, jnp.float32)
        f2 = jax.lax.bitcast_convert_type((d2 + 127) << 23, jnp.float32)
        return f1 * f2

    def chunk_body(c, carry):
        # the accumulator carries its OWN exponent: last-row sums can sit
        # far below the DP maximum and would flush if rescaled by the
        # state's factor
        acc_m, e_acc, e_state = carry
        acc_chunk = jnp.zeros_like(acc_m)
        live_mid = None
        for k in range(8):
            acc_chunk = row_body(c * 8 + jnp.int32(k), acc_chunk)
            if k == 3:
                # mid-chunk liveness sample: keeps the die-and-refill
                # detection at the original 4-row cadence even though the
                # rescale (and flag fold) runs every 8 rows — a column that
                # flushes and refills within the window is still caught
                mid = (m_ref[:] + x_ref[:] + y_ref[:]) * col_valid
                live_mid = jnp.where(mid > f32(0.0), jnp.int32(1), jnp.int32(0))
        # fold the chunk by comparing VALUE exponents (scale + mantissa
        # exponent), never nominal scales: after a lane's result row,
        # garbage pad rows with low quals can GROW the state (gcp=0 turns Y
        # into a prefix sum, x H per row), driving e_state hundreds of
        # binades above the collected result — rescaling the accumulator to
        # that scale flushed it (fuzz-caught).
        has_acc = acc_m > f32(0.0)
        has_chunk = acc_chunk > f32(0.0)
        chunk_e = e_state + exponent_of(acc_chunk)
        e_new = jnp.where(
            has_acc & has_chunk, jnp.maximum(e_acc, chunk_e),
            jnp.where(has_acc, e_acc, chunk_e),
        )
        # zero operands pair with an unclamped (possibly huge) exponent
        # difference: gate the pow2m argument or 0 * garbage-bitcast = NaN
        d_acc = jnp.where(has_acc, e_acc - e_new, 0)
        d_chunk = jnp.where(has_chunk, e_state - e_new, 0)
        acc_m = acc_m * pow2m(d_acc) + acc_chunk * pow2m(d_chunk)
        ea = jnp.where(acc_m > f32(0.0), exponent_of(acc_m), 0)
        acc_m = acc_m * jax.lax.bitcast_convert_type((127 - ea) << 23, jnp.float32)
        e_acc = jnp.where(acc_m > f32(0.0), e_new + ea, e_state)
        # renormalise the DP state: per-lane maximum magnitude back to ~2^90.
        # Invalid padded columns (beyond haplen) are zeroed: their pad-match
        # garbage decays far slower than real lanes and would otherwise
        # dominate the max and crush the valid columns into flush range
        # (column shifts only move information low -> high, so zeroing
        # columns beyond haplen never affects valid ones).
        m_v = m_ref[:] * col_valid
        x_v = x_ref[:] * col_valid
        y_v = y_ref[:] * col_valid
        # window-reliability flag: a valid column component alive at the
        # last rescale and zero now means a value died relative to the
        # window — its (flushed) path may still have mattered downstream.
        # Deaths after the lane's result row are irrelevant (and frequent:
        # pad rows can both grow and starve the state), hence the rslen
        # gate.  In-range results never need the flag: the window floor in
        # raw terms is at most 2^-115 (e_state <= 34 before collection),
        # 22 binades under MIN_ACCEPTED.
        # one liveness bit per column (M+X+Y combined: the failure mode
        # kills whole columns — components are coupled and die together
        # within a chunk or two)
        live_now = jnp.where(m_v + x_v + y_v > f32(0.0), jnp.int32(1), jnp.int32(0))
        live_min = jnp.minimum(live_mid, live_now)
        lost = jnp.where(live_ref[:] > live_min, jnp.int32(1), jnp.int32(0))
        gate = rslen > c * 8  # result not yet collected for this lane
        flag_ref[:] = flag_ref[:] | jnp.where(
            gate, jnp.max(lost, axis=0, keepdims=True), jnp.int32(0)
        )
        live_ref[:] = live_now
        mx = jnp.max(jnp.maximum(m_v, jnp.maximum(x_v, y_v)), axis=0, keepdims=True)
        e = exponent_of(mx)
        # target ~2^90, not ~1: a tile's minor columns can sit many decades
        # under the max and still matter later; at target ~1 they flush to
        # subnormals within a chunk (~1% deep-zone error at fuzz quals).
        # The 65 decades between 2^91 and the f32 normal floor cover an
        # 8-row window at ~8 decades/row of sustained decay (pipeline-max
        # territory); beyond that the liveness flag routes the lane to the
        # host-f64 rescue, so widening the window from 4 to 8 rows trades
        # no correctness for ~29% throughput (measured 78.5 -> 101
        # Gcells/s, and flagged-deep rates identical on deep corpora — the
        # flag already fires for effectively all deep long-read lanes).
        # 2^(90-e) can exceed the f32 normal range, hence two exact
        # factors.
        sf = jax.lax.bitcast_convert_type((127 - e) << 23, jnp.float32)
        up = jnp.float32(2.0 ** 90)
        m_ref[:] = (m_v * sf) * up
        x_ref[:] = (x_v * sf) * up
        y_ref[:] = (y_v * sf) * up
        return acc_m, e_acc, e_state + e - 90

    zi = jnp.zeros((1, LP), jnp.int32)
    acc_m, e_acc, _ = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(R // 8), chunk_body,
        (jnp.zeros((1, LP), f32), zi, zi),
    )
    out_ref[:] = acc_m
    exp_ref[:] = e_acc


def _kernel(hap_ref, packed_ref, inity_ref, rslen_ref,
            haplen_ref, out_ref, m_ref, x_ref, y_ref):
    H, LP = m_ref.shape
    R = packed_ref.shape[0] // 8
    f32 = jnp.float32

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (H, LP), 0)
    hap = hap_ref[:]
    hap_match_n = hap == _N_CODE
    inity = inity_ref[:]  # (1, LP)
    # NOTE: bool->f32 astype hits an infinite recursion in this jax
    # version's Mosaic convert_element_type lowering; use a select instead.
    col_valid = jnp.where((row_iota + 1) <= haplen_ref[:], f32(1.0), f32(0.0))
    rslen = rslen_ref[:]  # (1, LP)

    m_ref[:] = jnp.zeros((H, LP), f32)
    x_ref[:] = jnp.zeros((H, LP), f32)
    y_ref[:] = jnp.broadcast_to(inity, (H, LP))

    levels = []
    k = 1
    while k < H:
        levels.append(k)
        k <<= 1

    def shift1(v, first):
        # i32 shift operand: x64 Python ints lower to i64, which
        # tpu.dynamic_rotate rejects
        return jnp.where(row_iota == 0, first, pltpu.roll(v, jnp.int32(1), 0))

    def body(r, acc):
        # all 8 per-row vectors in one contiguous (8, LP) read (8 separate
        # dynamic slices cost ~5% of the kernel); pxx == pyy == the gap
        # continuation probability, deduplicated at pack time
        rows8 = packed_ref[pl.ds(8 * r, 8), :]
        rc = rows8[0:1].astype(jnp.int32)
        dmatch = rows8[1:2]
        dmis = rows8[2:3]
        pmm = rows8[3:4]
        pgapm = rows8[4:5]
        pmx = rows8[5:6]
        pmy = rows8[6:7]
        pxx = rows8[7:8]
        pyy = pxx

        match = (hap == rc) | hap_match_n | (rc == _N_CODE)
        prior = jnp.where(match, dmatch, dmis)

        m_prev = m_ref[:]
        x_prev = x_ref[:]
        y_prev = y_ref[:]

        # combine previous-row terms once, then a single shift
        t_comb = pmm * m_prev + pgapm * (x_prev + y_prev)
        y0 = jnp.where(r == 0, inity, jnp.zeros((1, LP), f32))
        m_new = prior * shift1(t_comb, pgapm * y0)
        x_new = pmx * m_prev + pxx * x_prev

        # Y[c] = pYY*Y[c-1] + pMY*M[c-1]: the coefficient pYY is per-row,
        # i.e. CONSTANT along the scanned column axis, so the affine-map
        # Hillis-Steele collapses to the constant-coefficient form
        #   b[c] += pYY^(2^k) * b[c - 2^k]
        # with the pYY powers from (1, LP) scalar squarings.  Spans 1-2 are
        # plain multiplies (pYY >= 2^-43 for &127 quals, so pYY^2 cannot
        # underflow); wider-span powers ride as (mantissa, exponent) pairs
        # applied as two exact factors (see _split_coeff).
        b = pmy * shift1(m_new, jnp.zeros((1, LP), f32))
        alpha = pyy  # (1, LP)
        am = ae = None
        for k in levels:
            ks = jnp.int32(k)
            b_sh = jnp.where(row_iota < k, jnp.float32(0.0), pltpu.roll(b, ks, 0))
            if k == 1:
                b = alpha * b_sh + b
            elif k == 2:
                alpha = alpha * alpha
                b = alpha * b_sh + b
            else:
                if am is None:
                    am, ae = _renorm_mant(alpha)
                am, d = _renorm_mant(am * am)
                ae = ae * 2 + d
                q_a, p2_a = _split_coeff(am, ae)
                b = (q_a * b_sh) * p2_a + b

        m_ref[:] = m_new
        x_ref[:] = x_new
        y_ref[:] = b

        row_sum = jnp.sum((m_new + x_new) * col_valid, axis=0, keepdims=True)
        return acc + jnp.where(rslen == (r + 1), row_sum, jnp.float32(0.0))

    # int32 bounds: under jax_enable_x64 a Python-int fori_loop counter is
    # int64, and 64-bit converts send Mosaic's lowering into infinite
    # recursion.
    out_ref[:] = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(R), body, jnp.zeros((1, LP), f32)
    )


@functools.partial(jax.jit, static_argnames=("lane_block", "interpret"))
def pairhmm_raw_pallas_scaled(hap, read, q, iq, dq, gcp, haplen, rslen,
                              *, lane_block: int = LANE_BLOCK,
                              interpret: bool = False):
    """Scaled-f32 PairHMM forward: (mantissa (P,), exp2 (P,), flag (P,)).

    The per-lane forward probability is ``mantissa * 2^exp2`` — unlimited
    dynamic range at f32 precision, used as the on-device rescue pass for
    lanes whose plain-f32 result underflows MIN_ACCEPTED.  In-range lanes
    match the plain kernel bit-for-bit (power-of-two rescales are exact).
    ``flag`` is nonzero for lanes whose column-value spread exceeded the
    per-lane f32 window before the result row — their deep results may
    have lost a dominant flushed path and need the host-f64 rescue.
    """
    from .. import context as _ctx

    ctx = _ctx.pairhmm_context("float32")
    f = jnp.float32
    H, P = hap.shape
    R = read.shape[0]
    assert P % lane_block == 0 and R % 8 == 0, (P, R)

    qm = (q & 127).astype(jnp.int32)
    im = (iq & 127).astype(jnp.int32)
    dm = (dq & 127).astype(jnp.int32)
    cm = (gcp & 127).astype(jnp.int32)
    p_mm = _m2m_arith64(im, dm)
    ph2pr_c = _ph2pr_arith(cm)
    p_mx = _ph2pr_arith(im)
    p_my = _ph2pr_arith(dm)
    distm = _ph2pr_arith(qm)
    p_gapm = f(1.0) - ph2pr_c
    dmatch = f(1.0) - distm
    dmis = distm / f(3.0)
    inity = (jnp.asarray(ctx.INITIAL_CONSTANT, f) / haplen.astype(f))[None, :]
    hap_i = hap.astype(jnp.int32)
    rslen2 = rslen.astype(jnp.int32)[None, :]
    haplen2 = haplen.astype(jnp.int32)[None, :]
    packed = jnp.stack(
        [read.astype(f), dmatch, dmis, p_mm, p_gapm, p_mx, p_my, ph2pr_c],
        axis=1,
    ).reshape(R * 8, P)

    grid = (P // lane_block,)

    def lane_spec(length):
        return pl.BlockSpec(
            (length, lane_block),
            lambda i: (jnp.int32(0), i),
            memory_space=pltpu.VMEM,
        )

    with jax.enable_x64(False):
        out, exp, flag = pl.pallas_call(
            _scaled_kernel,
            grid=grid,
            in_specs=[lane_spec(H), lane_spec(R * 8), lane_spec(1),
                      lane_spec(1), lane_spec(1)],
            out_specs=[lane_spec(1), lane_spec(1), lane_spec(1)],
            out_shape=[
                jax.ShapeDtypeStruct((1, P), jnp.float32),
                jax.ShapeDtypeStruct((1, P), jnp.int32),
                jax.ShapeDtypeStruct((1, P), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((H, lane_block), jnp.float32),
                pltpu.VMEM((H, lane_block), jnp.float32),
                pltpu.VMEM((H, lane_block), jnp.float32),
                pltpu.VMEM((H, lane_block), jnp.int32),
            ],
            interpret=interpret,
        )(hap_i, packed, inity, rslen2, haplen2)
    return out[0], exp[0], flag[0]


_LOG2_10 = float(np.log2(10.0))
_LN10 = float(np.log(10.0))


def _ph2pr_arith(qual_i32):
    """``10^(-q/10)`` computed on the VPU (no table gather).

    Matches the f32 table (powf) to within ~1 ulp; TPU gathers go through
    the scalar core and cost more than the whole DP kernel.
    """
    return jnp.exp2(qual_i32.astype(jnp.float32) * jnp.float32(-_LOG2_10 / 10.0))


def _match_to_match_arith(im, dm):
    """set_mm_prob (Context.h:197-209) evaluated arithmetically in f32.

    The Jacobian-table quantization is exact here: ``diff*1e4`` always lands
    on the integer ``1000*|i-d|``, so the table lookup equals the closed form
    ``log10(1 + 10^(-round(diff*1e4)*1e-4))`` evaluated directly.
    """
    f = jnp.float32
    mx = jnp.maximum(im, dm).astype(f)
    mn = jnp.minimum(im, dm).astype(f)
    small = f(-0.1) * mx
    big = f(-0.1) * mn
    diff = big - small
    ind = jnp.round(diff * f(10000.0))
    # log10(1 + 10^(-ind*1e-4)) = log1p(10^(-ind*1e-4)) / ln(10)
    jac = jnp.where(
        diff >= f(8.0),
        f(0.0),
        jnp.log1p(jnp.exp2(-(ind * f(1e-4)) * f(_LOG2_10))) * f(1.0 / np.log(10.0)),
    )
    ls = big + jac
    p = jnp.minimum(f(1.0), jnp.exp2(ls * f(_LOG2_10)))
    # 1 - 10^ls  via log1p for accuracy near p ~ 1:
    m2m_log10 = jnp.log1p(-p) * f(0.434294)  # truncated INV_LN10 (Context.h:78)
    return jnp.exp2(m2m_log10 * f(_LOG2_10))


def _jac_by_delta_2d() -> np.ndarray:
    """The 128 reachable f32 Jacobian-table entries as an (8, 16) grid.

    The table index is ``round(diff * 1e4)`` with ``diff = 0.1*(mx - mn)``
    (f32 roundings never move it off the integer), so only indices
    ``1000 * delta`` for delta in [0, 128) occur; the two-level one-hot
    lookup (row = delta>>4, column = delta&15) costs a fraction of a flat
    128-wide one-hot's HBM traffic.
    """
    jt = ctx_mod.jacobian_log_table("float32")
    return jt[np.minimum(np.arange(128) * 1000, len(jt) - 1)].astype(np.float32).reshape(8, 16)


def _jac_lookup_2level(delta):
    """Exact f32 Jacobian entry per element via two 8/16-wide one-hots."""
    f32 = jnp.float32
    tab = jnp.asarray(_jac_by_delta_2d(), f32)  # (8, 16)
    dflat = delta.reshape(-1, 1)
    oh_hi = ((dflat >> 4) == jnp.arange(8, dtype=jnp.int32)[None, :]).astype(f32)
    rows = jax.lax.dot_general(
        oh_hi, tab, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (RP, 16)
    oh_lo = ((dflat & 15) == jnp.arange(16, dtype=jnp.int32)[None, :]).astype(f32)
    return jnp.sum(rows * oh_lo, axis=1).reshape(delta.shape)


def _m2m_arith64(im, dm):
    """set_mm_prob to ~1 ulp of the float context table (Context.h:74-89)
    with NO gathers and NO emulated-f64 transcendentals:

    * the Jacobian correction only depends on ``mx - mn`` — a two-level
      one-hot lookup of the exact f32 table entries;
    * ``ls = big + jac`` reproduces the table's f32 rounding;
    * ``1 - 10^ls``: exact range reduction ``u = ls*ln10 = m*ln2 + v`` with
      ``|v| <= ln2/2``; the cancellation zone (p -> 1) lies entirely inside
      ``m == 0``, where a 7-term expm1 polynomial is *relatively* accurate;
      for ``m != 0``, ``1 - 2^m e^v`` has no cancellation (``1-p >= 0.29``).
      Grid-validated at <= 1.7e-7 relative vs the exact table (the naive
      f32 expm1 deviates 2e-5; emulated f64 costs ~0.2 ms per call);
    * the final ``10^(w * 0.434294)`` with w = log1p(-p) is
      ``(1-p) * e^((k-1)w)`` for ``k = 0.434294*ln10 = 1 - 1.04e-6``,
      expanded to first order (quadratic term <= 3e-9).
    """
    f32 = jnp.float32
    mx = jnp.maximum(im, dm)
    mn = jnp.minimum(im, dm)
    small = f32(-0.1) * mx.astype(f32)
    big = f32(-0.1) * mn.astype(f32)
    diff = big - small  # >= 0
    jac = _jac_lookup_2level(mx - mn)
    ls = jnp.where(diff >= f32(8.0), big, big + jac)
    u = ls * f32(_LN10)
    m = jnp.round(u * f32(1.4426950408889634))  # 1/ln2
    mi = m.astype(jnp.int32)
    LN2_HI = f32(0.693359375)  # 12 trailing zero bits: m*LN2_HI is exact
    LN2_LO = f32(-2.12194440e-4)
    v = (u - m * LN2_HI) - m * LN2_LO
    poly = f32(1.0) + v * (f32(1 / 2) + v * (f32(1 / 6) + v * (f32(1 / 24)
           + v * (f32(1 / 120) + v * (f32(1 / 720) + v * f32(1 / 5040))))))
    em1 = v * poly  # expm1(v), relative accuracy ~1 ulp on |v| <= 0.347
    pow2 = jax.lax.bitcast_convert_type(
        jnp.clip(mi + 127, 1, 254) << 23, jnp.float32)
    one_minus_p = jnp.where(mi == 0, -em1, f32(1.0) - pow2 * (f32(1.0) + em1))
    one_minus_p = jnp.clip(one_minus_p, f32(0.0), f32(1.0))
    w = jnp.log(jnp.maximum(one_minus_p, f32(1e-38)))
    corr = f32(1.0) + f32(0.434294 * _LN10 - 1.0) * w
    return jnp.where(one_minus_p > f32(0.0), one_minus_p * corr, f32(0.0))


@functools.lru_cache(maxsize=2)
def _m2m_2d(dtype: str = "float32") -> np.ndarray:
    """match-to-match cache reshaped (max_q, min_q) -> (128, 128) for the
    MXU one-hot gather (PairHMM quals are masked to 7 bits)."""
    tri = ctx_mod.pairhmm_context(dtype).match_to_match
    out = np.zeros((128, 128), dtype)
    for mx in range(128):
        base = (mx * (mx + 1)) >> 1
        out[mx, : mx + 1] = tri[base : base + mx + 1]
    return out


def _onehot_gather(table, idx):
    """Exact table gather as a one-hot matmul (TPU vector gathers go through
    the scalar core and cost more than the DP kernel; a one-hot f32 matmul
    at HIGHEST precision reproduces table values bit-exactly)."""
    K = table.shape[0]
    oh = (idx.reshape(-1, 1) == jnp.arange(K, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    v = jax.lax.dot_general(
        oh,
        table.reshape(K, 1),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return v.reshape(idx.shape)


def _m2m_mxu(im, dm):
    """Exact set_mm_prob via two one-hot contractions over the 2-D cache."""
    tab = jnp.asarray(_m2m_2d(), jnp.float32)
    mx = jnp.maximum(im, dm)
    mn = jnp.minimum(im, dm)
    oh_mx = (mx.reshape(-1, 1) == jnp.arange(128, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    rows = jax.lax.dot_general(
        oh_mx, tab, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    oh_mn = (mn.reshape(-1, 1) == jnp.arange(128, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    return jnp.sum(rows * oh_mn, axis=1).reshape(im.shape)


@functools.partial(jax.jit, static_argnames=("lane_block", "interpret", "prep"))
def pairhmm_raw_pallas(hap, read, q, iq, dq, gcp, haplen, rslen, *, lane_block: int = LANE_BLOCK, interpret: bool = False, prep: str = "arith64"):
    """float32 PairHMM forward probability per lane (TPU Pallas path).

    Same contract as ``pairhmm.pairhmm_raw(..., dtype='float32')``; lanes
    must be a multiple of ``lane_block``.  ``prep`` selects how per-row
    transition probabilities are produced:

    * "arith64" (default) — all-f32 closed forms replicating the table
      construction (match-to-match <= ~1.7e-7 relative vs the exact table,
      ph2pr <= 1 ulp of powf; golden 104-case max err identical to exact
      tables).  The one-hot/table alternatives materialise (R*P, 128)
      one-hots whose HBM traffic costs more than the DP kernel itself;
      "mxu" is the bit-exact option;
    * "mxu" — exact table values via one-hot matmul gathers (bit-identical
      to the context tables, bandwidth-heavy);
    * "table" — plain vector gathers (exact, scalar-core-slow on TPU; fine
      on CPU);
    * "arith" — all-f32 closed forms (kept for x64-disabled contexts).
    """
    ctx = ctx_mod.pairhmm_context("float32")
    f = jnp.float32
    H, P = hap.shape
    R = read.shape[0]
    assert P % lane_block == 0, (P, lane_block)

    qm = (q & 127).astype(jnp.int32)
    im = (iq & 127).astype(jnp.int32)
    dm = (dq & 127).astype(jnp.int32)
    cm = (gcp & 127).astype(jnp.int32)
    if prep == "arith64":
        # default on TPU: all-f32 closed forms with explicit range
        # reduction for the 1-p cancellation (see _m2m_arith64; ~1.7e-7
        # relative vs the exact table); no HBM-bound one-hot
        # materialisation and no emulated-f64 transcendentals
        p_mm = _m2m_arith64(im, dm)
        ph2pr_c = _ph2pr_arith(cm)
        p_mx = _ph2pr_arith(im)
        p_my = _ph2pr_arith(dm)
        distm = _ph2pr_arith(qm)
    elif prep == "arith":
        p_mm = _match_to_match_arith(im, dm)
        ph2pr_c = _ph2pr_arith(cm)
        p_mx = _ph2pr_arith(im)
        p_my = _ph2pr_arith(dm)
        distm = _ph2pr_arith(qm)
    elif prep == "mxu":
        table = jnp.asarray(ctx.ph2pr, f)
        p_mm = _m2m_mxu(im, dm)
        ph2pr_c = _onehot_gather(table, cm)
        p_mx = _onehot_gather(table, im)
        p_my = _onehot_gather(table, dm)
        distm = _onehot_gather(table, qm)
    else:
        ph2pr = jnp.asarray(ctx.ph2pr, f)
        m2m = jnp.asarray(ctx.match_to_match, f)
        max_q = jnp.maximum(im, dm)
        min_q = jnp.minimum(im, dm)
        p_mm = m2m[((max_q * (max_q + 1)) >> 1) + min_q]
        ph2pr_c = ph2pr[cm]
        p_mx = ph2pr[im]
        p_my = ph2pr[dm]
        distm = ph2pr[qm]
    p_gapm = f(1.0) - ph2pr_c
    dmatch = f(1.0) - distm
    dmis = distm / f(3.0)
    inity = (jnp.asarray(ctx.INITIAL_CONSTANT, f) / haplen.astype(f))[None, :]
    hap_i = hap.astype(jnp.int32)
    rslen2 = rslen.astype(jnp.int32)[None, :]
    haplen2 = haplen.astype(jnp.int32)[None, :]

    # per-row vectors interleaved along sublanes: rows 8r..8r+7 hold read-row
    # r's {read, dmatch, dmis, pMM, pGAPM, pMX, pMY, pCont} so the kernel
    # reads them as one contiguous (8, LP) dynamic slice
    packed = jnp.stack(
        [read.astype(f), dmatch, dmis, p_mm, p_gapm, p_mx, p_my, ph2pr_c],
        axis=1,
    ).reshape(R * 8, P)

    grid = (P // lane_block,)

    def lane_spec(length):
        # index_map must yield i32 under jax_enable_x64 (Mosaic rejects i64)
        return pl.BlockSpec(
            (length, lane_block),
            lambda i: (jnp.int32(0), i),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        lane_spec(H),      # hap
        lane_spec(R * 8),  # packed per-row vectors
        lane_spec(1),      # inity
        lane_spec(1),      # rslen
        lane_spec(1),      # haplen
    ]

    # x64 trace mode costs extra inside the Mosaic kernel (i64 scalar
    # plumbing); the kernel is all-i32/f32, so trace it with x64 off.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=lane_spec(1),
            out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((H, lane_block), jnp.float32),
                pltpu.VMEM((H, lane_block), jnp.float32),
                pltpu.VMEM((H, lane_block), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=int(50 * H * R) * P,
                bytes_accessed=int((H + 10 * R) * 4) * P,
                transcendentals=0,
            ),
            interpret=interpret,
        )(hap_i, packed, inity, rslen2, haplen2)
    return out[0]


def expand_indexed_planes(hap_u, readq_u, ridx, hidx, *, const_quals=None,
                          quals_u=None):
    """Device-side expansion of a deduplicated (indexed) batch: gather the
    per-pair planes from the unique read/hap planes with ``jnp.take`` and
    synthesize constant iq/dq/gcp planes when the batch carries the GATK
    default-GOP constants.  Shared by the single-device jit wrapper
    (api._scaled_indexed_jit) and the mesh shard body
    (parallel.mesh._pairhmm_indexed_sharded_fn) so the two paths cannot
    drift.  Returns (hap, read, q, iq, dq, gcp)."""
    import jax.numpy as jnp

    read = jnp.take(readq_u[0], ridx, axis=1)
    q = jnp.take(readq_u[1], ridx, axis=1)
    hap = jnp.take(hap_u, hidx, axis=1)
    if const_quals is not None:
        iq = jnp.full_like(read, const_quals[0])
        dq = jnp.full_like(read, const_quals[1])
        gcp = jnp.full_like(read, const_quals[2])
    else:
        iq = jnp.take(quals_u[0], ridx, axis=1)
        dq = jnp.take(quals_u[1], ridx, axis=1)
        gcp = jnp.take(quals_u[2], ridx, axis=1)
    return hap, read, q, iq, dq, gcp

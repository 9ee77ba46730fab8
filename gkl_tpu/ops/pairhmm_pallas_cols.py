"""PairHMM forward kernel, column-sweep variant: (R, LANE_BLOCK) state.

The row-sweep kernel (``pairhmm_pallas.py``) carries (H, LANE_BLOCK) state
tiles, capping the haplotype bucket at VMEM scratch (~2048).  This variant
transposes the sweep: the DP state is three (R, LANE_BLOCK) tiles (reads
are short and bounded), and the *haplotype* axis is streamed in chunks
over a second (sequential) grid dimension — the M/X/Y state persists in
scratch across grid steps while each step's hap block pages in, so VMEM
bounds only the READ bucket and haplotypes of ANY length run at full
speed (the TPU form of the reference's stripes covering any length,
avx-pairhmm-template.h:291-323; same streaming pattern as the SW kernel's
reference axis).

Recurrence mapping under a column sweep (reference formulas,
``avx-pairhmm-template.h:208-223``):

* M(r,c) needs the (r-1, c-1) diagonal — two sublane rolls of the previous
  column's state;
* Y(r,c) = pMY*M(r,c-1) + pYY*Y(r,c-1) — previous column, elementwise;
* X(r,c) = pMX*M(r-1,c) + pXX*X(r-1,c) — *within-column* affine recurrence
  over rows, solved by the same hoisted-coefficient Hillis-Steele scan as
  the PDHMM insertion (pXX is column-invariant, so per-level coefficient
  products are precomputed once).

Numerics are the same formulas as the row-sweep kernel (f32, golden 1e-5
contract holds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pairhmm_pallas as rows_mod

_N_CODE = 78
LANE_BLOCK = 128


def _kernel(hap_ref, read_ref, dmatch_ref, dmis_ref, pmm_ref, pgapm_ref,
            pmx_ref, pxx_ref, pmy_ref, pyy_ref, inity_ref, rslen_ref,
            haplen_ref, out_ref, m_ref, x_ref, y_ref):
    R, LP = m_ref.shape
    CH = hap_ref.shape[0]  # hap columns in this grid step's chunk
    jgrid = pl.program_id(1)
    f32 = jnp.float32

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LP), 0)
    read_i = read_ref[:]
    read_is_n = read_i == _N_CODE
    dmatch = dmatch_ref[:]
    dmis = dmis_ref[:]
    pmm = pmm_ref[:]
    pgapm = pgapm_ref[:]
    pmx = pmx_ref[:]
    pxx = pxx_ref[:]
    pmy = pmy_ref[:]
    pyy = pyy_ref[:]
    inity = inity_ref[:]  # (1, LP)
    haplen = haplen_ref[:]
    last_row = jnp.where((row_iota + 1) == rslen_ref[:], f32(1.0), f32(0.0))

    @pl.when(jgrid == 0)
    def _init():
        zero = jnp.zeros((R, LP), f32)
        m_ref[:] = zero
        x_ref[:] = zero
        y_ref[:] = zero
        out_ref[:] = jnp.zeros((1, LP), f32)

    def shift1(v, first):
        return jnp.where(row_iota == 0, first, pltpu.roll(v, jnp.int32(1), 0))

    zrow = jnp.zeros((1, LP), f32)

    # X-scan coefficient products (pXX is column-invariant): level l applies
    # the product of pXX over the 2^l-row span, wrap-masked.  The products
    # ride as (mantissa, exponent) pairs and are applied as two exact f32
    # factors — raw span products underflow f32 while their contributions
    # can still dominate the result (see pairhmm_pallas._split_coeff).
    # Spans 1-2 cannot underflow for &127 quals (pXX >= 2^-43), so their
    # exact single-factor form skips the extra in-loop multiply.
    # The ladder is hap-chunk-invariant but deliberately recomputed per
    # grid step: persisting 2·log2(R) extra (R, LANE_BLOCK) f32 tiles in
    # scratch (~2.3 MB at R=512) would break the probed VMEM budget that
    # allows R=512 at all, while the recompute costs ~0.5-1% of a CH>=256
    # step — the bandwidth/VMEM trade favors the recompute.
    a_levels = []
    am, ae = rows_mod._renorm_mant(pxx)
    k = 1
    while k < R:
        q_k, p2_k = rows_mod._split_coeff(am, ae)
        if k <= 2:
            a_levels.append((k, q_k * p2_k, None))  # exact: both factors normal
        else:
            a_levels.append((k, q_k, p2_k))
        m2 = am * jnp.where(row_iota >= k, pltpu.roll(am, jnp.int32(k), 0), f32(1.0))
        e2 = ae + jnp.where(row_iota >= k, pltpu.roll(ae, jnp.int32(k), 0), jnp.int32(0))
        am, d = rows_mod._renorm_mant(m2)
        ae = e2 + d
        k <<= 1

    def body(jc, carry):
        # jc: chunk-local column; j: global column index
        j = jgrid * CH + jc
        hap_b = hap_ref[pl.ds(jc, 1), :]  # (1, LP)
        match = (read_i == hap_b) | read_is_n | (hap_b == _N_CODE)
        prior = jnp.where(match, dmatch, dmis)

        m_l = m_ref[:]
        x_l = x_ref[:]
        y_l = y_ref[:]

        # diagonal (r-1, c-1): previous column shifted one row down.
        # Row-0 boundary of the previous column: M = X = 0, Y = inity.
        m_dg = shift1(m_l, zrow)
        xy_dg = shift1(x_l + y_l, inity)
        m = prior * (pmm * m_dg + pgapm * xy_dg)

        # Y: previous column, same row (boundary row 0 handled by the carried
        # state: y_l row 0 holds Y(0, c-1)... state rows are 1..R, and row 0
        # of the DP (the boundary) never enters Y's recurrence for rows >= 1.
        y = pmy * m_l + pyy * y_l

        # X: within-column affine scan over rows, X(0, c) = 0.
        b = pmx * shift1(m, zrow)
        for k, q_k, p2_k in a_levels:
            b_sh = jnp.where(row_iota >= k, pltpu.roll(b, jnp.int32(k), 0), f32(0.0))
            t = q_k * b_sh
            if p2_k is not None:
                t = t * p2_k
            b = t + b

        m_ref[:] = m
        x_ref[:] = b
        y_ref[:] = y

        valid = jnp.where((j + 1) <= haplen, f32(1.0), f32(0.0))
        out_ref[:] += jnp.sum((m + b) * last_row, axis=0, keepdims=True) * valid
        return carry

    _run_columns(body, CH)


def _run_columns(body, CH):
    """Drive ``body(jc, carry)`` over the CH chunk columns, 4-wide unrolled
    when CH allows (pipelines measurably better).  Shared by the plain and
    relay kernels so the out accumulation's reassociation stays IDENTICAL —
    the single-chunk-relay == plain-cols bit-equality contract depends on
    both using the same unroll."""
    if CH % 4 == 0:
        def chunk(c, carry):
            for k in range(4):
                body(c * 4 + jnp.int32(k), carry)
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(CH // 4), chunk, jnp.int32(0))
    else:
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(CH), body, jnp.int32(0))


def _kernel_relay(hap_ref, bm_ref, bx_ref, by_ref, read_ref,
                  dmatch_ref, dmis_ref, pmm_ref, pgapm_ref, pmx_ref, pxx_ref,
                  pmy_ref, pyy_ref, pby0_ref, rslen_ref, haplen_ref,
                  out_ref, bmo_ref, bxo_ref, byo_ref,
                  m_ref, x_ref, y_ref, pbm_ref, pbx_ref, pby_ref):
    """Column-sweep kernel over a READ-axis chunk [r0+1, r0+R] of the DP.

    The read relay removes the R <= 512 VMEM cap the same way the hap
    stream removed the H cap (together: any-length pairs at full speed, the
    reference's stripes covering any read length,
    avx-pairhmm-template.h:291-323).  Chunk-boundary state rides as three
    (H, P) planes in HBM: ``bm/bx/by`` hold M/X/Y of DP row ``r0`` at every
    column (for the first chunk the driver synthesizes the virtual row 0:
    M = X = 0, Y = INITIAL_CONSTANT/haplen), streamed per hap chunk like
    the haplotype itself; ``bmo/bxo/byo`` collect row ``r0+R`` for the next
    chunk.  The previous COLUMN's boundary values (needed by the first
    row's diagonal) ride in (1, LANE_BLOCK) scratch that persists across
    the sequential hap grid — exactly like the M/X/Y state tiles."""
    R, LP = m_ref.shape
    CH = hap_ref.shape[0]
    jgrid = pl.program_id(1)
    f32 = jnp.float32

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LP), 0)
    read_i = read_ref[:]
    read_is_n = read_i == _N_CODE
    dmatch = dmatch_ref[:]
    dmis = dmis_ref[:]
    pmm = pmm_ref[:]
    pgapm = pgapm_ref[:]
    pmx = pmx_ref[:]
    pxx = pxx_ref[:]
    pmy = pmy_ref[:]
    pyy = pyy_ref[:]
    haplen = haplen_ref[:]
    # rows are global DP rows r0+1 .. r0+R; rslen_ref carries rslen - r0
    # (a RUNTIME input, so every interior chunk reuses ONE compiled kernel
    # instead of baking r0 in as a trace-time constant)
    last_row = jnp.where((row_iota + 1) == rslen_ref[:], f32(1.0), f32(0.0))

    @pl.when(jgrid == 0)
    def _init():
        zero = jnp.zeros((R, LP), f32)
        m_ref[:] = zero
        x_ref[:] = zero
        y_ref[:] = zero
        out_ref[:] = jnp.zeros((1, LP), f32)
        zrow1 = jnp.zeros((1, LP), f32)
        pbm_ref[:] = zrow1
        pbx_ref[:] = zrow1
        # boundary at DP column 0: the driver passes inity for the first
        # chunk (virtual row 0), all-zero for deeper chunks (column 0 of
        # any row >= 1 is zero) — a runtime input, not a compile split
        pby_ref[:] = pby0_ref[:]

    def shift1(v, first):
        return jnp.where(row_iota == 0, first, pltpu.roll(v, jnp.int32(1), 0))

    zrow = jnp.zeros((1, LP), f32)

    # X-scan ladder (see _kernel above; identical construction)
    a_levels = []
    am, ae = rows_mod._renorm_mant(pxx)
    k = 1
    while k < R:
        q_k, p2_k = rows_mod._split_coeff(am, ae)
        if k <= 2:
            a_levels.append((k, q_k * p2_k, None))
        else:
            a_levels.append((k, q_k, p2_k))
        m2 = am * jnp.where(row_iota >= k, pltpu.roll(am, jnp.int32(k), 0), f32(1.0))
        e2 = ae + jnp.where(row_iota >= k, pltpu.roll(ae, jnp.int32(k), 0), jnp.int32(0))
        am, d = rows_mod._renorm_mant(m2)
        ae = e2 + d
        k <<= 1

    def body(jc, carry):
        j = jgrid * CH + jc
        hap_b = hap_ref[pl.ds(jc, 1), :]  # (1, LP)
        bm_c = bm_ref[pl.ds(jc, 1), :]    # boundary row r0 at THIS column
        bx_c = bx_ref[pl.ds(jc, 1), :]
        by_c = by_ref[pl.ds(jc, 1), :]
        match = (read_i == hap_b) | read_is_n | (hap_b == _N_CODE)
        prior = jnp.where(match, dmatch, dmis)

        m_l = m_ref[:]
        x_l = x_ref[:]
        y_l = y_ref[:]

        # diagonal (r-1, c-1): previous column shifted one row down; the
        # first chunk row's diagonal is the PREVIOUS column's boundary row
        m_dg = shift1(m_l, pbm_ref[:])
        xy_dg = shift1(x_l + y_l, pbx_ref[:] + pby_ref[:])
        m = prior * (pmm * m_dg + pgapm * xy_dg)

        y = pmy * m_l + pyy * y_l

        # X scan over chunk rows; the first row's seed folds in the full
        # X(r0+1, c) = pMX*M(r0, c) + pXX*X(r0, c) from the boundary planes
        seed = pmx[0:1] * bm_c + pxx[0:1] * bx_c
        b = pmx * shift1(m, zrow)
        b = jnp.where(row_iota == 0, seed, b)
        for k, q_k, p2_k in a_levels:
            b_sh = jnp.where(row_iota >= k, pltpu.roll(b, jnp.int32(k), 0), f32(0.0))
            t = q_k * b_sh
            if p2_k is not None:
                t = t * p2_k
            b = t + b

        m_ref[:] = m
        x_ref[:] = b
        y_ref[:] = y
        pbm_ref[:] = bm_c
        pbx_ref[:] = bx_c
        pby_ref[:] = by_c

        # boundary out: DP row r0+R of this column, for the next chunk —
        # a (1, LP) read of the state just stored (a full-tile multiply-
        # reduce here cost ~11% of the whole kernel)
        bmo_ref[pl.ds(jc, 1), :] = m_ref[pl.ds(R - 1, 1), :]
        bxo_ref[pl.ds(jc, 1), :] = x_ref[pl.ds(R - 1, 1), :]
        byo_ref[pl.ds(jc, 1), :] = y_ref[pl.ds(R - 1, 1), :]

        valid = jnp.where((j + 1) <= haplen, f32(1.0), f32(0.0))
        out_ref[:] += jnp.sum((m + b) * last_row, axis=0, keepdims=True) * valid
        return carry

    _run_columns(body, CH)


def _cols_relay_call(hap_i, bm, bx, by, read_i, dmatch, dmis, p_mm, p_gapm,
                     p_mx, p_xx, p_my, p_yy, pby0, rslen_local2, haplen2,
                     *, lane_block, interpret):
    H, P = hap_i.shape
    R = read_i.shape[0]
    CH = H
    for c in (256, 128, 64, 32, 16, 8):
        if H % c == 0:
            CH = c
            break
    grid = (P // lane_block, H // CH)

    def lane_spec(length):
        return pl.BlockSpec((length, lane_block),
                            lambda i, j: (jnp.int32(0), i),
                            memory_space=pltpu.VMEM)

    def hap_spec():
        return pl.BlockSpec((CH, lane_block), lambda i, j: (j, i),
                            memory_space=pltpu.VMEM)

    in_specs = ([hap_spec(), hap_spec(), hap_spec(), hap_spec()]
                + [lane_spec(R)] * 9 + [lane_spec(1)] * 3)
    out_specs = [lane_spec(1), hap_spec(), hap_spec(), hap_spec()]
    out_shape = [jax.ShapeDtypeStruct((1, P), jnp.float32)] + \
                [jax.ShapeDtypeStruct((H, P), jnp.float32)] * 3
    return pl.pallas_call(
        _kernel_relay,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((R, lane_block), jnp.float32)] * 3
        + [pltpu.VMEM((1, lane_block), jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=int(43 * H * R) * P,
            bytes_accessed=int((7 * H + 10 * R) * 4) * P,
            transcendentals=0,
        ),
        interpret=interpret,
    )(hap_i, bm, bx, by, read_i, dmatch, dmis, p_mm, p_gapm, p_mx, p_xx,
      p_my, p_yy, pby0, rslen_local2, haplen2)


def default_r_chunk(R: int) -> int:
    """Measured-optimal read-chunk height: SHALLOW chunks win big (v5e:
    r_chunk 512 -> 52 Gcells/s, 128 -> 94, 64 -> 111 at R=1024, H=4096 —
    fewer X-scan ladder levels and cheaper sublane rolls dominate the
    extra boundary traffic, which is ~0.5% of compute).  64 is the knee
    (32 regresses to 84: per-chunk fixed costs take over); chunk count is
    capped at 32 so very long reads keep the unrolled relay's compile
    time bounded."""
    return 64 * max(1, -(-R // (64 * 32)))


@functools.partial(jax.jit, static_argnames=("lane_block", "r_chunk", "interpret"))
def pairhmm_raw_pallas_cols_relay(hap, read, q, iq, dq, gcp, haplen, rslen,
                                  *, lane_block: int = LANE_BLOCK,
                                  r_chunk: int | None = None,
                                  interpret: bool = False):
    """float32 PairHMM forward for ANY (H, R): column sweep with the hap
    axis streamed (as in ``pairhmm_raw_pallas_cols``) AND the read axis
    relayed in ``r_chunk`` chunks with device-resident (H, P) boundary
    planes.  Removes the R <= 512 jnp cliff for long reads (PacBio/ONT);
    the whole relay is one jit program with no host fetch between chunks,
    so it shards/pods like any other engine.  Same contract as
    ``pairhmm_raw_pallas``; additionally, boundary-plane components under
    f32-min-normal flush at each chunk crossing, so results carry an
    absolute noise floor of ~1.2e-38 per chunk — ten decades below
    MIN_ACCEPTED, and lanes deeper than that are f64-rescued by the API
    regardless of engine."""
    ctx = __import__("gkl_tpu.context", fromlist=["pairhmm_context"]).pairhmm_context("float32")
    f = jnp.float32
    H, P = hap.shape
    R = read.shape[0]
    assert P % lane_block == 0, (P, lane_block)
    if r_chunk is None:
        r_chunk = default_r_chunk(R)

    qm = (q & 127).astype(jnp.int32)
    im = (iq & 127).astype(jnp.int32)
    dm = (dq & 127).astype(jnp.int32)
    cm = (gcp & 127).astype(jnp.int32)
    p_mm = rows_mod._m2m_arith64(im, dm)
    ph2pr_c = rows_mod._ph2pr_arith(cm)
    p_mx = rows_mod._ph2pr_arith(im)
    p_my = rows_mod._ph2pr_arith(dm)
    distm = rows_mod._ph2pr_arith(qm)
    p_gapm = f(1.0) - ph2pr_c
    p_xx = ph2pr_c
    p_yy = ph2pr_c
    dmatch = f(1.0) - distm
    dmis = distm / f(3.0)
    inity = (jnp.asarray(ctx.INITIAL_CONSTANT, f) / haplen.astype(f))[None, :]
    hap_i = hap.astype(jnp.int32)
    read_i = read.astype(jnp.int32)
    rslen2 = rslen.astype(jnp.int32)[None, :]
    haplen2 = haplen.astype(jnp.int32)[None, :]

    with jax.enable_x64(False):
        # virtual DP row 0: M = X = 0, Y = inity at every column
        bm = jnp.zeros((H, P), jnp.float32)
        bx = jnp.zeros((H, P), jnp.float32)
        by = jnp.broadcast_to(inity, (H, P)).astype(jnp.float32)
        acc = jnp.zeros((1, P), jnp.float32)
        zrow = jnp.zeros_like(inity)
        for r0 in range(0, R, r_chunk):
            rc = min(r_chunk, R - r0)
            sl = slice(r0, r0 + rc)
            # per-chunk scalars ride as runtime inputs (rslen - r0 and the
            # column-0 Y seed), so every interior chunk reuses ONE compiled
            # Mosaic kernel; only a ragged tail chunk adds a second shape
            out, bm, bx, by = _cols_relay_call(
                hap_i, bm, bx, by, read_i[sl], dmatch[sl], dmis[sl],
                p_mm[sl], p_gapm[sl], p_mx[sl], p_xx[sl], p_my[sl], p_yy[sl],
                inity if r0 == 0 else zrow, rslen2 - jnp.int32(r0), haplen2,
                lane_block=lane_block, interpret=interpret)
            acc = acc + out
    return acc[0]


@functools.partial(jax.jit, static_argnames=("lane_block", "interpret"))
def pairhmm_raw_pallas_cols(hap, read, q, iq, dq, gcp, haplen, rslen,
                            *, lane_block: int = LANE_BLOCK, interpret: bool = False):
    """float32 PairHMM forward, column-sweep (long-haplotype fast path).

    Same contract as ``pairhmm_raw_pallas``; state scales with the *read*
    bucket instead of the haplotype bucket.
    """
    ctx = __import__("gkl_tpu.context", fromlist=["pairhmm_context"]).pairhmm_context("float32")
    f = jnp.float32
    H, P = hap.shape
    R = read.shape[0]
    assert P % lane_block == 0, (P, lane_block)

    qm = (q & 127).astype(jnp.int32)
    im = (iq & 127).astype(jnp.int32)
    dm = (dq & 127).astype(jnp.int32)
    cm = (gcp & 127).astype(jnp.int32)

    # closed-form prep (see pairhmm_pallas.pairhmm_raw_pallas prep docs)
    p_mm = rows_mod._m2m_arith64(im, dm)
    ph2pr_c = rows_mod._ph2pr_arith(cm)
    p_mx = rows_mod._ph2pr_arith(im)
    p_my = rows_mod._ph2pr_arith(dm)
    distm = rows_mod._ph2pr_arith(qm)
    p_gapm = f(1.0) - ph2pr_c
    p_xx = ph2pr_c
    p_yy = ph2pr_c
    dmatch = f(1.0) - distm
    dmis = distm / f(3.0)
    inity = (jnp.asarray(ctx.INITIAL_CONSTANT, f) / haplen.astype(f))[None, :]
    hap_i = hap.astype(jnp.int32)
    read_i = read.astype(jnp.int32)
    rslen2 = rslen.astype(jnp.int32)[None, :]
    haplen2 = haplen.astype(jnp.int32)[None, :]

    # haplotype chunk streamed over the second (sequential) grid axis:
    # largest pow2 <= 512 dividing H (sublane rule: multiple of 8, or == H)
    CH = H
    for c in (512, 256, 128, 64, 32, 16, 8):
        if H % c == 0:
            CH = c
            break
    grid = (P // lane_block, H // CH)

    def lane_spec(length):
        return pl.BlockSpec(
            (length, lane_block),
            lambda i, j: (jnp.int32(0), i),
            memory_space=pltpu.VMEM,
        )

    hap_spec = pl.BlockSpec(
        (CH, lane_block),
        lambda i, j: (j, i),
        memory_space=pltpu.VMEM,
    )

    in_specs = [
        hap_spec,      # hap (streamed chunks)
        lane_spec(R),  # read
        lane_spec(R),  # dmatch
        lane_spec(R),  # dmis
        lane_spec(R),  # pmm
        lane_spec(R),  # pgapm
        lane_spec(R),  # pmx
        lane_spec(R),  # pxx
        lane_spec(R),  # pmy
        lane_spec(R),  # pyy
        lane_spec(1),  # inity
        lane_spec(1),  # rslen
        lane_spec(1),  # haplen
    ]

    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=lane_spec(1),
            out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, lane_block), jnp.float32)] * 3,
            cost_estimate=pl.CostEstimate(
                flops=int(40 * H * R) * P,
                bytes_accessed=int((H + 10 * R) * 4) * P,
                transcendentals=0,
            ),
            interpret=interpret,
        )(hap_i, read_i, dmatch, dmis, p_mm, p_gapm, p_mx, p_xx, p_my, p_yy,
          inity, rslen2, haplen2)
    return out[0]

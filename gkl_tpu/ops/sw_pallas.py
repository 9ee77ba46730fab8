"""Smith-Waterman score+backtrack kernel in Pallas (TPU fast path).

Same recurrence and backtrack codes as ``ops/sw.py`` (semantics from
``PairWiseSW.h:27-263``), with the DP state in VMEM scratch across the
grid and a ``fori_loop`` over reference rows:

* H/F carry as (M, LANE_BLOCK) int32 tiles; the within-row E recurrence
  ``E[j] = max(g[j], E[j-1] + w)`` has a CONSTANT increment ``w =
  max(open, extend)``, so the tropical Hillis-Steele scan is one roll, one
  scalar add and one max per level;
* backtrack row pairs nibble-pack in VMEM before the HBM store (rows
  2k/2k+1 in the low/high nibble), halving the O(N*M) write that dominated
  the call; only the lane-major transpose runs as an XLA pass afterwards;
* the reference axis streams in CHUNK-row blocks over a second
  (sequential) grid dimension: the H/F state persists in scratch across
  grid steps, while each step's backtrack block spills to HBM.  VMEM
  therefore bounds only M (the alternate length, <= ~2048) and the chunk,
  NOT N*M — device coverage extends to the full 2048x2048 bucket range
  instead of ~384x384.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw import DELETE, DELETE_EXT, INSERT, INSERT_EXT, LOW_INIT_VALUE, MATRIX_MIN_CUTOFF

LANE_BLOCK = 128
# scan-mask floor: far below any real score, far above i32 overflow when
# level offsets (<= N*|w|) are added
_SCAN_LOW = -(2**30)


def _pick_chunk(N: int, M: int, lane_block: int, mrelay: bool = False) -> int:
    """Largest reference-chunk size whose TOTAL VMEM footprint fits.

    Joint accounting calibrated against measured scoped-vmem failures on
    v5e (16 MB limit): per (M, lane_block) cell the kernel holds ~9 B of
    scratch (H/F i32 + packed-bt u8) plus ~24 B of multi-buffered
    alt/lastrow tiles, and each streamed chunk block (bt nibbles) is
    ~3x-buffered by the pipeline; ~2 MB of slack covers Mosaic temporaries.
    Measured: (N=2048, M=2048) passes at CH=8 and OOMs at CH=16, which this
    model reproduces.  CH must divide N and (lastcol block sublane rule)
    be a multiple of 8 — or equal N, which Mosaic exempts.  The alt-chunk
    relay adds four streamed (CH, lane_block) i32 edge planes."""
    cell = M * lane_block
    budget = 14 * (1 << 20) - 33 * cell
    edge = 4 * 3 * lane_block * 4 if mrelay else 0
    best = 0
    for ch in range(8, N + 1, 8):
        if N % ch == 0 and 3 * (ch // 2) * cell + ch * edge <= budget:
            best = max(best, ch)
    if best == 0:
        best = N if N % 8 else 8  # CH == N escapes the %8 block rule
    return best


def _kernel(indel_boundary, relay, ref_ref, alt_ref, reflen_ref, altlen_ref,
            wm_ref, wx_ref, wo_ref, we_ref, *rest):
    if relay:
        (h0_ref, f0_ref, lr0_ref, rowbase_ref,
         bt_ref, lastrow_ref, lastcol_ref, hout_ref, fout_ref,
         h_ref, f_ref, prev_bt_ref) = rest
    else:
        bt_ref, lastrow_ref, lastcol_ref, h_ref, f_ref, prev_bt_ref = rest
    M, LP = h_ref.shape
    CH = ref_ref.shape[0]  # rows in this grid step's chunk
    jgrid = pl.program_id(1)
    i32 = jnp.int32

    col_iota = jax.lax.broadcasted_iota(i32, (M, LP), 0)
    alt_i = alt_ref[:]
    reflen = reflen_ref[:]  # (1, LP)
    altlen = altlen_ref[:]
    w_match = wm_ref[:]  # (1, LP)
    w_mismatch = wx_ref[:]
    w_open = wo_ref[:]
    w_extend = we_ref[:]
    w = jnp.maximum(w_open, w_extend)
    low = i32(LOW_INIT_VALUE)
    cutoff = i32(MATRIX_MIN_CUTOFF)
    scan_low = i32(_SCAN_LOW)

    lastcol_onehot = col_iota + 1 == altlen  # (M, LP) bool

    # E[0] boundary term: max(T, low + (j+1)*w), hoisted (w is loop-invariant)
    low_s = low + (col_iota + 1) * w

    levels = []
    k = 1
    while k < M:
        levels.append(k)
        k <<= 1

    def shift1(v, first):
        return jnp.where(col_iota == 0, first, pltpu.roll(v, jnp.int32(1), 0))

    @pl.when(jgrid == 0)
    def _init():
        if relay:
            # segment relay: resume from the carried H/F/lastrow state
            h_ref[:] = h0_ref[:]
            f_ref[:] = f0_ref[:]
            lastrow_ref[:] = lr0_ref[:]
        else:
            if indel_boundary:
                h0 = w_open + col_iota * w_extend  # H(0, j), j = col_iota + 1
            else:
                h0 = jnp.zeros((M, LP), i32)
            h_ref[:] = h0
            f_ref[:] = jnp.full((M, LP), low, i32)
            lastrow_ref[:] = jnp.zeros((M, LP), i32)

    def body(lrow, r, parity):
        # lrow: chunk-local 0-based row; r: global 1-based row (traced)
        rc = ref_ref[pl.ds(lrow, 1), :]  # (1, LP)
        if indel_boundary:
            b_i = w_open + (r - 1) * w_extend  # (1, LP); H(i, 0)
            b_prev = jnp.where(r - 1 >= 1, w_open + (r - 2) * w_extend, 0)
        else:
            b_i = jnp.zeros((1, LP), i32)
            b_prev = jnp.zeros((1, LP), i32)

        h_prev = h_ref[:]
        f_prev = f_ref[:]

        sbt = jnp.where(alt_i == rc, w_match, w_mismatch)
        h_diag = shift1(h_prev, b_prev)
        hc = jnp.maximum(h_diag + sbt, cutoff)

        open_v = h_prev + w_open
        ext_v = f_prev + w_extend
        f_new = jnp.maximum(open_v, ext_v)
        dext = open_v <= ext_v

        hf = jnp.maximum(hc, f_new)
        g = w_open + shift1(hf, b_i)

        # E[j] = max(max_k(g[j-k] + k*w), low + (j+1)*w): constant-increment
        # tropical scan — roll, scalar add, max per level
        T = g
        for k in levels:
            T_sh = jnp.where(
                col_iota >= k,
                pltpu.roll(T, jnp.int32(k), 0) + k * w,
                scan_low,
            )
            T = jnp.maximum(T, T_sh)
        e_new = jnp.maximum(T, low_s)

        e_gt = e_new > hc
        h_after_e = jnp.maximum(hc, e_new)
        f_gt = f_new > h_after_e
        h_new = jnp.maximum(h_after_e, f_new)

        iext = shift1(h_new, b_i) + w_open <= shift1(e_new, low) + w_extend

        bt = (
            jnp.where(f_gt, DELETE, jnp.where(e_gt, INSERT, 0))
            | jnp.where(iext, INSERT_EXT, 0)
            | jnp.where(dext, DELETE_EXT, 0)
        )  # i32; Mosaic cannot shift i8 vectors, so nibble math stays i32

        # row-pair nibble packing in VMEM: halves the backtrack HBM write
        # and removes the separate XLA pack pass (~40% of the old call).
        # Under the 4-row unrolled loop the parity is static per slot.
        if parity == 1:
            prev_bt_ref[:] = bt.astype(jnp.uint8)
        else:
            bt_ref[pl.ds((lrow - 1) // 2, 1), :, :] = (
                prev_bt_ref[:].astype(jnp.int32) | (bt << 4)
            ).astype(jnp.uint8)[None]

        lc = jnp.max(jnp.where(lastcol_onehot, h_new, scan_low), axis=0, keepdims=True)
        lastcol_ref[pl.ds(lrow, 1), :] = lc
        lastrow_ref[:] = jnp.where(r == reflen, h_new, lastrow_ref[:])

        h_ref[:] = h_new
        f_ref[:] = f_new

    # 4-row unrolled groups pipeline better AND make the pack parity static
    # (no predicated regions); chunk sizes are multiples of 4
    base = jgrid * jnp.int32(CH)
    if relay:
        base = base + rowbase_ref[0, 0]  # global row offset of this segment

    def group(c, carry):
        for k in range(4):
            lrow = c * 4 + jnp.int32(k)
            body(lrow, base + lrow + 1, parity=(k + 1) % 2)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(CH // 4), group, jnp.int32(0))

    if relay:
        # carried state out (same block every grid step; last write wins)
        hout_ref[:] = h_ref[:]
        fout_ref[:] = f_ref[:]


def _kernel_m(indel_boundary, ref_ref, alt_ref, reflen_ref, altlen_ref,
              wm_ref, wx_ref, wo_ref, we_ref, mbase_ref, pedge0_ref,
              hedge_in_ref, eedge_in_ref,
              bt_ref, lastrow_ref, lastcol_ref, hedge_out_ref, eedge_out_ref,
              h_ref, f_ref, e_ref, prev_bt_ref, pedge_ref):
    """Alt-axis chunk of the SW DP: same exact int32 recurrence as
    ``_kernel`` over a [m0+1, m0+MCH] column slab, with the previous
    slab's right-edge values carried as (N, P) H/E planes in HBM
    (streamed per ref chunk like the backtrack) — the SW analogue of the
    PairHMM read relay.  Shallow slabs are the point: the within-row E
    scan costs log2(slab) roll levels and the rolls themselves are far
    cheaper on short tiles (v5e, 2048x512x128: 38 Gcells/s tall vs 58+ at
    M=128).  The chain is exact integer arithmetic, so slab results are
    bit-identical to the tall kernel."""
    M, LP = h_ref.shape
    CH = ref_ref.shape[0]
    jgrid = pl.program_id(1)
    i32 = jnp.int32

    col_iota = jax.lax.broadcasted_iota(i32, (M, LP), 0)
    alt_i = alt_ref[:]
    reflen = reflen_ref[:]
    altlen = altlen_ref[:]
    mbase = mbase_ref[:]  # (1, LP) global column offset of this slab
    w_match = wm_ref[:]
    w_mismatch = wx_ref[:]
    w_open = wo_ref[:]
    w_extend = we_ref[:]
    w = jnp.maximum(w_open, w_extend)
    low = i32(LOW_INIT_VALUE)
    cutoff = i32(MATRIX_MIN_CUTOFF)
    scan_low = i32(_SCAN_LOW)

    lastcol_onehot = col_iota + 1 + mbase == altlen

    levels = []
    k = 1
    while k < M:
        levels.append(k)
        k <<= 1

    def shift1(v, first):
        return jnp.where(col_iota == 0, first, pltpu.roll(v, jnp.int32(1), 0))

    @pl.when(jgrid == 0)
    def _init():
        if indel_boundary:
            # H(0, j) = open + (j-1)*extend at global j = mbase+col_iota+1
            h_ref[:] = w_open + (mbase + col_iota) * w_extend
        else:
            h_ref[:] = jnp.zeros((M, LP), i32)
        f_ref[:] = jnp.full((M, LP), low, i32)
        lastrow_ref[:] = jnp.zeros((M, LP), i32)
        pedge_ref[:] = pedge0_ref[:]  # H(0, m0) — the r=1 diagonal seed

    def body(lrow, r, parity):
        rc = ref_ref[pl.ds(lrow, 1), :]   # (1, LP)
        b_prev = pedge_ref[:]             # H(r-1, m0) from the left slab
        b_i = hedge_in_ref[pl.ds(lrow, 1), :]    # H(r, m0)
        e_seed = eedge_in_ref[pl.ds(lrow, 1), :]  # E(r, m0)

        h_prev = h_ref[:]
        f_prev = f_ref[:]

        sbt = jnp.where(alt_i == rc, w_match, w_mismatch)
        h_diag = shift1(h_prev, b_prev)
        hc = jnp.maximum(h_diag + sbt, cutoff)

        open_v = h_prev + w_open
        ext_v = f_prev + w_extend
        f_new = jnp.maximum(open_v, ext_v)
        dext = open_v <= ext_v

        hf = jnp.maximum(hc, f_new)
        g = w_open + shift1(hf, b_i)

        T = g
        for k in levels:
            T_sh = jnp.where(
                col_iota >= k,
                pltpu.roll(T, jnp.int32(k), 0) + k * w,
                scan_low,
            )
            T = jnp.maximum(T, T_sh)
        # the left slab's E carries in as E(r, m0) + (jl+1)*w — for slab 0
        # the driver seeds E = LOW_INIT_VALUE, reproducing the tall
        # kernel's low_s floor exactly
        e_new = jnp.maximum(T, e_seed + (col_iota + 1) * w)

        e_gt = e_new > hc
        h_after_e = jnp.maximum(hc, e_new)
        f_gt = f_new > h_after_e
        h_new = jnp.maximum(h_after_e, f_new)

        iext = shift1(h_new, b_i) + w_open <= shift1(e_new, e_seed) + w_extend

        bt = (
            jnp.where(f_gt, DELETE, jnp.where(e_gt, INSERT, 0))
            | jnp.where(iext, INSERT_EXT, 0)
            | jnp.where(dext, DELETE_EXT, 0)
        )

        if parity == 1:
            prev_bt_ref[:] = bt.astype(jnp.uint8)
        else:
            bt_ref[pl.ds((lrow - 1) // 2, 1), :, :] = (
                prev_bt_ref[:].astype(jnp.int32) | (bt << 4)
            ).astype(jnp.uint8)[None]

        lc = jnp.max(jnp.where(lastcol_onehot, h_new, scan_low), axis=0, keepdims=True)
        lastcol_ref[pl.ds(lrow, 1), :] = lc
        lastrow_ref[:] = jnp.where(r == reflen, h_new, lastrow_ref[:])

        h_ref[:] = h_new
        f_ref[:] = f_new
        e_ref[:] = e_new
        pedge_ref[:] = b_i
        # right-edge planes for the next slab (slice reads, not reductions)
        hedge_out_ref[pl.ds(lrow, 1), :] = h_ref[pl.ds(M - 1, 1), :]
        eedge_out_ref[pl.ds(lrow, 1), :] = e_ref[pl.ds(M - 1, 1), :]

    base = jgrid * jnp.int32(CH)

    def group(c, carry):
        for k in range(4):
            lrow = c * 4 + jnp.int32(k)
            body(lrow, base + lrow + 1, parity=(k + 1) % 2)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(CH // 4), group, jnp.int32(0))


SW_M_SLAB = 64        # slab height: 64 measures fastest (64.9 G vs 61.0 at
                      # 128 on the 2048x512x128 bucket)
SW_M_RELAY_MIN = 256  # tall-kernel cliff: use slabs only past this


def _sw_mrelay_call(ref_i, alt_sl, reflen2, altlen2, wm, wx, wo, we,
                    mbase, pedge0, hedge, eedge, *, indel_boundary,
                    lane_block, interpret):
    """One alt-slab pallas_call; the (mbase, pedge0) scalars ride as
    runtime inputs so every slab reuses ONE compiled kernel."""
    N, P = ref_i.shape
    M = alt_sl.shape[0]
    i32 = jnp.int32
    CH = _pick_chunk(N, M, lane_block, mrelay=True)
    grid = (P // lane_block, N // CH)
    ls = functools.partial(_lane_spec, lane_block)
    cs = functools.partial(_chunk_spec, lane_block)
    in_specs = _sw_base_specs(CH, M, lane_block) + [
        ls(1),    # mbase
        ls(1),    # pedge0
        cs(CH),   # hedge in
        cs(CH),   # eedge in
    ]
    out_specs = [
        cs(CH // 2, M),  # bt
        ls(M),           # lastrow
        cs(CH),          # lastcol (this slab's altlen columns only)
        cs(CH),          # hedge out
        cs(CH),          # eedge out
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((N // 2, M, P), jnp.uint8),
        jax.ShapeDtypeStruct((M, P), i32),
        jax.ShapeDtypeStruct((N, P), i32),
        jax.ShapeDtypeStruct((N, P), i32),
        jax.ShapeDtypeStruct((N, P), i32),
    ]
    return pl.pallas_call(
        functools.partial(_kernel_m, indel_boundary),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((M, lane_block), i32)] * 3
        + [pltpu.VMEM((M, lane_block), jnp.uint8)]
        + [pltpu.VMEM((1, lane_block), i32)],
        cost_estimate=_sw_cost(N, M, P),
        interpret=interpret,
    )(ref_i, alt_sl, reflen2, altlen2, wm, wx, wo, we, mbase, pedge0,
      hedge, eedge)


def _pad_m(M: int) -> int:
    """Alt-axis padding: beyond 512 rows, non-power-of-two sublane counts
    cost Mosaic several extra MB of roll temporaries (measured: M=1792 OOMs
    where M=2048 fits), so the kernel pads M up to the next power of two."""
    if M <= 512:
        return M
    p = 1024
    while p < M:
        p <<= 1
    return p


def sw_pallas_fits(N: int, M: int, lane_block: int = LANE_BLOCK) -> bool:
    """True when the streamed kernel's VMEM model (see _pick_chunk) admits
    the bucket at its minimum chunk (CH=8): 45 B per (padded-M, lane_block)
    cell against the 16 MB scoped-vmem limit with 2 MB slack.  M=2048 at
    128 lanes passes (verified on v5e), M=4096 does not; halving lane_block
    scales the ceiling up proportionally."""
    return N % 4 == 0 and M % 2 == 0 and 45 * _pad_m(M) * lane_block <= 14 * (1 << 20)


@functools.partial(jax.jit, static_argnames=("indel_boundary", "lane_block", "interpret"))
def sw_forward_pallas(ref, alt, reflen, altlen, match, mismatch, gap_open,
                      gap_extend, *, indel_boundary: bool,
                      lane_block: int = LANE_BLOCK, interpret: bool = False):
    """Same contract as ``sw.sw_forward(..., pack_bt=True)``: returns
    (bt row-pair-packed (P, N//2, M') uint8 — rows 2k/2k+1 in the low/high
    nibble — lastrow (M', P) int32, lastcol (N, P) int32), where M' is M
    padded to a power of two beyond 512 (callers must use the returned
    stride, not the input M).
    """
    N, P = ref.shape
    M = alt.shape[0]
    assert N % 4 == 0 and P % lane_block == 0, (N, P)
    i32 = jnp.int32

    # measured crossover (v5e): the tall kernel holds ~50-124 Gcells/s up
    # to M=256 but falls off a cliff beyond (38 G at M=512 — roll cost
    # grows superlinearly with sublane count), where 128-row slabs with
    # carried H/E edge planes run 57-72 G; below the cliff the slab pad +
    # per-column edge stores are pure overhead (160x160: 124 -> 31 G)
    mrelay = M > SW_M_RELAY_MIN
    if mrelay:
        # alt-slab relay: pad to a slab multiple (the pow2 rule only binds
        # the in-slab scan, and slabs are pow2 already) — M=1792 no longer
        # pays for a 2048 pad
        M_pad = -(-M // SW_M_SLAB) * SW_M_SLAB
    else:
        M_pad = _pad_m(M)
    if M_pad != M:
        # padded alt rows sit beyond every lane's altlen: the column scan
        # only moves information toward higher j, and lastrow/bt reads are
        # sliced to the real m downstream, so the fill value is irrelevant
        alt = jnp.pad(alt, ((0, M_pad - M), (0, 0)), constant_values=1)
        M = M_pad

    ref_i = ref.astype(i32)
    alt_i = alt.astype(i32)
    ones = jnp.ones((1, P), i32)
    wm = ones * jnp.asarray(match, i32)
    wx = ones * jnp.asarray(mismatch, i32)
    wo = ones * jnp.asarray(gap_open, i32)
    we = ones * jnp.asarray(gap_extend, i32)
    reflen2 = reflen.astype(i32)[None, :]
    altlen2 = altlen.astype(i32)[None, :]

    if mrelay:
        with jax.enable_x64(False):
            row_r = jnp.arange(N, dtype=i32)[:, None]  # r-1 for r = 1..N
            if indel_boundary:
                hedge = (jnp.asarray(gap_open, i32)
                         + row_r * jnp.asarray(gap_extend, i32)
                         ) * jnp.ones((1, P), i32)
            else:
                hedge = jnp.zeros((N, P), i32)
            eedge = jnp.full((N, P), LOW_INIT_VALUE, i32)
            bts, lastrows, lastcol = [], [], None
            for m0 in range(0, M, SW_M_SLAB):
                if m0 == 0:
                    pedge0 = jnp.zeros((1, P), i32)  # H(0, 0) = 0, both modes
                elif indel_boundary:
                    pedge0 = ones * (jnp.asarray(gap_open, i32)
                                     + (m0 - 1) * jnp.asarray(gap_extend, i32))
                else:
                    pedge0 = jnp.zeros((1, P), i32)
                bt_m, lr_m, lc_m, hedge, eedge = _sw_mrelay_call(
                    ref_i, alt_i[m0:m0 + SW_M_SLAB], reflen2, altlen2,
                    wm, wx, wo, we, ones * i32(m0), pedge0, hedge, eedge,
                    indel_boundary=indel_boundary, lane_block=lane_block,
                    interpret=interpret)
                bts.append(bt_m)
                lastrows.append(lr_m)
                # each slab reports scores only where altlen falls inside it
                lastcol = lc_m if lastcol is None else jnp.maximum(lastcol, lc_m)
            bt = jnp.concatenate(bts, axis=1)
            lastrow = jnp.concatenate(lastrows, axis=0)
        return (jnp.transpose(bt, (2, 0, 1)), lastrow,
                jnp.transpose(lastcol, (1, 0)))

    CH = _pick_chunk(N, M, lane_block)
    grid = (P // lane_block, N // CH)

    in_specs = _sw_base_specs(CH, M, lane_block)
    out_specs = [
        _chunk_spec(lane_block, CH // 2, M),  # bt (row-pair nibbles, streamed)
        _lane_spec(lane_block, M),            # lastrow
        _chunk_spec(lane_block, CH),          # lastcol (streamed)
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((N // 2, M, P), jnp.uint8),
        jax.ShapeDtypeStruct((M, P), i32),
        jax.ShapeDtypeStruct((N, P), i32),
    ]

    with jax.enable_x64(False):
        bt, lastrow, lastcol = pl.pallas_call(
            functools.partial(_kernel, indel_boundary, False),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((M, lane_block), i32)] * 2
            + [pltpu.VMEM((M, lane_block), jnp.uint8)],
            cost_estimate=_sw_cost(N, M, P),
            interpret=interpret,
        )(ref_i, alt_i, reflen2, altlen2, wm, wx, wo, we)

    # lane-major transposes (matching sw.sw_forward's row-packed
    # (P, N/2, M) / (M, P) / (P, N) output contract)
    return jnp.transpose(bt, (2, 0, 1)), lastrow, jnp.transpose(lastcol, (1, 0))


SW_RELAY_SEG = 2048



def _lane_spec(lane_block, *dims):
    """(dims..., lane_block) VMEM block replicated over the ref-chunk axis."""
    nd = len(dims)
    return pl.BlockSpec(
        (*dims, lane_block),
        lambda i, j: tuple([jnp.int32(0)] * nd) + (i,),
        memory_space=pltpu.VMEM,
    )


def _chunk_spec(lane_block, *dims):
    """Leading dim indexed by the sequential reference-chunk grid axis."""
    nd = len(dims) - 1
    return pl.BlockSpec(
        (*dims, lane_block),
        lambda i, j: (j,) + tuple([jnp.int32(0)] * nd) + (i,),
        memory_space=pltpu.VMEM,
    )


def _sw_base_specs(CH, M, lane_block):
    """The (ref, alt, reflen, altlen, wm, wx, wo, we) input-spec prefix
    shared by the single-call and relay-segment drivers — ONE definition so
    the two cannot diverge."""
    ls = functools.partial(_lane_spec, lane_block)
    cs = functools.partial(_chunk_spec, lane_block)
    return [cs(CH), ls(M), ls(1), ls(1), ls(1), ls(1), ls(1), ls(1)]


def _sw_cost(N, M, P):
    return pl.CostEstimate(flops=int(30 * N * M) * P,
                           bytes_accessed=int(N * M) * P,
                           transcendentals=0)


@functools.partial(
    jax.jit,
    static_argnames=("indel_boundary", "lane_block", "interpret"),
)
def _sw_relay_segment(ref_seg, alt, reflen, altlen, wm, wx, wo, we,
                      h0, f0, lr0, rowbase, *, indel_boundary: bool,
                      lane_block: int, interpret: bool):
    """One relay segment: same DP as ``sw_forward_pallas`` but resuming from
    carried (H, F, lastrow) state at global row offset ``rowbase``.  ONE
    compiled shape per (segment, M, lanes) covers every reference length —
    the compile-once analogue of the reference's on-demand matrix growth
    (PairWiseSW.h:454-501)."""
    SEG, P = ref_seg.shape
    M = alt.shape[0]
    i32 = jnp.int32
    CH = _pick_chunk(SEG, M, lane_block)
    grid = (P // lane_block, SEG // CH)

    ls = functools.partial(_lane_spec, lane_block)
    in_specs = _sw_base_specs(CH, M, lane_block) + [
        ls(M),    # h0
        ls(M),    # f0
        ls(M),    # lr0
        ls(1),    # rowbase (1, P) i32 broadcast
    ]
    out_specs = [
        _chunk_spec(lane_block, CH // 2, M),  # bt
        ls(M),                                # lastrow (carried)
        _chunk_spec(lane_block, CH),          # lastcol
        ls(M),                                # h out
        ls(M),                                # f out
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((SEG // 2, M, P), jnp.uint8),
        jax.ShapeDtypeStruct((M, P), i32),
        jax.ShapeDtypeStruct((SEG, P), i32),
        jax.ShapeDtypeStruct((M, P), i32),
        jax.ShapeDtypeStruct((M, P), i32),
    ]

    with jax.enable_x64(False):
        bt, lastrow, lastcol, h_out, f_out = pl.pallas_call(
            functools.partial(_kernel, indel_boundary, True),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((M, lane_block), i32)] * 2
            + [pltpu.VMEM((M, lane_block), jnp.uint8)],
            cost_estimate=_sw_cost(SEG, M, P),
            interpret=interpret,
        )(ref_seg, alt, reflen, altlen, wm, wx, wo, we, h0, f0, lr0, rowbase)
    return jnp.transpose(bt, (2, 0, 1)), lastrow, jnp.transpose(lastcol, (1, 0)), h_out, f_out


def relay_prolog(ref, alt, reflen, altlen, gap_open, gap_extend,
                 indel_boundary: bool):
    """Shared relay setup (single-device and mesh paths): pow2-pad the alt
    axis, build the virtual row-0 carried state (H/F/lastrow), and convert
    sequences to i32 (u8 VMEM tiles take (32, 128) tiling, which breaks
    the kernel's dynamic single-row reads and the == compare typing)."""
    import numpy as np_

    P = np_.asarray(ref).shape[1]
    M = np_.asarray(alt).shape[0]
    M_pad = _pad_m(M)
    alt_i = np_.asarray(alt, np_.int32)
    if M_pad != M:
        alt_i = np_.concatenate([alt_i, np_.full((M_pad - M, P), 1, np_.int32)])
    ref_i = np_.asarray(ref, np_.int32)
    col = np_.arange(M_pad, dtype=np_.int32)[:, None]
    if indel_boundary:
        h0 = (gap_open + col * gap_extend).astype(np_.int32) * np_.ones((1, P), np_.int32)
    else:
        h0 = np_.zeros((M_pad, P), np_.int32)
    f0 = np_.full((M_pad, P), LOW_INIT_VALUE, np_.int32)
    lr0 = np_.zeros((M_pad, P), np_.int32)
    reflen2 = np_.asarray(reflen, np_.int32)[None, :]
    altlen2 = np_.asarray(altlen, np_.int32)[None, :]
    return ref_i, alt_i, h0, f0, lr0, reflen2, altlen2, M_pad


def relay_drive(segment_call, ref_i, N, M, P, seg, h0, f0, lr0):
    """Shared relay loop: run ``segment_call(ref_seg, h, f, lr, rowbase)``
    per segment, carry the state, and assemble bt/lastcol on host.

    The O(N·M/2) backtrack readback is double-buffered: segment s+1 is
    dispatched (and s's device→host copies started asynchronously) BEFORE
    s's arrays are materialised, so the DMA rides under the next segment's
    compute — the TPU analogue of the reference streaming bt with
    non-temporal stores to keep the kernel unblocked
    (PairWiseSW.h:55-60,139-206).  Device/host memory stays bounded by two
    segments."""
    import numpy as np_

    bt_host = np_.empty((P, N // 2, M), np_.uint8)
    lc_host = np_.empty((P, N), np_.int32)
    h, f, lr = h0, f0, lr0
    lastrow = None
    pending = None  # (s0, bt_s, lc_s) not yet materialised
    for s0 in range(0, N, seg):
        bt_s, lastrow, lc_s, h, f = segment_call(
            ref_i[s0 : s0 + seg], h, f, lr, np_.full((1, P), s0, np_.int32))
        lr = lastrow
        for a in (bt_s, lc_s):
            start = getattr(a, "copy_to_host_async", None)
            if start is not None:
                start()
        if pending is not None:
            p0, pbt, plc = pending
            bt_host[:, p0 // 2 : (p0 + seg) // 2] = np_.asarray(pbt)
            lc_host[:, p0 : p0 + seg] = np_.asarray(plc)
        pending = (s0, bt_s, lc_s)
    p0, pbt, plc = pending
    bt_host[:, p0 // 2 : (p0 + seg) // 2] = np_.asarray(pbt)
    lc_host[:, p0 : p0 + seg] = np_.asarray(plc)
    return bt_host, np_.asarray(lastrow), lc_host


def sw_forward_pallas_relay(ref, alt, reflen, altlen, match, mismatch,
                            gap_open, gap_extend, *, indel_boundary: bool,
                            seg: int = SW_RELAY_SEG,
                            lane_block: int = LANE_BLOCK,
                            interpret: bool = False):
    """Segmented SW forward for reference lengths beyond one kernel's span.

    Same output contract as ``sw_forward_pallas`` (row-pair-packed bt with
    the pow2-padded alt stride) with ``N`` any multiple of ``seg``.
    """
    import numpy as np_

    N, P = ref.shape
    assert N % seg == 0 and P % lane_block == 0, (N, seg, P)
    ref_i, alt_i, h0, f0, lr0, reflen2, altlen2, M = relay_prolog(
        ref, alt, reflen, altlen, gap_open, gap_extend, indel_boundary)
    ones = np_.ones((1, P), np_.int32)
    wm, wx, wo, we = ones * match, ones * mismatch, ones * gap_open, ones * gap_extend

    def segment_call(ref_seg, h, f, lr, rowbase):
        return _sw_relay_segment(
            ref_seg, alt_i, reflen2, altlen2, wm, wx, wo, we, h, f, lr,
            rowbase, indel_boundary=indel_boundary, lane_block=lane_block,
            interpret=interpret,
        )

    return relay_drive(segment_call, ref_i, N, M, P, seg, h0, f0, lr0)

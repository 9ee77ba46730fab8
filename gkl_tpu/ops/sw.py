"""Affine-gap Smith-Waterman score+backtrack kernel, lane-batched for TPU.

The reference computes each pair with an anti-diagonal int32 wavefront and
streams a packed backtrack matrix (PairWiseSW.h:65-263).  The TPU mapping
scans over *ref rows* with alt columns and pairs vectorised:

* F (vertical gap) and the match term depend only on the previous row ->
  elementwise (M, P) ops.
* The within-row E recurrence ``E[j] = max(H[j-1]+open, E[j-1]+extend)``
  substitutes ``H = max(hclamp, E, F)`` to become the *tropical* affine
  recurrence ``E[j] = max(g[j], E[j-1] + max(open, extend))`` with
  ``g[j] = open + max(hclamp[j-1], F[j-1])`` — exactly equal (max-plus
  algebra), solved by an associative scan along columns.

Backtrack codes match the reference: {MATCH=0, INSERT=1, DELETE=2} plus
INSERT_EXT=4 / DELETE_EXT=8 when the gap's extension path was taken
(PairWiseSW.h:33-35,43-44,52-59).  The kernel also emits the last-row and
last-column H values needed for the strategy-dependent maximum tracking,
which (like the CIGAR walk) runs on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MATCH, INSERT, DELETE = 0, 1, 2
INSERT_EXT, DELETE_EXT = 4, 8
MATRIX_MIN_CUTOFF = -100000000
LOW_INIT_VALUE = -(2**31) // 2


def _tropical_combine(left, right):
    s1, t1 = left
    s2, t2 = right
    return s1 + s2, jnp.maximum(t1 + s2, t2)


@functools.partial(jax.jit, static_argnames=("indel_boundary", "pack_bt"))
def sw_forward(ref, alt, reflen, altlen, match, mismatch, gap_open, gap_extend, *, indel_boundary: bool, pack_bt: bool = False):
    """Score DP producing backtrack + boundary score rows.

    Args:
      ref:    (N, P) uint8 reference bases (rows / seq1).
      alt:    (M, P) uint8 alternate bases (cols / seq2).
      reflen, altlen: (P,) int32 true lengths.
      match/mismatch/gap_open/gap_extend: int32 scalars.
      indel_boundary: True for INDEL / LEADING_INDEL overhang strategies
        (boundary rows seeded with open+(k-1)*extend, PairWiseSW.h:212-221).
      pack_bt: pack two 4-bit backtrack codes per byte along the row axis
        (halves the O(N*M) device->host transfer, the same packing idea as
        the reference's 2-cells-per-int16 streaming, PairWiseSW.h:55-60).

    Returns:
      bt:      (P, N, M) uint8 backtrack codes (cell (i, j) at [p, i-1, j-1]),
               or (P, N//2, M) with codes for rows (2k, 2k+1) in the low /
               high nibble when ``pack_bt``.
      lastrow: (M, P) int32 — H(reflen[p], j) per lane.
      lastcol: (N, P) int32 — H(i, altlen[p]) per lane.
    """
    N, P = ref.shape
    M = alt.shape[0]
    if pack_bt:
        assert N % 2 == 0, "packed backtrack requires an even row bucket"
    i32 = jnp.int32
    w_match = jnp.asarray(match, i32)
    w_mismatch = jnp.asarray(mismatch, i32)
    w_open = jnp.asarray(gap_open, i32)
    w_extend = jnp.asarray(gap_extend, i32)
    w = jnp.maximum(w_open, w_extend)
    low = jnp.asarray(LOW_INIT_VALUE, i32)
    cutoff = jnp.asarray(MATRIX_MIN_CUTOFF, i32)

    alt_i = alt.astype(i32)  # (M, P)
    ref_i = ref.astype(i32)  # (N, P)

    col_ids = jnp.arange(1, M + 1, dtype=i32)[:, None]  # (M, 1)
    if indel_boundary:
        h0 = w_open + (col_ids - 1) * w_extend  # H(0, j)
    else:
        h0 = jnp.zeros((M, 1), i32)
    h_prev0 = jnp.broadcast_to(h0, (M, P))

    lastcol_onehot = (col_ids == altlen[None, :]).astype(i32)  # (M, P)

    def boundary(i):
        # H(i, 0); i may be 0
        if indel_boundary:
            return jnp.where(i >= 1, w_open + (i - 1) * w_extend, 0)
        return jnp.asarray(0, i32)

    def shift_cols(arr, first):
        return jnp.concatenate([jnp.broadcast_to(first, (1, P)).astype(arr.dtype), arr[:-1]], axis=0)

    def row_step(carry, xs):
        h_prev, f_prev, lastrow = carry
        rc, i = xs  # (P,), scalar row index (1-based)
        b_i = boundary(i)
        b_prev = boundary(i - 1)

        sbt = jnp.where(alt_i == rc[None, :], w_match, w_mismatch)  # (M, P)
        h_diag = shift_cols(h_prev, b_prev)
        hc = jnp.maximum(h_diag + sbt, cutoff)

        open_v = h_prev + w_open
        ext_v = f_prev + w_extend
        f_new = jnp.maximum(open_v, ext_v)
        dext = open_v <= ext_v

        hf = jnp.maximum(hc, f_new)
        g = w_open + shift_cols(hf, b_i)
        s = jnp.broadcast_to(w, (M, P))
        S, T = jax.lax.associative_scan(_tropical_combine, (s, g), axis=0)
        e_new = jnp.maximum(T, low + S)

        e_gt = e_new > hc
        h_after_e = jnp.maximum(hc, e_new)
        f_gt = f_new > h_after_e
        h_new = jnp.maximum(h_after_e, f_new)

        iext = shift_cols(h_new, b_i) + w_open <= shift_cols(e_new, low) + w_extend

        bt = (
            jnp.where(f_gt, DELETE, jnp.where(e_gt, INSERT, MATCH))
            | jnp.where(iext, INSERT_EXT, 0)
            | jnp.where(dext, DELETE_EXT, 0)
        ).astype(jnp.uint8)

        lastcol_i = jnp.sum(h_new * lastcol_onehot, axis=0).astype(i32)  # (P,)
        lastrow = jnp.where((i == reflen)[None, :], h_new, lastrow)
        return (h_new, f_new, lastrow), (bt, lastcol_i)

    f_prev0 = jnp.full((M, P), low, i32)
    lastrow0 = jnp.zeros((M, P), i32)
    xs = (ref_i, jnp.arange(1, N + 1, dtype=i32))
    (h_last, _, lastrow), (bt, lastcol) = jax.lax.scan(
        row_step, (h_prev0, f_prev0, lastrow0), xs
    )
    if pack_bt:
        # rows 2k / 2k+1 in the low / high nibble
        bt = bt[0::2] | (bt[1::2] << 4)  # (N//2, M, P)
    # bt: (N, M, P) -> (P, N, M) for contiguous per-lane host walks
    return jnp.transpose(bt, (2, 0, 1)), lastrow, jnp.transpose(lastcol, (1, 0))

"""Pallas TPU kernel: batched banded affine-gap global NW with traceback.

Cell semantics match the reference banded kernel exactly (see
align/oracle.py for the documented spec; reference
src/viterbifastbandmem.cpp:12-253).  TPU-first design:

  - One batch = P pairs; pairs ride the sublane axis, the band rides the
    lane axis (lanes 0..125 = diagonals dlo..dlo+125; lane 126 is a guard,
    lane 127 of each traceback row carries the Drow[LB] right-edge bit).
    The row loop is a fori_loop; each row is a handful of VPU ops over
    (P, 128) tiles.
  - B sequences are pre-shifted on the host so the row-i band window of
    every pair is bs[:, i:i+128] — one shared dynamic slice per row, no
    per-pair gathers.
  - The insert-state within-row recurrence DPI[j+1] = max(c[j], DPI[j]+e)
    is a max-plus prefix scan computed with a log2 doubling loop
    (x = max(x, shift(x, s) + s*e)); exact in float32 because the default
    gap penalties are multiples of 0.5 and |scores| << 2^23, and the -9e9
    sentinel absorbs small additions identically in both evaluation orders.
  - Traceback bits (4 bits/cell, reference encoding) stream out as an
    int32 (P, Amax+1, 128) tensor; traceback itself is a host-side pointer
    chase (negligible vs the DP).

Nucleotide scoring is computed arithmetically from letter classes
(A,C,G,T=0..3, N/other=4): match/mismatch if both < 4 else 0 — exactly the
reference nt matrix including N and soft-masked lowercase letters.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..alpha import CHAR_TO_LETTER_AMINO, CHAR_TO_LETTER_NUCLEO

NEG = np.float32(-9e9)
BAND_LANES = 126          # usable band lanes (diag offsets 0..125)
LB_LANE = 127             # Drow[LB] column bits live here in tb rows
TB_DM, TB_IM, TB_MD, TB_MI = 1, 2, 4, 8


def _letters(seq: np.ndarray, nucleo: bool) -> np.ndarray:
    table = CHAR_TO_LETTER_NUCLEO if nucleo else CHAR_TO_LETTER_AMINO
    n_val = 4 if nucleo else 20
    le = table[seq].astype(np.int32)
    le[le > n_val] = n_val
    return le


@dataclass
class PairBatch:
    a_cls: np.ndarray     # (P, Amax) int32
    bs_cls: np.ndarray    # (P, Smax) int32, pre-shifted B
    la: np.ndarray        # (P,) int32
    lb: np.ndarray        # (P,) int32
    dlo: np.ndarray       # (P,) int32
    bw: np.ndarray        # (P,) int32  band width dhi-dlo+1
    amax: int


def pack_pairs(pairs, nucleo: bool, band_radius: int,
               amax: Optional[int] = None, pad_multiple: int = 128
               ) -> PairBatch:
    """pairs: list of (a_seq_u8, b_seq_u8[, dlo, dhi]).  Band defaults to
    the main-diagonal band (ViterbiFastMainDiagMem)."""
    from ..align.oracle import band_diag_range
    P = len(pairs)
    las = np.zeros(P, dtype=np.int32)
    lbs = np.zeros(P, dtype=np.int32)
    dlos = np.zeros(P, dtype=np.int32)
    bws = np.zeros(P, dtype=np.int32)
    items = []
    for p, pair in enumerate(pairs):
        a, b = pair[0], pair[1]
        la, lb = len(a), len(b)
        if len(pair) >= 4:
            dlo, dhi = pair[2], pair[3]
        else:
            dlo, dhi = band_diag_range(la, lb, band_radius)
        bw = dhi - dlo + 1
        if bw > BAND_LANES:
            raise ValueError(f"band width {bw} exceeds {BAND_LANES} lanes")
        las[p], lbs[p], dlos[p], bws[p] = la, lb, dlo, bw
        items.append((a, b))
    max_la = int(las.max())
    if amax is None:
        amax = ((max_la + pad_multiple - 1) // pad_multiple) * pad_multiple
    assert amax >= max_la
    smax = amax + 128
    a_cls = np.full((P, amax), 4, dtype=np.int32)
    bs_cls = np.full((P, smax), 4, dtype=np.int32)
    for p, (a, b) in enumerate(items):
        la, lb, dlo = int(las[p]), int(lbs[p]), int(dlos[p])
        a_cls[p, :la] = _letters(a, nucleo)
        # storage index m holds b[j] with m = j + (la - dlo); the row-i
        # window [i, i+128) then covers j = dlo + i - la + [0, 128)
        off = la - dlo
        bl = _letters(b, nucleo)
        lo = max(0, off)
        hi = min(off + lb, smax)
        if hi > lo:
            bs_cls[p, lo:hi] = bl[lo - off:hi - off]
    return PairBatch(a_cls=a_cls, bs_cls=bs_cls, la=las, lb=lbs,
                     dlo=dlos, bw=bws, amax=amax)


# ---------------------------------------------------------------------------

def _make_kernel(amax: int, pb: int, match: float, mismatch: float,
                 with_traceback: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES = 128
    f32 = jnp.float32

    def kernel(*refs):
        if with_traceback:
            (a_ref, bs_ref, la_ref, lb_ref, dlo_ref, bw_ref, gp_ref,
             tb_ref, tblast_ref, finals_ref) = refs
        else:
            (a_ref, bs_ref, la_ref, lb_ref, dlo_ref, bw_ref, gp_ref,
             finals_ref) = refs
        lane = jax.lax.broadcasted_iota(jnp.int32, (pb, LANES), 1)
        la = la_ref[:, 0:1]
        lb = lb_ref[:, 0:1]
        dlo = dlo_ref[:, 0:1]
        bw = bw_ref[:, 0:1]
        g_open_a = gp_ref[0, 0]
        g_open_b = gp_ref[0, 1]
        g_ext_a = gp_ref[0, 2]
        g_ext_b = gp_ref[0, 3]
        g_l_open_a = gp_ref[0, 4]
        g_l_open_b = gp_ref[0, 5]
        g_r_open_a = gp_ref[0, 6]
        g_r_open_b = gp_ref[0, 7]
        g_l_ext_a = gp_ref[0, 8]
        g_l_ext_b = gp_ref[0, 9]
        g_r_ext_a = gp_ref[0, 10]
        g_r_ext_b = gp_ref[0, 11]

        neg = jnp.full((pb, LANES), NEG, dtype=f32)

        def shift_r(x, s, fill):
            y = pltpu.roll(x, s, 1)
            return jnp.where(lane < s, fill, y)

        def iscan(c, ext):
            """entering[k] = max_{t<=k-1}(c[t] + (k-1-t)*ext); lane0=NEG."""
            x = shift_r(c, 1, NEG)
            s = 1
            while s < LANES:
                x = jnp.maximum(x, shift_r(x, s, NEG) + f32(s) * ext)
                s *= 2
            return x

        def row_body(i, carry, a_chunk, bs_chunk0, bs_chunk1, r):
            m_in, d_in, d_lb, fin_m, fin_d, fin_i, tblast_bits = carry
            active = i < la
            j = dlo + lane + i - la
            valid = (j >= 0) & (j < lb) & (lane < bw) & active

            # a_i: extract lane r of the chunk; window bs[i:i+128] stitched
            # from the two aligned chunks with a dynamic rotate
            aw = jnp.sum(jnp.where(lane == r, a_chunk, 0), axis=1,
                         keepdims=True)
            roll0 = pltpu.roll(bs_chunk0, LANES - r, 1)
            roll1 = pltpu.roll(bs_chunk1, LANES - r, 1)
            bw_win = jnp.where(lane < LANES - r, roll0, roll1)
            sub = jnp.where((aw < 4) & (bw_win < 4),
                            jnp.where(aw == bw_win, f32(match),
                                      f32(mismatch)),
                            f32(0))

            open_a = jnp.where(i == 0, g_l_open_a, g_open_a)
            ext_a = jnp.where(i == 0, g_l_ext_a, g_ext_a)
            open_b = jnp.where(j == 0, g_l_open_b, g_open_b)
            ext_b = jnp.where(j == 0, g_l_ext_b, g_ext_b)

            # INSERT entering values DPI[i][j]
            c = m_in + open_a
            i_before = iscan(c, ext_a)

            # MATCH (priority M >= D >= I)
            xm = m_in
            bits = jnp.zeros((pb, LANES), dtype=jnp.int32)
            take_d = d_in > xm
            xm = jnp.where(take_d, d_in, xm)
            bits = jnp.where(take_d, TB_DM, bits)
            take_i = i_before > xm
            xm = jnp.where(take_i, i_before, xm)
            bits = jnp.where(take_i, TB_IM, bits)
            m_out = jnp.where(valid, xm + sub, neg)

            # DELETE (>= favours open)
            md = m_in + open_b
            de = d_in + ext_b
            take_open = md >= de
            d_out = jnp.where(valid, jnp.where(take_open, md, de), neg)
            bits = bits + jnp.where(valid & take_open, TB_MD, 0)

            # INSERT bit (>= favours open)
            take_iopen = c >= (i_before + ext_a)
            bits = bits + jnp.where(valid & take_iopen, TB_MI, 0)

            # Drow[LB] right-edge column
            k_lb = la + lb - dlo - i
            is_end = lane == k_lb
            m_end = jnp.max(jnp.where(is_end, m_in, neg), axis=1,
                            keepdims=True)
            d_lb_ext = d_lb + g_r_ext_b
            md_lb = m_end + g_r_open_b
            lb_open = md_lb >= d_lb_ext
            d_lb_new = jnp.where(active,
                                 jnp.where(lb_open, md_lb, d_lb_ext), d_lb)
            lb_bit = jnp.where(active & lb_open, TB_MD, 0)

            if with_traceback:
                row_bits = jnp.where(lane == LB_LANE, lb_bit, bits)
                row_bits = jnp.where(active, row_bits, 0)
                tb_ref[:, pl.ds(i, 1), :] = row_bits.reshape(pb, 1, LANES)
            else:
                row_bits = None

            # final DPI row (meaningful when i == la-1): scan cells k with
            # j = dlo-1+k; mi(k) = DPM[LA][dlo-1+k] + ROpenA = c2[k-1],
            # mi(0) = NEG (clobbered Mrow[startj-1]); strict > (ext wins).
            is_last = i == (la - 1)
            c2 = m_out + g_r_open_a
            mi_cell = shift_r(c2, 1, NEG)
            i1_entering = iscan(mi_cell, g_r_ext_a)
            i1_ext = i1_entering + g_r_ext_a
            take_last = mi_cell > i1_ext
            i1_after = jnp.maximum(mi_cell, i1_ext)
            j2 = dlo + lane - 1
            startj2 = jnp.maximum(dlo - 1, 0)
            valid2 = (j2 >= startj2) & (j2 < lb) & (lane < BAND_LANES)
            last_bits = jnp.where(valid2 & take_last, TB_MI, 0)
            tblast_bits = jnp.where(is_last, last_bits, tblast_bits)

            k_last = lb - dlo
            i1_fin = jnp.max(jnp.where(lane == k_last, i1_after, neg),
                             axis=1, keepdims=True)
            fm = jnp.max(jnp.where(lane == k_last, m_out, neg), axis=1,
                         keepdims=True)
            fin_m = jnp.where(is_last, fm, fin_m)
            fin_d = jnp.where(is_last, d_lb_new, fin_d)
            fin_i = jnp.where(is_last, i1_fin, fin_i)

            # next-row state: D shifts left one lane (roll by LANES-1 wraps
            # lane0 into lane LANES-1, which we overwrite with NEG)
            d_next = pltpu.roll(d_out, LANES - 1, 1)
            d_next = jnp.where(lane == LANES - 1, NEG, d_next)
            m_next = jnp.where(active, m_out, m_in)
            d_next = jnp.where(active, d_next, d_in)
            return (m_next, d_next, d_lb_new, fin_m, fin_d, fin_i,
                    tblast_bits)

        j0 = dlo + lane - la
        m0 = jnp.where(j0 == 0, f32(0), neg)
        d0 = neg
        d_lb0 = jnp.full((pb, 1), NEG, dtype=f32)
        fin0 = jnp.full((pb, 1), NEG, dtype=f32)
        tbl0 = jnp.zeros((pb, LANES), dtype=jnp.int32)

        def chunk_body(c, carry):
            base = c * LANES
            a_chunk = a_ref[:, pl.ds(base, LANES)]
            bs_chunk0 = bs_ref[:, pl.ds(base, LANES)]
            bs_chunk1 = bs_ref[:, pl.ds(base + LANES, LANES)]

            def inner(r, cr):
                return row_body(base + r, cr, a_chunk, bs_chunk0,
                                bs_chunk1, r)
            return jax.lax.fori_loop(0, LANES, inner, carry)

        carry = jax.lax.fori_loop(
            0, amax // LANES, chunk_body,
            (m0, d0, d_lb0, fin0, fin0, fin0, tbl0))
        _m, _d, _dlb, fin_m, fin_d, fin_i, tblast_bits = carry
        if with_traceback:
            tblast_ref[:, :] = tblast_bits
        finals_ref[:, :] = jnp.concatenate(
            [fin_m, fin_d, fin_i,
             jnp.full((pb, LANES - 3), NEG, dtype=f32)], axis=1)

    return kernel


@functools.lru_cache(maxsize=64)
def _compiled(amax: int, pb: int, match: float, mismatch: float,
              interpret: bool, with_traceback: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    kernel = _make_kernel(amax, pb, match, mismatch, with_traceback)
    smax = amax + 128

    def run(a_cls, bs_cls, la, lb, dlo, bw, gp):
        P = a_cls.shape[0]
        grid = (P // pb,)
        in_specs = [
            pl.BlockSpec((pb, amax), lambda g: (g, 0)),
            pl.BlockSpec((pb, smax), lambda g: (g, 0)),
            pl.BlockSpec((pb, 1), lambda g: (g, 0)),
            pl.BlockSpec((pb, 1), lambda g: (g, 0)),
            pl.BlockSpec((pb, 1), lambda g: (g, 0)),
            pl.BlockSpec((pb, 1), lambda g: (g, 0)),
            pl.BlockSpec((1, 16), lambda g: (0, 0)),
        ]
        if with_traceback:
            out_shape = (
                jax.ShapeDtypeStruct((P, amax + 1, 128), jnp.int32),
                jax.ShapeDtypeStruct((P, 128), jnp.int32),
                jax.ShapeDtypeStruct((P, 128), jnp.float32),
            )
            out_specs = (
                pl.BlockSpec((pb, amax + 1, 128), lambda g: (g, 0, 0)),
                pl.BlockSpec((pb, 128), lambda g: (g, 0)),
                pl.BlockSpec((pb, 128), lambda g: (g, 0)),
            )
        else:
            out_shape = jax.ShapeDtypeStruct((P, 128), jnp.float32)
            out_specs = pl.BlockSpec((pb, 128), lambda g: (g, 0))
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )(a_cls, bs_cls, la, lb, dlo, bw, gp)

    return jax.jit(run)


class BandedNWDevice:
    """Batched device banded NW for nucleotide pairs."""

    def __init__(self, ap, pb: int = 8, interpret: Optional[bool] = None):
        import jax
        self.ap = ap
        self.pb = pb
        self.match = float(ap.subst_mx[ord("A"), ord("A")])
        self.mismatch = float(ap.subst_mx[ord("A"), ord("C")])
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self.interpret = interpret
        gp = np.zeros((1, 16), dtype=np.float32)
        gp[0, :12] = [ap.open_a, ap.open_b, ap.ext_a, ap.ext_b,
                      ap.l_open_a, ap.l_open_b, ap.r_open_a, ap.r_open_b,
                      ap.l_ext_a, ap.l_ext_b, ap.r_ext_a, ap.r_ext_b]
        self.gp = gp

    def _pad(self, batch: PairBatch):
        P = batch.a_cls.shape[0]
        pad = (-P) % self.pb
        if not pad:
            return (batch.a_cls, batch.bs_cls, batch.la, batch.lb,
                    batch.dlo, batch.bw, P)

        def padp(x, fill):
            return np.concatenate(
                [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
        return (padp(batch.a_cls, 4), padp(batch.bs_cls, 4),
                padp(batch.la, 1), padp(batch.lb, 1), padp(batch.dlo, 1),
                padp(batch.bw, 1), P)

    def run_batch(self, batch: PairBatch, with_traceback: bool = True):
        import jax.numpy as jnp
        a_cls, bs_cls, la, lb, dlo, bw, P = self._pad(batch)
        fn = _compiled(batch.amax, self.pb, self.match, self.mismatch,
                       self.interpret, with_traceback)
        args = (jnp.asarray(a_cls), jnp.asarray(bs_cls),
                jnp.asarray(la.reshape(-1, 1)), jnp.asarray(lb.reshape(-1, 1)),
                jnp.asarray(dlo.reshape(-1, 1)), jnp.asarray(bw.reshape(-1, 1)),
                jnp.asarray(self.gp))
        if with_traceback:
            tb, tblast, finals = fn(*args)
            tb = np.asarray(tb)[:P]
            tblast = np.asarray(tblast)[:P]
        else:
            finals = fn(*args)
            tb = tblast = None
        finals = np.asarray(finals)[:P, :3]
        scores = finals[:, 0].copy()
        states = np.full(P, "M", dtype="U1")
        d_better = finals[:, 1] > scores
        scores[d_better] = finals[d_better, 1]
        states[d_better] = "D"
        i_better = finals[:, 2] > scores
        scores[i_better] = finals[i_better, 2]
        states[i_better] = "I"
        return scores, states, tb, tblast

    def traceback(self, batch: PairBatch, states, tb, tblast):
        paths = []
        for p in range(len(batch.la)):
            paths.append(_traceback_one(
                int(batch.la[p]), int(batch.lb[p]), int(batch.dlo[p]),
                states[p], tb[p], tblast[p]))
        return paths

    def align(self, pairs, band_radius: int, nucleo: bool = True):
        batch = pack_pairs(pairs, nucleo, band_radius)
        scores, states, tb, tblast = self.run_batch(batch)
        paths = self.traceback(batch, states, tb, tblast)
        return scores, paths


def _traceback_one(la: int, lb: int, dlo: int, state: str,
                   tb: np.ndarray, tblast: np.ndarray) -> str:
    """TraceBackBitMem over the lane-encoded bit tensor."""
    def bits(i, j):
        if i == la:
            k = j - dlo + 1
            if 0 <= k < BAND_LANES:
                return int(tblast[k])
            return 0
        if j == lb:
            return int(tb[i, LB_LANE])
        k = j - (dlo + i - la)
        if k == -1:
            return TB_IM  # reference's out-of-band marker TB[i][startj-1]
        if 0 <= k < BAND_LANES:
            return int(tb[i, k])
        return 0

    i, j = la, lb
    out = []
    while not (i == 0 and j == 0):
        out.append(state)
        if state == "M":
            assert i > 0 and j > 0, "device traceback left matrix in M"
            t = bits(i - 1, j - 1)
            state = "D" if (t & TB_DM) else ("I" if (t & TB_IM) else "M")
            i -= 1
            j -= 1
        elif state == "D":
            assert i > 0
            t = bits(i - 1, j)
            state = "M" if (t & TB_MD) else "D"
            i -= 1
        else:
            assert j > 0
            t = bits(i, j - 1)
            state = "M" if (t & TB_MI) else "I"
            j -= 1
    return "".join(reversed(out))

"""Pallas TPU kernel: anti-diagonal wavefront banded affine-gap global NW.

Same cell semantics as ops/banded_nw.py and align/oracle.py (reference
src/viterbifastbandmem.cpp), but iterated over ANTI-DIAGONALS t = i + j
instead of rows.  The anti-diagonal order is a topological order of the
same dependency DAG, so every float op sees identical operands — scores
and traceback bits are bit-exact by construction (no dyadic-penalty
assumption like the row kernel's doubling scan needed).

Why this layout wins on the VPU:
  - no within-row I-state prefix scan (the I dependency lands on the
    previous anti-diagonal) -> zero scan steps vs 7 lane-rolls/row
  - cells per anti-diagonal = ceil(bw/2) <= 17, so SEVEN pairs pack into
    one 128-lane vector (18-lane slots) vs one pair per vector row-wise
  - 2.5 lane-rolls per step amortized (d/dlb shift on odd parity, i shift
    and the A-window shift on even parity), everything else elementwise
  - A/B sequence windows live in VMEM carries; one precomputed "insert"
    lane-tile per step refreshes the single new letter per slot

Geometry (fixed lane frame):
  diag D* = la - i + j in [dlo, dhi] (reference convention), parity
  rho(t) = (rho0 + t) % 2 with rho0 = (la - dlo) % 2 shared batch-wide;
  lane u in a pair's slot holds D* = dlo + rho + 2u, i.e.
  i = I0(t) - u with I0(t) = (la + t - dlo - rho)/2 = I0(0) + r(t),
  j = J0(t) + u with J0(t) = t - I0(t).
  r increments on odd-parity steps; s = t - r on even ones.
  State shifts between steps: M identity (from t-2), D/Dlb lane+1 on
  rho=1 steps, I lane-1 on rho=0 steps; A-window shifts with r, B-window
  with s — one roll per step for the windows combined.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .banded_nw import _letters, NEG, TB_DM, TB_IM, TB_MD, TB_MI
from ..align.oracle import band_diag_range, get_range_j

LANES = 128
DEFAULT_SW = 18         # lanes per pair slot (bw <= 33); widened as needed


def slot_width(bw_max: int) -> int:
    """Smallest slot width supporting band width bw_max: (bw-1)//2 + 1
    value lanes plus one spare."""
    return max(DEFAULT_SW, (bw_max - 1) // 2 + 2)


@dataclass
class WaveBatch:
    rho0: int
    sw: int               # lanes per pair slot
    gpv: int              # pairs per vector row
    n_pairs: int          # real pairs
    nrows: int            # vector rows (ceil(n_pairs / gpv))
    steps: int            # padded step count (multiple of chunk)
    la: np.ndarray        # (n_pairs,)
    lb: np.ndarray
    dlo: np.ndarray
    bw: np.ndarray
    # lane-broadcast per-vector-row tiles, shape (nrows, 128) int32
    la_b: np.ndarray
    lb_b: np.ndarray
    ib: np.ndarray        # I0(0) - u per lane
    jb: np.ndarray        # J0(0) + u per lane
    umax_e: np.ndarray    # max valid u on even-parity steps (rho = rho0)
    umax_o: np.ndarray    # on odd-parity steps
    a_init: np.ndarray    # (nrows, 128) int32 letter classes at t=0
    b_init: np.ndarray
    ins: np.ndarray       # (nrows, steps, 128) int8 insert tiles
    t_int: np.ndarray     # (nrows, 2) interior [t_lo, t_hi] per row


def pack_wave(pairs, nucleo: bool, band_radius: int, chunk: int = 32,
              rho0: Optional[int] = None,
              steps_quantum: Optional[int] = None,
              sw_min: Optional[int] = None) -> WaveBatch:
    """pairs: list of (a_u8, b_u8[, dlo, dhi]) sharing (la - dlo) parity.

    steps_quantum/sw_min quantize the batch geometry (step count and
    slot width) so varying batch contents reuse the same compiled
    kernel: the kernel compile key is (steps, chunk, pb, rho0, sw), and
    over a high-latency device link a fresh pallas compile costs tens of
    seconds."""
    P = len(pairs)
    la = np.zeros(P, np.int32)
    lb = np.zeros(P, np.int32)
    dlo = np.zeros(P, np.int32)
    bw = np.zeros(P, np.int32)
    lets = []
    for p, pair in enumerate(pairs):
        a, b = pair[0], pair[1]
        if len(pair) >= 4:
            d0, d1 = pair[2], pair[3]
        else:
            d0, d1 = band_diag_range(len(a), len(b), band_radius)
        la[p], lb[p], dlo[p], bw[p] = len(a), len(b), d0, d1 - d0 + 1
        lets.append((_letters(a, nucleo), _letters(b, nucleo)))
    SW = slot_width(int(bw.max()))
    if sw_min is not None:
        SW = max(SW, sw_min)
    GPV = LANES // SW
    if GPV < 1:
        raise ValueError(f"band width {int(bw.max())} too wide")
    rhos = (la - dlo) % 2
    if rho0 is None:
        rho0 = int(rhos[0])
    assert (rhos == rho0).all(), "pairs must share (la - dlo) parity"

    nrows = (P + GPV - 1) // GPV
    # last needed step is t = la-1+lb (the final Drow[LB] update)
    steps = int((la + lb).max())
    q = max(chunk, steps_quantum or 0)
    steps = ((steps + q - 1) // q) * q

    i0 = (la - dlo - rho0) // 2           # I0(0) per pair
    lane = np.arange(LANES)
    slot = lane // SW
    u = lane - slot * SW
    dead = (lane >= GPV * SW) | (u >= SW)

    la_b = np.ones((nrows, LANES), np.int32)
    lb_b = np.ones((nrows, LANES), np.int32)
    ib = np.full((nrows, LANES), -10**6, np.int32)
    jb = np.full((nrows, LANES), -10**6, np.int32)
    umax_e = np.full((nrows, LANES), -1, np.int32)
    umax_o = np.full((nrows, LANES), -1, np.int32)
    a_init = np.full((nrows, LANES), 4, np.int32)
    b_init = np.full((nrows, LANES), 4, np.int32)
    ins = np.full((nrows, steps, LANES), 4, np.int8)

    # rho at step t; r(t) = #odd-parity steps in [1..t] etc.
    t_arr = np.arange(steps + 1)
    rho_t = (rho0 + t_arr) % 2
    r_t = (t_arr + rho0 - rho_t) // 2
    s_t = t_arr - r_t

    for p in range(P):
        q, g = divmod(p, GPV)
        sl = slice(g * SW, g * SW + SW)
        al, bl = lets[p]
        m = np.arange(SW)
        la_b[q, sl] = la[p]
        lb_b[q, sl] = lb[p]
        ib[q, sl] = i0[p] - m
        jb[q, sl] = -i0[p] + m
        # umax: u <= (dhi - dlo - rho)/2 = (bw - 1 - rho)//2
        umax_e[q, sl] = (bw[p] - 1 - rho0) // 2
        umax_o[q, sl] = (bw[p] - 1 - (1 - rho0)) // 2
        # initial windows at t=0 (r=0, s=0)
        ia = i0[p] - m
        okm = (ia >= 0) & (ia < la[p])
        a_init[q, g * SW + m[okm]] = al[ia[okm]]
        jc = -i0[p] + m
        okj = (jc >= 0) & (jc < lb[p])
        b_init[q, g * SW + m[okj]] = bl[jc[okj]]
        # insert tiles: stepping into t (t >= 1):
        #   odd rho(t-1) (=> r bumps): A insert at u=0, value a[I0(0)+r(t)]
        #   even rho(t-1) (=> s bumps): B insert at u=SW-1,
        #     value b[J0(t) + SW - 1] = b[-I0(0) + s(t) + SW - 1]
        t = np.arange(1, steps)
        ra = r_t[t]
        a_idx = i0[p] + ra
        oka = (r_t[t] != r_t[t - 1]) & (a_idx >= 0) & (a_idx < la[p])
        ins[q, t[oka], g * SW] = al[a_idx[oka]]
        b_idx = -i0[p] + s_t[t] + SW - 1
        okb = (s_t[t] != s_t[t - 1]) & (b_idx >= 0) & (b_idx < lb[p])
        ins[q, t[okb], g * SW + SW - 1] = bl[b_idx[okb]]

    for arr in (umax_e, umax_o):
        arr[:, dead] = -1

    t_lo_p, t_hi_p = _interior_bounds(
        la.astype(np.int64), lb.astype(np.int64), dlo.astype(np.int64),
        bw.astype(np.int64), rho0, SW)
    spad = nrows * GPV - P
    tl = np.concatenate([t_lo_p, np.zeros(spad, np.int64)])
    th = np.concatenate([t_hi_p, np.full(spad, 1 << 30, np.int64)])
    t_int = np.stack([tl.reshape(nrows, GPV).max(1),
                      th.reshape(nrows, GPV).min(1)], axis=1)

    return WaveBatch(rho0=rho0, sw=SW, gpv=GPV, n_pairs=P, nrows=nrows,
                     steps=steps,
                     la=la, lb=lb, dlo=dlo, bw=bw, la_b=la_b, lb_b=lb_b,
                     ib=ib, jb=jb, umax_e=umax_e, umax_o=umax_o,
                     a_init=a_init, b_init=b_init, ins=ins, t_int=t_int)


# ---------------------------------------------------------------------------

def _interior_bounds(la, lb, dlo, bw, rho0: int, SW: int, xp=np):
    """Closed-form per-pair interior step range [t_lo, t_hi].

    A step t is "interior" when, for every in-band lane u <= umax, the
    cell (i, j) is strictly inside [1, la-2] x [1, lb-1] of the DP
    rectangle and no special-case select can fire: no terminal-gap row
    or column (i == 0 / j == 0 left opens), no DPM[0][0] boundary, no
    Drow[LB] update (j == lb rides at lane u >= SW, impossible), no
    last-row capture (i == la-1), and the dlb freeze is inert (dlb is
    still uniformly NEG: its first update happens after t_hi).  The
    kernel's interior substep exploits this to skip those selects and to
    drop dlb from the odd-step lane roll — see _make_kernel.

    With r(t) = #odd-parity steps and s(t) = t - r(t):
      r in [umax - i0 + 1, la - 2 - i0], s in [i0 + 1, lb + i0 - SW]
    mapped to t via r = floor/ceil(t/2) by batch parity rho0.  Works
    for numpy (host pack) and jax.numpy (fused device pack) via xp.
    """
    i0 = (la - dlo - rho0) // 2
    umax = (bw - 1) // 2
    r_lo = xp.maximum(umax - i0 + 1, 0)
    s_lo = i0 + 1
    r_hi = la - 2 - i0
    s_hi = lb + i0 - SW
    t_lo = xp.maximum(xp.maximum(2 * r_lo - rho0,
                                 2 * s_lo - (1 - rho0)), 1)
    t_hi = xp.minimum(2 * r_hi + (1 - rho0), 2 * s_hi + rho0)
    return t_lo, t_hi


def _chunk_flags(batch: "WaveBatch", pb: int, r_pad: int,
                 chunk: int) -> np.ndarray:
    """Per (row-block, chunk) interior flags (int32 0/1) for the kernel's
    SMEM predicate: chunk cc is interior iff [cc*chunk, (cc+1)*chunk) is
    inside every row's interior range.  Pure-padding rows are
    unconstrained (their umax = -1 masks every lane either way)."""
    n_cc = batch.steps // chunk
    pad = r_pad - batch.nrows
    tlo = np.concatenate([batch.t_int[:, 0],
                          np.zeros(pad, np.int64)])
    thi = np.concatenate([batch.t_int[:, 1],
                          np.full(pad, 1 << 30, np.int64)])
    g_lo = tlo.reshape(-1, pb).max(1)
    g_hi = thi.reshape(-1, pb).min(1)
    t0s = np.arange(n_cc, dtype=np.int64) * chunk
    return ((t0s[None, :] >= g_lo[:, None])
            & (t0s[None, :] + chunk - 1 <= g_hi[:, None])).astype(np.int32)


def pack_ins(ins_i8: np.ndarray) -> np.ndarray:
    """Pack the (nrows, steps, 128) int8 insert tiles 4 steps per int32
    word (little-endian byte k = step t with t%4 == k): 4x less HBM/ICI
    traffic; the kernel unpacks with a static shift per unrolled step."""
    n, steps, lanes = ins_i8.shape
    assert steps % 4 == 0
    x = ins_i8.astype(np.uint32).reshape(n, steps // 4, 4, lanes)
    w = (x[:, :, 0] | (x[:, :, 1] << 8) | (x[:, :, 2] << 16)
         | (x[:, :, 3] << 24))
    return w.reshape(n, -1).astype(np.int32)


def _make_kernel(steps: int, chunk: int, pb: int, rho0: int, SW: int,
                 match: float, mismatch: float):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    nwrites = chunk // 8

    def kernel(la_ref, lb_ref, ib_ref, jb_ref, ume_ref, umo_ref,
               ai_ref, bi_ref, ins_ref, gp_ref, flag_ref,
               tb_ref, mle_ref, mlo_ref, dlb_out_ref,
               m1_s, m2_s, d_s, i_s, dlb_s, aw_s, bw_s, mle_s, mlo_s):
        cc = pl.program_id(1)
        n_cc = pl.num_programs(1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (pb, LANES), 1)
        slot_u = lane - (lane // SW) * SW
        edge_lo = slot_u == 0          # receives junk on roll-right
        edge_hi = slot_u == SW - 1     # receives junk on roll-left

        la_b = la_ref[:, :]
        lb_b = lb_ref[:, :]
        ib = ib_ref[:, :]
        jb = jb_ref[:, :]
        ume = ume_ref[:, :]
        umo = umo_ref[:, :]

        g_open_a = gp_ref[0, 0]
        g_open_b = gp_ref[0, 1]
        g_ext_a = gp_ref[0, 2]
        g_ext_b = gp_ref[0, 3]
        g_l_open_a = gp_ref[0, 4]
        g_l_open_b = gp_ref[0, 5]
        g_r_open_b = gp_ref[0, 7]
        g_l_ext_a = gp_ref[0, 8]
        g_l_ext_b = gp_ref[0, 9]
        g_r_ext_b = gp_ref[0, 11]

        neg = jnp.full((pb, LANES), NEG, f32)

        @pl.when(cc == 0)
        def _init():
            m1_s[:, :] = neg
            m2_s[:, :] = neg
            d_s[:, :] = neg
            i_s[:, :] = neg
            dlb_s[:, :] = neg
            aw_s[:, :] = ai_ref[:, :].astype(f32)
            bw_s[:, :] = bi_ref[:, :].astype(f32)
            mle_s[:, :] = neg
            mlo_s[:, :] = neg

        t0 = cc * chunk

        def roll_r(x):
            return pltpu.roll(x, 1, 1)     # y[L] = x[L-1]

        def roll_l(x):
            return pltpu.roll(x, LANES - 1, 1)   # y[L] = x[L+1]

        def substep(t_off, rho, carry, bits_acc, interior):
            """One anti-diagonal step t = t0 + t_off (rho static).  All
            same-direction lane shifts (d/dlb/b-window on odd steps,
            i/a-window on even) ride ONE stacked roll — rolls are the
            dominant cost on the VPU.  Sequence windows are carried as
            f32 (letter classes 0..5, exact).

            With interior=True (statically, for chunks the host proved
            interior via _interior_bounds/_chunk_flags) the step skips
            everything that cannot fire there: i/j recovery and the
            dynamic validity mask (the static in-band lane mask
            suffices), the DPM[0][0] boundary, terminal-gap open/ext
            selects (scalar gap params), the whole Drow[LB] column
            (dlb is uniformly NEG throughout the interior, so it also
            drops out of the odd-step roll), the dlb freeze, and the
            last-row mle/mlo captures.  Outputs are bit-identical: each
            skipped select is provably the identity on interior steps."""
            (m1, m2, d_buf, i_buf, dlb, a_win, b_win, mle, mlo) = carry
            t = t0 + t_off
            # r(t) = (t + rho0 - rho(t))/2 exactly (numerator always even)
            r = (t + (rho0 - rho)) // 2
            s = t - r

            ins_word = ins_ref[:, pl.ds((t_off // 4) * LANES, LANES)]
            ins_tile = ((ins_word >> (8 * (t_off % 4))) & 0xFF).astype(f32)
            m_in = m2
            if rho == 1:
                if interior:
                    packed = jnp.concatenate([d_buf, b_win], axis=0)
                    rolled = roll_l(packed)
                    d_in = jnp.where(edge_hi, neg, rolled[0:pb])
                    dlb_prev = dlb
                    b_win = jnp.where(edge_hi, ins_tile,
                                      rolled[pb:2 * pb])
                else:
                    packed = jnp.concatenate([d_buf, dlb, b_win], axis=0)
                    rolled = roll_l(packed)
                    d_in = jnp.where(edge_hi, neg, rolled[0:pb])
                    dlb_sh = jnp.where(edge_hi, neg, rolled[pb:2 * pb])
                    # dlb freezes at its final lane once t > la-1+lb
                    dlb_prev = jnp.where(t <= la_b + lb_b - 1, dlb_sh,
                                         dlb)
                    b_new = jnp.where(edge_hi, ins_tile,
                                      rolled[2 * pb:3 * pb])
                    if t_off == 0:
                        b_new = jnp.where(cc > 0, b_new, b_win)
                    b_win = b_new
                i_prev = i_buf
                # ume belongs to rho == rho0 steps (pack_wave defines
                # umax_e relative to the batch parity, not absolute rho);
                # keying on absolute rho dropped the in-band D* == dhi
                # diagonal for rho0 == 1 batches with odd band width
                # (wrong traceback when the optimal path rides the band
                # edge — see tests/test_pallas_nw.py band-edge case)
                umax = ume if rho0 == 1 else umo
            else:
                packed = jnp.concatenate([i_buf, a_win], axis=0)
                rolled = roll_r(packed)
                i_prev = jnp.where(edge_lo, neg, rolled[0:pb])
                dlb_prev = dlb
                d_in = d_buf
                a_new = jnp.where(edge_lo, ins_tile, rolled[pb:2 * pb])
                if t_off == 0 and not interior:
                    a_new = jnp.where(cc > 0, a_new, a_win)
                a_win = a_new
                umax = ume if rho0 == 0 else umo

            if interior:
                # static in-band lane mask; every i/j bound and special
                # row/col is provably clear of the interior range
                valid = slot_u <= umax
            else:
                i_vec = ib + r
                j_vec = jb + s
                valid = ((i_vec >= 0) & (i_vec < la_b) & (j_vec >= 0)
                         & (j_vec < lb_b) & (slot_u <= umax))

                # DPM[0][0] = 0 boundary (only ever true at t == 0)
                m_in = jnp.where((i_vec == 0) & (j_vec == 0), f32(0),
                                 m_in)

            aw = a_win
            bw = b_win
            sub = jnp.where((aw < 4) & (bw < 4),
                            jnp.where(aw == bw, f32(match), f32(mismatch)),
                            f32(0))

            if interior:
                open_a, ext_a = g_open_a, g_ext_a
                open_b, ext_b = g_open_b, g_ext_b
            else:
                open_a = jnp.where(i_vec == 0, g_l_open_a, g_open_a)
                ext_a = jnp.where(i_vec == 0, g_l_ext_a, g_ext_a)
                open_b = jnp.where(j_vec == 0, g_l_open_b, g_open_b)
                ext_b = jnp.where(j_vec == 0, g_l_ext_b, g_ext_b)

            # MATCH (priority M >= D >= I)
            xm = m_in
            take_d = d_in > xm
            xm = jnp.where(take_d, d_in, xm)
            take_i = i_prev > xm
            xm = jnp.where(take_i, i_prev, xm)
            m_out = jnp.where(valid, xm + sub, neg)

            # DELETE (>= favours open)
            md = m_in + open_b
            de = d_in + ext_b
            take_open = md >= de
            d_out = jnp.where(valid, jnp.where(take_open, md, de), neg)

            # INSERT (>= favours open)
            mi = m_in + open_a
            ie = i_prev + ext_a
            take_iopen = mi >= ie
            i_out = jnp.where(valid, jnp.where(take_iopen, mi, ie), neg)

            if interior:
                dlb_new = dlb_prev
            else:
                # Drow[LB] cell (i_lb = t - lb, j = lb) rides at its own
                # lane
                upd = ((j_vec == lb_b) & (i_vec >= 0) & (i_vec < la_b)
                       & (slot_u < SW))
                md_lb = m_in + g_r_open_b
                de_lb = dlb_prev + g_r_ext_b
                take_lb = md_lb >= de_lb
                dlb_new = jnp.where(upd, jnp.where(take_lb, md_lb, de_lb),
                                    dlb_prev)

            bits = jnp.where(take_d, TB_DM, 0)
            bits = jnp.where(take_i, TB_IM, bits)
            bits = bits + jnp.where(take_open, TB_MD, 0)
            bits = bits + jnp.where(take_iopen, TB_MI, 0)
            bits = jnp.where(valid, bits, 0)
            if not interior:
                bits = jnp.where(upd, jnp.where(take_lb, TB_MD, 0), bits)
            bits_acc = bits_acc | (bits << (4 * (t_off % 8)))

            if not interior:
                is_last = i_vec == la_b - 1
                if rho == rho0:   # even-parity t
                    mle = jnp.where(is_last, m_out, mle)
                else:
                    mlo = jnp.where(is_last, m_out, mlo)

            carry = (m_out, m1, d_out, i_out, dlb_new, a_win, b_win,
                     mle, mlo)
            return carry, bits_acc

        def chunk_body(interior):
            carry = (m1_s[:, :], m2_s[:, :], d_s[:, :], i_s[:, :],
                     dlb_s[:, :], aw_s[:, :], bw_s[:, :],
                     mle_s[:, :], mlo_s[:, :])
            for w in range(nwrites):
                bits_acc = jnp.zeros((pb, LANES), jnp.int32)
                for k in range(8):
                    t_off = w * 8 + k
                    rho = (rho0 + t_off) % 2   # chunk is even-sized
                    carry, bits_acc = substep(t_off, rho, carry,
                                              bits_acc, interior)
                tb_ref[:, pl.ds(w * LANES, LANES)] = bits_acc

            (m1_s[:, :], m2_s[:, :], d_s[:, :], i_s[:, :]) = carry[0:4]
            aw_s[:, :] = carry[5]
            bw_s[:, :] = carry[6]
            if not interior:
                dlb_s[:, :] = carry[4]
                mle_s[:, :] = carry[7]
                mlo_s[:, :] = carry[8]

        # whole (row-blocks, chunks) flag table lives in SMEM (Mosaic
        # rejects sub-(8,128) blocked specs); pick this step's scalar
        flag = flag_ref[pl.program_id(0), cc]

        @pl.when(flag != 0)
        def _interior_chunk():
            chunk_body(True)

        @pl.when(flag == 0)
        def _generic_chunk():
            chunk_body(False)

        @pl.when(cc == n_cc - 1)
        def _emit():
            mle_ref[:, :] = mle_s[:, :]
            mlo_ref[:, :] = mlo_s[:, :]
            dlb_out_ref[:, :] = dlb_s[:, :]

    return kernel


@functools.lru_cache(maxsize=64)
def _make_run(steps: int, chunk: int, pb: int, rho0: int, SW: int,
              match: float, mismatch: float, interpret: bool):
    """Un-jitted kernel wrapper (jit it, or compose into a fused jit)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_kernel(steps, chunk, pb, rho0, SW, match, mismatch)
    n_cc = steps // chunk
    nwrites = chunk // 8

    def run(la_b, lb_b, ib, jb, ume, umo, a_init, b_init, ins, gp, flags):
        R = la_b.shape[0]
        grid = (R // pb, n_cc)
        row_spec = pl.BlockSpec((pb, LANES), lambda g, c: (g, 0))
        in_specs = [row_spec] * 8 + [
            pl.BlockSpec((pb, (chunk // 4) * LANES), lambda g, c: (g, c)),
            pl.BlockSpec((1, 16), lambda g, c: (0, 0)),
            pl.BlockSpec((R // pb, n_cc), lambda g, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        out_shape = (
            jax.ShapeDtypeStruct((R, n_cc * nwrites * LANES), jnp.int32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((pb, nwrites * LANES), lambda g, c: (g, c)),
            row_spec, row_spec, row_spec,
        )
        scratch = [pltpu.VMEM((pb, LANES), jnp.float32) for _ in range(9)]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, scratch_shapes=scratch,
            interpret=interpret,
        )(la_b, lb_b, ib, jb, ume, umo, a_init, b_init, ins, gp, flags)

    return run


@functools.lru_cache(maxsize=None)
def _compiled(steps: int, chunk: int, pb: int, rho0: int, SW: int,
              match: float, mismatch: float, interpret: bool):
    import jax
    return jax.jit(_make_run(steps, chunk, pb, rho0, SW, match, mismatch,
                             interpret))


class WavefrontNWDevice:
    """Batched anti-diagonal banded NW; bit-exact vs align/oracle.py."""

    def __init__(self, ap, pb: int = 32, chunk: int = 32,
                 interpret: Optional[bool] = None,
                 steps_quantum: Optional[int] = None,
                 sw_min: Optional[int] = None):
        import jax
        self.ap = ap
        self.pb = pb
        self.chunk = chunk
        self.steps_quantum = steps_quantum
        self.sw_min = sw_min
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

    def run_batch(self, batch: WaveBatch):
        """Returns (tb_words, mle, mlo, dlb) numpy arrays."""
        import jax.numpy as jnp
        R = batch.nrows
        pad = (-R) % self.pb
        def padr(x, fill):
            if pad == 0:
                return x
            return np.concatenate(
                [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
        fn = _compiled(batch.steps, self.chunk, self.pb, batch.rho0,
                       batch.sw, self.match, self.mismatch, self.interpret)
        ins = pack_ins(padr(batch.ins, 4))
        flags = _chunk_flags(batch, self.pb, R + pad, self.chunk)
        outs = fn(jnp.asarray(padr(batch.la_b, 1)),
                  jnp.asarray(padr(batch.lb_b, 1)),
                  jnp.asarray(padr(batch.ib, -10**6)),
                  jnp.asarray(padr(batch.jb, -10**6)),
                  jnp.asarray(padr(batch.umax_e, -1)),
                  jnp.asarray(padr(batch.umax_o, -1)),
                  jnp.asarray(padr(batch.a_init, 4)),
                  jnp.asarray(padr(batch.b_init, 4)),
                  jnp.asarray(ins), jnp.asarray(self.gp),
                  jnp.asarray(flags))
        tb, mle, mlo, dlb = (np.asarray(o) for o in outs)
        tb = tb.reshape(tb.shape[0], -1, LANES)
        return tb[:R], mle[:R], mlo[:R], dlb[:R]

    def run_batch_sharded(self, batch: WaveBatch, mesh, axis: str = "data"):
        """Multi-chip run_batch: WaveBatch rows shard over `axis` of the
        mesh (pure data parallelism — each chip runs the wavefront kernel
        on its row block; no cross-chip communication is needed because
        pairs are independent).  Same outputs as run_batch."""
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        from usearch12_tpu.parallel.shardmap import shard_map_norep
        ndev = mesh.shape[axis]
        R = batch.nrows
        pad = (-R) % (self.pb * ndev)

        def padr(x, fill):
            if pad == 0:
                return x
            return np.concatenate(
                [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])

        fn = _compiled(batch.steps, self.chunk, self.pb, batch.rho0,
                       batch.sw, self.match, self.mismatch, self.interpret)
        spec = P(axis)
        sharded = shard_map_norep(
            lambda *a: fn(*a), mesh=mesh,
            in_specs=(spec,) * 9 + (P(), spec),
            out_specs=(spec,) * 4)
        ins = pack_ins(padr(batch.ins, 4))
        flags = _chunk_flags(batch, self.pb, R + pad, self.chunk)
        outs = sharded(jnp.asarray(padr(batch.la_b, 1)),
                       jnp.asarray(padr(batch.lb_b, 1)),
                       jnp.asarray(padr(batch.ib, -10**6)),
                       jnp.asarray(padr(batch.jb, -10**6)),
                       jnp.asarray(padr(batch.umax_e, -1)),
                       jnp.asarray(padr(batch.umax_o, -1)),
                       jnp.asarray(padr(batch.a_init, 4)),
                       jnp.asarray(padr(batch.b_init, 4)),
                       jnp.asarray(ins), jnp.asarray(self.gp),
                       jnp.asarray(flags))
        tb, mle, mlo, dlb = (np.asarray(o) for o in outs)
        tb = tb.reshape(tb.shape[0], -1, LANES)
        return tb[:R], mle[:R], mlo[:R], dlb[:R]

    def _mlast_row(self, batch: WaveBatch, mle_q, mlo_q, p):
        """M values of row la-1 indexed by j (NEG outside band).  Even t
        (rho == rho0) was captured into mle, odd t into mlo."""
        SW = batch.sw
        la = int(batch.la[p]); lb = int(batch.lb[p])
        dlo = int(batch.dlo[p]); bw = int(batch.bw[p])
        g = p % batch.gpv
        mlast = np.full(lb, NEG, np.float32)
        startj, endj = get_range_j(la, lb, dlo, dlo + bw - 1, la - 1)
        for j in range(startj, endj):
            t = la - 1 + j
            rho = (batch.rho0 + t) % 2
            u = (la + t - dlo - rho) // 2 - (la - 1)
            if not (0 <= u < SW):
                continue
            buf = mle_q if t % 2 == 0 else mlo_q
            mlast[j] = buf[g * SW + u]
        return mlast

    def align(self, pairs, band_radius: int, nucleo: bool = True,
              device_traceback: bool = True):
        """Scores + paths for a mixed-parity pair list.  With
        device_traceback (default) the pointer chase runs in XLA and only
        2-bit packed opcodes leave the device (host fallback when the
        terminal penalties are non-dyadic)."""
        idx0, idx1, out_scores, out_paths = [], [], \
            np.zeros(len(pairs), np.float32), [None] * len(pairs)
        for i, pair in enumerate(pairs):
            a, b = pair[0], pair[1]
            if len(pair) >= 4:
                d0 = pair[2]
            else:
                d0 = band_diag_range(len(a), len(b), band_radius)[0]
            (idx0 if (len(a) - d0) % 2 == 0 else idx1).append(i)
        for rho0, idxs in ((0, idx0), (1, idx1)):
            if not idxs:
                continue
            batch = pack_wave([pairs[i] for i in idxs], nucleo,
                              band_radius, self.chunk, rho0,
                              steps_quantum=self.steps_quantum,
                              sw_min=self.sw_min)
            tb, mle, mlo, dlb = self.run_batch(batch)
            if device_traceback and not self.interpret:
                scores, paths = trace_batch_device(self, batch, tb, mle,
                                                   mlo, dlb)
            else:
                scores, paths = trace_batch(self, batch, tb, mle, mlo, dlb)
            for k, i in enumerate(idxs):
                out_scores[i] = scores[k]
                out_paths[i] = paths[k]
        return out_scores, out_paths


def trace_batch(dev: WavefrontNWDevice, batch: WaveBatch, tb, mle, mlo,
                dlb):
    """Host traceback over the anti-diagonal bit tensor."""
    f32 = np.float32
    r_open_a = f32(dev.ap.r_open_a)
    r_ext_a = f32(dev.ap.r_ext_a)
    scores = np.zeros(batch.n_pairs, np.float32)
    paths: List[str] = []
    rho0 = batch.rho0
    SW = batch.sw
    for p in range(batch.n_pairs):
        q, g = divmod(p, batch.gpv)
        la = int(batch.la[p]); lb = int(batch.lb[p])
        dlo = int(batch.dlo[p]); bw = int(batch.bw[p])
        dhi = dlo + bw - 1
        base = g * SW
        tbq = tb[q]

        mlast = dev._mlast_row(batch, mle[q], mlo[q], p)

        # final DPI row (i = la): oracle src/viterbifastbandmem.cpp last loop
        startj, endj = get_range_j(la, lb, dlo, dhi, la - 1)
        tblast = np.zeros(lb + 1, np.uint8)
        i1 = f32(NEG)
        for j in range(startj, endj):
            mi = f32((mlast[j - 1] if j > 0 else f32(NEG)) + r_open_a)
            i1 = f32(i1 + r_ext_a)
            if mi > i1:
                i1 = mi
                tblast[j] = TB_MI
        t_fin = la - 1 + lb
        rho_f = (rho0 + t_fin) % 2
        u_lb = (lb + 1 - dlo - rho_f) // 2
        fin_d = dlb[q, base + u_lb] if 0 <= u_lb < SW else f32(NEG)
        fin_m = mlast[lb - 1]
        score, state = fin_m, "M"
        if fin_d > score:
            score, state = fin_d, "D"
        if i1 > score:
            score, state = i1, "I"
        scores[p] = score

        def bits(i, j):
            if i == la:
                return int(tblast[j]) if 0 <= j <= lb else 0
            t = i + j
            rho = (rho0 + t) % 2
            if j == lb:
                # u_lb = (D* - dlo - rho)/2 with D* = la - i + lb
                u = (la + lb - i - dlo - rho) // 2
                if 0 <= u < SW:
                    return int((tbq[t // 8, base + u] >> (4 * (t % 8))) & 15)
                return TB_MD
            k = j - (dlo + i - la)
            if k == -1:
                return TB_IM
            if not (0 <= k < bw):
                return 0
            u = (la + t - dlo - rho) // 2 - i
            if not (0 <= u < SW):
                return 0
            return int((tbq[t // 8, base + u] >> (4 * (t % 8))) & 15)

        i, j = la, lb
        out = []
        while not (i == 0 and j == 0):
            out.append(state)
            if state == "M":
                t = bits(i - 1, j - 1)
                state = "D" if (t & TB_DM) else ("I" if (t & TB_IM)
                                                 else "M")
                i -= 1
                j -= 1
            elif state == "D":
                t = bits(i - 1, j)
                state = "M" if (t & TB_MD) else "D"
                i -= 1
            else:
                t = bits(i, j - 1)
                state = "M" if (t & TB_MI) else "I"
                j -= 1
        paths.append("".join(reversed(out)))
    return scores, paths


# ---------------------------------------------------------------------------
# device-side traceback: vectorized pointer-chase in XLA over the anti-
# diagonal bit tensor, so only 2-bit packed path opcodes leave the device.
# The final-row DPI uses the log-doubling max-plus scan (exact when gap
# penalties are dyadic, which the defaults are; align_device falls back to
# the host traceback otherwise).
# ---------------------------------------------------------------------------

import functools as _ft

from .banded_nw import OP_M, OP_D, OP_I, OP_PAD, decode_packed_ops


@_ft.lru_cache(maxsize=64)
def _make_traceback_wave(n_words: int, gpv: int, sw: int, rho0: int,
                         steps: int, jmax: int):
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32

    def run(tb, mle, mlo, dlb, la, lb, dlo, bw, gp):
        """tb (R, n_words, 128) int32; mle/mlo/dlb (R, 128) f32;
        la/lb/dlo/bw (P,) int32.  Returns (scores (P,), packed ops)."""
        P = la.shape[0]
        pidx = jnp.arange(P)
        qrow = pidx // gpv
        base = (pidx % gpv) * sw
        # one flat buffer + composed indices: the pointer chase gathers
        # P scalars per step; row-then-column gathers would materialize a
        # (P, n_words*128) intermediate every step
        wtot = n_words * 128
        tb_all = tb.reshape(-1)
        qoff = qrow * wtot

        r_open_a = gp[0, 6]
        r_ext_a = gp[0, 10]

        # mlast[p, j] = M(la-1, j) gathered from the parity buffers
        jj = jnp.arange(jmax)[None, :]
        t_l = (la - 1)[:, None] + jj
        rho_l = (rho0 + t_l) % 2
        u_l = (la[:, None] + t_l - dlo[:, None] - rho_l) // 2 \
            - (la - 1)[:, None]
        lane_l = jnp.clip(base[:, None] + u_l, 0, 127)
        mle_p = mle[qrow]
        mlo_p = mlo[qrow]
        vals_e = jnp.take_along_axis(mle_p, lane_l, axis=1)
        vals_o = jnp.take_along_axis(mlo_p, lane_l, axis=1)
        mlast = jnp.where(t_l % 2 == 0, vals_e, vals_o)
        # band validity of (la-1, j): k = j - (dlo-1); 0 <= k < bw
        k_l = jj - (dlo[:, None] - 1)
        valid_l = ((k_l >= 0) & (k_l < bw[:, None]) & (jj < lb[:, None])
                   & (u_l >= 0) & (u_l < sw))
        mlast = jnp.where(valid_l, mlast, NEG)

        # final DPI row: i1(j) = max over j' < j of mlast[j'-? ...]:
        # mi(j) = mlast[j-1] + r_open_a; i1 via doubling max-plus scan
        mi = jnp.concatenate(
            [jnp.full((P, 1), NEG, f32), mlast[:, :-1]], axis=1) + r_open_a
        x = mi
        s = 1
        while s < jmax:
            y = jnp.concatenate(
                [jnp.full((P, s), NEG, f32),
                 x[:, :-s] + np.float32(s) * r_ext_a], axis=1)
            x = jnp.maximum(x, y)
            s *= 2
        i1_entering = jnp.concatenate(
            [jnp.full((P, 1), NEG, f32), x[:, :-1]], axis=1)
        i1_ext = i1_entering + r_ext_a
        i1_after = jnp.maximum(mi, i1_ext)
        tblast = jnp.where(mi > i1_ext, TB_MI, 0).astype(jnp.int32)
        # out-of-range j -> 0 bits
        tblast = jnp.where(jj <= lb[:, None], tblast, 0)

        fin_m = jnp.take_along_axis(mlast, (lb - 1)[:, None], axis=1)[:, 0]
        # host loop's final i1 state is after iteration j = lb-1
        fin_i = jnp.take_along_axis(i1_after, (lb - 1)[:, None],
                                    axis=1)[:, 0]
        # dlb final value lane
        t_fin = la - 1 + lb
        rho_f = (rho0 + t_fin) % 2
        u_lb_f = (lb + 1 - dlo - rho_f) // 2
        lane_f = jnp.clip(base + u_lb_f, 0, 127)
        fin_d = jnp.take_along_axis(dlb[qrow], lane_f[:, None],
                                    axis=1)[:, 0]
        fin_d = jnp.where((u_lb_f >= 0) & (u_lb_f < sw), fin_d, NEG)

        scores = fin_m
        st0 = jnp.zeros(P, jnp.int32)
        better_d = fin_d > scores
        scores = jnp.where(better_d, fin_d, scores)
        st0 = jnp.where(better_d, OP_D, st0)
        better_i = fin_i > scores
        scores = jnp.where(better_i, fin_i, scores)
        st0 = jnp.where(better_i, OP_I, st0)

        def bits_at(i, j):
            t = i + j
            rho = (rho0 + t) % 2
            # final DPI row
            tbl = jnp.take_along_axis(
                tblast, jnp.clip(j, 0, jmax - 1)[:, None], axis=1)[:, 0]
            # Drow[LB] column
            u_lb = (la + lb - i - dlo - rho) // 2
            lane = jnp.clip(base + u_lb, 0, 127)
            widx = jnp.clip(t // 8, 0, n_words - 1) * 128 + lane
            word = tb_all[qoff + widx]
            nib = (word >> (4 * (t % 8))) & 15
            lb_bits = jnp.where((u_lb >= 0) & (u_lb < sw), nib, TB_MD)
            # band cell
            k = j - (dlo + i - la)
            u = (la + t - dlo - rho) // 2 - i
            lane_b = jnp.clip(base + u, 0, 127)
            widx_b = jnp.clip(t // 8, 0, n_words - 1) * 128 + lane_b
            word_b = tb_all[qoff + widx_b]
            nib_b = (word_b >> (4 * (t % 8))) & 15
            band_bits = jnp.where((k >= 0) & (k < bw) & (u >= 0)
                                  & (u < sw), nib_b, 0)
            band_bits = jnp.where(k == -1, TB_IM, band_bits)
            return jnp.where(i == la, tbl,
                             jnp.where(j == lb, lb_bits, band_bits))

        def step_fn(step, carry):
            i, j, st, ops = carry
            done = (i == 0) & (j == 0)
            ri = jnp.where(st == OP_I, i, i - 1)
            rj = jnp.where(st == OP_D, j, j - 1)
            bts = bits_at(ri, rj)
            st_m = jnp.where(bts & TB_DM, OP_D,
                             jnp.where(bts & TB_IM, OP_I, OP_M))
            st_d = jnp.where(bts & TB_MD, OP_M, OP_D)
            st_i = jnp.where(bts & TB_MI, OP_M, OP_I)
            st_new = jnp.where(st == OP_M, st_m,
                               jnp.where(st == OP_D, st_d, st_i))
            di = jnp.where(st == OP_I, 0, 1)
            dj = jnp.where(st == OP_D, 0, 1)
            op = jnp.where(done, OP_PAD, st)
            # ops is (steps, P): each step writes one CONTIGUOUS row
            # (a (P, steps) column write is a strided scatter per step)
            ops = jax.lax.dynamic_update_slice(
                ops, op.astype(jnp.int8)[None, :], (step, 0))
            i = jnp.where(done, i, i - di)
            j = jnp.where(done, j, j - dj)
            st = jnp.where(done, st, st_new)
            return (i, j, st, ops)

        ops0 = jnp.full((steps, P), OP_PAD, dtype=jnp.int8)
        _i, _j, _st, ops = jax.lax.fori_loop(
            0, steps, step_fn, (la, lb, st0, ops0))
        ops = ops.T
        o = ops.reshape(P, steps // 4, 4).astype(jnp.uint8)
        packed = (o[:, :, 0] | (o[:, :, 1] << 2) | (o[:, :, 2] << 4)
                  | (o[:, :, 3] << 6))
        return scores, packed

    return run


@_ft.lru_cache(maxsize=32)
def _traceback_compiled_wave(n_words: int, gpv: int, sw: int, rho0: int,
                             steps: int, jmax: int):
    import jax
    return jax.jit(_make_traceback_wave(n_words, gpv, sw, rho0, steps,
                                        jmax))


def _is_dyadic(x: float) -> bool:
    return float(x) == float(np.float32(int(x * 16) / 16.0)) and \
        (x * 16) == int(x * 16)


def trace_batch_device(dev: WavefrontNWDevice, batch: WaveBatch, tb, mle,
                       mlo, dlb):
    """Device pointer-chase traceback; falls back to the host version when
    the terminal gap penalties are not dyadic (the doubling scan would not
    be bit-exact then)."""
    import jax.numpy as jnp
    ap = dev.ap
    if not (_is_dyadic(ap.r_open_a) and _is_dyadic(ap.r_ext_a)):
        return trace_batch(dev, batch, tb, mle, mlo, dlb)
    P = batch.n_pairs
    jmax = int(batch.lb.max()) + 1
    jmax = ((jmax + 127) // 128) * 128
    steps = ((int((batch.la + batch.lb).max()) + 8 + 3) // 4) * 4
    fn = _traceback_compiled_wave(tb.shape[1], batch.gpv, batch.sw,
                                  batch.rho0, steps, jmax)
    scores_d, packed = fn(
        jnp.asarray(tb), jnp.asarray(mle), jnp.asarray(mlo),
        jnp.asarray(dlb), jnp.asarray(batch.la.astype(np.int32)),
        jnp.asarray(batch.lb.astype(np.int32)),
        jnp.asarray(batch.dlo.astype(np.int32)),
        jnp.asarray(batch.bw.astype(np.int32)), jnp.asarray(dev.gp))
    paths = decode_packed_ops(np.asarray(packed), P)
    return np.asarray(scores_d)[:P], paths


# ---------------------------------------------------------------------------
# Fused device path: letters in, 2-bit ops out.
#
# run_batch/trace_batch_device round-trip the (R, steps/8, 128) traceback
# tensor through the host — ~64 KB per pair row, which over a slow
# host<->device link costs orders of magnitude more than the DP itself.
# The fused path instead uploads only the raw letter arrays (~1 byte per
# residue) and geometry, computes the WaveBatch tiles ON DEVICE with the
# same integer arithmetic as pack_wave (bit-identical tiles), runs the
# pallas kernel, and runs the pointer-chase traceback on device, so the
# only downloads are scores (4 B/pair) and packed ops ((la+lb)/4 B/pair).
# This is what makes device DP deployable end-to-end: ~15 cells of DP
# per byte moved instead of ~0.25.
# ---------------------------------------------------------------------------


def _pack_jax_builder(P: int, amax: int, bmax: int, steps: int, SW: int,
                      gpv: int, rho0: int, chunk: int, pb: int):
    """Returns a traced fn (a_let, b_let, la, lb, dlo, bw) -> 10 kernel
    input tiles (incl. the per-(row-block, chunk) interior flags),
    bit-identical to pack_wave + pack_ins + the pb padding (dummy rows
    hold la=lb=1 mini-pairs instead of fill constants — equally inert;
    their interior range is empty, so dummy-holding blocks take the
    generic path)."""
    import jax.numpy as jnp

    nrows = P // gpv
    n_cc = steps // chunk
    lanes_pad = LANES - gpv * SW

    # static step tables (identical to pack_wave's r_t/s_t)
    t_arr = np.arange(steps + 1)
    rho_t = (rho0 + t_arr) % 2
    r_t = (t_arr + rho0 - rho_t) // 2
    s_t = t_arr - r_t
    bump_a = np.zeros(steps, dtype=bool)
    bump_a[1:] = r_t[1:steps] != r_t[0:steps - 1]
    bump_b = np.zeros(steps, dtype=bool)
    bump_b[1:] = s_t[1:steps] != s_t[0:steps - 1]
    r_of_t = r_t[:steps].astype(np.int32)
    s_of_t = s_t[:steps].astype(np.int32)

    W_MID = np.int32(0x04040404)

    def rows(x, fill):
        # (P, SW) -> (nrows, 128) with lane padding
        x = x.reshape(nrows, gpv * SW)
        if lanes_pad:
            pad = jnp.full((nrows, lanes_pad), fill, x.dtype)
            x = jnp.concatenate([x, pad], axis=1)
        return x

    def pack4(v):
        # (P, steps) int32 byte values -> (P, steps//4) int32 words
        v = v.astype(jnp.uint32).reshape(P, steps // 4, 4)
        return (v[:, :, 0] | (v[:, :, 1] << 8) | (v[:, :, 2] << 16)
                | (v[:, :, 3] << 24)).astype(jnp.int32)

    def pack(a_let, b_let, la, lb, dlo, bw):
        a_let = a_let.astype(jnp.int32)
        b_let = b_let.astype(jnp.int32)
        i0 = (la - dlo - rho0) // 2
        m = jnp.arange(SW, dtype=jnp.int32)[None, :]
        la_s = jnp.broadcast_to(la[:, None], (P, SW))
        lb_s = jnp.broadcast_to(lb[:, None], (P, SW))
        ib_s = i0[:, None] - m
        jb_s = -i0[:, None] + m
        ume_s = jnp.broadcast_to(((bw - 1 - rho0) // 2)[:, None], (P, SW))
        umo_s = jnp.broadcast_to(((bw - 1 - (1 - rho0)) // 2)[:, None],
                                 (P, SW))
        ia = ib_s
        a_init_s = jnp.where(
            (ia >= 0) & (ia < la[:, None]),
            jnp.take_along_axis(a_let, jnp.clip(ia, 0, amax - 1), axis=1),
            4)
        jc = jb_s
        b_init_s = jnp.where(
            (jc >= 0) & (jc < lb[:, None]),
            jnp.take_along_axis(b_let, jnp.clip(jc, 0, bmax - 1), axis=1),
            4)

        # insert streams
        a_idx = i0[:, None] + r_of_t[None, :]
        insA = jnp.where(
            bump_a[None, :] & (a_idx >= 0) & (a_idx < la[:, None]),
            jnp.take_along_axis(a_let, jnp.clip(a_idx, 0, amax - 1),
                                axis=1),
            4)
        b_idx = -i0[:, None] + s_of_t[None, :] + (SW - 1)
        insB = jnp.where(
            bump_b[None, :] & (b_idx >= 0) & (b_idx < lb[:, None]),
            jnp.take_along_axis(b_let, jnp.clip(b_idx, 0, bmax - 1),
                                axis=1),
            4)
        wA = pack4(insA)            # (P, C)
        wB = pack4(insB)
        C = steps // 4
        u = jnp.arange(SW, dtype=jnp.int32)[None, None, :]
        w = jnp.where(u == 0, wA[:, :, None],
                      jnp.where(u == SW - 1, wB[:, :, None], W_MID))
        w = w.reshape(nrows, gpv, C, SW).transpose(0, 2, 1, 3) \
             .reshape(nrows, C, gpv * SW)
        if lanes_pad:
            pad = jnp.full((nrows, C, lanes_pad), W_MID, jnp.int32)
            w = jnp.concatenate([w, pad], axis=2)
        ins = w.reshape(nrows, C * LANES)

        t_lo, t_hi = _interior_bounds(la, lb, dlo, bw, rho0, SW, xp=jnp)
        g_lo = t_lo.reshape(nrows // pb, pb * gpv).max(1)
        g_hi = t_hi.reshape(nrows // pb, pb * gpv).min(1)
        t0s = jnp.arange(n_cc, dtype=jnp.int32) * chunk
        flags = ((t0s[None, :] >= g_lo[:, None])
                 & (t0s[None, :] + chunk - 1 <= g_hi[:, None])
                 ).astype(jnp.int32)
        return (rows(la_s, 1), rows(lb_s, 1),
                rows(ib_s, -10**6), rows(jb_s, -10**6),
                rows(ume_s, -1), rows(umo_s, -1),
                rows(a_init_s, 4), rows(b_init_s, 4), ins, flags)

    return pack


@_ft.lru_cache(maxsize=64)
def _fused_compiled(P: int, amax: int, bmax: int, steps: int, chunk: int,
                    pb: int, rho0: int, SW: int, gpv: int, match: float,
                    mismatch: float, interpret: bool):
    import jax

    n_words = steps // 8
    jmax = ((bmax + 1 + 127) // 128) * 128
    tsteps = ((steps + 8 + 3) // 4) * 4
    # three separately-jitted stages chained through device-resident
    # arrays: composing them into one jit multiplies XLA compile time
    # ~15x (the pallas call fused with a 500-step loop) for zero
    # transfer benefit — intermediates never leave the device either way
    pack_j = jax.jit(_pack_jax_builder(P, amax, bmax, steps, SW, gpv,
                                       rho0, chunk, pb))
    kern_j = _compiled(steps, chunk, pb, rho0, SW, match, mismatch,
                       interpret)
    tb_j = _traceback_compiled_wave(n_words, gpv, SW, rho0, tsteps, jmax)

    def fused(a_let, b_let, la, lb, dlo, bw, gp):
        tiles = pack_j(a_let, b_let, la, lb, dlo, bw)
        tb, mle, mlo, dlb = kern_j(*tiles[:9], gp, tiles[9])
        tb3 = tb.reshape(tb.shape[0], n_words, LANES)
        return tb_j(tb3, mle, mlo, dlb, la, lb, dlo, bw, gp)

    return fused


_OPS_ASCII = np.frombuffer(b"MDI?", dtype=np.uint8)


def _decode_ops_np(packed: np.ndarray, n: int) -> List[str]:
    """Vectorized packed-2-bit-ops -> path strings (reversed emit order)."""
    P, nb = packed.shape
    ops = np.zeros((P, nb * 4), dtype=np.uint8)
    ops[:, 0::4] = packed & 3
    ops[:, 1::4] = (packed >> 2) & 3
    ops[:, 2::4] = (packed >> 4) & 3
    ops[:, 3::4] = (packed >> 6) & 3
    asc = _OPS_ASCII[ops]
    lens = np.argmax(ops == OP_PAD, axis=1)
    lens[~(ops == OP_PAD).any(axis=1)] = nb * 4
    out = []
    for p in range(n):
        L = lens[p]
        out.append(asc[p, :L][::-1].tobytes().decode("ascii"))
    return out


def _quant_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


class FusedWaveAligner:
    """align()-compatible scores+paths via the fused device path."""

    def __init__(self, dev: WavefrontNWDevice):
        self.dev = dev

    def _fused_fn(self, P, amax, bmax, steps, rho0, SW, gpv):
        """(compiled fn, decoder): fn(a_let, b_let, la, lb, dlo, bw, gp)
        -> (scores, packed words); decoder(words_np, n) -> paths.
        Subclasses may pick a different kernel variant.

        The traceback runs as the pallas backward cursor-chase
        (ops/wavefront_trace.py) — the XLA pointer-chase costs minutes
        of device time on long pairs (its fori_loop gathers serialize on
        the scalar core); USEARCH_XLA_TRACE=1 restores it."""
        import os
        dev = self.dev
        if os.environ.get("USEARCH_XLA_TRACE"):
            fn = _fused_compiled(P, amax, bmax, steps, dev.chunk, dev.pb,
                                 rho0, SW, gpv, dev.match, dev.mismatch,
                                 dev.interpret)
            return fn, _decode_ops_np
        from .wavefront_trace import (fused_chase_compiled,
                                      decode_chase_words)
        fn = fused_chase_compiled(P, amax, bmax, steps, dev.chunk,
                                  dev.pb, rho0, SW, gpv, dev.match,
                                  dev.mismatch, dev.interpret)
        return fn, decode_chase_words

    def align(self, pairs, band_radius: int, nucleo: bool = True):
        dev = self.dev
        ap = dev.ap
        if dev.interpret or not (_is_dyadic(ap.r_open_a)
                                 and _is_dyadic(ap.r_ext_a)):
            return dev.align(pairs, band_radius, nucleo)
        P0 = len(pairs)
        out_scores = np.zeros(P0, np.float32)
        out_paths: List[Optional[str]] = [None] * P0
        geo = np.zeros((P0, 4), np.int32)
        idx = ([], [])
        for i, pair in enumerate(pairs):
            a, b = pair[0], pair[1]
            if len(pair) >= 4:
                d0, d1 = pair[2], pair[3]
            else:
                d0, d1 = band_diag_range(len(a), len(b), band_radius)
            geo[i] = (len(a), len(b), d0, d1 - d0 + 1)
            idx[(len(a) - d0) % 2].append(i)
        for rho0 in (0, 1):
            if idx[rho0]:
                self._group(pairs, idx[rho0], geo, rho0, nucleo,
                            out_scores, out_paths)
        return out_scores, out_paths

    def _group(self, pairs, idxs, geo, rho0, nucleo, out_scores,
               out_paths, force_rows=None):
        import jax.numpy as jnp
        dev = self.dev
        n = len(idxs)
        g = geo[idxs]
        la, lb, dlo, bw = (np.ascontiguousarray(g[:, k]) for k in range(4))
        SW = slot_width(int(bw.max()))
        if dev.sw_min:
            SW = max(SW, dev.sw_min)
        # bucket the slot width so varying hole bands reuse a handful of
        # compiled kernels without parking narrow bands in wide slots
        # (sw_min=64 for band-33 holes left 73% of the lanes dead)
        for b in (DEFAULT_SW, 32, 64, LANES):
            if SW <= b:
                SW = b
                break
        gpv = LANES // SW
        if gpv < 1 or SW < 2:
            # band too wide for one vector row: legacy per-batch path
            sc, ps = dev.align([pairs[i] for i in idxs],
                               0, nucleo)
            for k, i in enumerate(idxs):
                out_scores[i], out_paths[i] = sc[k], ps[k]
            return
        steps = _quant_up(int((la + lb).max()),
                          max(dev.chunk, dev.steps_quantum or 0))
        # coarse length buckets: hole-length jitter within a window must
        # not mint fresh compile geometries (each costs ~2-3s of pallas
        # tracing per process before the compile cache even applies)
        lq = max(128, (dev.steps_quantum or 0) // 2)
        amax = _quant_up(int(la.max()), lq)
        bmax = _quant_up(int(lb.max()), lq)
        nrows = _quant_up((n + gpv - 1) // gpv, dev.pb)
        # pow2 row bucketing bounds compile count across window fills
        cap = dev.pb
        while cap < nrows:
            cap *= 2
        nrows = cap
        # row cap: a fresh (P, steps) geometry costs a full kernel
        # compile (minutes over the tunneled backend), so batches
        # larger than NROWS_CAP rows are chunked and every chunk —
        # including the tail, padded — runs at exactly NROWS_CAP rows:
        # one compiled executable instead of pow2 buckets up the
        # batch-size ladder
        ncap = int(os.environ.get("USEARCH_DEV_NROWS_CAP", "512"))
        if force_rows is not None:
            nrows = force_rows
        elif nrows > ncap:
            step = ncap * gpv
            for lo in range(0, n, step):
                self._group(pairs, idxs[lo:lo + step], geo, rho0, nucleo,
                            out_scores, out_paths, force_rows=ncap)
            return
        P = nrows * gpv

        a_let = np.full((P, amax), 4, np.int8)
        b_let = np.full((P, bmax), 4, np.int8)
        # vectorized ragged fill: one LUT pass over the concatenation,
        # boolean row-major scatter (the per-pair loop dominated the
        # whole fused path at ~0.5s / 4k pairs)
        cat_a = np.concatenate([np.asarray(pairs[i][0]) for i in idxs])
        cat_b = np.concatenate([np.asarray(pairs[i][1]) for i in idxs])
        cols = np.arange(max(amax, bmax))
        a_let[:n][cols[None, :amax] < la[:, None]] = \
            _letters(cat_a, nucleo).astype(np.int8)
        b_let[:n][cols[None, :bmax] < lb[:, None]] = \
            _letters(cat_b, nucleo).astype(np.int8)
        la_p = np.ones(P, np.int32)
        lb_p = np.ones(P, np.int32)
        dlo_p = np.full(P, -1 - rho0, np.int32)   # parity-correct dummy
        bw_p = np.full(P, 4, np.int32)
        la_p[:n], lb_p[:n], dlo_p[:n], bw_p[:n] = la, lb, dlo, bw
        a_let[n:, 0] = 0
        b_let[n:, 0] = 0

        fn, decode = self._fused_fn(P, amax, bmax, steps, rho0, SW, gpv)
        scores_d, packed_d = fn(
            jnp.asarray(a_let), jnp.asarray(b_let), jnp.asarray(la_p),
            jnp.asarray(lb_p), jnp.asarray(dlo_p), jnp.asarray(bw_p),
            jnp.asarray(dev.gp))
        scores = np.asarray(scores_d)
        packed = np.asarray(packed_d)
        paths = decode(packed, n)
        for k, i in enumerate(idxs):
            out_scores[i] = scores[k]
            out_paths[i] = paths[k]

"""Pallas TPU kernel: backward cursor-chase traceback for the wavefront
banded NW (the device-side replacement for the XLA pointer-chase in
ops/wavefront_nw._make_traceback_wave).

Why: the XLA chase is a lax.fori_loop of `steps` iterations, each doing
P scalar gathers from the HBM-resident traceback tensor — on TPU those
gathers serialize on the scalar core, and for long pairs (steps ~ 8k)
one batch costs minutes of device time (round-3 device-forced ablation:
0.186x the reference, ~all of it in this loop).  TPU vectors have no
per-lane dynamic addressing, so a gather-free formulation is required.

Design: re-walk the anti-diagonals in REVERSE, streaming the traceback
words exactly like the forward kernel streams its insert tiles.  Each
pair's chase state (read position ri/rj, state M/D/I, virtual lane u,
next-read step tread) lives in ONE lane — a one-hot "cursor" — and the
nibble the chase needs at step t is simply (tile & cursor): the cursor
is always parked at the lane where that pair's band cell for step t
sits.  This works because the read lane u moves by at most one lane per
step (Δu ∈ {-1, 0, +1}, a function of the new state and the step
parity — derived from the forward geometry u = (la + t - dlo - ρ)/2 - i),
so cursor movement is two static lane-rolls per step, the same
primitive the forward kernel is built on.  No gathers, no reductions,
no scalar loops: per step the kernel does ~40 elementwise i32 ops and 2
stacked rolls on (pb, 128) tiles — about the forward DP's cost.

Path emission: at most one op per anti-diagonal step, so ops are
accumulated 16 steps per int32 word (2-bit codes 1=M 2=D 3=I, 0=idle)
in a per-lane shift register; lanes are disjoint per 2-bit position, so
an XLA sum over each pair's slot lanes after the kernel rebuilds the
full code stream.  The download is (steps/16) words/pair ≈ (la+lb)/4
bytes — same as the XLA chase, at ~1000x the speed.

Cell semantics replicated bit-for-bit from trace_batch
(ops/wavefront_nw.py; reference src/tracebackbitmem.cpp:8): state
priority, the virtual final DPI row (bits from the prologue's
max-plus-scan tblast, streamed 1 bit/step), the Drow[LB] column
(default TB_MD outside stored lanes), and the k == -1 TB_IM band edge.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np

from .banded_nw import NEG, TB_DM, TB_IM, TB_MD, TB_MI, OP_M, OP_D, OP_I
from .wavefront_nw import LANES

# emitted 2-bit codes (0 = no act at this step)
C_M, C_D, C_I = OP_M + 1, OP_D + 1, OP_I + 1


def _make_chase_kernel(steps: int, chunk: int, pb: int, rho0: int,
                       SW: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert chunk % 32 == 0
    n_cc = steps // chunk
    i32 = jnp.int32

    def kernel(cur0_ref, ri0_ref, rj0_ref, st0_ref, tread0_ref, u0_ref,
               la_ref, lb_ref, dlo_ref, bw_ref, tb_ref, tbl_ref,
               ops_ref,
               cur_s, ri_s, rj_s, st_s, tread_s, u_s):
        cc = pl.program_id(1)

        @pl.when(cc == 0)
        def _init():
            cur_s[:, :] = cur0_ref[:, :]
            ri_s[:, :] = ri0_ref[:, :]
            rj_s[:, :] = rj0_ref[:, :]
            st_s[:, :] = st0_ref[:, :]
            tread_s[:, :] = tread0_ref[:, :]
            u_s[:, :] = u0_ref[:, :]

        la_b = la_ref[:, :]
        lb_b = lb_ref[:, :]
        dlo_b = dlo_ref[:, :]
        bw_b = bw_ref[:, :]

        # global t of local step t_loc: t = (n_cc-1-cc)*chunk + t_loc.
        # chunk is a multiple of 32, so t % 8, t % 32 and the parity of
        # t are static per t_loc.
        t_base = (n_cc - 1 - cc) * chunk

        def substep(t_loc, carry, acc):
            cur, ri, rj, st, tread, uu = carry
            t = t_base + t_loc
            rho = (rho0 + t_loc) % 2

            word_tb = tb_ref[:, pl.ds((t_loc // 8) * LANES, LANES)]
            nib = (word_tb >> (4 * (t_loc % 8))) & 15
            word_tbl = tbl_ref[:, pl.ds((t_loc // 32) * LANES, LANES)]
            tbl_bit = (word_tbl >> (t_loc % 32)) & 1

            act = (cur == 1) & (tread == t)

            # bits at the read position (trace_batch bits()): the band
            # nibble rides at the cursor lane by construction
            bottom = ri == la_b
            lbcol = rj == lb_b
            k_diag = rj - (dlo_b + ri - la_b)
            u_ok = (uu >= 0) & (uu < SW)
            bits_band = jnp.where((k_diag >= 0) & (k_diag < bw_b) & u_ok,
                                  nib, 0)
            bits_band = jnp.where(k_diag == -1, TB_IM, bits_band)
            bits_lb = jnp.where(u_ok, nib, TB_MD)
            bits_bot = tbl_bit * TB_MI
            bits = jnp.where(bottom, bits_bot,
                             jnp.where(lbcol, bits_lb, bits_band))

            # state transition (priority identical to the XLA chase)
            st_m = jnp.where((bits & TB_DM) != 0, OP_D,
                             jnp.where((bits & TB_IM) != 0, OP_I, OP_M))
            st_d = jnp.where((bits & TB_MD) != 0, OP_M, OP_D)
            st_i = jnp.where((bits & TB_MI) != 0, OP_M, OP_I)
            st_new = jnp.where(st == OP_M, st_m,
                               jnp.where(st == OP_D, st_d, st_i))

            # emit: one 2-bit code (st BEFORE transition) per act
            code = jnp.where(act, st + 1, 0)
            acc = (acc << 2) | code

            # post-act state: (i, j) becomes (ri, rj); next read hops
            # t-2 on M, t-1 on D/I
            done = (ri == 0) & (rj == 0)
            ri2 = jnp.where(st_new == OP_I, ri, ri - 1)
            rj2 = jnp.where(st_new == OP_D, rj, rj - 1)
            tread2 = jnp.where(done, -1, ri2 + rj2)
            # Δu from the forward geometry (module docstring)
            du = jnp.where(st_new == OP_D, rho,
                           jnp.where(st_new == OP_I, rho - 1, 0))
            u2 = uu + du

            ri_n = jnp.where(act, ri2, ri)
            rj_n = jnp.where(act, rj2, rj)
            st_n = jnp.where(act, st_new, st)
            tr_n = jnp.where(act, tread2, tread)
            uu_n = jnp.where(act, u2, uu)

            # cursor move: clamp the virtual lane into the slot, roll
            # the whole state stack by the clamped delta
            c_old = jnp.clip(uu, 0, SW - 1)
            c_new = jnp.clip(uu_n, 0, SW - 1)
            plus_m = act & (c_new == c_old + 1)
            minus_m = act & (c_new == c_old - 1)
            move = plus_m | minus_m

            stack = jnp.concatenate(
                [cur, ri_n, rj_n, st_n, tr_n, uu_n], axis=0)
            move6 = jnp.concatenate([move] * 6, axis=0)
            plus6 = jnp.concatenate([plus_m] * 6, axis=0)
            minus6 = jnp.concatenate([minus_m] * 6, axis=0)
            keep = jnp.where(move6, 0, stack)
            moved_p = pltpu.roll(jnp.where(plus6, stack, 0), 1, 1)
            moved_m = pltpu.roll(jnp.where(minus6, stack, 0),
                                 LANES - 1, 1)
            out = keep + moved_p + moved_m
            carry = tuple(out[k * pb:(k + 1) * pb] for k in range(6))
            return carry, acc

        carry = (cur_s[:, :], ri_s[:, :], rj_s[:, :], st_s[:, :],
                 tread_s[:, :], u_s[:, :])
        for w in range(chunk // 16):
            acc = jnp.zeros((pb, LANES), i32)
            for k in range(16):
                t_loc = chunk - 1 - (w * 16 + k)
                carry, acc = substep(t_loc, carry, acc)
            ops_ref[:, pl.ds(w * LANES, LANES)] = acc

        (cur_s[:, :], ri_s[:, :], rj_s[:, :], st_s[:, :], tread_s[:, :],
         u_s[:, :]) = carry

    return kernel


@functools.lru_cache(maxsize=64)
def _chase_run(steps: int, chunk: int, pb: int, rho0: int, SW: int,
               interpret: bool):
    """Un-jitted pallas chase wrapper: state/geometry tiles + tb + tbl
    streams -> per-lane op words (R, (steps/16)*LANES) i32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_chase_kernel(steps, chunk, pb, rho0, SW)
    n_cc = steps // chunk

    def run(cur0, ri0, rj0, st0, tread0, u0, la_b, lb_b, dlo_b, bw_b,
            tb, tbl):
        R = cur0.shape[0]
        grid = (R // pb, n_cc)
        row_spec = pl.BlockSpec((pb, LANES), lambda g, c: (g, 0))
        rev = n_cc - 1
        in_specs = [row_spec] * 10 + [
            pl.BlockSpec((pb, (chunk // 8) * LANES),
                         lambda g, c: (g, rev - c)),
            pl.BlockSpec((pb, (chunk // 32) * LANES),
                         lambda g, c: (g, rev - c)),
        ]
        out_shape = jax.ShapeDtypeStruct(
            (R, (steps // 16) * LANES), jnp.int32)
        out_specs = pl.BlockSpec((pb, (chunk // 16) * LANES),
                                 lambda g, c: (g, c))
        scratch = [pltpu.VMEM((pb, LANES), jnp.int32) for _ in range(6)]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, scratch_shapes=scratch,
            interpret=interpret,
        )(cur0, ri0, rj0, st0, tread0, u0, la_b, lb_b, dlo_b, bw_b,
          tb, tbl)

    return run


def _make_trace_stage(n_words: int, gpv: int, sw: int, rho0: int,
                      steps: int, jmax: int, chunk: int, pb: int,
                      interpret: bool):
    """Traced fn (tb, mle, mlo, dlb, la, lb, dlo, bw, gp) ->
    (scores (P,), op words (P, steps/16) i32).

    Stage A (XLA): scores, initial state and the virtual final-DPI-row
    bits — identical arithmetic to _make_traceback_wave's prologue
    (ops/wavefront_nw.py).  Stage B: input tiles for the pallas chase.
    Stage C: the chase kernel + slot-lane reduction."""
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32
    i32 = jnp.int32
    run_chase = _chase_run(steps, chunk, pb, rho0, sw, interpret)

    lane = np.arange(LANES)
    pair_of_lane = np.minimum(lane // sw, gpv - 1).astype(np.int32)

    def run(tb, mle, mlo, dlb, la, lb, dlo, bw, gp):
        P = la.shape[0]
        R = P // gpv
        pidx = jnp.arange(P)
        qrow = pidx // gpv
        base = (pidx % gpv) * sw

        r_open_a = gp[0, 6]
        r_ext_a = gp[0, 10]

        # ---- stage A: prologue (bit-identical to the XLA chase's) ----
        jj = jnp.arange(jmax)[None, :]
        t_l = (la - 1)[:, None] + jj
        rho_l = (rho0 + t_l) % 2
        u_l = (la[:, None] + t_l - dlo[:, None] - rho_l) // 2 \
            - (la - 1)[:, None]
        lane_l = jnp.clip(base[:, None] + u_l, 0, 127)
        vals_e = jnp.take_along_axis(mle[qrow], lane_l, axis=1)
        vals_o = jnp.take_along_axis(mlo[qrow], lane_l, axis=1)
        mlast = jnp.where(t_l % 2 == 0, vals_e, vals_o)
        k_l = jj - (dlo[:, None] - 1)
        valid_l = ((k_l >= 0) & (k_l < bw[:, None]) & (jj < lb[:, None])
                   & (u_l >= 0) & (u_l < sw))
        mlast = jnp.where(valid_l, mlast, NEG)

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
        tblast = jnp.where(mi > i1_ext, 1, 0).astype(i32)
        tblast = jnp.where(jj <= lb[:, None], tblast, 0)

        fin_m = jnp.take_along_axis(mlast, (lb - 1)[:, None], axis=1)[:, 0]
        fin_i = jnp.take_along_axis(i1_after, (lb - 1)[:, None],
                                    axis=1)[:, 0]
        t_fin = la - 1 + lb
        rho_f = (rho0 + t_fin) % 2
        u_lb_f = (lb + 1 - dlo - rho_f) // 2
        lane_f = jnp.clip(base + u_lb_f, 0, 127)
        fin_d = jnp.take_along_axis(dlb[qrow], lane_f[:, None],
                                    axis=1)[:, 0]
        fin_d = jnp.where((u_lb_f >= 0) & (u_lb_f < sw), fin_d, NEG)

        scores = fin_m
        st0 = jnp.zeros(P, i32)
        better_d = fin_d > scores
        scores = jnp.where(better_d, fin_d, scores)
        st0 = jnp.where(better_d, OP_D, st0)
        better_i = fin_i > scores
        scores = jnp.where(better_i, fin_i, scores)
        st0 = jnp.where(better_i, OP_I, st0)

        # ---- stage B: chase input tiles ----
        ri0 = jnp.where(st0 == OP_I, la, la - 1)
        rj0 = jnp.where(st0 == OP_D, lb, lb - 1)
        tread0 = ri0 + rj0
        rho_0 = (rho0 + tread0) % 2
        u0 = (la + tread0 - dlo - rho_0) // 2 - ri0
        lane0 = base + jnp.clip(u0, 0, sw - 1)

        pol = jnp.asarray(pair_of_lane)

        def rows_of(vec, fill=0):
            # (P,) -> (R, LANES): lane l of row q holds vec[q*gpv + pol[l]]
            v2 = vec.reshape(R, gpv)
            return jnp.take(v2, pol, axis=1)

        lane_iota = jnp.arange(LANES, dtype=i32)[None, :]
        cur0_t = (rows_of(lane0) == lane_iota).astype(i32)
        ri0_t = jnp.where(cur0_t == 1, rows_of(ri0), 0)
        rj0_t = jnp.where(cur0_t == 1, rows_of(rj0), 0)
        st0_t = jnp.where(cur0_t == 1, rows_of(st0), 0)
        tread0_t = jnp.where(cur0_t == 1, rows_of(tread0), 0)
        u0_t = jnp.where(cur0_t == 1, rows_of(u0), 0)
        la_t = rows_of(la)
        lb_t = rows_of(lb)
        dlo_t = rows_of(dlo)
        bw_t = rows_of(bw)

        # tbl stream: bit per step t = tblast[t - la], packed 32/word,
        # replicated across each pair's slot lanes
        tt = jnp.arange(steps, dtype=i32)[None, :]
        j_of_t = tt - la[:, None]
        bit = jnp.take_along_axis(
            tblast, jnp.clip(j_of_t, 0, jmax - 1), axis=1)
        bit = jnp.where((j_of_t >= 0) & (j_of_t <= lb[:, None]), bit, 0)
        w32 = bit.reshape(P, steps // 32, 32)
        sh = jnp.arange(32, dtype=i32)[None, None, :]
        words = jnp.sum(w32 << sh, axis=2).astype(i32)   # (P, steps/32)
        words_r = words.reshape(R, gpv, steps // 32)
        tbl = jnp.take(words_r, pol, axis=1)             # (R, LANES, W)
        tbl = tbl.transpose(0, 2, 1).reshape(R, -1)

        # ---- stage C: chase + slot reduction ----
        ops_lanes = run_chase(cur0_t, ri0_t, rj0_t, st0_t, tread0_t,
                              u0_t, la_t, lb_t, dlo_t, bw_t, tb, tbl)
        nw_out = steps // 16
        o4 = ops_lanes.reshape(R, nw_out, LANES)[:, :, :gpv * sw]
        o4 = o4.reshape(R, nw_out, gpv, sw).sum(axis=3)  # (R, W, gpv)
        ops_words = o4.transpose(0, 2, 1).reshape(P, nw_out)
        return scores, ops_words

    return run


@functools.lru_cache(maxsize=64)
def _trace_stage_compiled(n_words: int, gpv: int, sw: int, rho0: int,
                          steps: int, jmax: int, chunk: int, pb: int,
                          interpret: bool):
    import jax
    return jax.jit(_make_trace_stage(n_words, gpv, sw, rho0, steps, jmax,
                                     chunk, pb, interpret))


_OPS_ASCII = np.frombuffer(b"?MDI", dtype=np.uint8)


def decode_chase_words(words: np.ndarray, n: int) -> List[str]:
    """(P, steps/16) i32 chase words -> path strings.  Word w bit range
    2*(15-k) holds the code of chase iteration 16w+k (t descending);
    code 0 = no act at that step."""
    P, nw = words.shape
    codes = np.zeros((P, nw * 16), dtype=np.uint8)
    w = words.astype(np.uint32)
    for k in range(16):
        codes[:, k::16] = (w >> np.uint32(2 * (15 - k))) & 3
    out = []
    for p in range(n):
        row = codes[p]
        sel = row[row != 0]
        out.append(_OPS_ASCII[sel][::-1].tobytes().decode("ascii"))
    return out


@functools.lru_cache(maxsize=64)
def fused_chase_compiled(P: int, amax: int, bmax: int, steps: int,
                         chunk: int, pb: int, rho0: int, SW: int,
                         gpv: int, match: float, mismatch: float,
                         interpret: bool):
    """letters in -> (scores, chase op words) out: pack + wavefront DP +
    pallas chase, all device-resident (the chase-traceback counterpart
    of wavefront_nw._fused_compiled)."""
    import jax
    from .wavefront_nw import _pack_jax_builder, _compiled

    n_words = steps // 8
    jmax = ((bmax + 1 + 127) // 128) * 128
    pack_j = jax.jit(_pack_jax_builder(P, amax, bmax, steps, SW, gpv,
                                       rho0, chunk, pb))
    kern_j = _compiled(steps, chunk, pb, rho0, SW, match, mismatch,
                       interpret)
    trace_j = _trace_stage_compiled(n_words, gpv, SW, rho0, steps, jmax,
                                    chunk, pb, interpret)
    # NOTE: a jax.export AOT cache was tried here to skip per-process
    # pallas tracing; on the tunneled axon backend deserialized
    # executables RELOAD ~8x slower than the jit+compilation-cache path
    # (64s vs 8s fresh-process first dispatch), so the plain path stays.

    def fused(a_let, b_let, la, lb, dlo, bw, gp):
        tiles = pack_j(a_let, b_let, la, lb, dlo, bw)
        tb, mle, mlo, dlb = kern_j(*tiles[:9], gp, tiles[9])
        return trace_j(tb, mle, mlo, dlb, la, lb, dlo, bw, gp)

    return fused


def trace_batch_chase(dev, batch, tb, mle, mlo, dlb):
    """Drop-in trace_batch replacement running the pallas chase.
    Same dyadic-penalty precondition as trace_batch_device (the
    prologue's doubling scan)."""
    import jax.numpy as jnp
    P = batch.n_pairs
    jmax = int(batch.lb.max()) + 1
    jmax = ((jmax + 127) // 128) * 128
    steps = batch.steps
    fn = _trace_stage_compiled(tb.shape[1], batch.gpv, batch.sw,
                               batch.rho0, steps, jmax, dev.chunk,
                               dev.pb, dev.interpret)
    R = tb.shape[0]
    pad_rows = (-R) % dev.pb
    if pad_rows:
        tb = np.concatenate(
            [tb, np.zeros((pad_rows,) + tb.shape[1:], tb.dtype)])
        mle = np.concatenate([mle, np.full((pad_rows, LANES), NEG,
                                           mle.dtype)])
        mlo = np.concatenate([mlo, np.full((pad_rows, LANES), NEG,
                                           mlo.dtype)])
        dlb = np.concatenate([dlb, np.full((pad_rows, LANES), NEG,
                                           dlb.dtype)])
    Rp = R + pad_rows
    Pp = Rp * batch.gpv
    la = np.ones(Pp, np.int32)
    lb_v = np.ones(Pp, np.int32)
    dlo = np.full(Pp, -1 - batch.rho0, np.int32)
    bw = np.full(Pp, 4, np.int32)
    la[:P], lb_v[:P] = batch.la, batch.lb
    dlo[:P], bw[:P] = batch.dlo, batch.bw
    tb_flat = tb.reshape(Rp, -1)
    scores_d, words_d = fn(
        jnp.asarray(tb_flat), jnp.asarray(mle), jnp.asarray(mlo),
        jnp.asarray(dlb), jnp.asarray(la), jnp.asarray(lb_v),
        jnp.asarray(dlo), jnp.asarray(bw), jnp.asarray(dev.gp))
    scores = np.asarray(scores_d)[:P]
    paths = decode_chase_words(np.asarray(words_d), P)
    return scores, paths

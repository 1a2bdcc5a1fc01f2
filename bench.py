"""Benchmark: banded-DP cell throughput on the TPU vs single-thread CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the headline BASELINE.json number: banded global-alignment
DP throughput in Gcells/s (cells = sum over pairs of band_width * LA, the
reference's inner-loop work) for the full kernel INCLUDING traceback-bit
emission, measured on batches of 250 nt amplicon-like pairs.  vs_baseline
divides by the single-thread CPU throughput of the native C kernel
(the same cell semantics as the reference's viterbifastbandmem.cpp inner
loop, compiled -O2), measured on the same machine and pairs.
"""

import ctypes
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_pairs(n, length=250, seed=1):
    rng = np.random.default_rng(seed)
    conv = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for _ in range(n):
        a = rng.integers(0, 4, length)
        b = a.copy()
        idx = rng.integers(0, length, 12)
        b[idx] = rng.integers(0, 4, 12)
        pairs.append((conv[a], conv[b]))
    return pairs


def bench_device(pairs, reps=10):
    """Anti-diagonal wavefront kernel (ops/wavefront_nw.py), including
    traceback-bit emission — the full reference inner-loop work."""
    import jax
    import jax.numpy as jnp
    from usearch12_tpu.scoring import AlnParams, nuc_mx
    from usearch12_tpu.ops.wavefront_nw import (WavefrontNWDevice,
                                                pack_wave, pack_ins,
                                                _compiled)
    ap = AlnParams(nucleo=True, subst_mx=nuc_mx(1.0, -2.0))
    ap.init4(-10.0, -1.0, -0.5, -0.5)
    dev = WavefrontNWDevice(ap, pb=64, chunk=128)
    batch = pack_wave(pairs, True, 16, dev.chunk)
    cells = float(np.sum(batch.bw.astype(np.int64) * batch.la))
    R = batch.nrows
    pad = (-R) % dev.pb

    def padr(x, fill):
        if pad == 0:
            return x
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])

    fn = _compiled(batch.steps, dev.chunk, dev.pb, batch.rho0, batch.sw,
                   dev.match, dev.mismatch, dev.interpret)
    args = (jnp.asarray(padr(batch.la_b, 1)),
            jnp.asarray(padr(batch.lb_b, 1)),
            jnp.asarray(padr(batch.ib, -10**6)),
            jnp.asarray(padr(batch.jb, -10**6)),
            jnp.asarray(padr(batch.umax_e, -1)),
            jnp.asarray(padr(batch.umax_o, -1)),
            jnp.asarray(padr(batch.a_init, 4)),
            jnp.asarray(padr(batch.b_init, 4)),
            jnp.asarray(pack_ins(padr(batch.ins, 4))),
            jnp.asarray(dev.gp))
    out = fn(*args)
    _ = float(out[1][0, 0])  # warm + sync (block_until_ready is unreliable
    #                          over the tunneled device link)
    best = None
    for _trial in range(3):
        t0 = time.perf_counter()
        for _i in range(reps):
            out = fn(*args)
        _ = float(out[1][0, 0])
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    return cells / best / 1e9, len(pairs) / best


def bench_cpu(pairs):
    from usearch12_tpu.scoring import AlnParams, nuc_mx
    from usearch12_tpu.native import get_lib, GapParams
    from usearch12_tpu.align.oracle import band_diag_range
    lib = get_lib()
    if lib is None:
        return None, None
    ap = AlnParams(nucleo=True, subst_mx=nuc_mx(1.0, -2.0))
    ap.init4(-10.0, -1.0, -0.5, -0.5)
    gp = GapParams.from_alnparams(ap)
    mx = np.ascontiguousarray(ap.subst_mx, dtype=np.float32)
    L = max(len(a) for a, _ in pairs)
    tb = np.zeros((L + 2) * (L + 130), dtype=np.uint8)
    mrow = np.zeros(L + 130, dtype=np.float32)
    drow = np.zeros(L + 130, dtype=np.float32)
    path = ctypes.create_string_buffer(4 * L + 2)
    score = ctypes.c_float(0)
    cells = 0
    t0 = time.perf_counter()
    for a, b in pairs:
        dlo, dhi = band_diag_range(len(a), len(b), 16)
        cells += (dhi - dlo + 1) * len(a)
        lib.nw_band(a, len(a), b, len(b), dlo, dhi, ctypes.byref(gp), mx,
                    tb, mrow, drow, path, ctypes.byref(score))
    dt = time.perf_counter() - t0
    return cells / dt / 1e9, len(pairs) / dt


def main():
    # large default batch: per-dispatch overhead dominates below ~16k
    # pairs on the tunneled dev rig (2048 pairs ~5 Gcells/s, 65536 ~30)
    n_pairs = int(os.environ.get("BENCH_PAIRS", "65536"))
    pairs = make_pairs(n_pairs)
    gcells_dev, pairs_dev = bench_device(pairs)
    cpu_pairs = pairs[: max(256, n_pairs // 8)]
    gcells_cpu, _ = bench_cpu(cpu_pairs)
    vs = gcells_dev / gcells_cpu if gcells_cpu else None
    print(json.dumps({
        "metric": "banded_nw_dp_throughput",
        "value": round(gcells_dev, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()

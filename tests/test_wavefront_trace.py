"""Pallas backward cursor-chase traceback (ops/wavefront_trace.py):
bit parity vs the host traceback on randomized batches, in interpret
mode on the CPU test tier.  The real-chip run is covered by the
USEARCH_TPU_TESTS tier and the bench's device ablation."""

import numpy as np
import pytest

from usearch12_tpu.scoring import AlnParams, nuc_mx
from usearch12_tpu.ops.wavefront_nw import (WavefrontNWDevice, pack_wave,
                                            FusedWaveAligner)
from usearch12_tpu.ops.wavefront_trace import (trace_batch_chase,
                                               fused_chase_compiled,
                                               decode_chase_words)
from usearch12_tpu.ops.wavefront_nw import trace_batch


def _ap():
    ap = AlnParams(nucleo=True, subst_mx=nuc_mx(1.0, -2.0))
    ap.init4(-10.0, -1.0, -0.5, -0.5)
    return ap


def _rand_pairs(rng, n, lmin=20, lmax=200, asym=False):
    conv = np.frombuffer(b"ACGT", np.uint8)
    pairs = []
    for _ in range(n):
        la = int(rng.integers(lmin, lmax))
        lb = la if not asym else int(np.clip(
            la + rng.integers(-12, 13), lmin, lmax + 12))
        a = rng.integers(0, 4, la)
        b = rng.integers(0, 4, max(lb, 1))
        if rng.random() < 0.7:  # related pair: mostly a with edits
            m = min(la, lb)
            b[:m] = a[:m]
            k = max(1, m // 10)
            b[rng.integers(0, m, k)] = rng.integers(0, 4, k)
        pairs.append((conv[a], conv[b]))
    return pairs


def _slow_ok():
    import os
    if os.environ.get("USEARCH_SLOW_TESTS") == "1" or \
            os.environ.get("USEARCH_TPU_TESTS") == "1":
        return True
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def test_chase_matches_host_trace_small():
    """Always-on smoke: tiny pairs keep interpret-mode cost low."""
    ap = _ap()
    dev = WavefrontNWDevice(ap, pb=8, chunk=32)
    rng = np.random.default_rng(9)
    pairs = _rand_pairs(rng, 6, lmin=16, lmax=44, asym=True)
    from usearch12_tpu.align.oracle import band_diag_range
    groups = {0: [], 1: []}
    for p in pairs:
        d0, _ = band_diag_range(len(p[0]), len(p[1]), 16)
        groups[(len(p[0]) - d0) % 2].append(p)
    for rho0, grp in groups.items():
        if not grp:
            continue
        batch = pack_wave(grp, True, 16, dev.chunk, rho0)
        tb, mle, mlo, dlb = dev.run_batch(batch)
        s_host, p_host = trace_batch(dev, batch, tb, mle, mlo, dlb)
        s_chase, p_chase = trace_batch_chase(dev, batch, tb, mle, mlo,
                                             dlb)
        assert np.array_equal(s_host, s_chase)
        assert p_host == p_chase


@pytest.mark.skipif(not _slow_ok(),
                    reason="needs TPU or USEARCH_SLOW_TESTS=1")
@pytest.mark.parametrize("seed,asym", [(1, False), (2, True)])
def test_chase_matches_host_trace(seed, asym):
    ap = _ap()
    dev = WavefrontNWDevice(ap, pb=8, chunk=32)
    rng = np.random.default_rng(seed)
    pairs = _rand_pairs(rng, 10, lmin=20, lmax=90, asym=asym)
    # group by parity like align()
    from usearch12_tpu.align.oracle import band_diag_range
    groups = {0: [], 1: []}
    for p in pairs:
        d0, _ = band_diag_range(len(p[0]), len(p[1]), 16)
        groups[(len(p[0]) - d0) % 2].append(p)
    for rho0, grp in groups.items():
        if not grp:
            continue
        batch = pack_wave(grp, True, 16, dev.chunk, rho0)
        tb, mle, mlo, dlb = dev.run_batch(batch)
        s_host, p_host = trace_batch(dev, batch, tb, mle, mlo, dlb)
        s_chase, p_chase = trace_batch_chase(dev, batch, tb, mle, mlo,
                                             dlb)
        assert np.array_equal(s_host, s_chase)
        assert p_host == p_chase


@pytest.mark.skipif(not _slow_ok(),
                    reason="needs TPU or USEARCH_SLOW_TESTS=1")
def test_fused_chase_matches_host_align():
    """Full fused path (pack + DP + chase, letters in / ops out) vs the
    per-stage host-traceback result."""
    import jax.numpy as jnp
    from usearch12_tpu.ops.wavefront_nw import (slot_width, _quant_up,
                                                _letters, LANES)
    from usearch12_tpu.align.oracle import band_diag_range
    ap = _ap()
    dev = WavefrontNWDevice(ap, pb=8, chunk=32)
    rng = np.random.default_rng(5)
    pairs = _rand_pairs(rng, 8, lmin=30, lmax=90, asym=True)
    geo = np.zeros((len(pairs), 4), np.int32)
    idxs = []
    for i, (a, b) in enumerate(pairs):
        d0, d1 = band_diag_range(len(a), len(b), 16)
        geo[i] = (len(a), len(b), d0, d1 - d0 + 1)
        if (len(a) - d0) % 2 == 0:
            idxs.append(i)
    la, lb, dlo, bw = (np.ascontiguousarray(geo[idxs, k]) for k in
                       range(4))
    SW = slot_width(int(bw.max()))
    gpv = LANES // SW
    steps = _quant_up(int((la + lb).max()), dev.chunk)
    amax = _quant_up(int(la.max()), 128)
    bmax = _quant_up(int(lb.max()), 128)
    n = len(idxs)
    nrows = _quant_up((n + gpv - 1) // gpv, dev.pb)
    P = nrows * gpv
    a_let = np.full((P, amax), 4, np.int8)
    b_let = np.full((P, bmax), 4, np.int8)
    for k, i in enumerate(idxs):
        a, b = pairs[i]
        a_let[k, :len(a)] = _letters(a, True).astype(np.int8)
        b_let[k, :len(b)] = _letters(b, True).astype(np.int8)
    la_p = np.ones(P, np.int32)
    lb_p = np.ones(P, np.int32)
    dlo_p = np.full(P, -1, np.int32)
    bw_p = np.full(P, 4, np.int32)
    la_p[:n], lb_p[:n], dlo_p[:n], bw_p[:n] = la, lb, dlo, bw
    a_let[n:, 0] = 0
    b_let[n:, 0] = 0
    fn = fused_chase_compiled(P, amax, bmax, steps, dev.chunk, dev.pb,
                              0, SW, gpv, dev.match, dev.mismatch,
                              dev.interpret)
    scores_d, words_d = fn(jnp.asarray(a_let), jnp.asarray(b_let),
                           jnp.asarray(la_p), jnp.asarray(lb_p),
                           jnp.asarray(dlo_p), jnp.asarray(bw_p),
                           jnp.asarray(dev.gp))
    paths = decode_chase_words(np.asarray(words_d), n)
    scores = np.asarray(scores_d)[:n]

    grp = [pairs[i] for i in idxs]
    batch = pack_wave(grp, True, 16, dev.chunk, 0)
    tb, mle, mlo, dlb = dev.run_batch(batch)
    s_host, p_host = trace_batch(dev, batch, tb, mle, mlo, dlb)
    assert np.array_equal(scores, s_host)
    assert paths == p_host

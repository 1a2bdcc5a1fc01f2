"""Pallas banded NW kernel vs the Python oracle.

Runs in interpret mode on CPU (conftest forces JAX_PLATFORMS=cpu); sizes are
kept small so interpretation stays fast.  On real TPU hardware the same
assertions are exercised at scale by the driver/bench.
"""

import os

import numpy as np
import pytest

from usearch12_tpu.scoring import AlnParams, nuc_mx
from usearch12_tpu.align.oracle import banded_nw_main_diag

# Interpret-mode kernel runs cost ~1 min each; run them only when requested
# (USEARCH_SLOW_TESTS=1) or when a real TPU backend is available.
def _have_tpu():
    if os.environ.get("USEARCH_SLOW_TESTS") == "1":
        return True
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _have_tpu(), reason="interpret-mode kernel tests are slow; "
    "set USEARCH_SLOW_TESTS=1")


def make_ap():
    ap = AlnParams(nucleo=True, subst_mx=nuc_mx(1.0, -2.0))
    ap.init4(-10.0, -1.0, -0.5, -0.5)
    return ap


def rand_pairs(rng, n, lmin=40, lmax=100):
    out = []
    for _ in range(n):
        L = int(rng.integers(lmin, lmax))
        a = np.frombuffer(
            "".join("ACGT"[i] for i in rng.integers(0, 4, L)).encode(),
            dtype=np.uint8).copy()
        b = list(a)
        for _ in range(int(rng.integers(0, 8))):
            b[int(rng.integers(0, len(b)))] = ord(
                "ACGT"[int(rng.integers(0, 4))])
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, len(b)))
            if rng.integers(0, 2) == 0 and len(b) > 30:
                del b[p]
            else:
                b.insert(p, ord("ACGT"[int(rng.integers(0, 4))]))
        out.append((a, np.array(b, dtype=np.uint8)))
    return out


@pytest.mark.parametrize("seed", [3, 11])
def test_kernel_matches_oracle(seed):
    from usearch12_tpu.ops.banded_nw import BandedNWDevice
    ap = make_ap()
    rng = np.random.default_rng(seed)
    pairs = rand_pairs(rng, 4)
    dev = BandedNWDevice(ap, pb=8)
    scores, paths = dev.align(pairs, band_radius=16)
    for k, (a, b) in enumerate(pairs):
        s_o, p_o = banded_nw_main_diag(a, b, 16, ap)
        assert np.float32(s_o) == np.float32(scores[k])
        assert p_o == paths[k]


def test_device_traceback_matches_host():
    from usearch12_tpu.ops.banded_nw import BandedNWDevice
    ap = make_ap()
    rng = np.random.default_rng(5)
    pairs = rand_pairs(rng, 4)
    dev = BandedNWDevice(ap, pb=8)
    s1, p1 = dev.align(pairs, band_radius=16)
    s2, p2 = dev.align_device(pairs, band_radius=16)
    assert list(p1) == list(p2)
    assert np.allclose(s1, s2)


@pytest.mark.parametrize("seed", [5, 17])
def test_wavefront_matches_oracle(seed):
    """Anti-diagonal wavefront kernel: bit-exact scores and paths."""
    from usearch12_tpu.ops.wavefront_nw import WavefrontNWDevice
    ap = make_ap()
    rng = np.random.default_rng(seed)
    pairs = rand_pairs(rng, 6)
    dev = WavefrontNWDevice(ap, pb=8)
    scores, paths = dev.align(pairs, band_radius=16)
    for k, (a, b) in enumerate(pairs):
        s_o, p_o = banded_nw_main_diag(a, b, 16, ap)
        assert np.float32(s_o) == np.float32(scores[k])
        assert p_o == paths[k]


def test_wavefront_nondyadic_penalties():
    """Exactness does not rely on dyadic penalties (same-DAG order)."""
    from usearch12_tpu.ops.wavefront_nw import WavefrontNWDevice
    ap = AlnParams(nucleo=True, subst_mx=nuc_mx(1.0, -2.0))
    ap.init4(-10.3, -1.1, -0.7, -0.4)
    rng = np.random.default_rng(23)
    pairs = rand_pairs(rng, 4)
    dev = WavefrontNWDevice(ap, pb=8)
    scores, paths = dev.align(pairs, band_radius=16)
    for k, (a, b) in enumerate(pairs):
        s_o, p_o = banded_nw_main_diag(a, b, 16, ap)
        assert np.float32(s_o) == np.float32(scores[k])
        assert p_o == paths[k]


def test_wavefront_device_traceback():
    """XLA pointer-chase traceback == host traceback, bit-exact."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("device traceback test needs TPU")
    from usearch12_tpu.ops.wavefront_nw import WavefrontNWDevice
    ap = make_ap()
    rng = np.random.default_rng(31)
    pairs = rand_pairs(rng, 8)
    dev = WavefrontNWDevice(ap, pb=8)
    s_d, p_d = dev.align(pairs, 16, device_traceback=True)
    s_h, p_h = dev.align(pairs, 16, device_traceback=False)
    for k in range(len(pairs)):
        assert np.float32(s_d[k]) == np.float32(s_h[k])
        assert p_d[k] == p_h[k]


def test_wavefront_sharded_matches_single():
    """run_batch_sharded over an 8-device mesh is bit-identical to the
    single-device run_batch (pure data parallelism over WaveBatch rows)."""
    import jax
    from jax.sharding import Mesh
    from usearch12_tpu.ops.wavefront_nw import WavefrontNWDevice, pack_wave
    ap = make_ap()
    rng = np.random.default_rng(3)
    pairs = rand_pairs(rng, 9)
    dev = WavefrontNWDevice(ap, pb=8)
    batch = pack_wave(pairs, True, 16, dev.chunk)
    single = dev.run_batch(batch)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharded = dev.run_batch_sharded(batch, mesh)
    for a, b in zip(single, sharded):
        assert np.array_equal(a, b)


def test_fused_wave_matches_oracle():
    """Letters-in/ops-out fused device path: bit-exact scores and paths.

    On the CPU tier FusedWaveAligner falls back to the legacy align()
    (interpret mode); the fused pack->kernel->traceback chain itself is
    exercised on the real-TPU tier (USEARCH_TPU_TESTS=1, run by bench).
    """
    from usearch12_tpu.ops.wavefront_nw import (WavefrontNWDevice,
                                                FusedWaveAligner)
    ap = make_ap()
    rng = np.random.default_rng(17)
    pairs = rand_pairs(rng, 12, lmin=40, lmax=220)
    dev = WavefrontNWDevice(ap, pb=8)
    fa = FusedWaveAligner(dev)
    scores, paths = fa.align(pairs, band_radius=16)
    for k, (a, b) in enumerate(pairs):
        s_o, p_o = banded_nw_main_diag(a, b, 16, ap)
        assert np.float32(s_o) == np.float32(scores[k])
        assert p_o == paths[k]


def test_interior_bounds_conservative():
    """Brute-force check of the closed-form interior range: for every t
    in [t_lo, t_hi] and every in-band lane u, no special-case condition
    the interior substep skips can fire (terminal rows/cols, DPM[0][0],
    Drow[LB] update at u < SW, last-row capture, out-of-rectangle cell).
    """
    from usearch12_tpu.ops.wavefront_nw import (_interior_bounds,
                                                slot_width)
    rng = np.random.default_rng(5)
    for _ in range(200):
        la = int(rng.integers(3, 120))
        lb = int(rng.integers(max(3, la - 20), la + 20))
        radius = int(rng.integers(2, 20))
        from usearch12_tpu.align.oracle import band_diag_range
        d0, d1 = band_diag_range(la, lb, radius)
        bw = d1 - d0 + 1
        SW = slot_width(bw)
        rho0 = (la - d0) % 2
        t_lo, t_hi = _interior_bounds(
            np.array([la]), np.array([lb]), np.array([d0]),
            np.array([bw]), rho0, SW)
        t_lo, t_hi = int(t_lo[0]), int(t_hi[0])
        i0 = (la - d0 - rho0) // 2
        for t in range(max(t_lo, 0), t_hi + 1):
            rho = (rho0 + t) % 2
            r = (t + rho0 - rho) // 2
            s = t - r
            umax = (bw - 1 - rho) // 2
            for u in range(0, umax + 1):
                i = i0 + r - u
                j = -i0 + s + u
                assert 1 <= i <= la - 2, (la, lb, d0, bw, t, u)
                assert 1 <= j <= lb - 1, (la, lb, d0, bw, t, u)
            # Drow[LB] update lane (j == lb) must sit at u >= SW
            for u in range(0, SW):
                i = i0 + r - u
                j = -i0 + s + u
                assert not (j == lb and 0 <= i < la), \
                    (la, lb, d0, bw, t, u)


def test_interior_flags_bit_exact():
    """Interior-specialized chunks produce bit-identical outputs to the
    generic path: run the compiled kernel once with the computed flags
    (must contain interior chunks) and once with flags forced to all
    generic, and compare every output word."""
    import jax.numpy as jnp
    from usearch12_tpu.ops.wavefront_nw import (WavefrontNWDevice,
                                                pack_wave, pack_ins,
                                                _chunk_flags, _compiled)
    from usearch12_tpu.align.oracle import band_diag_range
    ap = make_ap()
    rng = np.random.default_rng(23)
    pairs = rand_pairs(rng, 12, lmin=150, lmax=240)
    # pack_wave wants one (la - dlo) parity per batch
    pairs = [p for p in pairs
             if (len(p[0]) - band_diag_range(len(p[0]), len(p[1]),
                                             16)[0]) % 2 == 0][:6]
    assert len(pairs) >= 3
    dev = WavefrontNWDevice(ap, pb=8)
    batch = pack_wave(pairs, True, 16, dev.chunk)
    R = batch.nrows
    pad = (-R) % dev.pb

    def padr(x, fill):
        if pad == 0:
            return x
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])

    flags = _chunk_flags(batch, dev.pb, R + pad, dev.chunk)
    assert flags.sum() > 0, "fixture produced no interior chunks"
    assert (flags == 0).any(), "fixture produced no generic chunks"
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
    fast = fn(*args, jnp.asarray(flags))
    slow = fn(*args, jnp.asarray(np.zeros_like(flags)))
    for name, a, b in zip(("tb", "mle", "mlo", "dlb"), fast, slow):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name

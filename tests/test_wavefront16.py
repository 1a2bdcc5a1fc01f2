"""int16 wavefront kernel (ops/wavefront_nw16.py) parity tests.

The fast tests (quantization gate, band-edge regression) always run;
the interpret-mode kernel comparisons are gated like test_pallas_nw.py
(USEARCH_SLOW_TESTS=1 or a real TPU backend).
"""

import os

import numpy as np
import pytest

from usearch12_tpu.scoring import AlnParams, nuc_mx
from usearch12_tpu.align.oracle import banded_nw, band_diag_range
from usearch12_tpu.ops.wavefront_nw16 import (quantize_params, steps_fit,
                                              RANGE_LIMIT)


def make_ap(open_=-10.0, ext=-1.0, topen=-0.5, text=-0.5,
            match=1.0, mismatch=-2.0):
    ap = AlnParams(nucleo=True, subst_mx=nuc_mx(match, mismatch))
    ap.init4(open_, ext, topen, text)
    return ap


def _have_slow():
    if os.environ.get("USEARCH_SLOW_TESTS") == "1":
        return True
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


slow = pytest.mark.skipif(
    not _have_slow(), reason="interpret-mode kernel tests are slow; "
    "set USEARCH_SLOW_TESTS=1")


def test_quantize_gate():
    ap = make_ap()
    q = quantize_params(ap, 1.0, -2.0)
    assert q is not None and q[0] == 2
    assert steps_fit(1024, *q)       # 2x250nt amplicon pairs fit
    assert not steps_fit(RANGE_LIMIT, *q)
    # non-dyadic penalties do not quantize at any supported scale
    assert quantize_params(make_ap(open_=-10.3), 1.0, -2.0) is None
    assert quantize_params(make_ap(), 1.0, -2.3) is None
    # quarter-step penalties quantize at scale 4
    q4 = quantize_params(make_ap(topen=-0.25, text=-0.25), 1.0, -2.0)
    assert q4 is not None and q4[0] == 4


def test_band_edge_rho1_odd_bw():
    """Regression: the f32 kernel's ume/umo selection was keyed on
    absolute rho instead of rho == rho0, dropping the in-band D* == dhi
    diagonal for rho0 == 1 batches with odd band width.  This geometry
    (explicit diag window, path riding the band edge) is reachable from
    the engine's HSP-anchored hole DP."""
    from usearch12_tpu.ops.wavefront_nw import WavefrontNWDevice
    from usearch12_tpu.ops.wavefront_nw16 import WavefrontNW16Device
    ap = make_ap()
    a = np.frombuffer(b"ACGTAACGTA", dtype=np.uint8).copy()
    b = np.frombuffer(b"ACGTA" + b"C" * 15 + b"ACGTA",
                      dtype=np.uint8).copy()
    # dlo=9 -> rho0=1, dhi=25 -> bw=17 (odd); optimal path rides D*=dhi
    pair = (a, b, 9, 25)
    s_o, p_o = banded_nw(a, b, 9, 25, ap)
    for dev in (WavefrontNWDevice(ap, pb=8, interpret=True),
                WavefrontNW16Device(ap, pb=8, interpret=True)):
        s, p = dev.align([pair], 0, True)
        assert np.float32(s_o) == np.float32(s[0])
        assert p_o == p[0]


@slow
@pytest.mark.parametrize("seed", [3, 29])
def test_i16_matches_f32_tensors(seed):
    """The i16 kernel's (tb, mle, mlo, dlb) tensors are exactly equal to
    the f32 kernel's on real rows — same DP, 2x lane density."""
    from usearch12_tpu.ops.wavefront_nw import (WavefrontNWDevice,
                                                pack_wave)
    from usearch12_tpu.ops.wavefront_nw16 import (WavefrontNW16Device,
                                                  pack_wave16)
    ap = make_ap()
    dev32 = WavefrontNWDevice(ap, pb=8, chunk=32, interpret=True)
    dev16 = WavefrontNW16Device(ap, pb=8, chunk=32, interpret=True)
    rng = np.random.default_rng(seed)
    conv = np.frombuffer(b"ACGTN", dtype=np.uint8)
    pairs = []
    for _ in range(13):
        la = int(rng.integers(12, 60))
        lb = int(rng.integers(12, 60))
        d0, d1 = band_diag_range(la, lb, 16)
        pairs.append((conv[rng.integers(0, 5, la)],
                      conv[rng.integers(0, 5, lb)], d0, d1))
    for rho0 in (0, 1):
        sel = [p for p in pairs if (len(p[0]) - p[2]) % 2 == rho0]
        if not sel:
            continue
        t32 = dev32.run_batch(pack_wave(sel, True, 16, 32, rho0))
        t16 = dev16.run_batch(pack_wave16(sel, True, 16, 32, rho0))
        for x, y in zip(t32, t16):
            assert np.array_equal(x, y)


@slow
def test_i16_matches_oracle():
    from usearch12_tpu.ops.wavefront_nw16 import WavefrontNW16Device
    ap = make_ap()
    dev = WavefrontNW16Device(ap, pb=8, interpret=True)
    assert dev.usable
    rng = np.random.default_rng(7)
    conv = np.frombuffer(b"ACGTN", dtype=np.uint8)
    pairs = []
    for _ in range(10):
        la = int(rng.integers(15, 70))
        lb = int(rng.integers(15, 70))
        pairs.append((conv[rng.integers(0, 5, la)],
                      conv[rng.integers(0, 5, lb)]))
    scores, paths = dev.align(pairs, band_radius=16)
    for k, (a, b) in enumerate(pairs):
        d0, d1 = band_diag_range(len(a), len(b), 16)
        s_o, p_o = banded_nw(a, b, d0, d1, ap)
        assert np.float32(s_o) == np.float32(scores[k])
        assert p_o == paths[k]


@slow
def test_i16_fallback_nonquantizable():
    from usearch12_tpu.ops.wavefront_nw16 import WavefrontNW16Device
    ap = make_ap(open_=-10.3, ext=-1.1, topen=-0.7, text=-0.4)
    dev = WavefrontNW16Device(ap, pb=8, interpret=True)
    assert not dev.usable
    rng = np.random.default_rng(5)
    conv = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = [(conv[rng.integers(0, 4, 30)], conv[rng.integers(0, 4, 33)])
             for _ in range(3)]
    scores, paths = dev.align(pairs, band_radius=16)
    for k, (a, b) in enumerate(pairs):
        d0, d1 = band_diag_range(len(a), len(b), 16)
        s_o, p_o = banded_nw(a, b, d0, d1, ap)
        assert np.float32(s_o) == np.float32(scores[k])
        assert p_o == paths[k]


def test_device_packer_matches_host_pack():
    """_pack_jax_builder16 (pure XLA, the fused path's on-device pack)
    emits byte-identical mask tiles to pack_wave16 + pack_ins16."""
    import jax.numpy as jnp
    from usearch12_tpu.ops.banded_nw import _letters
    from usearch12_tpu.ops.wavefront_nw16 import (pack_wave16, pack_ins16,
                                                  _pack_jax_builder16)
    ap = make_ap()
    rng = np.random.default_rng(21)
    conv = np.frombuffer(b"ACGTN", dtype=np.uint8)
    for rho0 in (0, 1):
        pairs = []
        while len(pairs) < 8:
            la = int(rng.integers(15, 60))
            lb = int(rng.integers(15, 60))
            d0, d1 = band_diag_range(la, lb, 16)
            if (la - d0) % 2 != rho0:
                continue
            pairs.append((conv[rng.integers(0, 5, la)],
                          conv[rng.integers(0, 5, lb)], d0, d1))
        b16 = pack_wave16(pairs, True, 16, 32, rho0)
        gpv = b16.gpv
        n_use = (len(pairs) // gpv) * gpv   # compare complete rows only
        pairs = pairs[:n_use]
        b16 = pack_wave16(pairs, True, 16, 32, rho0)
        P = n_use
        amax = ((max(len(p[0]) for p in pairs) + 127) // 128) * 128
        bmax = ((max(len(p[1]) for p in pairs) + 127) // 128) * 128
        a_let = np.full((P, amax), 4, np.int8)
        b_let = np.full((P, bmax), 4, np.int8)
        la_p = np.zeros(P, np.int32)
        lb_p = np.zeros(P, np.int32)
        dlo_p = np.zeros(P, np.int32)
        bw_p = np.zeros(P, np.int32)
        for i, (a, b, d0, d1) in enumerate(pairs):
            a_let[i, :len(a)] = _letters(a, True)
            b_let[i, :len(b)] = _letters(b, True)
            la_p[i], lb_p[i] = len(a), len(b)
            dlo_p[i], bw_p[i] = d0, d1 - d0 + 1
        pack = _pack_jax_builder16(P, amax, bmax, b16.steps, b16.sw,
                                   gpv, rho0)
        m00_d, ins_d = pack(jnp.asarray(a_let), jnp.asarray(b_let),
                            jnp.asarray(la_p), jnp.asarray(lb_p),
                            jnp.asarray(dlo_p), jnp.asarray(bw_p))
        nr = P // gpv
        assert np.array_equal(np.asarray(m00_d)[:nr], b16.mask00[:nr])
        assert np.array_equal(np.asarray(ins_d)[:nr],
                              pack_ins16(b16.ins)[:nr])


@slow
def test_fused16_matches_oracle():
    """Full fused i16 pipeline (device pack -> i16 kernel -> device
    traceback) in interpret mode, driven via _group (align() falls back
    to the batch path under interpret)."""
    from usearch12_tpu.ops.wavefront_nw16 import (WavefrontNW16Device,
                                                  FusedWave16Aligner)
    ap = make_ap()
    dev = WavefrontNW16Device(ap, pb=8, chunk=32, interpret=True)
    fa = FusedWave16Aligner(dev)
    rng = np.random.default_rng(33)
    conv = np.frombuffer(b"ACGTN", dtype=np.uint8)
    pairs = []
    for _ in range(9):
        la = int(rng.integers(15, 60))
        lb = int(rng.integers(15, 60))
        pairs.append((conv[rng.integers(0, 5, la)],
                      conv[rng.integers(0, 5, lb)]))
    geo = np.zeros((len(pairs), 4), np.int32)
    idx = ([], [])
    for i, (a, b) in enumerate(pairs):
        d0, d1 = band_diag_range(len(a), len(b), 16)
        geo[i] = (len(a), len(b), d0, d1 - d0 + 1)
        idx[(len(a) - d0) % 2].append(i)
    scores = np.zeros(len(pairs), np.float32)
    paths = [None] * len(pairs)
    for rho0 in (0, 1):
        if idx[rho0]:
            fa._group(pairs, idx[rho0], geo, rho0, True, scores, paths)
    for k, (a, b) in enumerate(pairs):
        d0, d1 = band_diag_range(len(a), len(b), 16)
        s_o, p_o = banded_nw(a, b, d0, d1, ap)
        assert np.float32(s_o) == scores[k]
        assert p_o == paths[k]

"""Native C kernel vs pure-Python oracle equivalence."""

import numpy as np
import pytest

from usearch12_tpu.alpha import to_bytes
from usearch12_tpu.scoring import AlnParams, AlnHeuristics
from usearch12_tpu.align.oracle import banded_nw_main_diag, full_nw
from usearch12_tpu.align.hsp import HSPFinder
from usearch12_tpu.align.global_aligner import global_align


def rand_pair(rng, length=120, subs=10, indels=3):
    a = to_bytes("".join("ACGT"[i] for i in rng.integers(0, 4, length)))
    b = list(a)
    for _ in range(subs):
        b[int(rng.integers(0, len(b)))] = ord("ACGT"[int(rng.integers(0, 4))])
    for _ in range(indels):
        p = int(rng.integers(0, len(b)))
        if rng.integers(0, 2) == 0 and len(b) > 50:
            del b[p]
        else:
            b.insert(p, ord("ACGT"[int(rng.integers(0, 4))]))
    return a, np.array(b, dtype=np.uint8)


@pytest.fixture(scope="module")
def native():
    from usearch12_tpu.native import get_lib
    lib = get_lib()
    if lib is None:
        pytest.skip("no C compiler")
    return lib


def test_native_global_align_matches_oracle(native):
    from usearch12_tpu.native import NativeAligner
    from usearch12_tpu.config import reset_options, oset
    reset_options()
    oset("id", 0.8)
    ap = AlnParams.from_cmdline(True)
    ah = AlnHeuristics.from_cmdline(ap)
    na = NativeAligner(ap, ah)
    hf = HSPFinder(ap, ah)
    rng = np.random.default_rng(42)
    n_aligned = 0
    for _ in range(40):
        a, b = rand_pair(rng)
        na.set_a(a)
        na.set_b(b)
        p_native = na.global_align()
        hf.set_a(a)
        hf.set_b(b)
        p_oracle = global_align(a, b, ap, ah, hf)
        assert p_native == p_oracle
        if p_native is not None:
            n_aligned += 1
    assert n_aligned > 10  # sanity: the test exercises real alignments


def test_native_banded_nw_matches_oracle(native):
    import ctypes
    from usearch12_tpu.native import GapParams
    from usearch12_tpu.align.oracle import band_diag_range
    ap = AlnParams.from_cmdline(True)
    gp = GapParams.from_alnparams(ap)
    mx = np.ascontiguousarray(ap.subst_mx, dtype=np.float32)
    rng = np.random.default_rng(9)
    for _ in range(25):
        a, b = rand_pair(rng, length=80, subs=8, indels=4)
        la, lb = len(a), len(b)
        dlo, dhi = band_diag_range(la, lb, 16)
        tb = np.zeros((la + 1) * (lb + 1), dtype=np.uint8)
        mrow = np.zeros(lb + 2, dtype=np.float32)
        drow = np.zeros(lb + 1, dtype=np.float32)
        path = ctypes.create_string_buffer(la + lb + 2)
        score = ctypes.c_float(0)
        n = native.nw_band(np.ascontiguousarray(a), la,
                           np.ascontiguousarray(b), lb, dlo, dhi,
                           ctypes.byref(gp), mx, tb, mrow, drow, path,
                           ctypes.byref(score))
        assert n > 0
        s_o, p_o = banded_nw_main_diag(a, b, 16, ap)
        assert path.raw[:n].decode() == p_o
        assert score.value == pytest.approx(s_o, abs=1e-3)

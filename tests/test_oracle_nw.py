"""Banded NW oracle invariants and cross-checks."""

import numpy as np
import pytest

from usearch12_tpu.alpha import to_bytes
from usearch12_tpu.scoring import AlnParams, nuc_mx
from usearch12_tpu.align.oracle import banded_nw_main_diag, full_nw


def make_ap():
    ap = AlnParams(nucleo=True, subst_mx=nuc_mx(1.0, -2.0))
    ap.init4(-10.0, -1.0, -0.5, -0.5)
    return ap


def path_valid(path, la, lb):
    di = sum(1 for c in path if c in "MD")
    dj = sum(1 for c in path if c in "MI")
    return di == la and dj == lb


def score_path(a, b, path, ap):
    """Independent path scorer with the 12-penalty terminal model."""
    s = 0.0
    i = j = 0
    n = len(path)
    for col, c in enumerate(path):
        if c == "M":
            s += float(ap.subst_mx[a[i], b[j]])
            i += 1
            j += 1
        else:
            prev = path[col - 1] if col > 0 else None
            at_left = col == 0 or all(x == c for x in path[:col])
            at_right = all(x == c for x in path[col:])
            if c == "D":
                open_p = ap.l_open_b if at_left else (
                    ap.r_open_b if at_right else ap.open_b)
                ext_p = ap.l_ext_b if at_left else (
                    ap.r_ext_b if at_right else ap.ext_b)
                s += float(open_p if prev != "D" else ext_p)
                i += 1
            else:
                open_p = ap.l_open_a if at_left else (
                    ap.r_open_a if at_right else ap.open_a)
                ext_p = ap.l_ext_a if at_left else (
                    ap.r_ext_a if at_right else ap.ext_a)
                s += float(open_p if prev != "I" else ext_p)
                j += 1
    return s


def test_identical():
    ap = make_ap()
    a = to_bytes("ACGTACGTACGTACGTACGT")
    score, path = banded_nw_main_diag(a, a, 16, ap)
    assert path == "M" * len(a)
    assert score == pytest.approx(len(a))


def test_single_mismatch():
    ap = make_ap()
    a = to_bytes("ACGTACGTACGTACGTACGT")
    b = a.copy()
    b[10] = ord("C")
    score, path = banded_nw_main_diag(a, b, 16, ap)
    assert path == "M" * len(a)
    assert score == pytest.approx(len(a) - 3)  # 19*1 + (-2)


def test_single_insertion():
    ap = make_ap()
    a = to_bytes("ACGTTTACGGACGTCCGGTT")
    b = np.concatenate([a[:8], to_bytes("A"), a[8:]])
    score, path = banded_nw_main_diag(a, b, 16, ap)
    assert path_valid(path, len(a), len(b))
    assert path.count("I") == 1 and path.count("D") == 0


def test_full_vs_banded_wide_band():
    """With a band covering the whole matrix, banded == full DP."""
    rng = np.random.default_rng(3)
    ap = make_ap()
    for _ in range(20):
        la = int(rng.integers(5, 40))
        lb = int(rng.integers(5, 40))
        a = to_bytes("".join("ACGT"[i] for i in rng.integers(0, 4, la)))
        b = to_bytes("".join("ACGT"[i] for i in rng.integers(0, 4, lb)))
        s1, p1 = banded_nw_main_diag(a, b, 64, ap)
        s2, p2 = full_nw(a, b, ap)
        assert s1 == pytest.approx(s2), (p1, p2)
        assert path_valid(p1, la, lb)
        assert path_valid(p2, la, lb)


def test_score_matches_path_rescore():
    rng = np.random.default_rng(5)
    ap = make_ap()
    for _ in range(10):
        la = int(rng.integers(10, 60))
        a = to_bytes("".join("ACGT"[i] for i in rng.integers(0, 4, la)))
        b = a.copy()
        # a few mutations
        for _ in range(3):
            b[int(rng.integers(0, la))] = ord("ACGT"[int(rng.integers(0, 4))])
        score, path = full_nw(a, b, ap)
        assert score == pytest.approx(score_path(a, b, path, ap), abs=1e-3)

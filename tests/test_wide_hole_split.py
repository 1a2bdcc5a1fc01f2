"""Wide-hole split in the batch engine (ADVICE r3): holes whose band
exceeds BW_DEV_MAX route to the host kernel while the rest dispatch to
the device, and the re-interleaved paths must equal the host-only run.

Runs the engine with the interpret-mode device (-engine_device) on the
CPU tier; the workload mixes one very length-asymmetric pair (query
middle much longer than target middle -> hole band > 254) with normal
equal-length pairs.
"""

import os

import numpy as np
import pytest

from usearch12_tpu.cli import main as cli_main


def _slow_ok():
    if os.environ.get("USEARCH_SLOW_TESTS") == "1" or \
            os.environ.get("USEARCH_TPU_TESTS") == "1":
        return True
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _slow_ok(), reason="needs TPU backend or USEARCH_SLOW_TESTS=1")


def _write(path, recs):
    with open(path, "w") as f:
        for label, seq in recs:
            f.write(f">{label}\n{seq.tobytes().decode()}\n")


def test_wide_hole_split_parity(tmp_path):
    rng = np.random.default_rng(11)
    conv = np.frombuffer(b"ACGT", np.uint8)
    pre = conv[rng.integers(0, 4, 300)]
    suf = conv[rng.integers(0, 4, 300)]

    def seq(mid_len, seed):
        r = np.random.default_rng(seed)
        return np.concatenate([pre, conv[r.integers(0, 4, mid_len)], suf])

    # target: short middle; queries: one with a much longer middle
    # (hole band = |600-120| + 33 = 513 > BW_DEV_MAX) + normal ones
    targets = [("t0", seq(120, 1)), ("t1", seq(120, 2))]
    queries = [("qwide", seq(600, 3)),
               ("q1", seq(120, 4)), ("q2", seq(120, 5)),
               ("q3", seq(124, 6))]
    db_fa = str(tmp_path / "db.fa")
    q_fa = str(tmp_path / "q.fa")
    _write(db_fa, targets)
    _write(q_fa, queries)

    base = ["-usearch_global", q_fa, "-db", db_fa, "-id", "0.3",
            "-strand", "plus", "-gaforce", "-quiet"]
    d_b6 = str(tmp_path / "d.b6")
    h_b6 = str(tmp_path / "h.b6")
    # static gate forces every hole batch at the device split logic
    assert cli_main(base + ["-blast6out", d_b6, "-engine_device",
                            "-dev_batch_cells", "1"]) == 0
    assert cli_main(base + ["-blast6out", h_b6,
                            "-no_engine_device"]) == 0
    d = open(d_b6).read()
    assert d == open(h_b6).read()
    assert "qwide" in d, "wide-hole query produced no hit - vacuous test"

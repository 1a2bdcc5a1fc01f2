"""Randomized-option parity fuzz: usearch_global vs the reference binary.

Deterministic seeds; each trial draws a random option combo, runs both
implementations and byte-compares blast6 + uc outputs.
"""

import os
import random
import subprocess

import pytest

from usearch12_tpu.cli import main as cli_main
from usearch12_tpu.config import reset_options


def _run_ref(ref_bin, args):
    r = subprocess.run([ref_bin] + args + ["-quiet", "-threads", "1"],
                       capture_output=True, text=True)
    return r.returncode


def _draw(rng):
    opts = ["-id", rng.choice(["0.8", "0.9", "0.95"]),
            "-strand", rng.choice(["plus", "both"])]
    if rng.random() < 0.3:
        opts += ["-maxaccepts", str(rng.choice([1, 2, 4]))]
    if rng.random() < 0.3:
        opts += ["-maxrejects", str(rng.choice([4, 8, 32]))]
    if rng.random() < 0.25:
        opts += ["-mincols", str(rng.choice([50, 150]))]
    if rng.random() < 0.25:
        opts += ["-maxgaps", str(rng.choice([0, 2, 5]))]
    if rng.random() < 0.25:
        opts += ["-query_cov", rng.choice(["0.5", "0.9"])]
    if rng.random() < 0.25:
        opts += ["-target_cov", rng.choice(["0.5", "0.9"])]
    if rng.random() < 0.2:
        opts += ["-maxdiffs", str(rng.choice([5, 20]))]
    if rng.random() < 0.2:
        opts += ["-self"]
    if rng.random() < 0.2:
        opts += ["-sizein", "-sizeout"]
    if rng.random() < 0.25:
        opts += ["-wordlength", str(rng.choice([6, 7, 10]))]
    if rng.random() < 0.25:
        opts += ["-band", str(rng.choice([8, 32]))]
    if rng.random() < 0.2:
        opts += ["-match", "2.0", "-mismatch", "-3.0"]
    if rng.random() < 0.2:
        opts += ["-maxhits", str(rng.choice([1, 3]))]
    if rng.random() < 0.15:
        opts += ["-output_no_hits"]
    if rng.random() < 0.15:
        opts += ["-top_hit_only"]
    if rng.random() < 0.15:
        opts += ["-minseqlength", "100"]
    return opts


@pytest.mark.parametrize("seed", [1, 2, 7])
def test_fuzz_usearch_global(ref_bin, amplicons_small_fa, tmp_path, seed):
    rng = random.Random(seed)
    for trial in range(12):
        opts = _draw(rng)
        g_b6 = str(tmp_path / "g.b6")
        g_uc = str(tmp_path / "g.uc")
        m_b6 = str(tmp_path / "m.b6")
        m_uc = str(tmp_path / "m.uc")
        for p in (g_b6, g_uc, m_b6, m_uc):
            if os.path.exists(p):
                os.remove(p)
        base = ["-usearch_global", amplicons_small_fa, "-db",
                amplicons_small_fa] + opts
        if _run_ref(ref_bin, base + ["-blast6out", g_b6, "-uc", g_uc]) != 0:
            continue
        reset_options()
        assert cli_main(base + ["-blast6out", m_b6, "-uc", m_uc,
                                "-quiet"]) == 0, opts
        assert open(g_b6).read() == open(m_b6).read(), opts
        assert open(g_uc).read() == open(m_uc).read(), opts

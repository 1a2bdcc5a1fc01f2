"""Device SINTAX bootstraps (amplicon/sintax_device.py): -tabbedout
bytes must equal the host path exactly (RNG replay incl. random
tie-breaks).  Pure-XLA formulation, so it runs on the CPU test tier."""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _gen(tmp_path, n_db=300, n_q=120, both=True):
    rng = np.random.default_rng(9)
    conv = "ACGT"
    dbf = str(tmp_path / "db.fa")
    qf = str(tmp_path / "q.fa")
    seqs = []
    with open(dbf, "w") as f:
        for i in range(n_db):
            s = "".join(conv[j] for j in rng.integers(0, 4, 220))
            seqs.append(s)
            f.write(f">r{i};tax=d:D{i % 4},p:P{i % 16},g:G{i % 64};\n"
                    f"{s}\n")
    with open(qf, "w") as f:
        for i in range(n_q):
            s = bytearray(seqs[i % n_db].encode())
            for p in rng.integers(0, len(s), 5):
                s[p] = ord(conv[rng.integers(0, 4)])
            f.write(f">q{i}\n{s.decode()}\n")
    return dbf, qf


def _run(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-m", "usearch12_tpu.cli"] + args,
                       capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]


@pytest.mark.parametrize("strand", ["both", "plus"])
def test_sintax_device_parity(tmp_path, strand):
    dbf, qf = _gen(tmp_path)
    d_out = str(tmp_path / "d.sin")
    h_out = str(tmp_path / "h.sin")
    base = ["-sintax", qf, "-db", dbf, "-strand", strand, "-quiet",
            "-randseed", "1"]
    _run(base + ["-tabbedout", d_out, "-sintax_device"])
    _run(base + ["-tabbedout", h_out])
    d = open(d_out, "rb").read()
    assert d == open(h_out, "rb").read()
    assert len(d) > 0


def test_sintax_device_parity_vs_reference(tmp_path, ref_bin):
    """Device path vs the reference binary directly."""
    dbf, qf = _gen(tmp_path, n_db=200, n_q=60)
    d_out = str(tmp_path / "d.sin")
    r_out = str(tmp_path / "r.sin")
    _run(["-sintax", qf, "-db", dbf, "-strand", "both", "-quiet",
          "-randseed", "1", "-tabbedout", d_out, "-sintax_device"])
    subprocess.run([ref_bin, "-sintax", qf, "-db", dbf, "-strand",
                    "both", "-quiet", "-randseed", "1", "-tabbedout",
                    r_out, "-threads", "1"],
                   capture_output=True, timeout=600, check=True)
    assert open(d_out, "rb").read() == open(r_out, "rb").read()


def test_sintax_device_boot_subset_divide(tmp_path):
    """boot_subset '/8' divide mode: per-query m varies."""
    dbf, qf = _gen(tmp_path, n_db=150, n_q=40, both=False)
    d_out = str(tmp_path / "d.sin")
    h_out = str(tmp_path / "h.sin")
    base = ["-sintax", qf, "-db", dbf, "-strand", "plus", "-quiet",
            "-randseed", "1", "-boot_subset", "/8"]
    _run(base + ["-tabbedout", d_out, "-sintax_device"])
    _run(base + ["-tabbedout", h_out])
    assert open(d_out, "rb").read() == open(h_out, "rb").read()

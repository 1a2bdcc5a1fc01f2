"""Golden-output parity: usearch_local vs the reference binary."""

import subprocess

import numpy as np
import pytest

from usearch12_tpu.cli import main as cli_main


def run_ref(ref_bin, args):
    subprocess.run([ref_bin] + args + ["-quiet", "-threads", "1"],
                   check=True, capture_output=True)


def run_mine(args):
    assert cli_main(args + ["-quiet"]) == 0


@pytest.fixture(scope="module")
def local_nt(tmp_path_factory):
    """nt targets + query fragments (some revcomp'd, some with inserted
    junk to split into multiple HSPs)."""
    d = tmp_path_factory.mktemp("local_nt")
    rng = np.random.RandomState(402)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = {65: 84, 84: 65, 67: 71, 71: 67}
    targets = []
    with open(d / "db.fa", "w") as f:
        for i in range(25):
            L = rng.randint(300, 800)
            s = bases[rng.randint(0, 4, L)]
            targets.append(s)
            f.write(f">t{i}\n{s.tobytes().decode()}\n")
    with open(d / "q.fa", "w") as f:
        for i in range(20):
            t = targets[rng.randint(0, len(targets))]
            lo = rng.randint(0, max(1, len(t) - 200))
            frag = t[lo:lo + rng.randint(100, 200)].copy()
            nm = max(1, len(frag) // 15)
            idx = rng.choice(len(frag), nm, replace=False)
            frag[idx] = bases[rng.randint(0, 4, nm)]
            if i % 4 == 0:
                mid = len(frag) // 2
                junk = bases[rng.randint(0, 4, 30)]
                frag = np.concatenate([frag[:mid], junk, frag[mid:]])
            if i % 2 == 1:
                frag = np.array([comp[c] for c in frag[::-1]],
                                dtype=np.uint8)
            f.write(f">q{i}\n{frag.tobytes().decode()}\n")
    return str(d / "q.fa"), str(d / "db.fa")


@pytest.fixture(scope="module")
def local_aa(tmp_path_factory):
    d = tmp_path_factory.mktemp("local_aa")
    rng = np.random.RandomState(77)
    aas = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    targets = []
    with open(d / "db.fa", "w") as f:
        for i in range(20):
            L = rng.randint(150, 500)
            s = aas[rng.randint(0, 20, L)]
            targets.append(s)
            f.write(f">p{i}\n{s.tobytes().decode()}\n")
    with open(d / "q.fa", "w") as f:
        for i in range(15):
            t = targets[rng.randint(0, len(targets))]
            lo = rng.randint(0, max(1, len(t) - 120))
            frag = t[lo:lo + rng.randint(60, 120)].copy()
            nm = max(1, len(frag) // 8)
            idx = rng.choice(len(frag), nm, replace=False)
            frag[idx] = aas[rng.randint(0, 20, nm)]
            f.write(f">x{i}\n{frag.tobytes().decode()}\n")
    return str(d / "q.fa"), str(d / "db.fa")


@pytest.mark.parametrize("extra", [
    ["-strand", "plus"],
    ["-strand", "both"],
    ["-strand", "both", "-maxaccepts", "4", "-maxrejects", "64",
     "-id", "0.9"],
])
def test_local_parity_nt(ref_bin, local_nt, tmp_path, extra):
    q, db = local_nt
    golden = str(tmp_path / "golden.b6")
    mine = str(tmp_path / "mine.b6")
    base = ["-usearch_local", q, "-db", db, "-evalue", "1e-6"]
    run_ref(ref_bin, base + extra + ["-blast6out", golden])
    run_mine(base + extra + ["-blast6out", mine])
    assert open(golden).read() == open(mine).read()


def test_local_parity_aa(ref_bin, local_aa, tmp_path):
    q, db = local_aa
    golden = str(tmp_path / "golden.b6")
    mine = str(tmp_path / "mine.b6")
    base = ["-usearch_local", q, "-db", db, "-evalue", "1e-3"]
    run_ref(ref_bin, base + ["-blast6out", golden])
    run_mine(base + ["-blast6out", mine])
    assert open(golden).read() == open(mine).read()

"""Golden-output parity: cluster_otus (UPARSE) vs the reference binary."""

import subprocess

import numpy as np
import pytest

from usearch12_tpu.cli import main as cli_main


def run_ref(ref_bin, args):
    subprocess.run([ref_bin] + args + ["-quiet", "-threads", "1"],
                   check=True, capture_output=True)


@pytest.fixture(scope="module")
def uparse_fa(tmp_path_factory):
    """Size-sorted uniques: templates, near-variants and bimeras."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from genseqs import rand_seq, mutate
    rng = np.random.default_rng(42)
    tpls = [rand_seq(rng, 230) for _ in range(8)]
    recs = []
    k = 0
    for ti, t in enumerate(tpls):
        recs.append((f"tpl{ti}", t, int(rng.integers(300, 800))))
        for _ in range(15):
            recs.append((f"r{k}", mutate(rng, t, int(rng.integers(0, 4)),
                                         int(rng.integers(0, 2))), 1))
            k += 1
    for i in range(12):
        a, b = rng.choice(8, 2, replace=False)
        cut = int(rng.integers(60, 170))
        recs.append((f"chim{i}", tpls[a][:cut] + tpls[b][cut:],
                     int(rng.integers(2, 8))))
    recs.sort(key=lambda r: -r[2])
    path = str(tmp_path_factory.mktemp("uparse") / "in.fa")
    with open(path, "w") as f:
        for n, s, sz in recs:
            f.write(f">{n};size={sz};\n{s}\n")
    return path


@pytest.fixture(scope="module")
def uparse_big_fa(tmp_path_factory):
    """>100 OTUs so the ChunkSearcher hot-candidate path is exercised
    (src/chunksearcher.cpp:61-66 align-all cutoff at -uparse_maxdball 100),
    plus noisy chimeras and near-identical variants for the match/good/
    noisy model classes."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from genseqs import rand_seq, mutate
    rng = np.random.default_rng(123)
    tpls = [rand_seq(rng, 240) for _ in range(130)]
    recs = []
    k = 0
    for ti, t in enumerate(tpls):
        recs.append((f"tpl{ti}", t, int(rng.integers(100, 900))))
        for _ in range(3):
            recs.append((f"v{k}", mutate(rng, t, int(rng.integers(1, 6)),
                                         int(rng.integers(0, 2))),
                         int(rng.integers(2, 40))))
            k += 1
    for i in range(40):
        a, b = rng.choice(len(tpls), 2, replace=False)
        cut = int(rng.integers(60, 180))
        c = tpls[a][:cut] + tpls[b][cut:]
        if i % 3 == 0:
            c = mutate(rng, c, 1, 0)
        recs.append((f"chim{i}", c, int(rng.integers(2, 20))))
    recs.sort(key=lambda r: -r[2])
    path = str(tmp_path_factory.mktemp("uparse") / "big.fa")
    with open(path, "w") as f:
        for n, s, sz in recs:
            f.write(f">{n};size={sz};\n{s}\n")
    return path


def test_cluster_otus_parity(ref_bin, uparse_fa, tmp_path):
    g_fa, g_up = str(tmp_path / "g.fa"), str(tmp_path / "g.up")
    m_fa, m_up = str(tmp_path / "m.fa"), str(tmp_path / "m.up")
    g_aln, m_aln = str(tmp_path / "g.aln"), str(tmp_path / "m.aln")
    run_ref(ref_bin, ["-cluster_otus", uparse_fa, "-otus", g_fa,
                      "-uparseout", g_up, "-uparsealnout", g_aln,
                      "-relabel", "Otu"])
    assert cli_main(["-cluster_otus", uparse_fa, "-otus", m_fa,
                     "-uparseout", m_up, "-uparsealnout", m_aln,
                     "-relabel", "Otu", "-quiet"]) == 0
    assert open(g_up).read() == open(m_up).read()
    assert open(g_fa).read() == open(m_fa).read()
    assert open(g_aln).read() == open(m_aln).read()


def test_cluster_otus_chunked_parity(ref_bin, uparse_big_fa, tmp_path):
    g_fa, g_up = str(tmp_path / "g.fa"), str(tmp_path / "g.up")
    m_fa, m_up = str(tmp_path / "m.fa"), str(tmp_path / "m.up")
    run_ref(ref_bin, ["-cluster_otus", uparse_big_fa, "-otus", g_fa,
                      "-uparseout", g_up])
    assert cli_main(["-cluster_otus", uparse_big_fa, "-otus", m_fa,
                     "-uparseout", m_up, "-quiet"]) == 0
    assert open(g_up).read() == open(m_up).read()
    assert open(g_fa).read() == open(m_fa).read()


def test_cluster_otus_minsize(ref_bin, uparse_fa, tmp_path):
    """-minsize 5 stops the size-sorted stream early."""
    g_fa, m_fa = str(tmp_path / "g.fa"), str(tmp_path / "m.fa")
    run_ref(ref_bin, ["-cluster_otus", uparse_fa, "-otus", g_fa,
                      "-minsize", "5"])
    assert cli_main(["-cluster_otus", uparse_fa, "-otus", m_fa,
                     "-minsize", "5", "-quiet"]) == 0
    assert open(g_fa).read() == open(m_fa).read()

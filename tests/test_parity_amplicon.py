"""Golden-output parity: unoise3 / uchime3_denovo vs the reference binary."""

import subprocess

import numpy as np
import pytest

from usearch12_tpu.cli import main as cli_main


def run_ref(ref_bin, args):
    subprocess.run([ref_bin] + args + ["-quiet", "-threads", "1"],
                   check=True, capture_output=True)


@pytest.fixture(scope="module")
def chimera_fa(tmp_path_factory):
    """Size-sorted uniques with synthetic bimeras."""
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
    path = str(tmp_path_factory.mktemp("chim") / "chim.fa")
    with open(path, "w") as f:
        for n, s, sz in recs:
            f.write(f">{n};size={sz};\n{s}\n")
    return path


def test_uchime3_denovo_parity(ref_bin, chimera_fa, tmp_path):
    keys = ("ch", "non", "tab", "aln", "uca")
    g = {k: str(tmp_path / f"g_{k}") for k in keys}
    m = {k: str(tmp_path / f"m_{k}") for k in keys}
    run_ref(ref_bin, ["-uchime3_denovo", chimera_fa, "-chimeras", g["ch"],
                      "-nonchimeras", g["non"], "-uchimeout", g["tab"],
                      "-alnout", g["aln"], "-uchimealnout", g["uca"]])
    assert cli_main(["-uchime3_denovo", chimera_fa, "-chimeras", m["ch"],
                     "-nonchimeras", m["non"], "-uchimeout", m["tab"],
                     "-alnout", m["aln"], "-uchimealnout", m["uca"],
                     "-quiet"]) == 0
    for k in g:
        assert open(g[k]).read() == open(m[k]).read(), k


def test_unoise3_parity(ref_bin, chimera_fa, tmp_path):
    g_z, g_t = str(tmp_path / "g_z.fa"), str(tmp_path / "g_t.tab")
    m_z, m_t = str(tmp_path / "m_z.fa"), str(tmp_path / "m_t.tab")
    run_ref(ref_bin, ["-unoise3", chimera_fa, "-zotus", g_z,
                      "-tabbedout", g_t])
    assert cli_main(["-unoise3", chimera_fa, "-zotus", m_z,
                     "-tabbedout", m_t, "-quiet"]) == 0
    assert open(g_z).read() == open(m_z).read()
    assert open(g_t).read() == open(m_t).read()


def test_sintax_strand_both_parity(ref_bin, tmp_path):
    """sintax -strand both, incl. the reference's last-strand '*' quirk."""
    import numpy as np
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from genseqs import rand_seq, mutate
    rng = np.random.default_rng(77)
    taxa = ["d:Bacteria,p:Firmicutes,g:Bacillus",
            "d:Bacteria,p:Proteobacteria,g:Ecoli"]
    tpls = [rand_seq(rng, 220) for _ in range(2)]
    fa = str(tmp_path / "tax.fa")
    with open(fa, "w") as f:
        k = 0
        for ti, t in enumerate(tpls):
            f.write(f">tpl{ti};tax={taxa[ti]};\n{t}\n")
            for _ in range(8):
                f.write(f">r{k};tax={taxa[ti]};\n"
                        f"{mutate(rng, t, int(rng.integers(0, 5)), 0)}\n")
                k += 1
    g, m = str(tmp_path / "g.tab"), str(tmp_path / "m.tab")
    base = ["-sintax", fa, "-db", fa, "-strand", "both", "-tabbedout"]
    run_ref(ref_bin, base + [g])
    assert cli_main(base + [m, "-quiet"]) == 0
    assert open(g).read() == open(m).read()

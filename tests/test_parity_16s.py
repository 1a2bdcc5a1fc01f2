"""Golden-output parity: makeudb wordlength / udb2bitvec / search_16s."""

import subprocess

import numpy as np
import pytest

from usearch12_tpu.cli import main as cli_main

START = "GNTTGATCNTGNC"
END = "AGTCNNAACAAGGTANCNNTA"


def run_ref(ref_bin, args):
    subprocess.run([ref_bin] + args + ["-quiet", "-threads", "1"],
                   check=True, capture_output=True)


@pytest.fixture(scope="module")
def gene16s_data(tmp_path_factory):
    """(ref_genes.fa, genomes.fa): synthetic 16S-like genes with the
    conserved terminal motifs, embedded in random genomes on both strands,
    plus a fragment, an origin-crossing circular gene and N bases."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from genseqs import rand_seq, mutate
    rng = np.random.default_rng(7)

    def inst(m):
        return "".join("ACGT"[rng.integers(0, 4)] if c == "N" else c
                       for c in m)

    genes = [inst(START) + rand_seq(rng, 1500) + inst(END)
             for _ in range(8)]
    d = tmp_path_factory.mktemp("g16s")
    ref_fa = str(d / "ref16s.fa")
    with open(ref_fa, "w") as f:
        for i, g in enumerate(genes):
            f.write(f">gene{i}\n{g}\n")

    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    genomes = []
    # plus-strand genes
    g1 = mutate(rng, genes[0], 20, 0)
    g2 = mutate(rng, genes[1], 30, 0)
    genomes.append(("genome0 desc", rand_seq(rng, 2500) + g1 +
                    rand_seq(rng, 3000) + g2 + rand_seq(rng, 2000)))
    # minus strand
    rcg = "".join(comp[c] for c in reversed(mutate(rng, genes[2], 15, 0)))
    genomes.append(("genomeRC|x", rand_seq(rng, 3000) + rcg +
                    rand_seq(rng, 2800)))
    # fragment only
    genomes.append(("genomeFrag", rand_seq(rng, 2200) + genes[3][200:900] +
                    rand_seq(rng, 2500)))
    # circular: gene wraps the origin (length >= 2 * 6000)
    g = mutate(rng, genes[4], 10, 0)
    genomes.append(("circgenome", g[700:] + rand_seq(rng, 14000) +
                    g[:700]))
    # N bases exercise the global-RNG letter fill
    gn = list(mutate(rng, genes[5], 10, 0))
    for p in rng.integers(0, len(gn), 6):
        gn[int(p)] = "N"
    bg = list(rand_seq(rng, 2600) + "".join(gn) + rand_seq(rng, 2600))
    for p in rng.integers(0, len(bg), 25):
        bg[int(p)] = "N"
    genomes.append(("ngenome", "".join(bg)))

    genomes_fa = str(d / "genomes.fa")
    with open(genomes_fa, "w") as f:
        for n, s in genomes:
            f.write(f">{n}\n{s}\n")
    return ref_fa, genomes_fa


def test_udb_bitvec_parity(ref_bin, gene16s_data, tmp_path):
    """makeudb_usearch -wordlength 11 and udb2bitvec are byte-exact."""
    ref_fa, _ = gene16s_data
    g_udb, m_udb = str(tmp_path / "g.udb"), str(tmp_path / "m.udb")
    g_bv, m_bv = str(tmp_path / "g.bv"), str(tmp_path / "m.bv")
    run_ref(ref_bin, ["-makeudb_usearch", ref_fa, "-wordlength", "11",
                      "-output", g_udb])
    run_ref(ref_bin, ["-udb2bitvec", g_udb, "-output", g_bv])
    assert cli_main(["-makeudb_usearch", ref_fa, "-wordlength", "11",
                     "-output", m_udb, "-quiet"]) == 0
    assert cli_main(["-udb2bitvec", m_udb, "-output", m_bv,
                     "-quiet"]) == 0
    assert open(g_udb, "rb").read() == open(m_udb, "rb").read()
    assert open(g_bv, "rb").read() == open(m_bv, "rb").read()


def test_search_16s_parity(ref_bin, gene16s_data, tmp_path):
    ref_fa, genomes_fa = gene16s_data
    g_udb = str(tmp_path / "g.udb")
    g_bv = str(tmp_path / "g.bv")
    run_ref(ref_bin, ["-makeudb_usearch", ref_fa, "-wordlength", "11",
                      "-output", g_udb])
    run_ref(ref_bin, ["-udb2bitvec", g_udb, "-output", g_bv])
    g = {k: str(tmp_path / f"g_{k}") for k in ("tab", "fa", "win", "frag")}
    m = {k: str(tmp_path / f"m_{k}") for k in ("tab", "fa", "win", "frag")}
    run_ref(ref_bin, ["-search_16s", genomes_fa, "-bitvec", g_bv,
                      "-tabbedout", g["tab"], "-fastaout", g["fa"],
                      "-hitsout", g["win"], "-fragout", g["frag"]])
    assert cli_main(["-search_16s", genomes_fa, "-bitvec", g_bv,
                     "-tabbedout", m["tab"], "-fastaout", m["fa"],
                     "-hitsout", m["win"], "-fragout", m["frag"],
                     "-quiet"]) == 0
    for k in g:
        assert open(g[k]).read() == open(m[k]).read(), k

"""Golden-output parity: cluster_fast vs the reference binary."""

import subprocess

import pytest

from usearch12_tpu.cli import main as cli_main


def run_ref(ref_bin, args):
    subprocess.run([ref_bin] + args + ["-quiet", "-threads", "1"],
                   check=True, capture_output=True)


@pytest.mark.parametrize("extra", [
    ["-id", "0.97"],
    ["-id", "0.97", "-sizein", "-sizeout"],
    ["-id", "0.95", "-sort", "length"],
])
def test_cluster_fast_parity(ref_bin, amplicons_small_fa, tmp_path, extra):
    g_uc = str(tmp_path / "g.uc")
    g_cent = str(tmp_path / "g.fa")
    m_uc = str(tmp_path / "m.uc")
    m_cent = str(tmp_path / "m.fa")
    run_ref(ref_bin, ["-cluster_fast", amplicons_small_fa] + extra +
            ["-uc", g_uc, "-centroids", g_cent])
    assert cli_main(["-cluster_fast", amplicons_small_fa] + extra +
                    ["-uc", m_uc, "-centroids", m_cent, "-quiet"]) == 0
    assert open(g_uc).read() == open(m_uc).read()
    assert open(g_cent).read() == open(m_cent).read()


def test_fastx_uniques_parity(ref_bin, amplicons_small_fa, tmp_path):
    g_fa = str(tmp_path / "g.fa")
    m_fa = str(tmp_path / "m.fa")
    args = ["-fastx_uniques", amplicons_small_fa, "-sizeout",
            "-relabel", "Uniq"]
    run_ref(ref_bin, args + ["-fastaout", g_fa])
    assert cli_main(args + ["-fastaout", m_fa, "-quiet"]) == 0
    assert open(g_fa).read() == open(m_fa).read()


def test_fastx_uniques_sizein_order(ref_bin, tmp_path):
    """-sizein orders/gates clusters by SumSizeIn, not member count
    (src/derepresult.cpp:822-845 SetSizes + SetOrder)."""
    import numpy as np
    rng = np.random.default_rng(3)
    conv = "ACGT"
    seqs = ["".join(conv[j] for j in rng.integers(0, 4, 60))
            for _ in range(50)]
    inp = str(tmp_path / "in.fa")
    with open(inp, "w") as f:
        for i in range(600):
            s = seqs[int(rng.integers(0, 50))]
            f.write(f">r{i};size={int(rng.integers(1, 40))};\n{s}\n")
    g_fa = str(tmp_path / "g.fa")
    m_fa = str(tmp_path / "m.fa")
    args = ["-fastx_uniques", inp, "-sizein", "-sizeout",
            "-minuniquesize", "100"]
    run_ref(ref_bin, args + ["-fastaout", g_fa])
    assert cli_main(args + ["-fastaout", m_fa, "-quiet"]) == 0
    assert open(g_fa).read() == open(m_fa).read()


def test_cluster_mt_parity(ref_bin, amplicons_small_fa, tmp_path):
    """cluster_mt -threads 1 (batch-synchronous pending scheme)."""
    g_uc, g_fa = str(tmp_path / "g.uc"), str(tmp_path / "g.fa")
    m_uc, m_fa = str(tmp_path / "m.uc"), str(tmp_path / "m.fa")
    run_ref(ref_bin, ["-cluster_mt", amplicons_small_fa, "-id", "0.97",
                      "-uc", g_uc, "-centroids", g_fa])
    assert cli_main(["-cluster_mt", amplicons_small_fa, "-id", "0.97",
                     "-uc", m_uc, "-centroids", m_fa, "-quiet"]) == 0
    assert open(g_uc).read() == open(m_uc).read()
    assert open(g_fa).read() == open(m_fa).read()


def test_cluster_mt_device_batch(amplicons_small_fa, tmp_path):
    """Device-batched U counting over an 8-device mesh produces outputs
    byte-identical to the host cluster_mt path (greedy-order preservation
    of the batch-synchronous schedule, SURVEY §2.2)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from usearch12_tpu.cli import parse_argv
    from usearch12_tpu.cluster.uclust import cluster_mt
    from usearch12_tpu.parallel.cluster_batch import cluster_mt_batched

    h_uc, h_fa = str(tmp_path / "h.uc"), str(tmp_path / "h.fa")
    d_uc, d_fa = str(tmp_path / "d.uc"), str(tmp_path / "d.fa")
    # small maxpending forces several freeze/flush rounds
    parse_argv(["-cluster_mt", amplicons_small_fa, "-id", "0.95",
                "-maxpending", "8", "-uc", h_uc, "-centroids", h_fa,
                "-quiet"])
    cluster_mt(amplicons_small_fa)

    parse_argv(["-cluster_mt", amplicons_small_fa, "-id", "0.95",
                "-maxpending", "8", "-uc", d_uc, "-centroids", d_fa,
                "-quiet"])
    devs = np.array(jax.devices()[:8])
    n_db = 4 if len(devs) >= 8 else 1
    mesh = Mesh(devs.reshape(len(devs) // n_db, n_db), ("data", "db"))
    cluster_mt_batched(amplicons_small_fa, mesh=mesh)

    assert open(h_uc).read() == open(d_uc).read()
    assert open(h_fa).read() == open(d_fa).read()


@pytest.fixture(scope="module")
def tax_fa(tmp_path_factory):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    from genseqs import rand_seq, mutate
    rng = np.random.default_rng(77)
    taxa = ["d:Bacteria,p:Firmicutes,g:Bacillus",
            "d:Bacteria,p:Firmicutes,g:Clostridium",
            "d:Bacteria,p:Proteobacteria,g:Ecoli",
            "d:Archaea,p:Euryarchaeota,g:Halo"]
    tpls = [rand_seq(rng, 220) for _ in range(4)]
    recs = []
    k = 0
    for ti, t in enumerate(tpls):
        recs.append((f"tpl{ti};size={int(rng.integers(50, 200))};"
                     f"tax={taxa[ti]};", t))
        for _ in range(6):
            tx = taxa[(ti + (1 if k % 5 == 0 else 0)) % 4]
            recs.append((f"r{k};size={int(rng.integers(1, 20))};tax={tx};",
                         mutate(rng, t, int(rng.integers(0, 5)), 0)))
            k += 1
    path = str(tmp_path_factory.mktemp("tax") / "tax.fa")
    with open(path, "w") as f:
        for n, s in recs:
            f.write(f">{n}\n{s}\n")
    return path


def test_constax_report_parity(ref_bin, tax_fa, tmp_path):
    """-constax_report on the derep path (the reference binary segfaults
    on the cluster_fast -constax_report path, so parity is checked via
    fastx_uniques which shares the ConsTaxStr writers)."""
    g, m = str(tmp_path / "g.txt"), str(tmp_path / "m.txt")
    base = ["-fastx_uniques", tax_fa, "-sizein", "-sizeout",
            "-constax_report"]
    run_ref(ref_bin, base + [g, "-fastaout", str(tmp_path / "g.fa")])
    assert cli_main(base + [m, "-fastaout", str(tmp_path / "m.fa"),
                            "-quiet"]) == 0
    assert open(g).read() == open(m).read()


def test_dbhit_sink_parity(ref_bin, amplicons_small_fa, tmp_path):
    """-dbmatched/-dbnotmatched/-dbcutout (DBHitSink)."""
    g = {k: str(tmp_path / f"g{k}.fa") for k in ("m", "n", "c")}
    m = {k: str(tmp_path / f"m{k}.fa") for k in ("m", "n", "c")}
    def args(d):
        return ["-usearch_global", amplicons_small_fa, "-db",
                amplicons_small_fa, "-id", "0.95", "-strand", "plus",
                "-sizein", "-sizeout", "-dbmatched", d["m"],
                "-dbnotmatched", d["n"], "-dbcutout", d["c"]]
    run_ref(ref_bin, args(g))
    assert cli_main(args(m) + ["-quiet"]) == 0
    for k in g:
        assert open(g[k]).read() == open(m[k]).read(), k

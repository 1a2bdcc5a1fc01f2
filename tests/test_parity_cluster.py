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

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

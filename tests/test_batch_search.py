"""Device-batched search path vs the serial host driver (byte equality).

Needs a real TPU (wavefront kernel in interpret mode is too slow) or
USEARCH_SLOW_TESTS=1.
"""

import os

import pytest

from usearch12_tpu.cli import main as cli_main


def _have_tpu():
    if os.environ.get("USEARCH_SLOW_TESTS") == "1":
        return True
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _have_tpu(), reason="needs TPU backend or USEARCH_SLOW_TESTS=1")


@pytest.mark.parametrize("extra", [
    ["-strand", "plus"],
    ["-strand", "both", "-maxaccepts", "2", "-maxrejects", "8"],
])
def test_batch_search_matches_host(amplicons_small_fa, tmp_path, extra):
    d_b6, h_b6 = str(tmp_path / "d.b6"), str(tmp_path / "h.b6")
    base = ["-usearch_global", amplicons_small_fa, "-db",
            amplicons_small_fa, "-id", "0.9"] + extra
    assert cli_main(base + ["-blast6out", d_b6, "-use_device",
                            "-quiet"]) == 0
    assert cli_main(base + ["-blast6out", h_b6, "-quiet"]) == 0
    assert open(d_b6).read() == open(h_b6).read()


def test_cluster_checkpoint_resume(tmp_path):
    """A run killed mid-stream (no buffer flush) and resumed from its
    -checkpoint produces byte-identical -uc/-centroids output."""
    import subprocess
    import sys
    import numpy as np
    from usearch12_tpu.cli import parse_argv
    from usearch12_tpu.parallel.cluster_batch import cluster_mt_batched

    rng = np.random.default_rng(5)
    conv = np.frombuffer(b"ACGT", np.uint8)
    in_fa = str(tmp_path / "in.fa")
    with open(in_fa, "w") as f:
        tpls = [conv[rng.integers(0, 4, 150)] for _ in range(6)]
        for k in range(120):
            t = tpls[k % 6].copy()
            t[rng.integers(0, 150, 3)] = conv[rng.integers(0, 4, 3)]
            f.write(f">r{k}\n{t.tobytes().decode()}\n")

    full_uc, full_fa = str(tmp_path / "f.uc"), str(tmp_path / "f.fa")
    parse_argv(["-cluster_mt", in_fa, "-id", "0.95", "-maxpending", "8",
                "-uc", full_uc, "-centroids", full_fa, "-quiet"])
    cluster_mt_batched(in_fa)

    part_uc, part_fa = str(tmp_path / "p.uc"), str(tmp_path / "p.fa")
    ck = str(tmp_path / "ck.npz")
    crash = f"""
import numpy as np, os
import usearch12_tpu.cli as cli
import usearch12_tpu.parallel.cluster_batch as CB
cli.parse_argv(["-cluster_mt", {in_fa!r}, "-id", "0.95", "-maxpending",
                "8", "-uc", {part_uc!r}, "-centroids", {part_fa!r},
                "-checkpoint", {ck!r}, "-quiet"])
calls = [0]
orig = CB.DeviceUCounter.count
def bomb(self, *a, **k):
    calls[0] += 1
    if calls[0] == 6:
        os._exit(137)
    return orig(self, *a, **k)
CB.DeviceUCounter.count = bomb
CB.cluster_mt_batched({in_fa!r})
"""
    r = subprocess.run([sys.executable, "-c", crash])
    assert r.returncode == 137

    parse_argv(["-cluster_mt", in_fa, "-id", "0.95", "-maxpending", "8",
                "-uc", part_uc, "-centroids", part_fa,
                "-checkpoint", ck, "-quiet"])
    cluster_mt_batched(in_fa)
    assert open(full_uc).read() == open(part_uc).read()
    assert open(full_fa).read() == open(part_fa).read()


def test_sintax_boot_counts_sharded(tmp_path):
    """Device SINTAX boot counting (single-device and sharded over a
    2x4 mesh) equals the host scatter-add exactly."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from usearch12_tpu.io.seqdb import SeqDB
    from usearch12_tpu.index.udb import UDBIndex
    from usearch12_tpu.parallel.search_step import (build_incidence,
                                                    sintax_boot_counts)
    from usearch12_tpu.amplicon.sintax import _next_rand

    rng = np.random.default_rng(0)
    conv = np.frombuffer(b"ACGT", np.uint8)
    db = SeqDB()
    db.set_is_nucleo(True)
    for i in range(23):
        db.add(f"t{i};tax=g:G{i};", conv[rng.integers(0, 4, 180)])
    idx = UDBIndex.from_seqdb(db)
    inc = build_incidence(idx)

    Q, BOOTS, M = 4, 6, 8
    words = np.zeros((Q, BOOTS, M), np.int32)
    host_u = np.zeros((Q, BOOTS, idx.seq_count), np.int32)
    for q in range(Q):
        seq = conv[rng.integers(0, 4, 200)]
        uw = idx.params.unique_words(seq)
        r = 1
        for b in range(BOOTS):
            for k in range(M):
                r = _next_rand(r)
                w = int(uw[r % len(uw)])
                words[q, b, k] = w
                row = idx.postings[idx.starts[w]:idx.starts[w]
                                   + idx.sizes[w]]
                np.add.at(host_u[q, b], row, 1)

    assert np.array_equal(sintax_boot_counts(inc, words), host_u)
    devs = np.array(jax.devices())
    n_db = 4 if len(devs) % 4 == 0 else 1
    mesh = Mesh(devs.reshape(len(devs) // n_db, n_db), ("data", "db"))
    assert np.array_equal(sintax_boot_counts(inc, words, mesh=mesh),
                          host_u)

"""CLI-level mesh routing: -mesh must produce byte-identical output to
the host path (VERDICT r3 item 3: the product surface for multi-chip).

The mesh path is parallel/mesh_search.py (usearch_global) and
parallel/cluster_batch.py (cluster_mt); these tests drive them through
bin/usearch on the virtual 8-device CPU mesh, so what is asserted is the
real command surface, not a library fixture.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _cli_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_cli(args):
    r = subprocess.run(
        [sys.executable, "-m", "usearch12_tpu.cli"] + args,
        capture_output=True, text=True, env=_cli_env(), timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def _write_amplicons(path, n_tpl, n_reads, length, seed):
    rng = np.random.default_rng(seed)
    conv = np.frombuffer(b"ACGT", np.uint8)
    tpls = [conv[rng.integers(0, 4, length)] for _ in range(n_tpl)]
    with open(path, "w") as f:
        for k in range(n_reads):
            t = tpls[k % n_tpl].copy()
            t[rng.integers(0, length, 4)] = conv[rng.integers(0, 4, 4)]
            f.write(f">r{k}\n{t.tobytes().decode()}\n")
    return tpls


def test_usearch_global_mesh_cli(tmp_path):
    db = str(tmp_path / "db.fa")
    q = str(tmp_path / "q.fa")
    rng = np.random.default_rng(7)
    conv = np.frombuffer(b"ACGT", np.uint8)
    tpls = [conv[rng.integers(0, 4, 180)] for _ in range(20)]
    with open(db, "w") as f:
        for k, t in enumerate(tpls):
            f.write(f">t{k}\n{t.tobytes().decode()}\n")
    with open(q, "w") as f:
        for k in range(60):
            t = tpls[k % 20].copy()
            t[rng.integers(0, 180, 6)] = conv[rng.integers(0, 4, 6)]
            f.write(f">q{k}\n{t.tobytes().decode()}\n")
    mesh_b6 = str(tmp_path / "mesh.b6")
    host_b6 = str(tmp_path / "host.b6")
    _run_cli(["-usearch_global", q, "-db", db, "-id", "0.9", "-strand",
              "plus", "-blast6out", mesh_b6, "-quiet", "-mesh", "2x4"])
    _run_cli(["-usearch_global", q, "-db", db, "-id", "0.9", "-strand",
              "plus", "-blast6out", host_b6, "-quiet"])
    mesh_bytes = open(mesh_b6, "rb").read()
    assert mesh_bytes == open(host_b6, "rb").read()
    assert len(mesh_bytes) > 0, "workload produced no hits - test is vacuous"


def test_usearch_global_mesh_cli_uc_userout(tmp_path):
    """Mesh path with non-blast6 sinks (exercises the AlignResult route,
    not the packed emitter)."""
    db = str(tmp_path / "db.fa")
    q = str(tmp_path / "q.fa")
    rng = np.random.default_rng(17)
    conv = np.frombuffer(b"ACGT", np.uint8)
    tpls = [conv[rng.integers(0, 4, 150)] for _ in range(8)]
    with open(db, "w") as f:
        for k, t in enumerate(tpls):
            f.write(f">t{k}\n{t.tobytes().decode()}\n")
    with open(q, "w") as f:
        for k in range(24):
            t = tpls[k % 8].copy()
            t[rng.integers(0, 150, 4)] = conv[rng.integers(0, 4, 4)]
            f.write(f">q{k}\n{t.tobytes().decode()}\n")
    outs = {}
    for tag, extra in (("mesh", ["-mesh", "8"]), ("host", [])):
        uc = str(tmp_path / f"{tag}.uc")
        _run_cli(["-usearch_global", q, "-db", db, "-id", "0.9",
                  "-strand", "plus", "-uc", uc, "-quiet"] + extra)
        outs[tag] = open(uc, "rb").read()
    assert outs["mesh"] == outs["host"]
    assert len(outs["mesh"]) > 0


def test_cluster_mt_mesh_cli(tmp_path):
    reads = str(tmp_path / "reads.fa")
    _write_amplicons(reads, n_tpl=6, n_reads=60, length=150, seed=3)
    mesh_uc = str(tmp_path / "mesh.uc")
    host_uc = str(tmp_path / "host.uc")
    _run_cli(["-cluster_mt", reads, "-id", "0.95", "-maxpending", "16",
              "-uc", mesh_uc, "-quiet", "-mesh", "2x4"])
    _run_cli(["-cluster_mt", reads, "-id", "0.95", "-maxpending", "16",
              "-uc", host_uc, "-quiet"])
    mesh_bytes = open(mesh_uc, "rb").read()
    assert mesh_bytes == open(host_uc, "rb").read()
    assert len(mesh_bytes) > 0

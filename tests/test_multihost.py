"""Multi-host scaffolding test: 2 local processes x 4 virtual CPU
devices run the mesh-sharded usearch_global SPMD (jax.distributed over a
local coordinator); the spliced blast6 must byte-match a single-process
host-engine run over the same input."""

import os
import subprocess
import sys

import numpy as np
import pytest

from usearch12_tpu.cli import parse_argv

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def mh_data(tmp_path_factory):
    sys.path.insert(0, HERE)
    from genseqs import make_amplicons, write_fasta
    d = tmp_path_factory.mktemp("mh")
    recs = make_amplicons(n_templates=30, reads_per_template=3,
                          length=180, seed=23)
    db_fa = str(d / "db.fa")
    q_fa = str(d / "q.fa")
    write_fasta(db_fa, [r for r in recs if r[0].startswith("tpl")])
    write_fasta(q_fa, [r for r in recs if not r[0].startswith("tpl")])
    return db_fa, q_fa, str(d)


def test_two_process_search_parity(mh_data):
    db_fa, q_fa, d = mh_data
    out = f"{d}/mh.b6"
    port = "12771"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    workers = []
    for pid in range(2):
        workers.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", port, q_fa, db_fa, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for w in workers:
        try:
            so, se = w.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for ww in workers:
                ww.kill()
            pytest.fail("multihost worker timed out")
        assert w.returncode == 0, se.decode()[-2000:]

    # single-process truth over the same input
    parse_argv(["-usearch_global", q_fa, "-db", db_fa, "-id", "0.9",
                "-strand", "plus", "-quiet"])
    from usearch12_tpu.io.seqdb import SeqDB
    from usearch12_tpu.engine.batch import BatchEngine
    from usearch12_tpu.engine.emit import Blast6Emitter
    db = SeqDB.from_fastx(db_fa)
    db.mask()
    host_b6 = f"{d}/host.b6"
    with open(host_b6, "w") as f:
        em = Blast6Emitter(f, db, False)
        BatchEngine("usearch_global", db).run_file(
            q_fa, lambda *a: None, fast_emit=em.emit)
    assert open(out).read() == open(host_b6).read()

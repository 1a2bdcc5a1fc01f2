"""BatchEngine -threads window pool: the threaded pipeline must emit
byte-identical output to the serial path (deterministic ordered emit,
per-thread scratch; reference analog search.cpp:119-128 thread fan-out
with our stronger single-writer ordering)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from usearch12_tpu.cli import parse_argv  # noqa: E402


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    from genseqs import make_amplicons, write_fasta
    d = tmp_path_factory.mktemp("thr")
    recs = make_amplicons(n_templates=50, reads_per_template=14,
                          length=220, seed=23)
    db_fa = str(d / "db.fa")
    q_fa = str(d / "q.fa")
    write_fasta(db_fa, [r for r in recs if r[0].startswith("tpl")])
    write_fasta(q_fa, [r for r in recs if not r[0].startswith("tpl")])
    return db_fa, q_fa


def _run_blast6(db_fa, q_fa, out, threads, strand="plus"):
    parse_argv(["-usearch_global", q_fa, "-db", db_fa, "-id", "0.9",
                "-strand", strand, "-threads", str(threads), "-quiet"])
    from usearch12_tpu.io.seqdb import SeqDB
    from usearch12_tpu.engine.batch import BatchEngine
    from usearch12_tpu.engine.emit import Blast6Emitter
    db = SeqDB.from_fastx(db_fa)
    db.set_is_nucleo(True)
    db.mask()
    eng = BatchEngine("usearch_global", db)
    with open(out, "w") as f:
        em = Blast6Emitter(f, db, False)
        # window=48 over 600 queries -> 13 windows through the pool
        eng.run_file(q_fa, None, window=48, fast_emit=em)


@pytest.mark.parametrize("strand", ["plus", "both"])
def test_threaded_windows_byte_identical(workload, tmp_path, strand):
    db_fa, q_fa = workload
    o1 = str(tmp_path / f"t1_{strand}.b6")
    o4 = str(tmp_path / f"t4_{strand}.b6")
    _run_blast6(db_fa, q_fa, o1, threads=1, strand=strand)
    _run_blast6(db_fa, q_fa, o4, threads=4, strand=strand)
    b1 = open(o1, "rb").read()
    assert b1 and b1 == open(o4, "rb").read()

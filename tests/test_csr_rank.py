"""Device CSR ranking (ops/csr_rank.py) must reproduce the host USORT
candidate lists exactly — counts, SetTopBump filter, count-sort order,
and NextValue/2 cutoff — without a dense incidence."""

import numpy as np
import pytest

from usearch12_tpu.cli import parse_argv


@pytest.fixture(scope="module")
def ranked_db(tmp_path_factory):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from genseqs import make_amplicons, write_fasta
    d = tmp_path_factory.mktemp("csr")
    recs = make_amplicons(n_templates=80, reads_per_template=4,
                          length=200, seed=41)
    db_fa = str(d / "db.fa")
    q_fa = str(d / "q.fa")
    write_fasta(db_fa, [r for r in recs if r[0].startswith("tpl")])
    write_fasta(q_fa, [r for r in recs if not r[0].startswith("tpl")])
    return db_fa, q_fa


def test_csr_rank_exact(ranked_db):
    db_fa, q_fa = ranked_db
    parse_argv(["-usearch_global", q_fa, "-db", db_fa, "-id", "0.9",
                "-strand", "plus", "-quiet"])
    from usearch12_tpu.io.seqdb import SeqDB
    from usearch12_tpu.io.fastx import read_fastx
    from usearch12_tpu.index.udb import UDBIndex
    from usearch12_tpu.ops.csr_rank import CSRDeviceRanker
    from usearch12_tpu.search.usorted import USortedRanker
    db = SeqDB.from_fastx(db_fa)
    db.mask()
    index = UDBIndex.from_seqdb(db)
    cr = CSRDeviceRanker(index, topk=64, chunk_b=64)
    ur = USortedRanker(index)
    recs = list(read_fastx(q_fa, stream=True))
    jbuf = np.ascontiguousarray(np.concatenate([s for _l, s, _q in recs]))
    j_off = np.zeros(len(recs) + 1, np.int64)
    np.cumsum([len(s) for _l, s, _q in recs], out=j_off[1:])
    cand, cnts, out_n, unc = cr.rank_window(jbuf, j_off)
    assert not unc.any()
    for i, (_l, s, _q) in enumerate(recs):
        tix, c = ur.rank(s)
        exp_n = min(len(tix), 64)
        assert out_n[i] == exp_n, (i, out_n[i], exp_n)
        assert np.array_equal(tix[:exp_n], cand[i][:exp_n]), i
        assert np.array_equal(c[:exp_n], cnts[i][:exp_n]), i


def test_csr_rank_engine_blast6(ranked_db):
    """End-to-end: CSR device ranking plugged into the batch engine must
    produce host-identical blast6 bytes."""
    db_fa, q_fa = ranked_db
    parse_argv(["-usearch_global", q_fa, "-db", db_fa, "-id", "0.9",
                "-strand", "plus", "-quiet"])
    from usearch12_tpu.io.seqdb import SeqDB
    from usearch12_tpu.engine.batch import BatchEngine
    from usearch12_tpu.engine.emit import Blast6Emitter
    from usearch12_tpu.ops.csr_rank import CSRDeviceRanker
    import tempfile
    db = SeqDB.from_fastx(db_fa)
    db.mask()
    with tempfile.TemporaryDirectory() as d:
        eng = BatchEngine("usearch_global", db)
        cr = CSRDeviceRanker(eng.index, topk=64, chunk_b=64)

        def override(jbuf, j_off):
            cand, cnts, out_n, _unc = cr.rank_window(jbuf, j_off)
            return (np.ascontiguousarray(cand.astype(np.uint32)),
                    np.ascontiguousarray(cnts), out_n)

        with open(f"{d}/csr.b6", "w") as f:
            em = Blast6Emitter(f, db, False)
            eng.run_file(q_fa, lambda *a: None, fast_emit=em.emit,
                         rank_override=override)
        eng2 = BatchEngine("usearch_global", db)
        with open(f"{d}/host.b6", "w") as f:
            em2 = Blast6Emitter(f, db, False)
            eng2.run_file(q_fa, lambda *a: None, fast_emit=em2.emit)
        assert open(f"{d}/csr.b6").read() == open(f"{d}/host.b6").read()


def test_csr_rank_over_cap_host_fallback(ranked_db, monkeypatch):
    """Queries whose posting total exceeds CAP_MAX must come back flagged
    uncertain (zero device counts) and the engine override must replace
    them with the exact host ranking."""
    db_fa, q_fa = ranked_db
    parse_argv(["-usearch_global", q_fa, "-db", db_fa, "-id", "0.9",
                "-strand", "plus", "-quiet"])
    from usearch12_tpu.io.seqdb import SeqDB
    from usearch12_tpu.io.fastx import read_fastx
    from usearch12_tpu.index.udb import UDBIndex
    from usearch12_tpu.ops.csr_rank import (CSRDeviceRanker,
                                            make_engine_override)
    from usearch12_tpu.engine.batch import BatchEngine
    db = SeqDB.from_fastx(db_fa)
    db.mask()
    index = UDBIndex.from_seqdb(db)
    # force every query over the ceiling
    monkeypatch.setattr(CSRDeviceRanker, "CAP_MAX", 4)
    cr = CSRDeviceRanker(index, topk=64, chunk_b=64)
    recs = list(read_fastx(q_fa, stream=True))[:8]
    jbuf = np.ascontiguousarray(np.concatenate([s for _l, s, _q in recs]))
    j_off = np.zeros(len(recs) + 1, np.int64)
    np.cumsum([len(s) for _l, s, _q in recs], out=j_off[1:])
    cand, cnts, out_n, unc = cr.rank_window(jbuf, j_off)
    assert unc.all() and (out_n == 0).all()
    eng = BatchEngine("usearch_global", db, index=index)
    override = make_engine_override(cr, eng)
    o_cand, o_cnts, o_out_n = override(jbuf, j_off)
    h_cand, h_cnts, h_out_n = eng._rank_jobs(jbuf, j_off)
    assert np.array_equal(o_out_n, h_out_n)
    for i in range(len(recs)):
        n = int(h_out_n[i])
        assert np.array_equal(o_cand[i][:n],
                              h_cand[i][:n].astype(o_cand.dtype)), i

"""The uint16 postings mirror (UDBIndex._postings16, usort_rank_c
has_csr mode 2) must rank identically to the uint32 CSR path, and must
be dropped when seq_count outgrows uint16 range."""

import numpy as np
import pytest

from usearch12_tpu.cli import parse_argv


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from genseqs import make_amplicons, write_fasta
    d = tmp_path_factory.mktemp("p16")
    recs = make_amplicons(n_templates=60, reads_per_template=4,
                          length=180, seed=77)
    db_fa = str(d / "db.fa")
    q_fa = str(d / "q.fa")
    write_fasta(db_fa, [r for r in recs if r[0].startswith("tpl")])
    write_fasta(q_fa, [r for r in recs if not r[0].startswith("tpl")])
    parse_argv(["-usearch_global", q_fa, "-db", db_fa, "-id", "0.9",
                "-strand", "plus", "-quiet"])
    from usearch12_tpu.io.seqdb import SeqDB
    from usearch12_tpu.index.udb import UDBIndex
    from usearch12_tpu.io.fastx import read_fastx
    db = SeqDB.from_fastx(db_fa)
    db.mask()
    index = UDBIndex.from_seqdb(db)
    queries = [s for _l, s, _q in read_fastx(q_fa, stream=True)]
    return index, queries


def test_uint16_mirror_built_and_exact(small_index):
    from usearch12_tpu.native import NativeRanker
    index, queries = small_index
    assert index._postings16 is not None
    assert index._postings16.dtype == np.uint16
    assert np.array_equal(index._postings16, index._postings)

    r16 = NativeRanker(index)
    for mode in (0, 1):
        got = [r16.rank(q, 50, mode) for q in queries]
        # force the uint32 path on a fresh ranker (no stale arg cache)
        saved = index._postings16
        index._postings16 = None
        try:
            r32 = NativeRanker(index)
            want = [r32.rank(q, 50, mode) for q in queries]
        finally:
            index._postings16 = saved
        for (gt, gc), (wt, wc) in zip(got, want):
            assert np.array_equal(gt, wt)
            assert np.array_equal(gc, wc)


def test_uint16_mirror_dropped_past_65535(small_index):
    from usearch12_tpu.index.udb import UDBIndex
    from usearch12_tpu.native import NativeRanker
    src, queries = small_index
    seq = queries[0]
    index = UDBIndex(src.params)
    index.add_seq(0, seq)
    # a sparse append past uint16 range, then a forced reflatten: the
    # mirror must disappear and ranking must still work
    index.add_seq(0x10000, queries[1])
    index._flat_dirty = True
    index._flatten()
    assert index._postings16 is None
    r = NativeRanker(index)
    tix, counts = r.rank(seq, 50, 1)
    assert len(tix) > 0
    assert (counts >= 1).all()

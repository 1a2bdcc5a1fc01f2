"""Speculative batched usearch_global: device-batched candidate alignment.

The reference's search loop is lazy (align candidates one at a time until
the terminator fires, 1 accept / 32 rejects).  On TPU we align the top
K = maxaccepts + maxrejects candidates of a whole query window in one
batched dispatch (host HSP chaining + wavefront hole DP,
ops/batch_align.py), then REPLAY the accept/terminate logic on the host
over the precomputed paths — the replay consumes exactly the alignments
the lazy loop would have computed, so hits are bit-identical
(SURVEY.md §7 "early termination economics").

Used by cmd_usearch_global under -use_device; parity vs the serial host
driver is asserted in tests/test_batch_search.py.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from ..config import options
from ..io.seqdb import SeqDB
from ..io.fastx import read_fastx, file_is_nucleo
from ..scoring import AlnParams, AlnHeuristics
from ..index.udb import UDBIndex
from ..search.accepter import Accepter
from ..search.terminator import Terminator
from ..search.hitmgr import HitMgr
from ..search.usorted import USortedRanker
from ..align.result import AlignResult
from ..ops.batch_align import BatchedGlobalAligner


def batch_search_file(cmd: str, query_path: str, db: SeqDB,
                      on_query_done: Callable, window: int = 8192) -> None:
    from ..device import ensure_device_runtime
    ensure_device_runtime()
    o = options()
    nucleo = db.get_is_nucleo()
    ap = AlnParams.from_cmdline(nucleo)
    ah = AlnHeuristics.from_cmdline(ap)
    index = UDBIndex.from_seqdb(db)
    ranker = USortedRanker(index)
    accepter = Accepter(is_global=True)
    terminator = Terminator(cmd)
    bga = BatchedGlobalAligner(ap, ah)
    fail = not o.flag("gaforce")

    strand_both = False
    if nucleo:
        if not o.filled("strand"):
            raise SystemExit("Must specify -strand plus or both with nt db")
        s = o.str("strand")
        if s == "both":
            strand_both = True
        elif s != "plus":
            raise SystemExit("Invalid -strand, must be plus or both")
    if (not nucleo) and file_is_nucleo(query_path):
        raise SystemExit("-use_device does not support translated search")

    # K: candidates the lazy loop can possibly touch before terminating
    ma, mr = terminator.max_accepts, terminator.max_rejects
    unbounded = (ma == 0 or mr == 0 or o.filled("termid")
                 or o.filled("termidd"))
    K = None if unbounded else ma + mr

    records = [(label, seq) for label, seq, _q in read_fastx(query_path, stream=True)
               ]

    from ..alpha import revcomp as rc
    pos = 0
    while pos < len(records):
        batch = records[pos:pos + window]
        pos += len(batch)
        # Phase A: rank + filter + collect candidate pairs
        cand_lists = []   # per (query, strand): list of tix
        pair_jobs = []    # (a, b) pairs across the window
        job_index = {}    # (bi, strand, k) -> job idx
        for bi, (label, seq) in enumerate(batch):
            strands = [(seq, False)]
            if strand_both:
                strands.append((rc(seq), True))
            per_strand = []
            for sseq, is_rc in strands:
                tix_order, _c = ranker.rank(sseq)
                kept = []
                for tix in tix_order.tolist():
                    if accepter.reject_pair(label, sseq, db.labels[tix],
                                            db.seqs[tix]):
                        continue
                    kept.append(tix)
                    if K is not None and len(kept) >= K:
                        break
                per_strand.append((sseq, is_rc, kept))
                for k, tix in enumerate(kept):
                    job_index[(bi, is_rc, k)] = len(pair_jobs)
                    pair_jobs.append((sseq, db.seqs[tix]))
            cand_lists.append(per_strand)

        # Phase B: one batched device alignment for the window
        paths = bga.align_pairs(pair_jobs, fail_if_no_hsps=fail)

        # Phase C: host replay of the lazy accept/terminate loop
        for bi, (label, seq) in enumerate(batch):
            hm = HitMgr()
            hm.set_query(label)
            for sseq, is_rc, kept in cand_lists[bi]:
                terminator.on_new_query()
                for k, tix in enumerate(kept):
                    path = paths[job_index[(bi, is_rc, k)]]
                    accept = False
                    if path is not None:
                        ar = AlignResult(
                            query_label=label, target_label=db.labels[tix],
                            query_seq=sseq, target_seq=db.seqs[tix],
                            path=path, nucleo=nucleo, target_index=tix,
                            query_revcomp=is_rc)
                        accept = accepter.is_accept(ar)
                        if accept:
                            hm.append_hit(ar)
                    if terminator.terminate(hm, accept):
                        break
            on_query_done(label, seq, hm.hits)

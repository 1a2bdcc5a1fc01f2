"""fastq_mergepairs / fastq_join (src/merge*.cpp, src/fastqjoin.cpp).

Merge: HSP seeding of fwd vs revcomp(rev) (StaggerOk), top HSP extended to
the full overlap along its diagonal, gates (minovlen, stagger, maxdiffs,
pctid), posterior quality combination for the overlap, post filters.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..alpha import revcomp
from ..config import options
from ..io.fastx import read_fastq, write_fasta, write_fastq
from ..scoring import AlnParams, AlnHeuristics
from ..align.hsp import HSPFinder
from .qual import get_fastq
from .filter import Relabeler


def trunc_label(label: str) -> str:
    for i, c in enumerate(label):
        if c in " \t":
            return label[:i]
    return label


def illumina_label_pair_match(l1: str, l2: str) -> bool:
    o = options()
    if o.flag("ignore_label_mismatches"):
        return True
    if len(l1) != len(l2):
        return False
    found = False
    for c1, c2 in zip(l1, l2):
        if c1 != c2:
            if found:
                return False
            if c1 != "1" or (c2 != "2" and c2 != "3"):
                return False
            found = True
    return True


def _truncate_tail(seq, qual, fq) -> tuple:
    """SeqInfo::TruncateTail via fastq_trunctail (src/mergepre.cpp)."""
    o = options()
    tt = o.uns("fastq_trunctail")
    tail = 0
    for k in range(len(seq)):
        if fq.char_to_int(ord(qual[len(seq) - k - 1])) <= tt:
            tail += 1
        else:
            break
    if tail > 0 and tail > o.uns("fastq_tail"):
        n = len(seq) - tail
        return seq[:n], qual[:n]
    return seq, qual


def _extend_hsp(ql: int, tl: int, loi: int, loj: int):
    """ExtendHSP (src/mergealign.cpp:13-39)."""
    lo_i = 0 if loi <= loj else loi - loj
    lo_j = 0 if loj <= loi else loj - loi
    len_i = ql - lo_i
    len_j = tl - lo_j
    length = min(len_i, len_j)
    return lo_i, lo_j, length


def merge_pair(seq1, qual1, seq2, qual2, hf: HSPFinder, ah: AlnHeuristics,
               fq):
    """Returns (merged_seq, merged_qual, hsp, diff_count) or (None, reason).
    seq2 is the raw reverse read (revcomp applied here)."""
    o = options()
    s2rc = revcomp(seq2)
    q2rc = qual2[::-1]
    hf.set_a(seq1)
    hf.set_b(s2rc)
    hsps = hf.ungapped_blast(ah.xdrop_global_hsp, True,
                             ah.min_global_hsp_length,
                             ah.min_global_hsp_score)
    top = None
    for h in hsps:
        if top is None or h.score > top.score:
            top = h
    if top is None:
        return None, "notaligned"
    loi, loj, length = _extend_hsp(len(seq1), len(s2rc), top.loi, top.loj)

    # GetMergeAln left/right/stagger (src/mergealign.cpp:139-172)
    hii = loi + length - 1
    hij = loj + length - 1
    fl, rl = len(seq1), len(s2rc)
    left = loi if loj == 0 else -loj
    right = (rl - hij - 1) if hii + 1 == fl else -(rl - hij - 1)
    if length < o.uns("fastq_minovlen"):
        return None, "ovtooshort"
    stag = left < 0 or right < 0
    if o.flag("fastq_nostagger") and stag:
        return None, "staggered"

    # MergeSI (src/mergealign.cpp:44-123)
    out_seq = []
    out_qual = []
    pos1 = 0
    for i in range(loi):
        out_seq.append(seq1[pos1])
        out_qual.append(qual1[pos1])
        pos1 += 1
    pos2 = loj
    diff_count = 0
    pm = fq.pair_match_int
    pmm = fq.pair_mismatch_int
    for _k in range(length):
        c1, c2 = seq1[pos1], s2rc[pos2]
        q1, q2 = ord(qual1[pos1]), ord(q2rc[pos2])
        iq1, iq2 = fq.char_to_int(q1), fq.char_to_int(q2)
        if c1 == c2:
            out_seq.append(c1)
            out_qual.append(chr(fq.int_to_char(pm[iq1, iq2])))
        else:
            diff_count += 1
            out_seq.append(c1 if q1 >= q2 else c2)
            out_qual.append(chr(fq.int_to_char(pmm[iq1, iq2])))
        pos1 += 1
        pos2 += 1
    while pos2 < rl:
        out_seq.append(s2rc[pos2])
        out_qual.append(q2rc[pos2])
        pos2 += 1

    if diff_count > o.uns("fastq_maxdiffs"):
        return None, "maxdiffs"
    pct_id = 100.0 * (length - diff_count) / length if length else 0.0
    if pct_id < float(o.uns("fastq_pctid")):
        return None, "pctid"

    mseq = np.array(out_seq, dtype=np.uint8)
    mqual = "".join(out_qual)

    # MergePost gates
    if o.filled("fastq_minmergelen") and len(mseq) < o.uns("fastq_minmergelen"):
        return None, "tooshort"
    if o.filled("fastq_maxmergelen") and len(mseq) > o.uns("fastq_maxmergelen"):
        return None, "toolong"
    if o.filled("fastq_minqual"):
        minq = min(fq.char_to_int(ord(q)) for q in mqual)
        if minq < o.uns("fastq_minqual"):
            return None, "minq"
    return (mseq, mqual, (loi, loj, length), diff_count), None


def fastq_mergepairs(fwd_path: Optional[str]) -> None:
    o = options()
    if o.filled("fastq_maxee"):
        raise SystemExit("maxee filtering not supported, use fastq_filter")
    rev_path = o.str("reverse")
    if not fwd_path or not rev_path:
        raise SystemExit("Missing input")
    if not o.flag("notrunclabels"):
        o.set("trunclabels", True)

    fq = get_fastq()
    ap = AlnParams.from_cmdline(True)
    ah = AlnHeuristics.from_cmdline(ap)
    hf = HSPFinder(ap, ah)
    rl = Relabeler()

    f_fq = open(o.str("fastqout"), "w") if o.filled("fastqout") else None
    f_fa = open(o.str("fastaout"), "w") if o.filled("fastaout") else None
    f_nm_fwd_fq = open(o.str("fastqout_notmerged_fwd"), "w") \
        if o.filled("fastqout_notmerged_fwd") else None
    f_nm_rev_fq = open(o.str("fastqout_notmerged_rev"), "w") \
        if o.filled("fastqout_notmerged_rev") else None
    f_nm_fwd_fa = open(o.str("fastaout_notmerged_fwd"), "w") \
        if o.filled("fastaout_notmerged_fwd") else None
    f_nm_rev_fa = open(o.str("fastaout_notmerged_rev"), "w") \
        if o.filled("fastaout_notmerged_rev") else None

    it1 = read_fastq(fwd_path)
    it2 = read_fastq(rev_path)
    trunc = o.flag("trunclabels")
    minlen_filled = o.filled("fastq_minlen")
    minlen = o.uns("fastq_minlen") if minlen_filled else 0

    for (l1, s1, q1), (l2, s2, q2) in zip(it1, it2):
        if trunc:
            l1, l2 = trunc_label(l1), trunc_label(l2)
        if not illumina_label_pair_match(l1, l2):
            raise SystemExit(f"Label mismatch: {l1} vs {l2}")
        orig = (s1, q1, s2, q2)
        # MergePre: tail truncation + minlen
        s1t, q1t = _truncate_tail(s1, q1, fq)
        s2t, q2t = _truncate_tail(s2, q2, fq)
        ok = not (minlen_filled and
                  (len(s1t) < minlen or len(s2t) < minlen))
        result = None
        if ok:
            result, _reason = merge_pair(s1t, q1t, s2t, q2t, hf, ah, fq)
        if result is not None:
            mseq, mqual, _hsp, _d = result
            label = rl.relabel(l1, fq.get_ee(mqual)
                               if o.flag("fastq_eeout") else None)
            if f_fa:
                write_fasta(f_fa, label, mseq, o.uns("fasta_cols"))
            if f_fq:
                write_fastq(f_fq, label, mseq, mqual)
        else:
            # notmerged outputs restore original (untrimmed) reads
            if f_nm_fwd_fq:
                write_fastq(f_nm_fwd_fq, l1, orig[0], orig[1])
            if f_nm_rev_fq:
                write_fastq(f_nm_rev_fq, l2, orig[2], orig[3])
            if f_nm_fwd_fa:
                write_fasta(f_nm_fwd_fa, l1, orig[0], o.uns("fasta_cols"))
            if f_nm_rev_fa:
                write_fasta(f_nm_rev_fa, l2, orig[2], o.uns("fasta_cols"))

    for f in (f_fq, f_fa, f_nm_fwd_fq, f_nm_rev_fq, f_nm_fwd_fa,
              f_nm_rev_fa):
        if f:
            f.close()

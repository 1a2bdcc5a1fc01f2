"""fastq_join: pair concatenation with pad (src/fastqjoin.cpp)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..alpha import revcomp
from ..config import options
from ..io.fastx import read_fastq, write_fasta, write_fastq
from .merge import illumina_label_pair_match, trunc_label


def fastq_join(fwd_path: Optional[str]) -> None:
    o = options()
    if o.filled("output"):
        raise SystemExit("Use -fastqout and/or -fastaout, not -output")
    rev_path = o.str("reverse")
    if not fwd_path or not rev_path:
        raise SystemExit("Missing filename")

    pad = o.str("join_padgap") if o.filled("join_padgap") else "NNNNNNNN"
    padq = o.str("join_padgapq") if o.filled("join_padgap") else "IIIIIIII"
    if len(padq) != len(pad):
        raise SystemExit("padq length != padgap")
    pad_arr = np.frombuffer(pad.encode(), dtype=np.uint8)

    f_fq = open(o.str("fastqout"), "w") if o.filled("fastqout") else None
    f_fa = open(o.str("fastaout"), "w") if o.filled("fastaout") else None
    trunc = o.flag("trunclabels")

    count = 0
    for (l1, s1, q1), (l2, s2, q2) in zip(read_fastq(fwd_path),
                                          read_fastq(rev_path)):
        if trunc:
            l1, l2 = trunc_label(l1), trunc_label(l2)
        if not illumina_label_pair_match(l1, l2):
            raise SystemExit(f"Label mismatch: {l1} vs {l2}")
        s2rc = revcomp(s2)
        q2rc = q2[::-1]
        if o.filled("stripleft"):
            n = o.uns("stripleft")
            s1, q1 = s1[n:], q1[n:]
        if o.filled("stripright"):
            n = o.uns("stripright")
            s2rc, q2rc = s2rc[:len(s2rc) - n], q2rc[:len(q2rc) - n]
        jseq = np.concatenate([s1, pad_arr, s2rc])
        jqual = q1 + padq + q2rc
        label = l1
        if o.filled("relabel"):
            count += 1
            rlab = o.str("relabel")
            if rlab.startswith("+"):
                label = label + rlab + str(count)
            else:
                label = rlab + str(count)
        if f_fq:
            write_fastq(f_fq, label, jseq, jqual)
        if f_fa:
            write_fasta(f_fa, label, jseq, o.uns("fasta_cols"))
    for f in (f_fq, f_fa):
        if f:
            f.close()

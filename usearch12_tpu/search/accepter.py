"""Accept predicate for alignments and pre-alignment pair rejection.

Reference: src/accepter.cpp:27-95 (IsAcceptLo), :140-198 (RejectPair).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import options
from ..io.seqdb import size_from_label


class Accepter:
    def __init__(self, is_global: bool, accept_all: bool = False) -> None:
        self.is_global = is_global
        self.accept_all = accept_all

    def reject_pair(self, q_label: str, q_seq: np.ndarray,
                    t_label: str, t_seq: np.ndarray) -> bool:
        if self.accept_all:
            return False
        o = options()
        if o.flag("self") and q_label == t_label:
            return True
        if o.flag("notself") and q_label != t_label:
            return True
        if o.flag("selfid") and self.is_global:
            if len(q_seq) == len(t_seq) and np.array_equal(q_seq, t_seq):
                return True
        if o.filled("min_sizeratio"):
            qsize = size_from_label(q_label, -1)
            tsize = size_from_label(t_label, -1)
            assert qsize > 0 and tsize > 0
            if tsize / qsize < o.flt("min_sizeratio"):
                return True
        if (o.filled("minqt") or o.filled("maxqt") or o.filled("minsl")
                or o.filled("maxsl")):
            ql, tl = len(q_seq), len(t_seq)
            assert ql != 0 and tl != 0
            qt = ql / tl
            sl = min(ql, tl) / max(ql, tl)
            if o.filled("minqt") and qt < o.flt("minqt"):
                return True
            if o.filled("maxqt") and qt > o.flt("maxqt"):
                return True
            if o.filled("minsl") and sl < o.flt("minsl"):
                return True
            if o.filled("maxsl") and sl > o.flt("maxsl"):
                return True
        return False

    def is_accept(self, ar) -> bool:
        if ar is None:
            return False
        return self._is_accept_lo(ar)

    def _is_accept_lo(self, ar) -> bool:
        if self.accept_all:
            return True
        o = options()
        if self.reject_pair(ar.query_label, ar.query_seq,
                            ar.target_label, ar.target_seq):
            return False
        if o.filled("id"):
            fract_id = ar.get_fract_id()
            if fract_id < o.flt("id"):
                return False
            if o.filled("maxid") and fract_id > o.flt("maxid"):
                return False
        if o.filled("mincols") and ar.get_aln_length() < o.uns("mincols"):
            return False
        if o.filled("maxgaps") and ar.get_gap_count() > o.uns("maxgaps"):
            return False
        if o.filled("evalue"):
            if ar.evalue is None or ar.evalue > o.flt("evalue"):
                return False
        if o.filled("query_cov") or o.filled("max_query_cov"):
            cov = ar.get_query_cov()
            if o.filled("query_cov") and cov < o.flt("query_cov"):
                return False
            if o.filled("max_query_cov") and cov > o.flt("max_query_cov"):
                return False
        if o.filled("target_cov") or o.filled("max_target_cov"):
            cov = ar.get_target_cov()
            if o.filled("target_cov") and cov < o.flt("target_cov"):
                return False
            if o.filled("max_target_cov") and cov > o.flt("max_target_cov"):
                return False
        if o.filled("maxdiffs") and ar.get_diff_count() > o.uns("maxdiffs"):
            return False
        if o.filled("mindiffs") and ar.get_diff_count() < o.uns("mindiffs"):
            return False
        if o.filled("abskew"):
            qsize = size_from_label(ar.query_label, -1)
            tsize = size_from_label(ar.target_label, -1)
            if tsize / qsize < o.flt("abskew"):
                return False
        return True

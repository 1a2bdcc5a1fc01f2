"""USORT candidate ranking and the u-sorted search loop.

Reference semantics (src/udbusortedsearcher.cpp):
  - SetU: U[target] = shared unique word count (query unique words x target
    unique words via postings).
  - SetTopBump(MinU=1, bump=50): scan targets in index order; dynamic MinU
    raise to 50% of a new max (src/udbusortedsearcher.cpp:230-267).
  - CountSortOrderDesc: stable descending order, dropping candidates below
    NextValue/2 where NextValue is the running second-max of the forward
    scan (src/countsort.cpp:6-108).
  - Candidates aligned in that order until the Terminator fires.

The U computation itself is delegated to UDBIndex (host bincount now,
device segment-sum kernel on TPU).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..config import options
from ..index.udb import UDBIndex


def set_top_bump(u: np.ndarray, min_u: int, bump_pct: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (top_u, top_target_indexes) in target-index order."""
    bump = bump_pct / 100.0
    top_u = []
    top_tix = []
    max_count = 0
    cur_min = min_u
    for tix, n in enumerate(u.tolist()):
        if n >= cur_min:
            if n > max_count:
                new_min = int(n * bump)
                if new_min > cur_min and new_min < max_count:
                    cur_min = new_min
                max_count = n
            top_u.append(n)
            top_tix.append(tix)
    return (np.array(top_u, dtype=np.uint32),
            np.array(top_tix, dtype=np.int64))


def set_top_no_bump(u: np.ndarray, min_u: int):
    mask = u >= min_u
    tix = np.nonzero(mask)[0]
    return u[tix].astype(np.uint32), tix.astype(np.int64)


def count_sort_order_desc(values: np.ndarray) -> np.ndarray:
    """Stable descending order of `values`, truncated at MinValue =
    NextValue/2 (src/countsort.cpp)."""
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    max_value = 0
    next_value = 0
    for v in values.tolist():
        if v > max_value:
            next_value = max_value
            max_value = v
    min_value = next_value // 2
    keep = values >= min_value
    idx = np.nonzero(keep)[0]
    order = idx[np.argsort(-values[idx].astype(np.int64), kind="stable")]
    return order.astype(np.int64)


def quick_sort_order_desc(values: np.ndarray) -> np.ndarray:
    return np.argsort(-values.astype(np.int64), kind="stable").astype(np.int64)


class USortedRanker:
    """SetTargetOrder: query words -> ranked candidate target list."""

    def __init__(self, index: UDBIndex) -> None:
        self.index = index

    def rank(self, query_seq: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (ordered_target_indexes, their word counts)."""
        params = self.index.params
        uw = params.unique_words(query_seq)
        u = self.index.count_u(uw)
        o = options()
        bump = o.uns("bump")
        if bump != 0:
            top_u, top_tix = set_top_bump(u, 1, bump)
        else:
            top_u, top_tix = set_top_no_bump(u, 1)
        if o.flag("quicksort"):
            order = quick_sort_order_desc(top_u)
        else:
            order = count_sort_order_desc(top_u)
        return top_tix[order], top_u[order]

    def get_u_ranked(self, query_seq: np.ndarray, self_delete: bool = False,
                     query_label: str = "", labels=None):
        """GetU (src/udbusortedsearcher.cpp:489-532): no-bump top list,
        optionally deleting the query itself from the tied-top block."""
        params = self.index.params
        uw = params.unique_words(query_seq)
        u = self.index.count_u(uw)
        top_u, top_tix = set_top_no_bump(u, 1)
        order = count_sort_order_desc(top_u)
        tix = top_tix[order]
        counts = top_u[order]
        if self_delete and len(tix) > 0 and labels is not None:
            top_count = counts[0]
            for i in range(len(tix)):
                if counts[i] < top_count:
                    break
                if labels[tix[i]] == query_label:
                    tix = np.delete(tix, i)
                    counts = np.delete(counts, i)
                    break
        return tix, counts

    def get_hot(self, query_seq: np.ndarray, max_hot: int, max_drop: int
                ) -> np.ndarray:
        """GetHot (src/udbusortedsearcher.cpp:534-568)."""
        tix, counts = self.rank(query_seq)
        n = len(tix)
        if n == 0:
            return tix
        if n > max_hot:
            n = max_hot
        top_count = int(counts[0])
        out = [tix[0]]
        for i in range(1, n):
            if top_count - int(counts[i]) > max_drop:
                return np.array(out, dtype=np.int64)
            out.append(tix[i])
        return np.array(out, dtype=np.int64)

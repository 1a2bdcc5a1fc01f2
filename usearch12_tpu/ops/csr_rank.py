"""Device CSR ranking: exact USORT candidate lists without the dense
(V, T) incidence.

The dense-MXU formulation (parallel/mesh_search.py) stores an int8
incidence column per target — 64 KB of HBM per 1k targets per word-slot
row, infeasible past ~100k targets.  This module keeps the index in its
native CSR form on device (postings ~4 bytes per target word occurrence,
~1 GB for 1M 250-mers) and computes, in ONE jitted dispatch per query
chunk:

  1. hit-stream gather: each query's words' posting rows concatenate
     into a fixed-capacity row of target ids (segment arithmetic +
     take, no scatter)
  2. per-target counts: sort the row ascending and run-length encode
     with two associative scans — the sorted order IS index order, so
  3. the exact SetTopBump ratchet applies as the same two prefix maxima
     used by the mesh ranker (records are never dropped), and the
     count-sort NextValue is the penultimate prefix record
  4. top-K by one lexicographic sort on integer keys (-count, target)

Everything is sort/scan/gather — no data-dependent shapes (the hit
capacity is a padded bucket, recompiles are bounded by the bucket
count) and no scatter.  Exactness vs the host ranker is asserted in
tests/test_csr_rank.py.

Reference semantics: SetU_NonCoded + SetTopBump + CountSortOrderDesc
(src/udbusortedsearcher.cpp:375-410, 205-282; src/countsort.h:49).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np


class CSRDeviceRanker:
    """Exact USORT ranking from device-resident CSR postings."""

    def __init__(self, index, topk: int = 64, bump: Optional[int] = None,
                 chunk_b: int = 64) -> None:
        import jax
        import jax.numpy as jnp
        from ..config import options
        index._flatten()
        self.index = index
        self.topk = topk
        self.bump = int(options().uns("bump")) if bump is None else bump
        self.chunk_b = chunk_b
        self.t = index.seq_count
        v = index.params.slot_count
        # CSR on device; an extra empty row V serves as the padding word
        starts = np.zeros(v + 2, dtype=np.int32)
        starts[:v + 1] = index.starts
        starts[v + 1] = starts[v]
        self._starts = jax.device_put(jnp.asarray(starts))
        self._sizes = jax.device_put(
            jnp.asarray(np.concatenate(
                [index.sizes, [0]]).astype(np.int32)))
        self._postings = jax.device_put(
            jnp.asarray(index.postings.astype(np.int32)))
        self._fns = {}

    def _fn(self, wmax: int, cap: int):
        key = (wmax, cap)
        fn = self._fns.get(key)
        if fn is None:
            fn = self._build(wmax, cap)
            self._fns[key] = fn
        return fn

    def _build(self, wmax: int, cap: int):
        import jax
        import jax.numpy as jnp

        K = self.topk
        bump = self.bump
        T = self.t          # sentinel target id for padding

        def step(qw, starts, sizes, postings):
            # qw: (B, wmax) int32 word ids (pad = V+... the empty row)
            B = qw.shape[0]
            seg_sizes = sizes[qw]                        # (B, wmax)
            seg_off = jnp.cumsum(seg_sizes, axis=1)      # inclusive
            seg_lo = seg_off - seg_sizes                 # exclusive
            total = seg_off[:, -1]                       # (B,)
            pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
            # which word segment does flat position j fall into?
            seg = jax.vmap(
                lambda off, p: jnp.searchsorted(off, p, side="right")
            )(seg_off, pos.repeat(B, axis=0))            # (B, cap)
            seg = jnp.minimum(seg, wmax - 1)
            within = pos - jnp.take_along_axis(seg_lo, seg, axis=1)
            word = jnp.take_along_axis(qw, seg, axis=1)
            idx = starts[word] + within
            hits = postings[jnp.clip(idx, 0, postings.shape[0] - 1)]
            hits = jnp.where(pos < total[:, None], hits, T)
            # per-target counts: ascending sort => index-order runs
            h = jax.lax.sort(hits, dimension=1)
            prev = jnp.concatenate(
                [jnp.full((B, 1), -1, h.dtype), h[:, :-1]], axis=1)
            is_start = (h != prev) & (h < T)
            nxt = jnp.concatenate(
                [h[:, 1:], jnp.full((B, 1), T + 1, h.dtype)], axis=1)
            is_end = (h != nxt) & (h < T)
            posi = jnp.arange(cap, dtype=jnp.int32)[None, :].repeat(
                B, axis=0)
            # run start position broadcast to every element of the run
            run_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(is_start, posi, -1), axis=1)
            # run end position broadcast backwards
            run_end = jax.lax.associative_scan(
                jnp.minimum, jnp.where(is_end, posi, cap), axis=1,
                reverse=True)
            count = jnp.where(is_start, run_end - run_start + 1, 0)
            count = count.astype(jnp.int32)
            # exact SetTopBump over the (t-ascending) run sequence
            if bump != 0:
                inc = jax.lax.associative_scan(jnp.maximum, count, axis=1)
                pm = jnp.concatenate(
                    [jnp.zeros((B, 1), count.dtype), inc[:, :-1]], axis=1)
                record = count > pm
                nm = (count * bump) // 100
                contrib = jnp.where(record & (nm < pm), nm, 0)
                cm = jax.lax.associative_scan(jnp.maximum, contrib,
                                              axis=1)
                cur_min = jnp.maximum(
                    jnp.concatenate([jnp.zeros((B, 1), count.dtype),
                                     cm[:, :-1]], axis=1), 1)
                kept = jnp.where(count >= cur_min, count, 0)
            else:
                pm = jnp.concatenate(
                    [jnp.zeros((B, 1), count.dtype),
                     jax.lax.associative_scan(jnp.maximum, count,
                                              axis=1)[:, :-1]], axis=1)
                kept = count
            # NextValue: prefix max (pm) at the first global max
            maxv = jnp.max(count, axis=1)
            first_max = jnp.argmax(count == maxv[:, None], axis=1)
            nextv = jnp.take_along_axis(pm, first_max[:, None],
                                        axis=1)[:, 0]
            nextv = jnp.where(maxv > 0, nextv, 0)
            # top-K by (count desc, target asc)
            tgt = jnp.where(kept > 0, h, T)
            nc, nt = jax.lax.sort((-kept, tgt), dimension=1, num_keys=2)
            return -nc[:, :K], nt[:, :K], nextv

        return jax.jit(partial(step))

    def rank_window(self, jbuf: np.ndarray, j_off: np.ndarray):
        """Same contract as MeshRanker.rank_window: (cand, cnts, out_n,
        uncertain).  Queries run in chunks of chunk_b so the (B, cap)
        hit stream stays within a bounded HBM footprint."""
        import jax.numpy as jnp
        params = self.index.params
        n_jobs = len(j_off) - 1
        v = params.slot_count
        sizes_np = np.asarray(self.index.sizes)
        uw = []
        for j in range(n_jobs):
            uw.append(params.unique_words(jbuf[j_off[j]:j_off[j + 1]]))

        K = self.topk
        cnts = np.zeros((n_jobs, K), dtype=np.int32)
        cand = np.full((n_jobs, K), self.t, dtype=np.int64)
        nextv = np.zeros(n_jobs, dtype=np.int32)
        for lo in range(0, n_jobs, self.chunk_b):
            hi = min(lo + self.chunk_b, n_jobs)
            chunk = uw[lo:hi]
            max_w = max([len(w) for w in chunk] + [8])
            max_hits = max([int(sizes_np[w].sum()) for w in chunk] + [64])
            wmax = 1 << int(np.ceil(np.log2(max_w)))
            cap = 1 << int(np.ceil(np.log2(max_hits)))
            qw = np.full((hi - lo, wmax), v, dtype=np.int32)
            for j, w in enumerate(chunk):
                qw[j, :len(w)] = w
            fn = self._fn(wmax, cap)
            c_d, t_d, n_d = fn(jnp.asarray(qw), self._starts,
                               self._sizes, self._postings)
            cnts[lo:hi] = np.asarray(c_d)
            cand[lo:hi] = np.asarray(t_d).astype(np.int64)
            nextv[lo:hi] = np.asarray(n_d)
        valid = (cnts > 0) & (cand < self.t)
        first_bad = np.where(valid.all(axis=1), cnts.shape[1],
                             np.argmin(valid, axis=1))
        out_n = first_bad.astype(np.int32)
        minv = np.maximum(nextv // 2, 1)
        keep = valid & (cnts >= minv[:, None])
        out_n = np.minimum(out_n, keep.sum(axis=1)).astype(np.int32)
        from ..search.terminator import Terminator
        term = Terminator("usearch_global")
        bound = term.max_accepts + term.max_rejects
        uncertain = (out_n >= self.topk) & (bound > self.topk)
        return cand, cnts.astype(np.uint32), out_n, uncertain


def make_engine_override(ranker, eng):
    """rank_override for BatchEngine.search_window: device CSR ranking
    with an exact host re-rank for capacity-uncertain queries."""
    def override(jbuf, j_off):
        cand, cnts, out_n, unc = ranker.rank_window(jbuf, j_off)
        if unc.any():
            h_cand, h_cnts, h_out_n = eng._rank_jobs(jbuf, j_off)
            for j in np.nonzero(unc)[0]:
                k = min(int(h_out_n[j]), cand.shape[1])
                cand[j, :k] = h_cand[j, :k]
                cnts[j, :k] = h_cnts[j, :k]
                out_n[j] = k
        return (np.ascontiguousarray(cand.astype(np.uint32)),
                np.ascontiguousarray(cnts), out_n)
    return override

"""Batched HSP-anchored global alignment: host chaining + device hole DP.

The reference aligns pairs one at a time (HSP chain, then a banded NW per
inter-HSP hole, src/globalalignmem.cpp:129-236).  On TPU the hole DPs are
the batchable unit: this module chains many pairs on the host (native C,
global_chain_c), gathers every hole across the batch, groups holes by
their terminal-penalty class (which of the 4 hole edges touch a sequence
end, src/globalalignmem.cpp AlignHSPMem semantics — penalties are the
only per-hole variation), and dispatches each class as ONE wavefront
kernel batch.  Paths are spliced exactly as the serial code does, so
results are bit-identical to NativeAligner.global_align / global_align.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..scoring import AlnParams, AlnHeuristics


class BatchedGlobalAligner:
    def __init__(self, ap: AlnParams, ah: AlnHeuristics, device=None,
                 pb: int = 16) -> None:
        from ..native import NativeAligner
        self.ap = ap
        self.ah = ah
        self.native = NativeAligner(ap, ah)
        if device is None:
            from .wavefront_nw import WavefrontNWDevice
            device = WavefrontNWDevice(ap, pb=pb)
        self.device = device
        # per terminal-class devices share ap-derived match/mismatch but
        # carry the hole-local gap-parameter vector
        self._class_devices: Dict[Tuple[bool, bool, bool, bool], object] = {}

    def _class_device(self, cls: Tuple[bool, bool, bool, bool]):
        dev = self._class_devices.get(cls)
        if dev is None:
            from .wavefront_nw import WavefrontNWDevice
            local_ap = self.ap.hole_params(*cls)
            dev = WavefrontNWDevice(local_ap, pb=self.device.pb,
                                    chunk=self.device.chunk,
                                    interpret=self.device.interpret)
            self._class_devices[cls] = dev
        return dev

    def align_pairs(self, pairs: List[Tuple[np.ndarray, np.ndarray]],
                    fail_if_no_hsps: bool = True,
                    full_dp_always: bool = False
                    ) -> List[Optional[str]]:
        """Paths (or None = not aligned) for each (a, b) pair."""
        ah = self.ah
        n = len(pairs)
        plans: List[Optional[list]] = [None] * n
        results: List[Optional[str]] = [None] * n
        # jobs[cls] = list of (pair_idx, seg_idx, sub_a, sub_b)
        jobs: Dict[tuple, list] = {}

        for p, (a, b) in enumerate(pairs):
            la, lb = len(a), len(b)
            self.native.set_a(a)
            self.native.set_b(b)
            status, hsps = self.native.global_chain(
                full_dp_always=full_dp_always,
                fail_if_no_hsps=fail_if_no_hsps)
            if status == "fail":
                continue
            if status == "fulldp":
                # rare: -fulldp; keep on host
                self.native.set_a(a)
                self.native.set_b(b)
                results[p] = self.native.global_align(
                    full_dp_always=True, fail_if_no_hsps=fail_if_no_hsps)
                continue
            if status == "fallback":
                # no chain: whole-pair banded NW with the full AP
                plan = [("hole", (True, True, True, True), a, b)]
                plans[p] = plan
                self._queue(jobs, p, 0, plan[0])
                continue
            plan = []
            prev = None
            for h in hsps:
                hloi, hloj, hleni, hlenj = (int(h[0]), int(h[1]),
                                            int(h[2]), int(h[3]))
                if prev is None:
                    g = (0, 0, hloi, hloj)
                else:
                    g = (prev[0] + 1, prev[1] + 1,
                         hloi - prev[0] - 1, hloj - prev[1] - 1)
                plan.append(self._hole_seg(a, b, la, lb, *g))
                plan.append(("M", hleni))
                prev = (hloi + hleni - 1, hloj + hlenj - 1)
            g = (prev[0] + 1, prev[1] + 1,
                 la - prev[0] - 1, lb - prev[1] - 1)
            plan.append(self._hole_seg(a, b, la, lb, *g))
            plans[p] = plan
            for s, seg in enumerate(plan):
                if seg[0] == "hole":
                    self._queue(jobs, p, s, seg)

        # device: one wavefront batch per terminal class
        hole_paths: Dict[Tuple[int, int], str] = {}
        for cls, items in jobs.items():
            dev = self._class_device(cls)
            sub_pairs = [(sa, sb) for (_p, _s, sa, sb) in items]
            _scores, paths = dev.align(sub_pairs, ah.band_radius,
                                       nucleo=self.ap.nucleo)
            for (p, s, _sa, _sb), path in zip(items, paths):
                hole_paths[(p, s)] = path

        # splice
        for p in range(n):
            plan = plans[p]
            if plan is None:
                continue
            parts = []
            for s, seg in enumerate(plan):
                kind = seg[0]
                if kind == "M":
                    parts.append("M" * seg[1])
                elif kind == "I":
                    parts.append("I" * seg[1])
                elif kind == "D":
                    parts.append("D" * seg[1])
                else:
                    parts.append(hole_paths[(p, s)])
            results[p] = "".join(parts)
        return results

    @staticmethod
    def _hole_seg(a, b, la, lb, hloi, hloj, hleni, hlenj):
        """align_hole dispatch (zero-dim holes become pure gap runs)."""
        if hleni == 0:
            return ("I", hlenj)
        if hlenj == 0:
            return ("D", hleni)
        cls = (hloi == 0, hloj == 0, hloi + hleni == la,
               hloj + hlenj == lb)
        return ("hole", cls, a[hloi:hloi + hleni], b[hloj:hloj + hlenj])

    @staticmethod
    def _queue(jobs, p, s, seg):
        _kind, cls, sa, sb = seg
        jobs.setdefault(cls, []).append((p, s, sa, sb))

"""In-memory sequence database (reference: src/seqdb.{h,cpp}).

Stores label / seq (np.uint8 ASCII) / optional qual per record, with helpers
for nt/aa typing, masking, size= annotations, and packing into fixed-shape
padded device batches (the TPU-side representation).
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np

from ..alpha import IS_ACGTU
from ..mask import mask_seq, db_mask_type

# reference semantics: strstr(";size=") — the annotation must follow a ';'
_SIZE_RE = re.compile(r";size=(\d+)")


def size_from_label(label: str, default: int = 1) -> int:
    m = _SIZE_RE.search(label)
    return int(m.group(1)) if m else default


def strip_size(label: str) -> str:
    s = _SIZE_RE.sub("", label)
    return s.strip(";")


def relabel_with_size(label: str, size: int) -> str:
    base = strip_size(label)
    if base and not base.endswith(";"):
        base += ";"
    return f"{base}size={size};"


class SeqDB:
    def __init__(self) -> None:
        self.labels: List[str] = []
        self.seqs: List[np.ndarray] = []
        self.quals: List[Optional[str]] = []
        self._is_nucleo: Optional[bool] = None

    # -- construction -----------------------------------------------------
    @classmethod
    def from_fastx(cls, path: str) -> "SeqDB":
        from .fastx import read_fastx
        db = cls()
        for label, seq, qual in read_fastx(path):
            if len(seq) == 0:
                # reference warns and drops empty records at load
                continue
            db.add(label, seq, qual)
        return db

    def add(self, label: str, seq: np.ndarray, qual: Optional[str] = None) -> int:
        idx = len(self.labels)
        self.labels.append(label)
        self.seqs.append(np.asarray(seq, dtype=np.uint8))
        self.quals.append(qual)
        return idx

    # -- accessors ----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.labels)

    @property
    def seq_count(self) -> int:
        return len(self.labels)

    def seq_length(self, i: int) -> int:
        return len(self.seqs[i])

    def letter_count(self) -> int:
        return sum(len(s) for s in self.seqs)

    def get_is_nucleo(self) -> bool:
        """>80% of sampled letters in [ACGTUN] => nucleotide
        (src/seqdb.cpp:268-310; deterministic full count instead of the
        reference's rand() sampling — equivalent for unambiguous inputs)."""
        if self._is_nucleo is None:
            total = 0
            nuc = 0
            for s in self.seqs:
                if len(s) == 0:
                    continue
                total += len(s)
                nuc += int(IS_ACGTU[s].sum())
                nuc += int((s == ord("N")).sum()) + int((s == ord("n")).sum())
                if total >= 100000:
                    break
            self._is_nucleo = total > 0 and nuc / total > 0.8
        return self._is_nucleo

    def set_is_nucleo(self, v: bool) -> None:
        self._is_nucleo = v

    # -- masking ------------------------------------------------------------
    def mask(self, mtype: Optional[str] = None) -> None:
        nucleo = self.get_is_nucleo()
        if mtype is None:
            mtype = db_mask_type(nucleo)
        self.seqs = [mask_seq(s, mtype, nucleo) for s in self.seqs]

    # -- device packing -------------------------------------------------------
    def pack_padded(self, indices=None, pad_to: Optional[int] = None,
                    multiple: int = 128):
        """Pack sequences into a (N, Lpad) uint8 array + lengths vector.
        Pads with 0 and rounds Lpad up to `multiple` for TPU lane alignment."""
        if indices is None:
            indices = range(len(self))
        seqs = [self.seqs[i] for i in indices]
        lens = np.array([len(s) for s in seqs], dtype=np.int32)
        maxlen = int(lens.max()) if len(seqs) else 0
        if pad_to is not None:
            maxlen = max(maxlen, pad_to)
        lpad = max(multiple, ((maxlen + multiple - 1) // multiple) * multiple)
        out = np.zeros((len(seqs), lpad), dtype=np.uint8)
        for k, s in enumerate(seqs):
            out[k, : len(s)] = s
        return out, lens

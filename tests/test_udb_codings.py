"""Legacy .udb coding interop: pos-coded, var-coded, and hashed files
(udbfile.h IsCoded/IsVarCoded/IsHashed) cannot be WRITTEN by any 12.0
command, but the reference still reads them (older tools produced them).
We craft each coding by hand, verify the reference binary searches it,
and require byte-identical blast6 from our reader."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from usearch12_tpu.cli import main as cli_main, parse_argv

HERE = os.path.dirname(os.path.abspath(__file__))

MAGIC1 = 0x55444246
MAGIC2 = 0x55444266
MAGIC3 = 0x55444233
MAGIC4 = 0x55444234
HDR_FMT = "<11I2Q8s64s64sI"


def _encode_varint(v):
    out = []
    for _ in range(5):
        b = v & 0x7F
        if v <= 0x7F:
            out.append(b | 0x80)
            return bytes(out)
        out.append(b)
        v >>= 7
    raise AssertionError


def _write_udb(path, *, hashed, seq_index_bits, seq_pos_bits, word_width,
               slot_count, sizes, row_bytes_or_postings, db):
    labels, seqs = db
    with open(path, "wb") as f:
        f.write(struct.pack(
            HDR_FMT, MAGIC1, int(hashed), seq_index_bits, seq_pos_bits,
            word_width, 1, 100, 0, 0, 0, 0,
            slot_count if hashed else 0, len(labels), b"", b"nt", b"",
            MAGIC2))
        np.asarray(sizes, dtype=np.uint32).tofile(f)
        f.write(struct.pack("<I", MAGIC3))
        if isinstance(row_bytes_or_postings, bytes):
            f.write(row_bytes_or_postings)
        else:
            np.asarray(row_bytes_or_postings, dtype=np.uint32).tofile(f)
        f.write(struct.pack("<I", MAGIC4))
        lbl = [l.encode() + b"\0" for l in labels]
        f.write(struct.pack("<IIQIII", 0x5E0DB3, len(labels),
                            sum(len(s) for s in seqs),
                            sum(len(b) for b in lbl), 0, 0x5E0DB4))
        f.write(b"\0\0\0\0")
        off = 0
        offs = []
        for b in lbl:
            offs.append(off)
            off += len(b)
        np.asarray(offs, dtype=np.uint32).tofile(f)
        f.write(b"".join(lbl))
        np.asarray([len(s) for s in seqs], dtype=np.uint32).tofile(f)
        for s in seqs:
            f.write(s)


def _mk_db(rng, n=12, length=120):
    conv = "ACGT"
    seqs = ["".join(conv[i] for i in rng.integers(0, 4, length))
            for _ in range(n)]
    return [f"t{i}" for i in range(n)], [s.encode() for s in seqs]


def _words(seq, w):
    n = len(seq) - w + 1
    vals = []
    conv = {65: 0, 67: 1, 71: 2, 84: 3}
    for i in range(n):
        v = 0
        ok = True
        for c in seq[i:i + w]:
            if c not in conv:
                ok = False
                break
            v = v * 4 + conv[c]
        vals.append(v if ok else -1)
    return vals


def _rs_hash(win, slots):
    a, b, h = 63689, 378551, 0
    for c in win:
        h = (h * a + c) & 0xFFFFFFFF
        a = (a * b) & 0xFFFFFFFF
    return h % slots


def _mk_queries(path, rng, seqs, n=8):
    conv = "ACGT"
    with open(path, "w") as f:
        for k in range(n):
            s = bytearray(seqs[k % len(seqs)])
            for p in rng.integers(0, len(s), 4):
                s[p] = ord(conv[rng.integers(0, 4)])
            f.write(f">q{k}\n{s.decode()}\n")


def _search_both(ref_bin, udb, q_fa, d, tag):
    g, m = f"{d}/{tag}_g.b6", f"{d}/{tag}_m.b6"
    r = subprocess.run(
        [ref_bin, "-usearch_global", q_fa, "-db", udb, "-id", "0.8",
         "-strand", "plus", "-blast6out", g, "-quiet", "-threads", "1"],
        capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert cli_main(["-usearch_global", q_fa, "-db", udb, "-id", "0.8",
                     "-strand", "plus", "-blast6out", m, "-quiet"]) == 0
    assert open(g).read() == open(m).read(), tag


def test_pos_coded_udb(ref_bin, tmp_path):
    rng = np.random.default_rng(31)
    labels, seqs = _mk_db(rng)
    w = 8
    slot = 4 ** w
    rows = [[] for _ in range(slot)]
    for ix, s in enumerate(seqs):
        for pos, v in enumerate(_words(s, w)):
            if v >= 0:
                rows[v].append((ix << 16) | pos)
    sizes = [len(r) for r in rows]
    postings = [p for r in rows for p in r]
    udb = str(tmp_path / "coded.udb")
    _write_udb(udb, hashed=False, seq_index_bits=16, seq_pos_bits=16,
               word_width=w, slot_count=slot, sizes=sizes,
               row_bytes_or_postings=postings, db=(labels, seqs))
    q = str(tmp_path / "q.fa")
    _mk_queries(q, rng, seqs)
    parse_argv(["-quiet"])
    _search_both(ref_bin, udb, q, str(tmp_path), "coded")


def test_var_coded_udb(ref_bin, tmp_path):
    """The 12.0-beta binary SEGFAULTS on var-coded files in
    usearch_global (UDBUsortedSearcher::SetU dispatches only
    Coded/NonCoded, src/udbusortedsearcher.cpp:284-290, so byte rows
    are read as uint32 postings); SetU_VarCoded is reachable only from
    GetU.  Our reader decodes the documented format
    (src/udbdata.h:84-125), so we validate against an equivalent
    PLAIN-coded per-occurrence file, which both implementations search
    byte-identically."""
    rng = np.random.default_rng(33)
    labels, seqs = _mk_db(rng)
    w = 8
    slot = 4 ** w
    var_rows = [b"" for _ in range(slot)]
    occ_rows = [[] for _ in range(slot)]
    for ix, s in enumerate(seqs):
        for pos, v in enumerate(_words(s, w)):
            if v >= 0:
                var_rows[v] += _encode_varint(ix) + _encode_varint(pos)
                occ_rows[v].append(ix)
    var_udb = str(tmp_path / "var.udb")
    _write_udb(var_udb, hashed=False, seq_index_bits=0, seq_pos_bits=0xFF,
               word_width=w, slot_count=slot,
               sizes=[len(r) for r in var_rows],   # BYTE sizes
               row_bytes_or_postings=b"".join(var_rows),
               db=(labels, seqs))
    occ_udb = str(tmp_path / "occ.udb")
    _write_udb(occ_udb, hashed=False, seq_index_bits=32, seq_pos_bits=0,
               word_width=w, slot_count=slot,
               sizes=[len(r) for r in occ_rows],
               row_bytes_or_postings=[p for r in occ_rows for p in r],
               db=(labels, seqs))
    q = str(tmp_path / "q.fa")
    _mk_queries(q, rng, seqs)
    parse_argv(["-quiet"])
    # plain-occurrence file: reference vs us, byte parity
    _search_both(ref_bin, occ_udb, q, str(tmp_path), "occ")
    # var-coded file through OUR reader must match the occurrence file
    m = f"{tmp_path}/var_m.b6"
    assert cli_main(["-usearch_global", q, "-db", var_udb, "-id", "0.8",
                     "-strand", "plus", "-blast6out", m, "-quiet"]) == 0
    assert open(m).read() == open(f"{tmp_path}/occ_m.b6").read()


def test_hashed_udb(ref_bin, tmp_path):
    rng = np.random.default_rng(35)
    labels, seqs = _mk_db(rng)
    w = 8
    slot = 4999
    rows = [[] for _ in range(slot)]
    for ix, s in enumerate(seqs):
        seen = set()
        for i in range(len(s) - w + 1):
            win = s[i:i + w]
            h = _rs_hash(win, slot)
            if h not in seen:
                seen.add(h)
                rows[h].append(ix)
    sizes = [len(r) for r in rows]
    postings = [p for r in rows for p in r]
    udb = str(tmp_path / "hashed.udb")
    _write_udb(udb, hashed=True, seq_index_bits=32, seq_pos_bits=0,
               word_width=w, slot_count=slot, sizes=sizes,
               row_bytes_or_postings=postings, db=(labels, seqs))
    q = str(tmp_path / "q.fa")
    _mk_queries(q, rng, seqs)
    parse_argv(["-quiet"])
    _search_both(ref_bin, udb, q, str(tmp_path), "hashed")

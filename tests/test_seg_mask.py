"""SEG masking vs the 12.0-beta binary on the minimized recursion-trim
probe cases (tools/seg_probe.py; seg.py:_trim docstring).  Each case
pinned down one rule of the binary's left-recursion trim behavior —
byte parity here guards the whole empirical characterization."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CASES = [
    # prefix series: right end shrinks with the recursion offset
    "IXSATGNGNGNGNY" + "I" * 12,
    "T" + "IXSATGNGNGNGNY" + "I" * 12,
    "TCIXSATGNGNGNGNY" + "I" * 12,
    "QTCIXSATGNGNGNGNY" + "I" * 12,
    "xWGTTCIXSATGNGNGNGNY" + "I" * 12,
    # scan minimum at the interval end, shrunk back
    "CLQZbbRzIZNTNbWWWWWWW",
    # left end preserved while the right end shrinks
    "xQQVRLLXSDZbbRzIZNWWWWWWW",
    # minimum well inside the interval: published output
    "VNQGXYTLLLLLLTFNSSSSSHGHGIIIII",
    # offset 13 with gap >= W: offset stops biting
    "LWxbZCMKVIFVNBxQGXYTLLLLLLLLTFNTSSSSSQQQHGHGHGHGHGHGIIIIIII",
    # I-family offsets 13-15: recursion segment disappears entirely
    "LbKIDLbVFBzTY" + "MGFWEbEbEbEbLKLKL" + "YXIYXIYIYIYHTHTAHTAHTAHT",
    "LbKIDLbVFBzTYM" + "MGFWEbEbEbEbLKLKL" + "YXIYXIYIYIYHTHTAHTAHTAHT",
    # case from the TTCIN family: long prefix windows must not score
    "TTCINSATGNGNGNGNYIIIIIIIIIIII",
    # recursion at offset 34 with three trims: the SECOND trim
    # (interval start 7) takes the full uncapped offset shrink and goes
    # degenerate — the I7/V15 runs stay UNmasked in the binary
    "ILFPDMNDZXEZXEZXEQQQQQQQQQQQQQQYKQZAZTDSL" + "I" * 7 + "V" * 15
    + "DLDDLDDLDFPP" + "C" * 20 + "A" * 10 + "CbZC",
    # F-family: first-interval trim with scan gap 13 (one past W) takes
    # the FULL offset shrink (14), not the published gap — the old
    # "gap >= W" cap masked one char too many
    "EDKDbQSXbXXMASbWGLLxN" + "F" * 9
    + "THBFbDDzXYbHQBbBxZBBXZzxVVVVVVVVVVVVVV" + "x" * 11,
    # H-family boundary: scan gap EXACTLY W at leftend 0 takes the
    # published shrink (the sole probed exception to the offset rule)
    "LWxbZCMKVIFVNBxQGXYT" + "L" * 9 + "TFNTSSSSSQQQHGHGHGHGHGHGIIIIIII",
]


@pytest.mark.parametrize("seq", CASES, ids=range(len(CASES)))
def test_seg_minimized_cases(ref_bin, tmp_path, seq):
    from usearch12_tpu.cli import parse_argv
    from usearch12_tpu.index.udbfile import read_udb
    from usearch12_tpu.seg import seg_mask

    fa = str(tmp_path / "in.fa")
    udb = str(tmp_path / "r.udb")
    with open(fa, "w") as f:
        f.write(f">s0\n{seq}\n")
    subprocess.run(
        [ref_bin, "-makeudb_usearch", fa, "-output", udb, "-dbmask",
         "seg", "-hardmask", "-quiet", "-threads", "1"],
        check=True, capture_output=True)
    _idx, db = read_udb(udb)
    want = db.seqs[0].tobytes().decode("latin1")

    parse_argv(["-makeudb_usearch", fa, "-output", str(tmp_path / "m"),
                "-dbmask", "seg", "-hardmask", "-quiet"])
    got = seg_mask(np.frombuffer(seq.encode("latin1"),
                                 np.uint8)).tobytes().decode("latin1")
    assert got == want

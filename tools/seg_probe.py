"""Probe the 12.0-beta binary's SEG masking via .udb round-trip and
minimize divergent inputs against our seg_mask.

Usage: PYTHONPATH=/root/repo python tools/seg_probe.py [seed ...]
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

REF = "/tmp/usearch_ref_test"
AA = "ACDEFGHIKLMNPQRSTVWYBZXbzx"


def binary_seg_mask(seqs, d):
    """Masked (hardmask 'x') sequences as the binary writes them into a
    .udb, read back with our byte-exact reader."""
    fa = os.path.join(d, "in.fa")
    udb = os.path.join(d, "r.udb")
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")
    r = subprocess.run(
        [REF, "-makeudb_usearch", fa, "-output", udb, "-dbmask", "seg",
         "-hardmask", "-quiet", "-threads", "1"], capture_output=True)
    if r.returncode:
        return None
    from usearch12_tpu.index.udbfile import read_udb
    _idx, db = read_udb(udb)
    return [s.tobytes().decode("latin1") for s in db.seqs]


def our_seg_mask(seqs):
    from usearch12_tpu.cli import parse_argv
    parse_argv(["-makeudb_usearch", "x.fa", "-output", "x.udb",
                "-dbmask", "seg", "-hardmask", "-quiet"])
    from usearch12_tpu.seg import seg_mask
    out = []
    for s in seqs:
        arr = np.frombuffer(s.encode("latin1"), np.uint8)
        out.append(seg_mask(arr).tobytes().decode("latin1"))
    return out


def gen(seed):
    rng = np.random.default_rng(seed + 500)
    n = int(rng.integers(3, 30))
    seqs = []
    for _ in range(n):
        parts = []
        tgt = int(rng.integers(20, 600))
        while sum(len(p) for p in parts) < tgt:
            r = rng.random()
            if r < 0.25:
                parts.append(AA[int(rng.integers(0, len(AA)))]
                             * int(rng.integers(2, 20)))
            elif r < 0.45:
                dd = "".join(AA[int(j)] for j in
                             rng.integers(0, len(AA),
                                          int(rng.integers(2, 4))))
                parts.append(dd * int(rng.integers(2, 10)))
            else:
                parts.append("".join(
                    AA[int(j)] for j in
                    rng.integers(0, len(AA), int(rng.integers(4, 30)))))
        seqs.append("".join(parts)[:tgt])
    return seqs


def diverges(s, d):
    b = binary_seg_mask([s], d)
    if b is None:
        return False
    return our_seg_mask([s])[0] != b[0]


def minimize(s, d):
    """Greedy shrink: chunk deletion then per-char deletion."""
    changed = True
    while changed:
        changed = False
        step = max(1, len(s) // 8)
        while step >= 1:
            i = 0
            while i < len(s):
                t = s[:i] + s[i + step:]
                if len(t) >= 1 and diverges(t, d):
                    s = t
                    changed = True
                else:
                    i += step
            step //= 2
    return s


def main():
    seeds = [int(a) for a in sys.argv[1:]] or [15, 19, 21, 23]
    d = tempfile.mkdtemp(prefix="segprobe_")
    for seed in seeds:
        seqs = gen(seed)
        b = binary_seg_mask(seqs, d)
        ours = our_seg_mask(seqs)
        for i, (o, bb) in enumerate(zip(ours, b)):
            if o != bb:
                print(f"seed {seed} seq {i} len {len(seqs[i])} diverges")
                m = minimize(seqs[i], d)
                print(f"  minimized ({len(m)}): {m!r}")
                bm = binary_seg_mask([m], d)[0]
                om = our_seg_mask([m])[0]
                print(f"  bin : {bm!r}")
                print(f"  ours: {om!r}")
                return


if __name__ == "__main__":
    main()

"""Bulk adversarial SEG fuzz: B/Z/X-dense random amino inputs, our
seg_mask vs the 12.0-beta binary's .udb masking, batched 40 seqs per
binary call.

Usage: PYTHONPATH=/root/repo python tools/seg_fuzz.py [n_inputs]
Writes any divergent input to /tmp/seg_diff_<i>.txt.
"""

import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from seg_probe import binary_seg_mask, our_seg_mask  # noqa: E402

AA = "ACDEFGHIKLMNPQRSTVWYBZXbzx"
BZX = "BZXbzx"


def gen_seq(rng):
    parts = []
    tgt = int(rng.integers(20, 600))
    while sum(len(p) for p in parts) < tgt:
        r = rng.random()
        if r < 0.2:
            parts.append(AA[int(rng.integers(0, len(AA)))]
                         * int(rng.integers(2, 25)))
        elif r < 0.35:
            parts.append(BZX[int(rng.integers(0, len(BZX)))]
                         * int(rng.integers(2, 15)))
        elif r < 0.55:
            dd = "".join(AA[int(j)] for j in
                         rng.integers(0, len(AA), int(rng.integers(2, 4))))
            parts.append(dd * int(rng.integers(2, 10)))
        else:
            src = BZX if rng.random() < 0.4 else AA
            parts.append("".join(
                src[int(j)] for j in
                rng.integers(0, len(src), int(rng.integers(4, 30)))))
    return "".join(parts)[:tgt]


def main():
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    batch = 40
    d = tempfile.mkdtemp(prefix="segfz_")
    rng = np.random.default_rng(20260818)
    done = fails = 0
    while done < n_total:
        seqs = [gen_seq(rng) for _ in range(batch)]
        b = binary_seg_mask(seqs, d)
        if b is None:
            print("binary rc!=0 on batch at", done)
            fails += 1
            done += batch
            continue
        o = our_seg_mask(seqs)
        for i, (x, y) in enumerate(zip(o, b)):
            if x != y:
                fails += 1
                print("DIFF at", done + i)
                with open(f"/tmp/seg_diff_{done + i}.txt", "w") as f:
                    f.write(seqs[i] + "\n" + y + "\n" + x + "\n")
        done += batch
        if done % 2000 == 0:
            print(done, "done,", fails, "fails", flush=True)
    print("TOTAL", done, "FAILS", fails)


if __name__ == "__main__":
    main()

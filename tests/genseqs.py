"""Synthetic amplicon test-data generator (deterministic).

Produces 16S-like nucleotide reads: a set of "true" template sequences plus
reads derived from them with substitutions and indels, with size= abundance
annotations — the input shape expected by cluster_fast / unoise3 / uchime3.
"""

from __future__ import annotations

import numpy as np

BASES = "ACGT"


def rand_seq(rng, length: int) -> str:
    return "".join(BASES[i] for i in rng.integers(0, 4, size=length))


def mutate(rng, seq: str, n_subs: int, n_indels: int) -> str:
    s = list(seq)
    for _ in range(n_subs):
        p = int(rng.integers(0, len(s)))
        s[p] = BASES[int(rng.integers(0, 4))]
    for _ in range(n_indels):
        p = int(rng.integers(0, len(s)))
        if rng.integers(0, 2) == 0 and len(s) > 50:
            del s[p]
        else:
            s.insert(p, BASES[int(rng.integers(0, 4))])
    return "".join(s)


def make_amplicons(n_templates=20, reads_per_template=10, length=250,
                   seed=7, max_subs=8, max_indels=2):
    """Returns list of (label, seq) with out-of-order derived reads."""
    rng = np.random.default_rng(seed)
    templates = [rand_seq(rng, length) for _ in range(n_templates)]
    records = []
    k = 0
    for ti, t in enumerate(templates):
        records.append((f"tpl{ti};size={int(rng.integers(50, 500))};", t))
        for r in range(reads_per_template):
            n_subs = int(rng.integers(0, max_subs + 1))
            n_ind = int(rng.integers(0, max_indels + 1))
            records.append((f"read{k};size={int(rng.integers(1, 50))};",
                            mutate(rng, t, n_subs, n_ind)))
            k += 1
    # shuffle deterministically
    order = rng.permutation(len(records))
    return [records[i] for i in order]


def write_fasta(path: str, records) -> None:
    with open(path, "w") as f:
        for label, seq in records:
            f.write(f">{label}\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i:i + 80] + "\n")


if __name__ == "__main__":
    import sys
    write_fasta(sys.argv[1] if len(sys.argv) > 1 else "/tmp/amplicons.fa",
                make_amplicons())

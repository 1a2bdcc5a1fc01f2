"""Golden-output parity: FASTQ preprocessing vs the reference binary."""

import subprocess

import numpy as np
import pytest

from usearch12_tpu.cli import main as cli_main


def run_ref(ref_bin, args):
    subprocess.run([ref_bin] + args + ["-quiet", "-threads", "1"],
                   check=True, capture_output=True)


@pytest.fixture(scope="module")
def paired_fq(tmp_path_factory):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(11)
    bases = "ACGT"
    d = tmp_path_factory.mktemp("fq")
    r1p, r2p = str(d / "R1.fq"), str(d / "R2.fq")

    def rq(L, mean=35):
        return "".join(chr(33 + int(min(41, max(2, rng.normal(mean, 6)))))
                       for _ in range(L))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    with open(r1p, "w") as f1, open(r2p, "w") as f2:
        for k in range(100):
            L = int(rng.integers(180, 300))
            tpl = "".join(bases[i] for i in rng.integers(0, 4, L))
            r1len = int(rng.integers(100, 151))
            r2len = int(rng.integers(100, 151))
            r1 = list(tpl[:r1len])
            r2 = [comp[c] for c in reversed(tpl[-r2len:])]
            for _ in range(int(rng.integers(0, 3))):
                r1[int(rng.integers(0, r1len))] = bases[int(rng.integers(0, 4))]
            q1, q2 = rq(r1len), rq(r2len)
            if rng.integers(0, 3) == 0:
                q1 = q1[:-6] + "##$###"
            f1.write(f"@pair{k} 1:N:0\n{''.join(r1)}\n+\n{q1}\n")
            f2.write(f"@pair{k} 2:N:0\n{''.join(r2)}\n+\n{q2}\n")
    return r1p, r2p


def test_fastq_filter_parity(ref_bin, paired_fq, tmp_path):
    r1, _ = paired_fq
    g = str(tmp_path / "g.fq")
    m = str(tmp_path / "m.fq")
    args = ["-fastq_filter", r1, "-fastq_maxee", "1.0", "-fastq_trunclen",
            "120", "-relabel", "Filt"]
    run_ref(ref_bin, args + ["-fastqout", g])
    assert cli_main(args + ["-fastqout", m, "-quiet"]) == 0
    assert open(g).read() == open(m).read()


def test_fastq_mergepairs_parity(ref_bin, paired_fq, tmp_path):
    r1, r2 = paired_fq
    g = str(tmp_path / "g.fq")
    m = str(tmp_path / "m.fq")
    gn = str(tmp_path / "gn.fq")
    mn = str(tmp_path / "mn.fq")
    args = ["-fastq_mergepairs", r1, "-reverse", r2]
    run_ref(ref_bin, args + ["-fastqout", g, "-fastqout_notmerged_fwd", gn])
    assert cli_main(args + ["-fastqout", m, "-fastqout_notmerged_fwd", mn,
                            "-quiet"]) == 0
    assert open(g).read() == open(m).read()
    assert open(gn).read() == open(mn).read()


def test_fastq_join_parity(ref_bin, paired_fq, tmp_path):
    r1, r2 = paired_fq
    g = str(tmp_path / "g.fq")
    m = str(tmp_path / "m.fq")
    args = ["-fastq_join", r1, "-reverse", r2]
    run_ref(ref_bin, args + ["-fastqout", g])
    assert cli_main(args + ["-fastqout", m, "-quiet"]) == 0
    assert open(g).read() == open(m).read()


def test_fastx_orient_parity(ref_bin, amplicons_small_fa, tmp_path):
    import numpy as np
    from usearch12_tpu.alpha import revcomp, to_bytes, to_str
    q = str(tmp_path / "q.fa")
    recs = []
    cur = None
    for line in open(amplicons_small_fa):
        if line.startswith(">"):
            cur = [line.strip()[1:], ""]
            recs.append(cur)
        else:
            cur[1] += line.strip()
    with open(q, "w") as f:
        for i, (l, s) in enumerate(recs[:40]):
            if i % 3 == 0:
                s = to_str(revcomp(to_bytes(s)))
            f.write(f">{l}\n{s}\n")
    g = str(tmp_path / "g.tab")
    m = str(tmp_path / "m.tab")
    args = ["-fastx_orient", q, "-db", amplicons_small_fa]
    run_ref(ref_bin, args + ["-tabbedout", g])
    assert cli_main(args + ["-tabbedout", m, "-quiet"]) == 0
    assert open(g).read() == open(m).read()


def test_fastq_mergepairs_report_parity(ref_bin, paired_fq, tmp_path):
    """-report merge statistics (src/mergestats.cpp)."""
    r1, r2 = paired_fq
    g_fq, g_rep = str(tmp_path / "g.fq"), str(tmp_path / "g.txt")
    m_fq, m_rep = str(tmp_path / "m.fq"), str(tmp_path / "m.txt")
    run_ref(ref_bin, ["-fastq_mergepairs", r1, "-reverse", r2,
                      "-fastqout", g_fq, "-report", g_rep])
    assert cli_main(["-fastq_mergepairs", r1, "-reverse", r2,
                     "-fastqout", m_fq, "-report", m_rep, "-quiet"]) == 0
    assert open(g_rep).read() == open(m_rep).read()


def _adversarial_pairs(tmp_path, n=600, seed=123):
    """Odd lengths incl. empty reads, N bases, low quals, CRLF lines."""
    rng = np.random.default_rng(seed)
    conv = "ACGTN"

    def rand_read():
        L = int(rng.integers(0, 80))
        s = "".join(conv[int(i)] for i in rng.integers(0, 5, L))
        q = "".join(chr(33 + int(v)) for v in rng.integers(0, 41, L))
        return s, q
    f1p = str(tmp_path / "adv1.fq")
    f2p = str(tmp_path / "adv2.fq")
    with open(f1p, "w", newline="") as f1, \
            open(f2p, "w", newline="") as f2:
        for i in range(n):
            s1, q1 = rand_read()
            s2, q2 = rand_read()
            crlf = "\r\n" if i % 7 == 0 else "\n"
            f1.write(f"@fz{i} 1:N:0:1{crlf}{s1}{crlf}+{crlf}{q1}{crlf}")
            f2.write(f"@fz{i} 2:N:0:1{crlf}{s2}{crlf}+{crlf}{q2}{crlf}")
    return f1p, f2p


def test_fastq_adversarial_parity(ref_bin, tmp_path):
    """Empty reads (ToFastq/ToFasta skip them), CRLF, N runs, low quals
    through filter/filter2/merge incl. the -report empty-distribution
    block (src/quarts.cpp:5-16)."""
    f1, f2 = _adversarial_pairs(tmp_path)
    g, m = str(tmp_path / "g.out"), str(tmp_path / "m.out")
    g2, m2 = str(tmp_path / "g2.out"), str(tmp_path / "m2.out")

    args = ["-fastq_filter", f1, "-fastq_maxee", "2.0",
            "-fastq_trunctail", "5", "-fastq_minlen", "10"]
    run_ref(ref_bin, args + ["-fastqout", g, "-fastqout_discarded", g2])
    assert cli_main(args + ["-fastqout", m, "-fastqout_discarded", m2,
                            "-quiet"]) == 0
    assert open(g).read() == open(m).read()
    assert open(g2).read() == open(m2).read()

    args = ["-fastq_mergepairs", f1, "-reverse", f2]
    run_ref(ref_bin, args + ["-fastqout", g, "-report", g2])
    assert cli_main(args + ["-fastqout", m, "-report", m2,
                            "-quiet"]) == 0
    assert open(g).read() == open(m).read()
    assert open(g2).read() == open(m2).read()

    args = ["-fastq_filter2", f1, "-reverse", f2, "-fastq_maxee", "3.0"]
    run_ref(ref_bin, args + ["-fastqout", g, "-output2", g2])
    assert cli_main(args + ["-fastqout", m, "-output2", m2,
                            "-quiet"]) == 0
    assert open(g).read() == open(m).read()
    assert open(g2).read() == open(m2).read()


def test_empty_fasta_record_stream_warn(ref_bin, tmp_path, capsys):
    """Zero-length FASTA records in streaming mode warn and are skipped
    (the _warn_empty import path used to crash)."""
    inp = str(tmp_path / "e.fa")
    with open(inp, "w") as f:
        f.write(">a\nACGTACGTAGTC\n>empty\n>b\nACGTACGTAGTC\n")
    g, m = str(tmp_path / "g.fa"), str(tmp_path / "m.fa")
    args = ["-fastx_truncate", inp, "-trunclen", "8", "-padlen", "1",
            "-stripleft", "0", "-stripright", "0"]
    run_ref(ref_bin, args + ["-fastaout", g])
    assert cli_main(args + ["-fastaout", m, "-quiet"]) == 0
    assert open(g).read() == open(m).read()

"""Golden-output parity: usearch_global vs the reference binary."""

import subprocess

import pytest

from usearch12_tpu.cli import main as cli_main


def run_ref(ref_bin, args):
    subprocess.run([ref_bin] + args + ["-quiet", "-threads", "1"],
                   check=True, capture_output=True)


def run_mine(args):
    assert cli_main(args + ["-quiet"]) == 0


@pytest.mark.parametrize("extra", [
    ["-id", "0.9"],
    ["-id", "0.97", "-self", "-maxaccepts", "4"],
])
def test_blast6_parity_nt(ref_bin, amplicons_small_fa, tmp_path, extra):
    golden = str(tmp_path / "golden.b6")
    mine = str(tmp_path / "mine.b6")
    base = ["-usearch_global", amplicons_small_fa, "-db", amplicons_small_fa,
            "-strand", "plus"]
    run_ref(ref_bin, base + extra + ["-blast6out", golden])
    run_mine(base + extra + ["-blast6out", mine])
    assert open(golden).read() == open(mine).read()


def test_blast6_parity_aa(ref_bin, tmp_path):
    test_fa = "/root/reference/tmp/test.fa"
    golden = str(tmp_path / "golden.b6")
    mine = str(tmp_path / "mine.b6")
    base = ["-usearch_global", test_fa, "-db", test_fa, "-id", "0.9"]
    run_ref(ref_bin, base + ["-blast6out", golden])
    run_mine(base + ["-blast6out", mine])
    assert open(golden).read() == open(mine).read()


def test_udb_file_parity(ref_bin, amplicons_small_fa, tmp_path):
    """Index build matches reference .udb bit-for-bit (sizes + postings)."""
    import numpy as np
    from usearch12_tpu.index.udbfile import read_udb, write_udb
    from usearch12_tpu.io.seqdb import SeqDB
    from usearch12_tpu.index.udb import UDBIndex

    golden = str(tmp_path / "g.udb")
    run_ref(ref_bin, ["-makeudb_usearch", amplicons_small_fa,
                      "-output", golden])
    ridx, rdb = read_udb(golden)
    db = SeqDB.from_fastx(amplicons_small_fa)
    db.mask()
    midx = UDBIndex.from_seqdb(db)
    assert np.array_equal(ridx.sizes, midx.sizes)
    assert np.array_equal(ridx.postings.astype(np.int64),
                          midx.postings.astype(np.int64))
    assert rdb.labels == db.labels
    # roundtrip through our writer
    mine_udb = str(tmp_path / "m.udb")
    write_udb(mine_udb, midx, db)
    r2idx, r2db = read_udb(mine_udb)
    assert np.array_equal(r2idx.sizes, midx.sizes)
    assert r2db.labels == db.labels


FIELDS_A = ("query+target+id+fractid+dist+mid+pctgaps+pairs+gaps+allgaps"
            "+qlo+qhi+tlo+thi+ql+tl+qs+ts+alnlen+opens+exts+mism+ids+qcov"
            "+tcov+diffs+diffsa+editdiffs+caln+aln+qstrand+tstrand")
FIELDS_B = ("query+clusternr+qlor+qhir+tlor+thir+qlot+qhit+qunt+tlot+thit"
            "+tunt+qrow+trow+qrowdots+trowdots+qseg+tseg+qseq+tseq+abskew"
            "+gc+kmerid+qtrimlo+qtrimhi+qframe+pv+pctpv+qsegf+tsegf"
            "+qtrimseq")


@pytest.mark.parametrize("fields", [FIELDS_A, FIELDS_B])
def test_userout_fields_parity(ref_bin, amplicons_small_fa, tmp_path,
                               fields):
    """Full -userfields catalogue, byte-exact formats."""
    g, m = str(tmp_path / "g.txt"), str(tmp_path / "m.txt")
    base = ["-usearch_global", amplicons_small_fa, "-db",
            amplicons_small_fa, "-id", "0.9", "-strand", "plus",
            "-userfields", fields]
    subprocess.run([ref_bin] + base + ["-userout", g, "-quiet",
                                       "-threads", "1"],
                   check=True, capture_output=True)
    assert cli_main(base + ["-userout", m, "-quiet"]) == 0
    assert open(g).read() == open(m).read()


def test_alnout_parity(ref_bin, amplicons_small_fa, tmp_path):
    """Human-readable -alnout; both sides stamp a 2-line run banner
    (command line + version/RAM/cores — environment-specific, same
    shape, compared structurally); the body must be byte-exact."""
    g, m = str(tmp_path / "g.txt"), str(tmp_path / "m.txt")
    base = ["-usearch_global", amplicons_small_fa, "-db",
            amplicons_small_fa, "-id", "0.9", "-strand", "plus"]
    subprocess.run([ref_bin] + base + ["-alnout", g, "-quiet",
                                       "-threads", "1"],
                   check=True, capture_output=True)
    assert cli_main(base + ["-alnout", m, "-quiet"]) == 0
    g_body = "".join(open(g).readlines()[2:])
    m_lines = open(m).readlines()
    # banner shape: cmdline echo then "<prog> v<ver>, <N> RAM, <N> cores"
    assert "-usearch_global" in m_lines[0]
    assert " RAM, " in m_lines[1] and " cores" in m_lines[1]
    assert g_body == "".join(m_lines[2:])


def test_alnout_local_parity(ref_bin, amplicons_small_fa, tmp_path):
    g, m = str(tmp_path / "g.txt"), str(tmp_path / "m.txt")
    base = ["-usearch_local", amplicons_small_fa, "-db",
            amplicons_small_fa, "-evalue", "1e-6", "-strand", "plus"]
    subprocess.run([ref_bin] + base + ["-alnout", g, "-quiet",
                                       "-threads", "1"],
                   check=True, capture_output=True)
    assert cli_main(base + ["-alnout", m, "-quiet"]) == 0
    g_body = "".join(open(g).readlines()[2:])
    assert g_body == "".join(open(m).readlines()[2:])


def test_seg_trim_outputs_parity(ref_bin, amplicons_small_fa, tmp_path):
    """-qsegout/-tsegout/-trimout row-segment FASTA outputs."""
    g = {k: str(tmp_path / f"g{k}.fa") for k in ("q", "t", "r")}
    m = {k: str(tmp_path / f"m{k}.fa") for k in ("q", "t", "r")}
    def args(d):
        return ["-usearch_global", amplicons_small_fa, "-db",
                amplicons_small_fa, "-id", "0.9", "-strand", "plus",
                "-qsegout", d["q"], "-tsegout", d["t"], "-trimout", d["r"]]
    subprocess.run([ref_bin] + args(g) + ["-quiet", "-threads", "1"],
                   check=True, capture_output=True)
    assert cli_main(args(m) + ["-quiet"]) == 0
    for k in g:
        assert open(g[k]).read() == open(m[k]).read(), k


def test_udb_db_input_parity(ref_bin, amplicons_small_fa, tmp_path):
    """-db x.udb: LoadDB dispatch (src/loaddb.cpp:127)."""
    udb = str(tmp_path / "db.udb")
    run_ref(ref_bin, ["-makeudb_usearch", amplicons_small_fa, "-output",
                      udb])
    g, m = str(tmp_path / "g.b6"), str(tmp_path / "m.b6")
    base = ["-usearch_global", amplicons_small_fa, "-db", udb, "-id",
            "0.9", "-strand", "plus"]
    run_ref(ref_bin, base + ["-blast6out", g])
    assert cli_main(base + ["-blast6out", m, "-quiet"]) == 0
    assert open(g).read() == open(m).read()


def test_mask_variants_udb_parity(ref_bin, tmp_path):
    """dust (nt) and seg (aa) masking, soft and hard, compared via the
    .udb file which embeds the masked SeqDB byte-for-byte."""
    import numpy as np
    rng = np.random.default_rng(41)
    nt = str(tmp_path / "nt.fa")
    with open(nt, "w") as f:
        for i in range(12):
            parts = []
            while sum(len(p) for p in parts) < 220:
                r = rng.random()
                if r < 0.3:
                    parts.append("ACGT"[int(rng.integers(0, 4))]
                                 * int(rng.integers(2, 14)))
                elif r < 0.5:
                    d = ("ACGT"[int(rng.integers(0, 4))]
                         + "ACGT"[int(rng.integers(0, 4))])
                    parts.append(d * int(rng.integers(2, 9)))
                else:
                    parts.append("".join(
                        "ACGT"[int(j)]
                        for j in rng.integers(0, 4, int(rng.integers(4, 25)))))
            f.write(f">n{i}\n{''.join(parts)[:220]}\n")
    aa = str(tmp_path / "aa.fa")
    AA = "ACDEFGHIKLMNPQRSTVWY"
    with open(aa, "w") as f:
        for i in range(12):
            parts = []
            while sum(len(p) for p in parts) < 180:
                r = rng.random()
                if r < 0.3:
                    parts.append(AA[int(rng.integers(0, 20))]
                                 * int(rng.integers(3, 14)))
                else:
                    parts.append("".join(
                        AA[int(j)]
                        for j in rng.integers(0, 20,
                                              int(rng.integers(4, 25)))))
            f.write(f">p{i}\n{''.join(parts)[:180]}\n")
    for path, mk in ((nt, "dust"), (aa, "seg"), (nt, "fastnucleo"),
                     (aa, "fastamino")):
        for hm in ([], ["-hardmask"]):
            g = str(tmp_path / "g.udb")
            m = str(tmp_path / "m.udb")
            run_ref(ref_bin, ["-makeudb_usearch", path, "-output", g,
                              "-dbmask", mk] + hm)
            run_mine(["-makeudb_usearch", path, "-output", m,
                      "-dbmask", mk] + hm)
            assert open(g, "rb").read() == open(m, "rb").read(), (mk, hm)


def test_userfields_terminal_gap_rows(ref_bin, tmp_path):
    """Alignments whose path begins/ends with terminal gaps: row/seg
    fields start at FirstMQPos/FirstMTPos, evalue is -1 for global
    hits, and qseg/tseg/segf replicate the reference's printf %*.*s
    space padding (src/userout.cpp:217-246, src/alignresult.h:173)."""
    import numpy as np
    rng = np.random.default_rng(77)
    conv = "ACGT"
    t = "".join(conv[int(j)] for j in rng.integers(0, 4, 200))
    db = str(tmp_path / "db.fa")
    qf = str(tmp_path / "q.fa")
    with open(db, "w") as f:
        f.write(f">t0\n{t}\n")
    with open(qf, "w") as f:
        # leading extra base (leading-D path) and a clean full match;
        # trailing-gap queries make the reference's tseg read heap
        # bytes past the target buffer (undefined) so they are covered
        # by the row/aln fields only
        f.write(f">q_lead\nA{t[:-1]}\n")
        f.write(f">q_trail\n{t[1:]}AA\n")
        f.write(f">q_full\n{t}\n")
    flds = ("qrow+trow+qseg+qsegf+evalue+pctpv+pv+aln"
            "+qlot+qhit+tlot+thit")
    g, m = str(tmp_path / "g.us"), str(tmp_path / "m.us")
    args = ["-usearch_global", qf, "-db", db, "-id", "0.7", "-strand",
            "plus", "-userfields", flds]
    run_ref(ref_bin, args + ["-userout", g])
    assert cli_main(args + ["-userout", m, "-quiet"]) == 0
    assert open(g).read() == open(m).read()

    g2, m2 = str(tmp_path / "g.fp"), str(tmp_path / "m.fp")
    args = ["-usearch_global", qf, "-db", db, "-id", "0.7", "-strand",
            "plus"]
    run_ref(ref_bin, args + ["-fastapairs", g2])
    assert cli_main(args + ["-fastapairs", m2, "-quiet"]) == 0
    assert open(g2).read() == open(m2).read()

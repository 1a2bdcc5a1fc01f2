"""Benchmark: end-to-end command throughput vs the reference binary,
plus the banded-DP kernel throughput on the device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric: cluster_fast end-to-end throughput (seqs/sec) on a
100k-read synthetic amplicon workload, measured back-to-back against the
reference binary on the same machine (vs_baseline = ours / reference;
>1 means faster than the reference).  The machine's clock throttles over
time, so paired measurement is the only honest comparison.

Artifact-loss proofing (round-4 lesson: BENCH_r04.json was rc=124 with
an empty tail because the bench printed only after ALL legs):
  * a global wall-clock budget (USEARCH_BENCH_BUDGET_S, default 2700 s)
    gates every leg: legs run in priority order (headline paired e2e ->
    device ablation -> device auto legs -> kernel sweep -> the rest)
    and are skipped with a recorded reason when the remaining budget is
    short;
  * the single JSON line is emitted by a flush handler registered for
    atexit, SIGTERM, SIGINT and a self-armed SIGALRM, so a driver
    timeout (SIGTERM) or an overrunning leg still emits every completed
    measurement;
  * generated workloads live in a persistent /tmp workspace, so the
    expensive one-time generation (800k-read amplicon file, 250k read
    pairs, 220k-target DB) is not re-paid on every run.

extra carries: per-command seqs/s + vs-ref ratios with byte parity, the
device ablation on the long-divergent workload, AUTO-mode device legs
(sintax_device, rank_device) with USEARCH_DEVICE_STATS provenance, the
wavefront kernel Gcells/s sweep, thread scaling, and the virtual-mesh
scaling curve.  Device stages run in killable subprocesses so a wedged
tunnel cannot hang the bench.
"""

import atexit
import json
import os
import shutil
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

REF_SRC = "/root/reference/tmp/usearch_linux_x86_12.0-beta"
WS = os.environ.get("USEARCH_BENCH_WS", "/tmp/usearch_bench_ws")

T0 = time.monotonic()
BUDGET_S = float(os.environ.get("USEARCH_BENCH_BUDGET_S", "2700"))

RESULT = {"metric": "cluster_fast_end_to_end_throughput", "value": None,
          "unit": "seqs/sec", "vs_baseline": None, "extra": {}}
EXTRA = RESULT["extra"]
_emitted = [False]


def _flush(signum=None, frame=None):
    """Emit the one JSON line exactly once; safe from signal context."""
    if _emitted[0]:
        if signum is not None:
            os._exit(0)
        return
    _emitted[0] = True
    EXTRA["elapsed_s"] = round(time.monotonic() - T0, 1)
    if signum is not None:
        EXTRA["terminated_by"] = ("SIGALRM (self budget)"
                                  if signum == signal.SIGALRM
                                  else f"signal {signum}")
    if RESULT["value"] is None:
        # headline leg never completed: fall back to the best available
        # kernel number so the artifact still has a metric
        g = EXTRA.get("kernel_gcells_per_s")
        if isinstance(g, dict):
            RESULT["metric"] = "kernel_banded_nw_throughput"
            RESULT["unit"] = "Gcells/s"
            RESULT["value"] = max(v for v in g.values()
                                  if isinstance(v, (int, float)))
    sys.stdout.write(json.dumps(RESULT) + "\n")
    sys.stdout.flush()
    if signum is not None:
        os._exit(0)


def _snapshot():
    """Persist the in-progress record for post-mortems (side channel;
    the official artifact is the stdout line)."""
    try:
        with open("/tmp/usearch_bench_partial.json", "w") as f:
            json.dump(RESULT, f)
    except OSError:
        pass


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def leg(name, est_s, fn, *args):
    """Run one bench leg if the remaining budget covers its estimate.
    A failed leg records its error; a skipped leg records why.  Either
    way the bench continues and the artifact carries the reason."""
    rem = remaining()
    if rem < est_s:
        EXTRA[name] = (f"skipped: {int(rem)}s budget left < "
                       f"~{int(est_s)}s estimate")
        return None
    t_leg = time.monotonic()
    try:
        out = fn(*args)
        EXTRA.setdefault("leg_seconds", {})[name] = round(
            time.monotonic() - t_leg, 1)
        return out
    except Exception as e:  # noqa: BLE001 — record, keep going
        EXTRA[name] = "failed: " + repr(e)[:300]
        return None
    finally:
        _snapshot()


def _prepare_ref():
    ref = "/tmp/usearch_ref_bench"
    if not os.path.exists(ref):
        try:
            shutil.copy(REF_SRC, ref)
            os.chmod(ref, 0o755)
        except OSError:
            return None
    return ref


def _gen_workloads(d):
    from genseqs import make_amplicons, write_fasta
    reads = os.path.join(d, "bench_reads.fa")
    db = os.path.join(d, "bench_db.fa")
    q = os.path.join(d, "bench_q.fa")
    if not os.path.exists(reads):
        recs = make_amplicons(n_templates=400, reads_per_template=250,
                              length=250, seed=11)
        write_fasta(reads, recs)
    if not os.path.exists(db):
        recs2 = make_amplicons(n_templates=2000, reads_per_template=50,
                               length=250, seed=12)
        write_fasta(db, [r for r in recs2 if r[0].startswith("tpl")])
        write_fasta(q, [r for r in recs2 if not r[0].startswith("tpl")])
    return reads, db, q


def _run(cmd, timeout=900, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    if extra_env:
        env.update(extra_env)
    # never let one command outlive the global budget (the flush
    # handler still fires on SIGALRM, but a leg should fail first)
    timeout = max(30.0, min(timeout, remaining() + 30.0))
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, timeout=timeout, env=env)
    if r.returncode != 0:
        sys.stderr.write(r.stderr.decode(errors="replace")[-2000:])
        raise RuntimeError(f"bench command failed rc={r.returncode}: "
                           f"{' '.join(cmd[:4])}...")
    return time.perf_counter() - t0


def _paired(rf, my, reps=3):
    """Alternate ref/mine runs; min of each side.  The rig's clock
    oscillates, so more alternations beat a single r,m,m,r sandwich."""
    trs, tms = [], []
    for k in range(reps):
        if k % 2 == 0:
            trs.append(_run(rf))
            tms.append(_run(my))
        else:
            tms.append(_run(my))
            trs.append(_run(rf))
    return min(trs), min(tms)


def bench_cluster(ref, reads, d):
    n_seqs = sum(1 for line in open(reads) if line.startswith(">"))
    my = [os.path.join(HERE, "bin", "usearch"), "-cluster_fast",
          reads, "-id", "0.97", "-uc", os.path.join(d, "m.uc"),
          "-centroids", os.path.join(d, "m.fa"), "-quiet"]
    rf = [ref, "-cluster_fast", reads, "-id", "0.97", "-uc",
          os.path.join(d, "r.uc"), "-centroids", os.path.join(d, "r.fa"),
          "-quiet", "-threads", "1"]
    t_ref, t_my = _paired(rf, my, reps=5)
    parity = (open(os.path.join(d, "m.uc"), "rb").read() ==
              open(os.path.join(d, "r.uc"), "rb").read())
    return n_seqs / t_my, n_seqs / t_ref, t_ref / t_my, parity


def bench_global(ref, db, q, d):
    n_q = sum(1 for line in open(q) if line.startswith(">"))
    my = [os.path.join(HERE, "bin", "usearch"), "-usearch_global",
          q, "-db", db, "-id", "0.9", "-strand", "plus", "-blast6out",
          os.path.join(d, "m.b6"), "-quiet"]
    rf = [ref, "-usearch_global", q, "-db", db, "-id", "0.9", "-strand",
          "plus", "-blast6out", os.path.join(d, "r.b6"), "-quiet",
          "-threads", "1"]
    t_ref, t_my = _paired(rf, my, reps=5)
    parity = (open(os.path.join(d, "m.b6"), "rb").read() ==
              open(os.path.join(d, "r.b6"), "rb").read())
    return n_q / t_my, n_q / t_ref, t_ref / t_my, parity


def _gen_sintax(d):
    import numpy as np
    dbf = os.path.join(d, "sintax_db.fa")
    qf = os.path.join(d, "sintax_q.fa")
    if not os.path.exists(dbf):
        rng = np.random.default_rng(9)
        conv = "ACGT"
        seqs = []
        with open(dbf, "w") as f:
            for i in range(500):
                s = "".join(conv[j] for j in rng.integers(0, 4, 250))
                seqs.append(s)
                f.write(f">r{i};tax=d:D{i % 5},p:P{i % 20},"
                        f"g:G{i % 100};\n{s}\n")
        rng2 = np.random.default_rng(10)
        with open(qf, "w") as f:
            for i in range(8000):
                s = bytearray(seqs[i % len(seqs)].encode())
                for p in rng2.integers(0, len(s), 6):
                    s[p] = ord(conv[rng2.integers(0, 4)])
                f.write(f">q{i}\n{s.decode()}\n")
    return dbf, qf


def bench_sintax(ref, d):
    dbf, qf = _gen_sintax(d)
    my = [os.path.join(HERE, "bin", "usearch"), "-sintax", qf,
          "-db", dbf, "-tabbedout", os.path.join(d, "m.sin"), "-strand",
          "both", "-quiet", "-randseed", "1"]
    rf = [ref, "-sintax", qf, "-db", dbf, "-tabbedout",
          os.path.join(d, "r.sin"), "-strand", "both", "-quiet",
          "-randseed", "1", "-threads", "1"]
    t_ref, t_my = _paired(rf, my)
    parity = (open(os.path.join(d, "m.sin"), "rb").read() ==
              open(os.path.join(d, "r.sin"), "rb").read())
    return 8000 / t_my, 8000 / t_ref, t_ref / t_my, parity


def _gen_pairs(d):
    """250k overlapping read pairs for the merge bench."""
    import numpy as np
    f1p = os.path.join(d, "bench_r1.fq")
    f2p = os.path.join(d, "bench_r2.fq")
    if os.path.exists(f1p):
        return f1p, f2p
    rng = np.random.default_rng(5)
    conv = np.frombuffer(b"ACGT", np.uint8)
    comp = {65: 84, 84: 65, 67: 71, 71: 67}
    with open(f1p, "w") as f1, open(f2p, "w") as f2:
        for i in range(250000):
            frag = conv[rng.integers(0, 4, 250)]
            r2 = np.array([comp[c] for c in frag[100:][::-1]], np.uint8)
            q = "I" * 150
            f1.write(f"@rd{i} 1:N:0:1\n"
                     f"{frag[:150].tobytes().decode()}\n+\n{q}\n")
            f2.write(f"@rd{i} 2:N:0:1\n{r2.tobytes().decode()}\n+\n{q}\n")
    return f1p, f2p


def bench_merge(ref, d):
    f1, f2 = _gen_pairs(d)
    my = [os.path.join(HERE, "bin", "usearch"), "-fastq_mergepairs",
          f1, "-reverse", f2, "-fastqout", os.path.join(d, "m.mg"),
          "-quiet"]
    rf = [ref, "-fastq_mergepairs", f1, "-reverse", f2, "-fastqout",
          os.path.join(d, "r.mg"), "-quiet", "-threads", "1"]
    t_ref, t_my = _paired(rf, my)
    parity = (open(os.path.join(d, "m.mg"), "rb").read()
              == open(os.path.join(d, "r.mg"), "rb").read())
    return 250000 / t_my, 250000 / t_ref, t_ref / t_my, parity


def bench_unoise(ref, d):
    """unoise3 over the uniques of 800k amplicon-style reads (heavy
    exact-duplicate mass so the denoiser has real work; random reads
    dereplicate to singletons and exit at -minsize)."""
    import numpy as np
    amp = os.path.join(d, "bench_amp.fa")
    uniq = os.path.join(d, "bench_uniq.fa")
    if not os.path.exists(amp):
        rng = np.random.default_rng(11)
        conv = np.frombuffer(b"ACGT", np.uint8)
        templates = [conv[rng.integers(0, 4, 250)]
                     for _ in range(16000)]
        with open(amp, "w") as f:
            for i in range(800000):
                t = templates[int(rng.integers(0, 16000))]
                if rng.random() < 0.4:
                    t = t.copy()
                    for p in rng.integers(0, 250, 2):
                        t[p] = conv[int(rng.integers(0, 4))]
                f.write(f">amp{i}\n{t.tobytes().decode()}\n")
    if not os.path.exists(uniq):
        _run([os.path.join(HERE, "bin", "usearch"),
              "-fastx_uniques", amp, "-fastaout", uniq, "-sizeout",
              "-relabel", "Uniq", "-quiet"])
    my = [os.path.join(HERE, "bin", "usearch"), "-unoise3", uniq,
          "-zotus", os.path.join(d, "m.zfa"), "-tabbedout",
          os.path.join(d, "m.ztab"), "-quiet"]
    rf = [ref, "-unoise3", uniq, "-zotus", os.path.join(d, "r.zfa"),
          "-tabbedout", os.path.join(d, "r.ztab"), "-quiet",
          "-threads", "1"]
    t_ref, t_my = _paired(rf, my)
    parity = (open(os.path.join(d, "m.zfa"), "rb").read()
              == open(os.path.join(d, "r.zfa"), "rb").read()
              and open(os.path.join(d, "m.ztab"), "rb").read()
              == open(os.path.join(d, "r.ztab"), "rb").read())
    return t_ref / t_my, parity


# ------------------------------------------------------------- device legs

def _gen_longseq(d):
    """Long-sequence device workload: 24 kb sequences, 13 conserved
    150 nt blocks alternating with 12 variable 1850 nt segments; queries
    re-roll 50% of each variable segment (indel-free, so inter-anchor
    holes sit on the main diagonal and the whole DP volume is
    device-eligible).  Honest profile statement: this models divergent
    long-read/contig comparison (e.g. gene-sized conserved anchors in
    otherwise divergent 24 kb contigs), NOT the 250 nt amplicon configs —
    it is the long-seq headline config where banded DP dominates
    (src/viterbifastbandmem.cpp:232-253 cost model), and it is the
    regime the device path exists for."""
    import numpy as np
    qf = os.path.join(d, "bench_lq.fa")
    tf = os.path.join(d, "bench_lt.fa")
    if os.path.exists(qf):
        return qf, tf
    rng = np.random.default_rng(21)
    conv = np.frombuffer(b"ACGT", np.uint8)
    n_block, blk, n_var, var = 13, 150, 12, 1850
    blocks = [conv[rng.integers(0, 4, blk)] for _ in range(n_block)]

    def assemble(segs):
        parts = []
        for k in range(n_var):
            parts.append(blocks[k])
            parts.append(segs[k])
        parts.append(blocks[n_var])
        return np.concatenate(parts)

    targets = []
    with open(tf, "w") as f:
        for i in range(32):
            segs = [conv[rng.integers(0, 4, var)] for _ in range(n_var)]
            targets.append(segs)
            f.write(f">lt{i}\n{assemble(segs).tobytes().decode()}\n")
    with open(qf, "w") as f:
        for i in range(32):
            parent = targets[i % len(targets)]
            segs = []
            for s in parent:
                t = s.copy()
                flip = rng.random(var) < 0.5
                t[flip] = conv[rng.integers(0, 4, int(flip.sum()))]
                segs.append(t)
            f.write(f">lq{i}\n{assemble(segs).tobytes().decode()}\n")
    return qf, tf


def _read_stats(path):
    """Last USEARCH_DEVICE_STATS record at path, or {}."""
    try:
        with open(path) as f:
            lines = [json.loads(x) for x in f if x.strip()]
        return lines[-1] if lines else {}
    except (OSError, ValueError):
        return {}


def bench_device_ablation(ref, d):
    """usearch_global on the long-seq workload three ways — host-forced,
    adaptive gate, device-forced — against the reference binary.
    Returns an extras dict with per-leg wall time, device cells actually
    dispatched (USEARCH_DEVICE_STATS), server provenance, and byte
    parity of every leg."""
    qf, tf = _gen_longseq(d)

    common = ["-id", "0.5", "-strand", "plus", "-band", "120",
              "-maxaccepts", "64", "-maxrejects", "64"]

    def my_cmd(tag, extra_opts):
        return ([os.path.join(HERE, "bin", "usearch"), "-usearch_global",
                 qf, "-db", tf] + common +
                ["-blast6out", os.path.join(d, f"abl_{tag}.b6"), "-quiet"]
                + extra_opts)

    rf = ([ref, "-usearch_global", qf, "-db", tf] + common +
          ["-blast6out", os.path.join(d, "abl_ref.b6"),
           "-quiet", "-threads", "1"])
    legs = [("host", ["-dev_batch_cells", "1000000000000000"]),
            ("auto", []),
            ("device", ["-dev_batch_cells", "1"])]
    out = {"server": _server_probe()}
    # cold first-run experience (VERDICT r4 item 8): time the very first
    # device-engaging run separately — it pays server spawn + compile
    # when no resident server is warm yet
    t_cold = _run(my_cmd("device", legs[2][1]), timeout=600)
    out["first_device_run_s"] = round(t_cold, 3)
    out["server_after_warm"] = _server_probe()
    times = {tag: [] for tag, _ in legs}
    ref_times = []
    for _ in range(2):
        ref_times.append(_run(rf))
        for tag, opts in legs:
            stats_path = os.path.join(d, f"abl_{tag}.stats")
            times[tag].append(_run(
                my_cmd(tag, opts),
                extra_env={"USEARCH_DEVICE_STATS": stats_path}))
    t_ref = min(ref_times)
    out["ref_s"] = round(t_ref, 3)
    ref_b6 = open(os.path.join(d, "abl_ref.b6"), "rb").read()
    for tag, opts in legs:
        st = _read_stats(os.path.join(d, f"abl_{tag}.stats"))
        t = min(times[tag])
        parity = (open(os.path.join(d, f"abl_{tag}.b6"), "rb").read()
                  == ref_b6)
        out[tag] = {"s": round(t, 3), "vs_ref": round(t_ref / t, 3),
                    "device_used": bool(st.get("device")),
                    "device_cells": st.get("device_cells", 0),
                    "host_cells": st.get("host_cells", 0),
                    "parity": parity}
    return out


def _server_probe():
    """Resident device-server provenance for evidence records: whether a
    server answers and whether it is warm (has served aligns)."""
    try:
        from usearch12_tpu.device_server import get_client
        cli = get_client(spawn=False)
        if cli is None:
            return {"used": False, "warm": False}
        return {"used": True,
                "warm": bool(cli.info.get("aligns_served", 0)),
                "aligns_served": cli.info.get("aligns_served", 0),
                "backend": cli.info.get("backend")}
    except Exception as e:  # noqa: BLE001
        return {"used": False, "error": repr(e)[:120]}


def _gen_sintax_big(d):
    """60k-target / 248 nt taxonomy DB (past the 40000 auto-device
    threshold) + 1500 queries: the regime where the device matmul boots
    (served by the resident device server) displace the host C argmax
    scan (O(boots x T) per strand)."""
    import numpy as np
    dbf = os.path.join(d, "sxb_db.fa")
    qf = os.path.join(d, "sxb_q.fa")
    if os.path.exists(dbf):
        return dbf, qf
    rng = np.random.default_rng(17)
    conv = np.frombuffer(b"ACGT", np.uint8)
    seqs = []
    with open(dbf, "w") as f:
        for i in range(60000):
            s = conv[rng.integers(0, 4, 248)]
            seqs.append(s)
            f.write(f">r{i};tax=d:D{i % 5},p:P{i % 40},g:G{i % 400};\n"
                    f"{s.tobytes().decode()}\n")
    with open(qf, "w") as f:
        for i in range(1500):
            s = seqs[(i * 13) % len(seqs)].copy()
            pos = rng.integers(0, len(s), 8)
            s[pos] = conv[rng.integers(0, 4, 8)]
            f.write(f">q{i}\n{s.tobytes().decode()}\n")
    return dbf, qf


def bench_sintax_device(ref, d):
    """AUTO-mode device SINTAX vs host-forced SINTAX on a 60k-target DB
    (auto threshold 40000), interleaved legs, byte parity of -tabbedout
    at -randseed 1.  The auto leg runs with NO forcing flags; device
    participation is proven by the USEARCH_DEVICE_STATS record the
    classifier writes (VERDICT r5 item 2)."""
    dbf, qf = _gen_sintax_big(d)

    def my_cmd(tag, extra_opts):
        return ([os.path.join(HERE, "bin", "usearch"), "-sintax", qf,
                 "-db", dbf, "-tabbedout", os.path.join(d, f"sx_{tag}.sin"),
                 "-strand", "both", "-quiet", "-randseed", "1"]
                + extra_opts)

    rf = [ref, "-sintax", qf, "-db", dbf, "-tabbedout",
          os.path.join(d, "sx_ref.sin"), "-strand", "both", "-quiet",
          "-randseed", "1", "-threads", "1"]
    legs = [("host", ["-no_sintax_device"]), ("auto", [])]
    _run(my_cmd("auto", []), timeout=600)   # untimed warm (jit/compile)
    times = {tag: [] for tag, _ in legs}
    ref_times = []
    for _ in range(2):
        ref_times.append(_run(rf))
        for tag, opts in legs:
            times[tag].append(_run(
                my_cmd(tag, opts),
                extra_env={"USEARCH_DEVICE_STATS":
                           os.path.join(d, f"sx_{tag}.stats")}))
    ref_b = open(os.path.join(d, "sx_ref.sin"), "rb").read()
    out = {"ref_s": round(min(ref_times), 3), "server": _server_probe()}
    for tag, _ in legs:
        st = _read_stats(os.path.join(d, f"sx_{tag}.stats"))
        t = min(times[tag])
        out[tag] = {
            "s": round(t, 3), "vs_ref": round(min(ref_times) / t, 3),
            "device_used": bool(st.get("device")),
            "queries": st.get("queries"),
            "parity": open(os.path.join(d, f"sx_{tag}.sin"),
                           "rb").read() == ref_b}
    return out


def _gen_bigdb(ref, d):
    """220k-target DB (past the 200k auto device-rank threshold) + 2000
    queries, indexed ONCE into a .udb both binaries load (our reader is
    byte-parity with the reference's, tests/test_udb_codings.py), so the
    timed legs measure search, not index build."""
    import numpy as np
    dbf = os.path.join(d, "bigdb.fa")
    qf = os.path.join(d, "bigq.fa")
    udb = os.path.join(d, "bigdb.udb")
    if not os.path.exists(udb):
        rng = np.random.default_rng(13)
        conv = np.frombuffer(b"ACGT", np.uint8)
        tpls = [conv[rng.integers(0, 4, 250)] for _ in range(2000)]
        with open(dbf, "w") as f:
            for t in range(220000):
                s = tpls[t % 2000].copy()
                s[rng.integers(0, 250, 8)] = conv[rng.integers(0, 4, 8)]
                f.write(f">t{t}\n{s.tobytes().decode()}\n")
        with open(qf, "w") as f:
            for qn in range(2000):
                s = tpls[qn % 2000].copy()
                s[rng.integers(0, 250, 12)] = conv[rng.integers(0, 4, 12)]
                f.write(f">q{qn}\n{s.tobytes().decode()}\n")
        _run([ref, "-makeudb_usearch", dbf, "-output", udb, "-quiet",
              "-threads", "1"], timeout=600)
    return udb, qf


def bench_rank_device(ref, d):
    """End-to-end usearch_global on a 220k-target DB: the AUTO leg (no
    flags) engages the CSR device ranker above the 200k-target
    threshold; the hostrank leg pins -no_device_rank; the reference runs
    the same .udb.  Device participation proven by rank_device_jobs in
    USEARCH_DEVICE_STATS (VERDICT r5 item 2)."""
    udb, qf = _gen_bigdb(ref, d)

    def my_cmd(tag, extra_opts):
        return ([os.path.join(HERE, "bin", "usearch"), "-usearch_global",
                 qf, "-db", udb, "-id", "0.9", "-strand", "plus",
                 "-blast6out", os.path.join(d, f"bd_{tag}.b6"), "-quiet"]
                + extra_opts)

    rf = [ref, "-usearch_global", qf, "-db", udb, "-id", "0.9",
          "-strand", "plus", "-blast6out", os.path.join(d, "bd_ref.b6"),
          "-quiet", "-threads", "1"]
    legs = [("hostrank", ["-no_device_rank"]), ("auto", [])]
    _run(my_cmd("auto", []), timeout=900)   # untimed warm (device_put+jit)
    times = {tag: [] for tag, _ in legs}
    ref_times = []
    for _ in range(2):
        ref_times.append(_run(rf))
        for tag, opts in legs:
            times[tag].append(_run(
                my_cmd(tag, opts),
                extra_env={"USEARCH_DEVICE_STATS":
                           os.path.join(d, f"bd_{tag}.stats")}))
    ref_b = open(os.path.join(d, "bd_ref.b6"), "rb").read()
    out = {"ref_s": round(min(ref_times), 3), "server": _server_probe(),
           "targets": 220000, "queries": 2000}
    for tag, _ in legs:
        st = _read_stats(os.path.join(d, f"bd_{tag}.stats"))
        t = min(times[tag])
        out[tag] = {
            "s": round(t, 3), "vs_ref": round(min(ref_times) / t, 3),
            "device_used": st.get("rank_device_jobs", 0) > 0,
            "rank_device_jobs": st.get("rank_device_jobs", 0),
            "parity": open(os.path.join(d, f"bd_{tag}.b6"),
                           "rb").read() == ref_b}
    return out


def bench_thread_scaling(ref, db, q, d):
    """-threads 4 vs -threads 1 for both binaries on the official global
    workload.  This rig exposes ONE core, so both ratios measure
    oversubscription overhead, not speedup; the N-core projection lives
    in BASELINE.md, backed by the gil_released_fraction measured by
    tools/measure_gil_fraction.py and recorded here."""
    out = {}
    for tag, nt in (("t1", "1"), ("t4", "4")):
        my = [os.path.join(HERE, "bin", "usearch"), "-usearch_global",
              q, "-db", db, "-id", "0.9", "-strand", "plus",
              "-blast6out", os.path.join(d, f"ts_m_{tag}.b6"), "-quiet",
              "-threads", nt]
        rf = [ref, "-usearch_global", q, "-db", db, "-id", "0.9",
              "-strand", "plus", "-blast6out",
              os.path.join(d, f"ts_r_{tag}.b6"), "-quiet", "-threads", nt]
        t_ref, t_my = _paired(rf, my, reps=3)
        out[tag] = {"mine_s": round(t_my, 3), "ref_s": round(t_ref, 3)}
    out["mine_t4_vs_t1"] = round(out["t1"]["mine_s"]
                                 / out["t4"]["mine_s"], 3)
    out["ref_t4_vs_t1"] = round(out["t1"]["ref_s"]
                                / out["t4"]["ref_s"], 3)
    out["parity_t4"] = (
        open(os.path.join(d, "ts_m_t4.b6"), "rb").read()
        == open(os.path.join(d, "ts_r_t4.b6"), "rb").read())
    # direct GIL-released-fraction measurement (VERDICT r5 item 5)
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "tools",
                                          "measure_gil_fraction.py"),
             q, db],
            capture_output=True, timeout=min(600, remaining()), text=True)
        out["gil_fraction"] = (json.loads(r.stdout.strip().splitlines()[-1])
                               if r.returncode == 0
                               else "failed: " + r.stderr.strip()[-200:])
    except Exception as e:  # noqa: BLE001
        out["gil_fraction"] = "failed: " + repr(e)[:200]
    out["note"] = ("1 physical core: t4/t1 ratios measure "
                   "oversubscription overhead; see BASELINE.md for the "
                   "N-core projection derived from gil_fraction")
    return out


_KERNEL_CHILD = """
import json, os, sys, time
sys.path.insert(0, %(here)r)
import numpy as np

def make_pairs(n, length=250, seed=1):
    rng = np.random.default_rng(seed)
    conv = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for _ in range(n):
        a = rng.integers(0, 4, length)
        b = a.copy()
        idx = rng.integers(0, length, 12)
        b[idx] = rng.integers(0, 4, 12)
        pairs.append((conv[a], conv[b]))
    return pairs

import jax
import jax.numpy as jnp
from usearch12_tpu.scoring import AlnParams, nuc_mx
from usearch12_tpu.ops.wavefront_nw import (WavefrontNWDevice, pack_wave,
                                            pack_ins, _compiled,
                                            _chunk_flags)
ap = AlnParams(nucleo=True, subst_mx=nuc_mx(1.0, -2.0))
ap.init4(-10.0, -1.0, -0.5, -0.5)
dev = WavefrontNWDevice(ap, pb=64, chunk=128)

def time_fn(fn, args, n_pairs):
    o2 = fn(*args)
    _ = float(o2[1][0, 0])
    best = None
    reps = 3 if n_pairs >= 65536 else 10
    for _t in range(3):
        t0 = time.perf_counter()
        for _i in range(reps):
            o2 = fn(*args)
        _ = float(o2[1][0, 0])
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    return best

out32 = {}
for n_pairs in (2048, 8192, 65536):
    pairs = make_pairs(n_pairs)
    batch = pack_wave(pairs, True, 16, dev.chunk)
    cells = float(np.sum(batch.bw.astype(np.int64) * batch.la))
    R = batch.nrows
    pad = (-R) %% dev.pb
    def padr(x, fill):
        if pad == 0:
            return x
        return np.concatenate([x, np.full((pad,) + x.shape[1:], fill,
                                          x.dtype)])
    fn = _compiled(batch.steps, dev.chunk, dev.pb, batch.rho0, batch.sw,
                   dev.match, dev.mismatch, dev.interpret)
    args = (jnp.asarray(padr(batch.la_b, 1)), jnp.asarray(padr(batch.lb_b, 1)),
            jnp.asarray(padr(batch.ib, -10**6)), jnp.asarray(padr(batch.jb, -10**6)),
            jnp.asarray(padr(batch.umax_e, -1)), jnp.asarray(padr(batch.umax_o, -1)),
            jnp.asarray(padr(batch.a_init, 4)), jnp.asarray(padr(batch.b_init, 4)),
            jnp.asarray(pack_ins(padr(batch.ins, 4))), jnp.asarray(dev.gp),
            jnp.asarray(_chunk_flags(batch, dev.pb, R + pad, dev.chunk)))
    out32[str(n_pairs)] = round(cells / time_fn(fn, args, n_pairs) / 1e9, 2)

# utilization vs per-chip VPU peak: the banded-DP recurrence costs
# ~12 VPU ops/cell (match select + 3x2 add/max for M/D/I + band
# shift); v5e VPU f32 peak ~= 4 ALUs x (8x128) lanes x 0.94 GHz
# ~= 3.85e12 ops/s.  MXU is irrelevant: no matmuls in the DP.
OPS_PER_CELL = 12.0
VPU_PEAK = 3.85e12
best_g = max(out32.values())
out = {"gcells": out32,
       "ops_per_cell_est": OPS_PER_CELL,
       "pct_vpu_peak_at_best": round(100.0 * best_g * 1e9 * OPS_PER_CELL
                                     / VPU_PEAK, 2)}
print(json.dumps(out))
"""


def _device_reachable():
    """30s-capped subprocess probe of the accelerator (twice).  The
    expensive device stages would otherwise hang their full timeout on a
    wedged tunnel.  Returns (ok, cause); cached for the run."""
    if _device_reachable.cache is not None:
        return _device_reachable.cache
    from usearch12_tpu.device import device_env
    cause = "unknown"
    for _attempt in range(2):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "x = (jnp.ones((8, 128)) * 2).block_until_ready();"
                 "print('ok', jax.devices()[0].platform)"],
                capture_output=True, timeout=30, text=True,
                env=device_env())
            if r.returncode == 0 and "ok" in r.stdout:
                _device_reachable.cache = (True, "ok")
                return _device_reachable.cache
            cause = "probe rc=%d: %s" % (r.returncode,
                                         r.stderr.strip()[-200:])
        except subprocess.TimeoutExpired:
            cause = "probe timeout after 30s (tunnel wedged)"
        except Exception as e:  # noqa: BLE001
            cause = repr(e)[:200]
    _device_reachable.cache = (False, "device unreachable: " + cause)
    return _device_reachable.cache


_device_reachable.cache = None


def bench_kernel_device():
    """Run the device kernel sweep in a child with a hard timeout.
    Retries once; on failure returns (None, cause-string) so the bench
    record always says WHY the device number is missing."""
    ok, cause = _device_reachable()
    if not ok:
        return None, cause
    cause = "unknown"
    for attempt in range(2):
        try:
            r = subprocess.run([sys.executable, "-c",
                                _KERNEL_CHILD % {"here": HERE}],
                               capture_output=True,
                               timeout=min(900, remaining()), text=True)
            if r.returncode == 0:
                return json.loads(r.stdout.strip().splitlines()[-1]), "ok"
            cause = "rc=%d: %s" % (r.returncode,
                                   r.stderr.strip()[-300:])
        except subprocess.TimeoutExpired:
            cause = "timeout"
        except Exception as e:  # noqa: BLE001
            cause = repr(e)[:300]
    return None, cause


def run_tpu_test_tier():
    """Run the device test tier (pallas kernel, traceback, engine-with-
    device) against the real chip; returns a summary string."""
    ok, cause = _device_reachable()
    if not ok:
        return "SKIP: " + cause
    env = dict(os.environ)
    env["USEARCH_TPU_TESTS"] = "1"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    try:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q",
             os.path.join(HERE, "tests", "test_pallas_nw.py"),
             os.path.join(HERE, "tests", "test_wavefront_trace.py"),
             os.path.join(HERE, "tests", "test_wide_hole_split.py")],
            capture_output=True, timeout=min(1200, remaining()),
            text=True, env=env)
        tail = (r.stdout.strip().splitlines() or ["no output"])[-1]
        return ("pass: " if r.returncode == 0 else "FAIL: ") + tail[:200]
    except subprocess.TimeoutExpired:
        return "FAIL: timeout"
    except Exception as e:  # noqa: BLE001
        return "FAIL: " + repr(e)[:200]


def bench_kernel_cpu():
    """Single-thread native CPU kernel Gcells/s (the per-chip baseline)."""
    import ctypes
    import numpy as np
    from usearch12_tpu.scoring import AlnParams, nuc_mx
    from usearch12_tpu.native import get_lib, GapParams
    from usearch12_tpu.align.oracle import band_diag_range
    lib = get_lib()
    if lib is None:
        return None
    rng = np.random.default_rng(1)
    conv = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for _ in range(2048):
        a = rng.integers(0, 4, 250)
        b = a.copy()
        idx = rng.integers(0, 250, 12)
        b[idx] = rng.integers(0, 4, 12)
        pairs.append((conv[a], conv[b]))
    ap = AlnParams(nucleo=True, subst_mx=nuc_mx(1.0, -2.0))
    ap.init4(-10.0, -1.0, -0.5, -0.5)
    gp = GapParams.from_alnparams(ap)
    mx = np.ascontiguousarray(ap.subst_mx, dtype=np.float32)
    L = 250
    tb = np.zeros((L + 2) * (L + 130), dtype=np.uint8)
    mrow = np.zeros(L + 130, dtype=np.float32)
    drow = np.zeros(L + 130, dtype=np.float32)
    path = ctypes.create_string_buffer(4 * L + 2)
    score = ctypes.c_float(0)
    cells = 0
    t0 = time.perf_counter()
    for a, b in pairs:
        dlo, dhi = band_diag_range(len(a), len(b), 16)
        cells += (dhi - dlo + 1) * len(a)
        lib.nw_band(a, len(a), b, len(b), dlo, dhi, ctypes.byref(gp), mx,
                    tb, mrow, drow, path, ctypes.byref(score))
    dt = time.perf_counter() - t0
    return cells / dt / 1e9


def _log_tpu_evidence(stage, payload):
    """Append a successful device-stage record to TPU_EVIDENCE.jsonl so
    hardware evidence survives a later tunnel outage; every record
    carries resident-server provenance (VERDICT r5 item 8)."""
    try:
        rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
               "stage": stage, "result": payload}
        if isinstance(payload, dict) and "server" not in payload:
            rec["server"] = _server_probe()
        with open(os.path.join(HERE, "TPU_EVIDENCE.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass


def _last_tpu_evidence(stage):
    """Most recent TPU_EVIDENCE.jsonl record for `stage`, or None."""
    try:
        with open(os.path.join(HERE, "TPU_EVIDENCE.jsonl")) as f:
            recs = [json.loads(ln) for ln in f if ln.strip()]
    except (OSError, ValueError):
        return None
    recs = [r for r in recs if r.get("stage") == stage]
    return recs[-1] if recs else None


def main():
    # flush-on-anything: atexit + driver SIGTERM + self SIGALRM backstop
    atexit.register(_flush)
    signal.signal(signal.SIGTERM, _flush)
    signal.signal(signal.SIGINT, _flush)
    signal.signal(signal.SIGALRM, _flush)
    signal.alarm(int(BUDGET_S) + 90)

    os.makedirs(WS, exist_ok=True)
    d = WS
    # a stale "bad" device-health verdict from an earlier transient
    # failure must not decide this bench's device path
    import glob as _glob
    for p in _glob.glob("/tmp/usearch_device_health*"):
        try:
            os.unlink(p)
        except OSError:
            pass
    ref = _prepare_ref()
    EXTRA["budget_s"] = BUDGET_S
    EXTRA["workload"] = ("100k reads cluster_fast id=0.97; "
                         "100k q x 2k t usearch_global id=0.9")
    if ref is None:
        EXTRA["reference"] = "unavailable: " + REF_SRC
    reads, db, q = _gen_workloads(d)

    # ---- priority 1: headline paired e2e (the official ratios) ----
    if ref is not None:
        r = leg("usearch_global", 120, bench_global, ref, db, q, d)
        if r:
            g_my, g_ref, g_ratio, p1 = r
            EXTRA["usearch_global_seqs_per_s"] = round(g_my, 1)
            EXTRA["usearch_global_ref_seqs_per_s"] = round(g_ref, 1)
            EXTRA["usearch_global_vs_ref"] = round(g_ratio, 3)
            EXTRA["usearch_global_parity"] = p1
        r = leg("cluster_fast", 260, bench_cluster, ref, reads, d)
        if r:
            c_my, c_ref, c_ratio, p2 = r
            RESULT["value"] = round(c_my, 1)
            RESULT["vs_baseline"] = round(c_ratio, 3)
            EXTRA["cluster_fast_ref_seqs_per_s"] = round(c_ref, 1)
            EXTRA["cluster_fast_parity"] = p2
        r = leg("sintax", 60, bench_sintax, ref, d)
        if r:
            s_my, s_ref, s_ratio, p3 = r
            EXTRA["sintax_seqs_per_s"] = round(s_my, 1)
            EXTRA["sintax_vs_ref"] = round(s_ratio, 3)
            EXTRA["sintax_parity"] = p3
        r = leg("fastq_mergepairs", 120, bench_merge, ref, d)
        if r:
            m_my, m_ref, m_ratio, p4 = r
            EXTRA["fastq_mergepairs_pairs_per_s"] = round(m_my, 1)
            EXTRA["fastq_mergepairs_vs_ref"] = round(m_ratio, 3)
            EXTRA["fastq_mergepairs_parity"] = p4
        r = leg("unoise3", 300, bench_unoise, ref, d)
        if r:
            u_ratio, p5 = r
            EXTRA["unoise3_vs_ref"] = round(u_ratio, 3)
            EXTRA["unoise3_parity"] = p5
        parity_keys = [k for k in
                       ("usearch_global_parity", "cluster_fast_parity",
                        "sintax_parity", "fastq_mergepairs_parity",
                        "unoise3_parity") if k in EXTRA]
        if parity_keys:
            EXTRA["output_parity"] = all(EXTRA[k] for k in parity_keys)

    # ---- priority 2: device legs (recorded on-chip evidence) ----
    dev_ok, dev_cause = _device_reachable()
    if ref is not None and dev_ok:
        r = leg("device_ablation", 300, bench_device_ablation, ref, d)
        if r:
            EXTRA["device_ablation"] = r
            if any(isinstance(v, dict) and v.get("device_used")
                   for v in r.values() if isinstance(v, dict)):
                _log_tpu_evidence("device_ablation", r)
        r = leg("sintax_device", 280, bench_sintax_device, ref, d)
        if r:
            EXTRA["sintax_device"] = r
            _log_tpu_evidence("sintax_device", r)
        r = leg("rank_device", 420, bench_rank_device, ref, d)
        if r:
            EXTRA["rank_device"] = r
            _log_tpu_evidence("rank_device", r)
    elif ref is not None:
        for k in ("device_ablation", "sintax_device", "rank_device"):
            EXTRA[k] = "skipped: " + dev_cause

    # ---- priority 3: kernel sweep ----
    if dev_ok:
        kern, kern_cause = leg("kernel_sweep", 420,
                               bench_kernel_device) or (None, "leg failed")
    else:
        kern, kern_cause = None, dev_cause
    if kern is not None:
        _log_tpu_evidence("kernel_sweep", kern)
        EXTRA["kernel_gcells_per_s"] = kern.get("gcells", kern)
        EXTRA["kernel_utilization"] = {
            k: kern[k] for k in ("ops_per_cell_est",
                                 "pct_vpu_peak_at_best") if k in kern}
        cpu = leg("kernel_cpu", 60, bench_kernel_cpu)
        if cpu:
            EXTRA["kernel_cpu_gcells_per_s"] = round(cpu, 3)
            EXTRA["kernel_vs_cpu"] = round(
                max(kern["gcells"].values()) / cpu, 1)
    else:
        EXTRA["kernel_gcells_per_s"] = "unavailable: " + str(kern_cause)
        rec = _last_tpu_evidence("kernel_sweep")
        if rec is not None:
            EXTRA["kernel_gcells_per_s_recorded_on_chip"] = {
                "ts": rec.get("ts"), **rec.get("result", {}),
                "note": "most recent real-chip sweep from "
                        "TPU_EVIDENCE.jsonl (in-repo hardware record; "
                        "device was unreachable at bench time)"}

    # ---- priority 4: the rest ----
    if ref is not None:
        r = leg("thread_scaling", 180, bench_thread_scaling,
                ref, db, q, d)
        if r:
            EXTRA["thread_scaling"] = r

    def mesh_scaling():
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "tools",
                                          "scaling_curve.py")],
            capture_output=True, timeout=min(1200, remaining()),
            text=True)
        return (json.loads(r.stdout.strip()) if r.returncode == 0
                else "failed: " + r.stderr.strip()[-300:])

    r = leg("mesh_scaling", 500, mesh_scaling)
    if r:
        EXTRA["mesh_scaling"] = r

    tier = leg("tpu_test_tier", 300, run_tpu_test_tier)
    if tier:
        EXTRA["tpu_test_tier"] = tier
        if tier.startswith("pass:"):
            _log_tpu_evidence("tpu_test_tier", tier)
        elif tier.startswith("SKIP"):
            rec = _last_tpu_evidence("tpu_test_tier")
            if rec is not None:
                EXTRA["tpu_test_tier_recorded_on_chip"] = {
                    "ts": rec.get("ts"), "result": rec.get("result")}

    _snapshot()
    _flush()


if __name__ == "__main__":
    main()

"""Benchmark: end-to-end command throughput vs the reference binary,
plus the banded-DP kernel throughput on the device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric: cluster_fast end-to-end throughput (seqs/sec) on a
100k-read synthetic amplicon workload, measured back-to-back against the
reference binary on the same machine (vs_baseline = ours / reference;
>1 means faster than the reference).  The machine's clock throttles over
time, so paired measurement is the only honest comparison.

extra carries: usearch_global end-to-end seqs/s + ratio, the wavefront
kernel Gcells/s at three batch sizes (vs single-thread native CPU), and
workload parameters.  The kernel bench runs in a subprocess with a
timeout so a wedged device tunnel cannot hang the whole benchmark.
"""

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

REF_SRC = "/root/reference/tmp/usearch_linux_x86_12.0-beta"


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


def _run(cmd, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
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
                                            pack_ins, _compiled)
from usearch12_tpu.ops.wavefront_nw16 import (WavefrontNW16Device,
                                              pack_wave16, pack_ins16,
                                              _compiled16)
ap = AlnParams(nucleo=True, subst_mx=nuc_mx(1.0, -2.0))
ap.init4(-10.0, -1.0, -0.5, -0.5)
dev = WavefrontNWDevice(ap, pb=64, chunk=128)
dev16 = WavefrontNW16Device(ap, pb=64, chunk=128)

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

out32, out16 = {}, {}
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
            jnp.asarray(pack_ins(padr(batch.ins, 4))), jnp.asarray(dev.gp))
    out32[str(n_pairs)] = round(cells / time_fn(fn, args, n_pairs) / 1e9, 2)
    o32 = fn(*args)

    # the i16 leg must not take down the f32 record if Mosaic rejects
    # an int16 op on this chip generation
    try:
        b16 = pack_wave16(pairs, True, 16, dev16.chunk, batch.rho0)
        fn16 = _compiled16(b16.steps, dev16.chunk, dev16.pb, b16.rho0,
                           b16.sw, dev16.quant[0], dev16.quant[1],
                           dev16.interpret)
        def padz(x):
            if pad == 0:
                return x
            return np.concatenate([x, np.zeros((pad,) + x.shape[1:],
                                               x.dtype)])
        args16 = (jnp.asarray(padz(b16.mask00)),
                  jnp.asarray(pack_ins16(padz(b16.ins))))
        out16[str(n_pairs)] = round(
            cells / time_fn(fn16, args16, n_pairs) / 1e9, 2)
        if n_pairs == 2048:
            # variant parity: the i16 kernel must emit exactly the f32
            # kernel's tensors (same DP at 2x lane density)
            o16 = fn16(*args16)
            for x, y in zip(o32, o16):
                assert np.array_equal(np.asarray(x)[:R],
                                      np.asarray(y)[:R]), \\
                    "i16/f32 kernel tensor mismatch"
    except AssertionError:
        raise
    except Exception as e:
        out16[str(n_pairs)] = "failed: " + repr(e)[:200]

out = {k: (max(out32[k], out16[k])
           if isinstance(out16[k], float) else out32[k])
       for k in out32}
# utilization vs per-chip VPU peak: the banded-DP recurrence costs
# ~12 VPU ops/cell (match select + 3x2 add/max for M/D/I + band
# shift); v5e VPU f32 peak ~= 4 ALUs x (8x128) lanes x 0.94 GHz
# ~= 3.85e12 ops/s (the int16 kernel packs 2x elements per op; its
# peak fraction is reported against the same f32 baseline for
# continuity).
# MXU is irrelevant: no matmuls in the DP.
OPS_PER_CELL = 12.0
VPU_PEAK = 3.85e12
best_g = max(out.values())
out = {"gcells": out, "gcells_f32": out32, "gcells_i16": out16,
       "variant_parity": "i16 tensors == f32 tensors @2048",
       "ops_per_cell_est": OPS_PER_CELL,
       "pct_vpu_peak_at_best": round(100.0 * best_g * 1e9 * OPS_PER_CELL
                                     / VPU_PEAK, 2)}
print(json.dumps(out))
"""


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


def _gen_sintax_big(d):
    """20k-target / 248nt taxonomy DB (past the 16384 auto-device
    threshold) + 1500 queries: the regime where the device matmul boots
    displace the host C argmax scan (O(boots x T) per strand)."""
    import numpy as np
    dbf = os.path.join(d, "sxb_db.fa")
    qf = os.path.join(d, "sxb_q.fa")
    if os.path.exists(dbf):
        return dbf, qf
    rng = np.random.default_rng(17)
    conv = np.frombuffer(b"ACGT", np.uint8)
    seqs = []
    with open(dbf, "w") as f:
        for i in range(20000):
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
    """Device (MXU matmul boots) vs host-C SINTAX on a 20k-target DB,
    interleaved legs, byte parity of -tabbedout at -randseed 1
    (VERDICT r3 item 4).  Returns per-leg seconds + parity."""
    dbf, qf = _gen_sintax_big(d)

    def my_cmd(tag, extra_opts):
        return ([os.path.join(HERE, "bin", "usearch"), "-sintax", qf,
                 "-db", dbf, "-tabbedout", os.path.join(d, f"sx_{tag}.sin"),
                 "-strand", "both", "-quiet", "-randseed", "1"]
                + extra_opts)

    rf = [ref, "-sintax", qf, "-db", dbf, "-tabbedout",
          os.path.join(d, "sx_ref.sin"), "-strand", "both", "-quiet",
          "-randseed", "1", "-threads", "1"]
    legs = [("host", ["-no_sintax_device"]), ("device", ["-sintax_device"])]
    _run(my_cmd("device", legs[1][1]))     # untimed warm (jit/compile)
    times = {tag: [] for tag, _ in legs}
    ref_times = []
    for _ in range(2):
        ref_times.append(_run(rf))
        for tag, opts in legs:
            times[tag].append(_run(my_cmd(tag, opts)))
    ref_b = open(os.path.join(d, "sx_ref.sin"), "rb").read()
    out = {"ref_s": round(min(ref_times), 3)}
    for tag, _ in legs:
        t = min(times[tag])
        out[tag] = {
            "s": round(t, 3), "vs_ref": round(min(ref_times) / t, 3),
            "parity": open(os.path.join(d, f"sx_{tag}.sin"),
                           "rb").read() == ref_b}
    return out


def _gen_longseq(d):
    """Long-sequence device-ablation workload, indel-free by
    construction so the whole DP volume is device-eligible.

    Every sequence has the same layout: 13 position-specific conserved
    150nt blocks (shared by all sequences) alternating with 12 variable
    1850nt segments (24150nt total).  Targets draw variable segments
    independently; each query copies a parent target and re-rolls 50%
    of each variable segment's positions.  HSP chains anchor on the
    conserved blocks and every inter-anchor hole sits on the main
    diagonal (|alen-blen| = 0), so no hole exceeds the wavefront
    kernel's 254-wide band limit — the round-3 geometry (random 24kb
    middles) scattered anchors across diagonals and routed 77% of
    cells to the host as wide holes, measuring nothing about the chip.

    With -maxaccepts/-maxrejects >= #targets every query aligns every
    target: 32x32 pairs x ~5.3M banded cells = ~5.5 Gcells of DP per
    leg at -band 120, the long-read regime where banded DP dominates
    the run (viterbifastbandmem.cpp:232-253 cost model).  Identity:
    query-vs-parent ~0.65 (accepted at -id 0.5), query-vs-other ~0.31
    (rejected), so the blast6 parity check is non-trivial."""
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


def bench_device_ablation(ref, d):
    """usearch_global on the long-seq workload three ways — host-forced,
    adaptive gate, device-forced — against the reference binary.
    Returns an extras dict with per-leg wall time, device cells actually
    dispatched (USEARCH_DEVICE_STATS), and byte parity of every leg."""
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
    out = {}
    # interleave every leg (and the reference) within each round so the
    # rig's oscillating clock can't fake a between-leg ratio; a wedged
    # device tunnel costs the first device-forced run a ~60s probe, so
    # warm it once untimed before the timed rounds
    _run(my_cmd("device", legs[2][1]))
    times = {tag: [] for tag, _ in legs}
    ref_times = []
    for _ in range(2):
        ref_times.append(_run(rf))
        for tag, opts in legs:
            stats_path = os.path.join(d, f"abl_{tag}.stats")
            env_save = os.environ.get("USEARCH_DEVICE_STATS")
            os.environ["USEARCH_DEVICE_STATS"] = stats_path
            try:
                times[tag].append(_run(my_cmd(tag, opts)))
            finally:
                if env_save is None:
                    os.environ.pop("USEARCH_DEVICE_STATS", None)
                else:
                    os.environ["USEARCH_DEVICE_STATS"] = env_save
    t_ref = min(ref_times)
    out["ref_s"] = round(t_ref, 3)
    ref_b6 = open(os.path.join(d, "abl_ref.b6"), "rb").read()
    for tag, opts in legs:
        stats_path = os.path.join(d, f"abl_{tag}.stats")
        t = min(times[tag])
        dev_cells = host_cells = 0
        dev_on = False
        try:
            with open(stats_path) as f:
                lines = [json.loads(x) for x in f if x.strip()]
            # two timed runs appended two lines; report the last
            if lines:
                dev_cells = lines[-1].get("device_cells", 0)
                host_cells = lines[-1].get("host_cells", 0)
                dev_on = bool(lines[-1].get("device"))
        except OSError:
            pass
        parity = (open(os.path.join(d, f"abl_{tag}.b6"), "rb").read()
                  == ref_b6)
        out[tag] = {"s": round(t, 3), "vs_ref": round(t_ref / t, 3),
                    "device_used": dev_on, "device_cells": dev_cells,
                    "host_cells": host_cells, "parity": parity}
    return out


def bench_thread_scaling(ref, db, q, d):
    """-threads 4 vs -threads 1 for both binaries on the official global
    workload (VERDICT r3 weak #6).  This rig exposes ONE core, so both
    ratios measure oversubscription overhead, not speedup — the
    expectation for a 10-core host is recorded alongside: the reference
    scales via std::thread fan-out (search.cpp:119-128); this engine
    fans out whole windows per thread with thread-private scratch
    (engine/batch.py run_file), and ~70-85% of a window's wall time is
    inside GIL-releasing ctypes C calls (rank/chain/DP/emit), so the
    Amdahl bound at 10 threads is ~4-7x vs the reference's ~9x —
    unless the device path absorbs the DP, where threads feed one chip."""
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
    out["note"] = ("1 physical core: ratios measure oversubscription "
                   "overhead; 10-core expectation ~4-7x (GIL-released "
                   "fraction 0.70-0.85 measured by cProfile: rank/chain/"
                   "DP/emit run in C with the GIL dropped) vs reference "
                   "~9x")
    return out


def _device_reachable():
    """30s-capped subprocess probe of the accelerator (twice).  The
    expensive device stages (kernel sweep child: 2x600s, TPU test tier:
    1800s) would otherwise hang their full timeout on a wedged tunnel —
    ~40 min of dead time per bench run.  Returns (ok, cause)."""
    sys.path.insert(0, HERE)
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
                return True, "ok"
            cause = "probe rc=%d: %s" % (r.returncode,
                                         r.stderr.strip()[-200:])
        except subprocess.TimeoutExpired:
            cause = "probe timeout after 30s (tunnel wedged)"
        except Exception as e:  # noqa: BLE001
            cause = repr(e)[:200]
    return False, cause


def bench_kernel_device():
    """Run the device kernel sweep in a child with a hard timeout.
    Retries once; on failure returns (None, cause-string) so the bench
    record always says WHY the device number is missing (round-2 lost
    its TPU evidence to a silent `except: pass` here)."""
    ok, cause = _device_reachable()
    if not ok:
        return None, "device unreachable: " + cause
    cause = "unknown"
    for attempt in range(2):
        try:
            r = subprocess.run([sys.executable, "-c",
                                _KERNEL_CHILD % {"here": HERE}],
                               capture_output=True, timeout=900, text=True)
            if r.returncode == 0:
                return json.loads(r.stdout.strip().splitlines()[-1]), "ok"
            cause = "rc=%d: %s" % (r.returncode,
                                   r.stderr.strip()[-300:])
        except subprocess.TimeoutExpired:
            cause = "timeout after 600s"
        except Exception as e:  # noqa: BLE001
            cause = repr(e)[:300]
    return None, cause


def run_tpu_test_tier():
    """Run the device test tier (pallas kernel, traceback, engine-with-
    device) against the real chip; returns a summary string."""
    ok, cause = _device_reachable()
    if not ok:
        return "SKIP: device unreachable: " + cause
    env = dict(os.environ)
    env["USEARCH_TPU_TESTS"] = "1"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    try:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q",
             os.path.join(HERE, "tests", "test_pallas_nw.py"),
             os.path.join(HERE, "tests", "test_batch_search.py"),
             os.path.join(HERE, "tests", "test_wavefront_trace.py"),
             os.path.join(HERE, "tests", "test_wide_hole_split.py")],
            capture_output=True, timeout=1800, text=True, env=env)
        tail = (r.stdout.strip().splitlines() or ["no output"])[-1]
        return ("pass: " if r.returncode == 0 else "FAIL: ") + tail[:200]
    except subprocess.TimeoutExpired:
        return "FAIL: timeout after 1800s"
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


def _gen_pairs(d):
    """100k overlapping read pairs for the merge bench."""
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


def bench_unoise(ref, reads, d):
    """unoise3 over the uniques of 100k amplicon-style reads (heavy
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


def _last_tpu_evidence(stage):
    """Most recent TPU_EVIDENCE.jsonl record for `stage`, or None."""
    try:
        with open(os.path.join(HERE, "TPU_EVIDENCE.jsonl")) as f:
            recs = [json.loads(ln) for ln in f if ln.strip()]
    except (OSError, ValueError):
        return None
    recs = [r for r in recs if r.get("stage") == stage]
    return recs[-1] if recs else None


def _log_tpu_evidence(stage, payload):
    """Append a successful device-stage record to TPU_EVIDENCE.jsonl so
    hardware evidence survives a later tunnel outage (see TPU_EVIDENCE.md)."""
    try:
        with open(os.path.join(HERE, "TPU_EVIDENCE.jsonl"), "a") as f:
            f.write(json.dumps({
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "stage": stage, "result": payload}) + "\n")
    except OSError:
        pass


def main():
    import tempfile
    d = tempfile.mkdtemp(prefix="usearch_bench_")
    # a stale "bad" device-health verdict from an earlier transient
    # failure must not decide this bench's device path
    import glob as _glob
    for p in _glob.glob("/tmp/usearch_device_health*"):
        try:
            os.unlink(p)
        except OSError:
            pass
    ref = _prepare_ref()
    reads, db, q = _gen_workloads(d)

    extra = {"workload": "100k reads cluster_fast id=0.97; "
                         "100k q x 2k t usearch_global id=0.9"}

    g_my = g_ref = g_ratio = None
    c_my = c_ref = c_ratio = None
    parity_ok = True
    if ref is not None:
        g_my, g_ref, g_ratio, p1 = bench_global(ref, db, q, d)
        c_my, c_ref, c_ratio, p2 = bench_cluster(ref, reads, d)
        s_my, s_ref, s_ratio, p3 = bench_sintax(ref, d)
        m_my, m_ref, m_ratio, p4 = bench_merge(ref, d)
        u_ratio, p5 = bench_unoise(ref, reads, d)
        parity_ok = p1 and p2 and p3 and p4 and p5
        extra["usearch_global_seqs_per_s"] = round(g_my, 1)
        extra["usearch_global_ref_seqs_per_s"] = round(g_ref, 1)
        extra["usearch_global_vs_ref"] = round(g_ratio, 3)
        extra["cluster_fast_ref_seqs_per_s"] = round(c_ref, 1)
        extra["sintax_seqs_per_s"] = round(s_my, 1)
        extra["sintax_vs_ref"] = round(s_ratio, 3)
        extra["fastq_mergepairs_pairs_per_s"] = round(m_my, 1)
        extra["fastq_mergepairs_vs_ref"] = round(m_ratio, 3)
        extra["unoise3_vs_ref"] = round(u_ratio, 3)
        extra["output_parity"] = parity_ok

    if ref is not None:
        try:
            extra["device_ablation"] = bench_device_ablation(ref, d)
        except Exception as e:  # noqa: BLE001
            extra["device_ablation"] = "failed: " + repr(e)[:300]

    # device CSR ranking vs host C ranker on a >=100k-target DB
    # (identical candidate order asserted in-child)
    ok_dev, cause_dev = _device_reachable()
    if ok_dev:
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "tools",
                                              "bench_device_rank.py")],
                capture_output=True, timeout=1200, text=True)
            extra["device_rank"] = (
                json.loads(r.stdout.strip().splitlines()[-1])
                if r.returncode == 0
                else "failed: " + r.stderr.strip()[-300:])
            if isinstance(extra["device_rank"], dict):
                _log_tpu_evidence("device_rank", extra["device_rank"])
        except Exception as e:  # noqa: BLE001
            extra["device_rank"] = "failed: " + repr(e)[:300]
    else:
        extra["device_rank"] = "skipped: device unreachable: " + cause_dev

    # device SINTAX boots vs host C on a 20k-target DB (VERDICT r4)
    if ok_dev and ref is not None:
        try:
            extra["sintax_device"] = bench_sintax_device(ref, d)
            if isinstance(extra["sintax_device"], dict):
                _log_tpu_evidence("sintax_device", extra["sintax_device"])
        except Exception as e:  # noqa: BLE001
            extra["sintax_device"] = "failed: " + repr(e)[:300]
    elif ref is not None:
        extra["sintax_device"] = "skipped: device unreachable"

    # thread scaling (-threads 4 vs 1, both binaries; 1-core rig)
    if ref is not None:
        try:
            extra["thread_scaling"] = bench_thread_scaling(ref, db, q, d)
        except Exception as e:  # noqa: BLE001
            extra["thread_scaling"] = "failed: " + repr(e)[:300]

    # virtual-mesh scaling curve (1/2/4/8 devices): stands in for the
    # multi-host efficiency target until real multi-chip exists
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "tools",
                                          "scaling_curve.py")],
            capture_output=True, timeout=1500, text=True)
        extra["mesh_scaling"] = (
            json.loads(r.stdout.strip()) if r.returncode == 0
            else "failed: " + r.stderr.strip()[-300:])
    except Exception as e:  # noqa: BLE001
        extra["mesh_scaling"] = "failed: " + repr(e)[:300]

    kern, kern_cause = bench_kernel_device()
    if kern is not None:
        _log_tpu_evidence("kernel_sweep", kern)
    if isinstance(extra.get("device_ablation"), dict) and any(
            isinstance(v, dict) and v.get("device_used")
            for v in extra["device_ablation"].values()):
        _log_tpu_evidence("device_ablation", extra["device_ablation"])
    if kern is not None:
        gcells = kern.get("gcells", kern)
        extra["kernel_gcells_per_s"] = gcells
        extra["kernel_utilization"] = {
            k: kern[k] for k in ("ops_per_cell_est",
                                 "pct_vpu_peak_at_best") if k in kern}
        cpu = bench_kernel_cpu()
        if cpu:
            extra["kernel_cpu_gcells_per_s"] = round(cpu, 3)
            extra["kernel_vs_cpu"] = round(
                max(gcells.values()) / cpu, 1)
    else:
        extra["kernel_gcells_per_s"] = "unavailable: " + kern_cause
        rec = _last_tpu_evidence("kernel_sweep")
        if rec is not None:
            extra["kernel_gcells_per_s_recorded_on_chip"] = {
                "ts": rec.get("ts"), **rec.get("result", {}),
                "note": "most recent real-chip sweep from "
                        "TPU_EVIDENCE.jsonl (in-repo hardware record; "
                        "device was unreachable at bench time)"}
    extra["tpu_test_tier"] = run_tpu_test_tier()
    if extra["tpu_test_tier"].startswith("pass:"):
        _log_tpu_evidence("tpu_test_tier", extra["tpu_test_tier"])
    elif extra["tpu_test_tier"].startswith("SKIP"):
        rec = _last_tpu_evidence("tpu_test_tier")
        if rec is not None:
            extra["tpu_test_tier_recorded_on_chip"] = {
                "ts": rec.get("ts"), "result": rec.get("result")}

    if c_my is not None:
        print(json.dumps({
            "metric": "cluster_fast_end_to_end_throughput",
            "value": round(c_my, 1),
            "unit": "seqs/sec",
            "vs_baseline": round(c_ratio, 3),
            "extra": extra,
        }))
    else:
        print(json.dumps({
            "metric": "kernel_banded_nw_throughput",
            "value": (max(kern.get("gcells", kern).values())
                      if kern else None),
            "unit": "Gcells/s",
            "vs_baseline": None,
            "extra": extra,
        }))


if __name__ == "__main__":
    main()

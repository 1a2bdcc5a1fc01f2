"""Mesh scaling curve on virtual CPU devices: mesh_search and batched
clustering throughput at 1/2/4/8 devices.

Stands in for the multi-host scaling-efficiency target (BASELINE.md:
>=0.8 at 2 hosts) until real multi-chip hardware exists: it validates
that per-device work actually shrinks as the mesh grows (sharded
postings / sharded pair DP), while measuring the collective + dispatch
overhead the sharding adds.  CAVEAT, recorded in the output: all N
virtual devices share this rig's single physical core, so wall-clock
cannot improve with N here — the meaningful signals are (a) per-device
FLOP share dropping ~1/N and (b) total overhead staying bounded.  On
real hardware the same program text shards over real chips (XLA
partitions by sharding annotations; no code change).

Writes SCALING_r<N>.json when invoked with a round argument, else
prints JSON.  Each mesh size runs in a fresh subprocess because
xla_force_host_platform_device_count must be set before jax init.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r'''
import json, os, sys, time
sys.path.insert(0, %(here)r)
sys.path.insert(0, %(here)r + "/tests")
import numpy as np
import jax
from jax.sharding import Mesh

N = %(n)d
from genseqs import make_amplicons, write_fasta
from usearch12_tpu.cli import parse_argv
d = %(dir)r
db_fa, q_fa = d + "/db.fa", d + "/q.fa"
if not os.path.exists(db_fa):
    recs = make_amplicons(n_templates=200, reads_per_template=6,
                          length=220, seed=31)
    write_fasta(db_fa, [r for r in recs if r[0].startswith("tpl")])
    write_fasta(q_fa, [r for r in recs if not r[0].startswith("tpl")])

parse_argv(["-usearch_global", q_fa, "-db", db_fa, "-id", "0.9",
            "-strand", "plus", "-quiet"])
from usearch12_tpu.io.seqdb import SeqDB
from usearch12_tpu.parallel.mesh_search import mesh_search_file

devs = np.array(jax.devices())[:N]
# db axis carries the sharded postings; keep data=1 so the per-device
# share of the index shrinks with N
mesh = Mesh(devs.reshape(1, N), ("data", "db"))
db = SeqDB.from_fastx(db_fa)
db.mask()
n_q = sum(1 for line in open(q_fa) if line.startswith(">"))
# warmup (jit compile) then timed
mesh_search_file(q_fa, db, mesh, lambda *a: None, window=256, topk=64)
t0 = time.perf_counter()
st = mesh_search_file(q_fa, db, mesh, lambda *a: None, window=256,
                      topk=64)
t_search = time.perf_counter() - t0
ov = st.get("overhead", {})

parse_argv(["-cluster_mt", q_fa, "-id", "0.97", "-quiet",
            "-uc", d + f"/c{N}.uc"])
from usearch12_tpu.parallel.cluster_batch import cluster_mt_batched
t0 = time.perf_counter()
cluster_mt_batched(q_fa, mesh=mesh)
t_cluster = time.perf_counter() - t0

w = max(1, ov.get("windows", 1))
print(json.dumps({"n": N, "search_q_per_s": round(n_q / t_search, 1),
                  "cluster_s": round(t_cluster, 3),
                  "overhead_per_window": {
                      "dispatches": round(ov.get("dispatches", 0) / w, 2),
                      "h2d_bytes": round(ov.get("h2d_bytes", 0) / w),
                      "d2h_bytes": round(ov.get("d2h_bytes", 0) / w),
                      "all_gather_bytes":
                          round(ov.get("all_gather_bytes", 0) / w),
                      "psum_bytes": round(ov.get("psum_bytes", 0) / w)},
                  "windows": ov.get("windows", 0),
                  "dims": st.get("dims")}))
'''


def project_2host(row):
    """Analytic 2-host efficiency from the measured per-window
    collective bytes (SURVEY §6 target: >=0.8 scaling efficiency at 2
    hosts).  Model: 2 hosts x 1 chip, db axis split across hosts so the
    per-window all_gather/psum carries cross DCN (assumed 100 Gb/s
    effective per direction = 12.5 GB/s); per-chip compute is the rank
    matmul share Q(B,V) @ W(V, T/2) int8 on the MXU at a conservative
    50%% of the v5e 394 TOPS int8 peak.  Collective bytes per window are
    O(n_db*B*K) — independent of DB size T — so efficiency grows with
    T; reported at the measured shape and at a production 1M-target DB.
    """
    ov, dims = row.get("overhead_per_window"), row.get("dims")
    if not (isinstance(ov, dict) and isinstance(dims, dict)):
        return None
    dcn_bw = 12.5e9
    mxu = 0.5 * 394e12
    coll_bytes = ov.get("all_gather_bytes", 0) + ov.get("psum_bytes", 0)
    t_dcn = coll_bytes / dcn_bw
    B = 256  # child window size

    def eff(t_pad):
        t_comp = 2.0 * B * dims["v"] * (t_pad / 2) / mxu
        return round(t_comp / (t_comp + t_dcn), 4)

    return {"model": "t_comp/(t_comp+t_dcn); DCN 12.5 GB/s, MXU 50% of "
                     "394 TOPS int8, db axis split 2 hosts",
            "collective_bytes_per_window": coll_bytes,
            "efficiency_at_measured_db": eff(dims["t_pad"]),
            "efficiency_at_1M_target_db": eff(1_000_000),
            "target": ">=0.8 (SURVEY §6 / BASELINE.md 2-host)"}


def run(round_no=None):
    import tempfile
    d = tempfile.mkdtemp(prefix="usearch_scaling_")
    out = {"devices": {}, "caveat":
           "all virtual devices share one physical core on this rig; "
           "wall-clock cannot improve with N — this measures sharding "
           "overhead + per-device work share, not real-chip speedup"}
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={n}")
        env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run(
            [sys.executable, "-c",
             _CHILD % {"here": HERE, "n": n, "dir": d}],
            capture_output=True, timeout=1200, text=True, env=env)
        if r.returncode != 0:
            out["devices"][str(n)] = "failed: " + r.stderr.strip()[-300:]
            continue
        out["devices"][str(n)] = json.loads(r.stdout.strip().splitlines()[-1])
    two = out["devices"].get("2")
    if isinstance(two, dict):
        proj = project_2host(two)
        if proj is not None:
            out["two_host_projection"] = proj
    base = out["devices"].get("1")
    if isinstance(base, dict):
        for n in ("2", "4", "8"):
            v = out["devices"].get(n)
            if isinstance(v, dict):
                v["search_vs_1dev"] = round(
                    v["search_q_per_s"] / base["search_q_per_s"], 3)
    if round_no is not None:
        with open(os.path.join(HERE, f"SCALING_r{round_no:02d}.json"),
                  "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else None)

import subprocess, sys, os, random, itertools
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from usearch12_tpu.cli import main as cli_main
from usearch12_tpu.config import reset_options

REF = "/tmp/usearch_ref"
Q = "/tmp/otus_in.fa"

random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 30

def run_ref(args):
    r = subprocess.run([REF] + args + ["-quiet", "-threads", "1"],
                       capture_output=True, text=True)
    return r.returncode, r.stderr

nfail = 0
for trial in range(N):
    opts = ["-id", random.choice(["0.8", "0.9", "0.95"]),
            "-strand", random.choice(["plus", "both"])]
    if random.random() < 0.3:
        opts += ["-maxaccepts", str(random.choice([1, 2, 4]))]
    if random.random() < 0.3:
        opts += ["-maxrejects", str(random.choice([4, 8, 32]))]
    if random.random() < 0.25:
        opts += ["-mincols", str(random.choice([50, 150]))]
    if random.random() < 0.25:
        opts += ["-maxgaps", str(random.choice([0, 2, 5]))]
    if random.random() < 0.25:
        opts += ["-query_cov", random.choice(["0.5", "0.9"])]
    if random.random() < 0.25:
        opts += ["-target_cov", random.choice(["0.5", "0.9"])]
    if random.random() < 0.2:
        opts += ["-maxdiffs", str(random.choice([5, 20]))]
    if random.random() < 0.2:
        opts += ["-self"]
    if random.random() < 0.2:
        opts += ["-sizein", "-sizeout"]
    if random.random() < 0.25:
        opts += ["-wordlength", str(random.choice([6, 7, 10]))]
    if random.random() < 0.25:
        opts += ["-band", str(random.choice([8, 32]))]
    if random.random() < 0.2:
        opts += ["-match", "2.0", "-mismatch", "-3.0"]
    if random.random() < 0.2:
        opts += ["-maxhits", str(random.choice([1, 3]))]
    if random.random() < 0.15:
        opts += ["-output_no_hits"]
    if random.random() < 0.15:
        opts += ["-top_hit_only"]
    if random.random() < 0.15:
        opts += ["-minseqlength", "100"]

    g_b6, m_b6 = "/tmp/fz_g.b6", "/tmp/fz_m.b6"
    g_uc, m_uc = "/tmp/fz_g.uc", "/tmp/fz_m.uc"
    for p in (g_b6, m_b6, g_uc, m_uc):
        if os.path.exists(p): os.remove(p)
    base = ["-usearch_global", Q, "-db", Q] + opts
    rc, err = run_ref(base + ["-blast6out", g_b6, "-uc", g_uc])
    if rc != 0:
        # reference rejected the combo; ours should too (loosely checked)
        continue
    reset_options()
    try:
        mrc = cli_main(base + ["-blast6out", m_b6, "-uc", m_uc, "-quiet"])
    except SystemExit as e:
        mrc = 1
    except Exception as e:
        print(f"[{trial}] OURS CRASHED: {opts}\n  {e}")
        nfail += 1
        continue
    ok = True
    for g, m in ((g_b6, m_b6), (g_uc, m_uc)):
        gd = open(g).read() if os.path.exists(g) else "<missing>"
        md = open(m).read() if os.path.exists(m) else "<missing>"
        if gd != md:
            ok = False
    if not ok:
        nfail += 1
        print(f"[{trial}] DIVERGED: {' '.join(opts)}")
print(f"fuzz done: {nfail} failures / {N}")

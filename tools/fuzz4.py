import subprocess, sys, os, random
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
from usearch12_tpu.cli import main as cli_main
from usearch12_tpu.config import reset_options
REF = "/tmp/usearch_ref"
random.seed(int(sys.argv[1])); N = int(sys.argv[2]); MODE = sys.argv[3]

def run_ref(args):
    r = subprocess.run([REF] + args + ["-quiet", "-threads", "1"],
                       capture_output=True, text=True)
    return r.returncode, r.stderr

nfail = 0
for trial in range(N):
    if MODE == "unoise":
        opts = []
        if random.random() < 0.4: opts += ["-unoise_alpha", random.choice(["1.5","3.0"])]
        if random.random() < 0.4: opts += ["-minsize", random.choice(["2","8"])]
        base = ["-unoise3", "/tmp/otus_in.fa"] + opts
        pairs = [("-zotus", ".fa"), ("-tabbedout", ".tab"), ("-ampout", "_a.fa")]
    elif MODE == "uchime":
        opts = []
        if random.random() < 0.4: opts += ["-abskew", random.choice(["2.0","16.0"])]
        if random.random() < 0.3: opts += ["-minh", "0.2"]
        base = ["-uchime3_denovo", "/tmp/otus_in.fa"] + opts
        pairs = [("-chimeras", ".fa"), ("-nonchimeras", "_n.fa"), ("-uchimeout", ".tab")]
    elif MODE == "otutab":
        opts = ["-id", random.choice(["0.9", "0.97"]), "-strand", "plus"]
        if random.random() < 0.4: opts += ["-maxaccepts", "8", "-maxrejects", "32"]
        base = ["-otutab", "/tmp/otus_in.fa", "-db", "/tmp/g_otus.fa"] + opts
        pairs = [("-otutabout", ".tab"), ("-mapout", ".map"), ("-uc", ".uc")]
    elif MODE == "closed":
        opts = ["-id", "0.97", "-strand", "plus"]
        base = ["-closed_ref", "/tmp/otus_in.fa", "-db", "/tmp/g_otus.fa"] + opts
        pairs = [("-otutabout", ".tab"), ("-mapout", ".map")]
    elif MODE == "trunc":
        opts = []
        if random.random() < 0.6: opts += ["-trunclen", random.choice(["100","150"])]
        if random.random() < 0.4: opts += ["-stripleft", "5"]
        if random.random() < 0.3: opts += ["-stripright", "5"]
        if random.random() < 0.3: opts += ["-padlen", "200"]
        if random.random() < 0.3: opts += ["-relabel", "T"]
        base = ["-fastx_truncate", "/tmp/R1.fq"] + opts
        pairs = [("-fastqout", ".fq"), ("-fastaout", ".fa")]
    elif MODE == "join":
        opts = []
        if random.random() < 0.4: opts += ["-join_padgap", "NNNNN"]
        if random.random() < 0.3: opts += ["-relabel", "J"]
        base = ["-fastq_join", "/tmp/R1.fq", "-reverse", "/tmp/R2.fq"] + opts
        pairs = [("-fastqout", ".fq"), ("-fastaout", ".fa")]
    elif MODE == "orient":
        base = ["-fastx_orient", "/tmp/otus_in.fa", "-db", "/tmp/g_otus.fa"]
        pairs = [("-fastaout", ".fa"), ("-notmatched", "_n.fa"), ("-tabbedout", ".tab")]
    outs_g, outs_m = {}, {}
    gargs, margs = list(base), list(base)
    for flag, ext in pairs:
        outs_g[flag] = f"/tmp/f4g{ext}"; outs_m[flag] = f"/tmp/f4m{ext}"
        for p in (outs_g[flag], outs_m[flag]):
            if os.path.exists(p): os.remove(p)
        gargs += [flag, outs_g[flag]]; margs += [flag, outs_m[flag]]
    rc, err = run_ref(gargs)
    if rc != 0:
        print(f"[{trial}] ref rejected: {err.strip().splitlines()[-1][:80] if err.strip() else rc}")
        continue
    reset_options()
    try:
        cli_main(margs + ["-quiet"])
    except SystemExit as e:
        print(f"[{trial}] ours exited: {e}")
    except Exception as e:
        print(f"[{trial}] CRASH: {base}\n  {type(e).__name__}: {e}")
        nfail += 1; continue
    for flag, _ in pairs:
        gd = open(outs_g[flag]).read() if os.path.exists(outs_g[flag]) else "<none>"
        md = open(outs_m[flag]).read() if os.path.exists(outs_m[flag]) else "<none>"
        if gd != md:
            print(f"[{trial}] DIVERGED {flag}: {' '.join(base)}")
            nfail += 1; break
print(f"fuzz {MODE} done: {nfail} failures / {N}")

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
    if MODE == "filter":
        opts = []
        if random.random() < 0.5: opts += ["-fastq_maxee", random.choice(["0.5","1.0","2.0"])]
        if random.random() < 0.3: opts += ["-fastq_truncqual", str(random.choice([5,15]))]
        if random.random() < 0.3: opts += ["-fastq_trunclen", str(random.choice([80,120]))]
        if random.random() < 0.3: opts += ["-fastq_minlen", str(random.choice([50,100]))]
        if random.random() < 0.3: opts += ["-fastq_maxns", str(random.choice([0,2]))]
        if random.random() < 0.3: opts += ["-fastq_stripleft", str(random.choice([3,10]))]
        if random.random() < 0.2: opts += ["-fastq_stripright", "5"]
        if random.random() < 0.3: opts += ["-relabel", "Filt"]
        if random.random() < 0.3: opts += ["-fastq_eeout"]
        if random.random() < 0.2: opts += ["-fastq_maxee_rate", "0.01"]
        base = ["-fastq_filter", "/tmp/R1.fq"] + opts
        pairs = [("-fastqout", ".fq"), ("-fastaout", ".fa"),
                 ("-fastqout_discarded", "_d.fq")]
    elif MODE == "merge":
        opts = []
        if random.random() < 0.4: opts += ["-fastq_maxdiffs", str(random.choice([2,10]))]
        if random.random() < 0.3: opts += ["-fastq_minovlen", str(random.choice([10,30]))]
        if random.random() < 0.3: opts += ["-fastq_pctid", str(random.choice([80,95]))]
        if random.random() < 0.3: opts += ["-fastq_minmergelen", "150"]
        if random.random() < 0.3: opts += ["-fastq_maxmergelen", "280"]
        if random.random() < 0.3: opts += ["-relabel", "M"]
        if random.random() < 0.3: opts += ["-fastq_nostagger"]
        if random.random() < 0.2: opts += ["-fastq_trunctail", str(random.choice([5,10]))]
        base = ["-fastq_mergepairs", "/tmp/R1.fq", "-reverse", "/tmp/R2.fq"] + opts
        pairs = [("-fastqout", ".fq"), ("-fastaout_notmerged_fwd", "_nf.fa")]
    elif MODE == "sintax":
        opts = ["-tabbedout", None]
        opts = []
        if random.random() < 0.5: opts += ["-sintax_cutoff", "0.8"]
        if random.random() < 0.4: opts += ["-strand", random.choice(["plus","both"])]
        else: opts += ["-strand", "plus"]
        if random.random() < 0.3: opts += ["-boots", str(random.choice([20,100]))]
        base = ["-sintax", "/tmp/taxin.fa", "-db", "/tmp/taxin.fa"] + opts
        pairs = [("-tabbedout", ".tab")]
    outs_g, outs_m = {}, {}
    gargs, margs = list(base), list(base)
    for flag, ext in pairs:
        outs_g[flag] = f"/tmp/f3g{ext}"; outs_m[flag] = f"/tmp/f3m{ext}"
        for p in (outs_g[flag], outs_m[flag]):
            if os.path.exists(p): os.remove(p)
        gargs += [flag, outs_g[flag]]; margs += [flag, outs_m[flag]]
    rc, err = run_ref(gargs)
    if rc != 0:
        continue
    reset_options()
    try:
        cli_main(margs + ["-quiet"])
    except SystemExit:
        pass
    except Exception as e:
        print(f"[{trial}] CRASH: {opts}\n  {type(e).__name__}: {e}")
        nfail += 1; continue
    for flag, _ in pairs:
        gd = open(outs_g[flag]).read() if os.path.exists(outs_g[flag]) else "<none>"
        md = open(outs_m[flag]).read() if os.path.exists(outs_m[flag]) else "<none>"
        if gd != md:
            print(f"[{trial}] DIVERGED {flag}: {' '.join(opts)}")
            nfail += 1; break
print(f"fuzz {MODE} done: {nfail} failures / {N}")

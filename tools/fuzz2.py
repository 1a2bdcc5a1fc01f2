import subprocess, sys, os, random
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
from usearch12_tpu.cli import main as cli_main
from usearch12_tpu.config import reset_options
REF = "/tmp/usearch_ref"
random.seed(int(sys.argv[1]))
N = int(sys.argv[2])
MODE = sys.argv[3]

def run_ref(args):
    r = subprocess.run([REF] + args + ["-quiet", "-threads", "1"],
                       capture_output=True, text=True)
    return r.returncode, r.stderr

nfail = 0
for trial in range(N):
    outs_g, outs_m = {}, {}
    if MODE == "cluster":
        opts = ["-id", random.choice(["0.90", "0.95", "0.97"])]
        if random.random() < 0.4: opts += ["-sort", random.choice(["length", "size"])]
        if random.random() < 0.4: opts += ["-sizein", "-sizeout"]
        if random.random() < 0.3: opts += ["-maxaccepts", str(random.choice([1,2]))]
        if random.random() < 0.3: opts += ["-maxrejects", str(random.choice([4,16]))]
        if random.random() < 0.3: opts += ["-strand", "both"]
        if random.random() < 0.25: opts += ["-wordlength", str(random.choice([6,10]))]
        if random.random() < 0.25: opts += ["-minsize", "2"]
        if random.random() < 0.25: opts += ["-relabel", "C"]
        base = ["-cluster_fast", "/tmp/otus_in.fa"] + opts
        pairs = [("-uc", ".uc"), ("-centroids", ".fa")]
    elif MODE == "local":
        opts = ["-evalue", random.choice(["1e-6", "1e-3", "10"])]
        if random.random() < 0.4: opts += ["-strand", random.choice(["plus", "both"])]
        else: opts += ["-strand", "plus"]
        if random.random() < 0.3: opts += ["-maxaccepts", str(random.choice([1,4]))]
        if random.random() < 0.3: opts += ["-maxrejects", str(random.choice([8,32]))]
        if random.random() < 0.3: opts += ["-id", "0.8"]
        if random.random() < 0.3: opts += ["-maxhits", str(random.choice([1,3]))]
        if random.random() < 0.25: opts += ["-mincols", "40"]
        if random.random() < 0.2: opts += ["-hspw", str(random.choice([4,6]))]
        base = ["-usearch_local", "/tmp/otus_in.fa", "-db", "/tmp/otus_in.fa"] + opts
        pairs = [("-blast6out", ".b6"), ("-userout", ".uo")]
        base += ["-userfields", "query+target+id+qlo+qhi+tlo+thi+raw+bits+evalue+qstrand"]
    elif MODE == "uniq":
        opts = []
        if random.random() < 0.5: opts += ["-sizein"]
        if random.random() < 0.6: opts += ["-sizeout"]
        if random.random() < 0.4: opts += ["-relabel", "U"]
        if random.random() < 0.3: opts += ["-minuniquesize", "2"]
        if random.random() < 0.3: opts += ["-strand", "both"]
        if random.random() < 0.3: opts += ["-topn", "10"]
        base = ["-fastx_uniques", "/tmp/otus_in.fa"] + opts
        pairs = [("-fastaout", ".fa"), ("-uc", ".uc"), ("-tabbedout", ".tab")]

    gargs, margs = list(base), list(base)
    for flag, ext in pairs:
        outs_g[flag] = f"/tmp/fzg{ext}"; outs_m[flag] = f"/tmp/fzm{ext}"
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
        nfail += 1
        continue
    for flag, _ in pairs:
        gd = open(outs_g[flag]).read() if os.path.exists(outs_g[flag]) else "<none>"
        md = open(outs_m[flag]).read() if os.path.exists(outs_m[flag]) else "<none>"
        if gd != md:
            print(f"[{trial}] DIVERGED {flag}: {' '.join(opts)}")
            nfail += 1
            break
print(f"fuzz {MODE} done: {nfail} failures / {N}")

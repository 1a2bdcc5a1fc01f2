import numpy as np, subprocess, sys
fails = 0
rng = np.random.default_rng(2024)
def rs(n, alpha="ACGT", p_low=0.0):
    out=[]
    for j in rng.integers(0, len(alpha), n):
        c = alpha[int(j)]
        if p_low and rng.random() < p_low: c = c.lower()
        out.append(c)
    return "".join(out)
def run_pair(refcmd, mycmd, outs, tag):
    global fails
    r = subprocess.run(f"/tmp/usearch_ref_test {refcmd} -quiet -threads 1", shell=True, capture_output=True)
    m = subprocess.run(f"python -m usearch12_tpu.cli {mycmd} -quiet -threads 1", shell=True, capture_output=True)
    if r.returncode != 0:
        return  # reference errored; skip (we don't match error text)
    if m.returncode != 0:
        print("RC", tag, m.stderr[-200:].decode()); fails += 1; return
    for a, b in outs:
        try:
            da, db = open(a,"rb").read(), open(b,"rb").read()
        except OSError:
            print("MISSING", tag, a); fails += 1; return
        if da != db:
            print("DIFF", tag, a); fails += 1; return

for t in range(25):
    # very short seqs mixed with normal, lowercase, N runs
    n = int(rng.integers(2, 25))
    with open("e_db.fa","w") as f:
        for i in range(n):
            L = int(rng.choice([3,5,7,8,9,12,30,80,200]))
            f.write(f">t{i};size={int(rng.integers(1,50))};\n{rs(L,'ACGTN',0.2)}\n")
    with open("e_q.fa","w") as f:
        for i in range(int(rng.integers(1, 15))):
            L = int(rng.choice([2,6,8,10,25,100,250]))
            f.write(f">q{i}\n{rs(L,'ACGT',0.1)}\n")
    idv = rng.choice(["0.5","0.8","0.97"])
    run_pair(f"-usearch_global e_q.fa -db e_db.fa -id {idv} -strand plus -blast6out r.b6 -uc r.uc",
             f"-usearch_global e_q.fa -db e_db.fa -id {idv} -strand plus -blast6out m.b6 -uc m.uc",
             [("r.b6","m.b6"),("r.uc","m.uc")], f"global{t}")
    run_pair(f"-cluster_fast e_db.fa -id {idv} -centroids r.fa -uc r.uc -sizein -sizeout",
             f"-cluster_fast e_db.fa -id {idv} -centroids m.fa -uc m.uc -sizein -sizeout",
             [("r.fa","m.fa"),("r.uc","m.uc")], f"cluster{t}")
    run_pair("-fastx_uniques e_db.fa -fastaout r.fa -sizein -sizeout -uc r.uc",
             "-fastx_uniques e_db.fa -fastaout m.fa -sizein -sizeout -uc m.uc",
             [("r.fa","m.fa"),("r.uc","m.uc")], f"uniq{t}")
print("fails:", fails)

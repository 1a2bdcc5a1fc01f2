import numpy as np, subprocess
fails = 0
rng = np.random.default_rng(77)
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
    if r.returncode != 0:
        return
    m = subprocess.run(f"python -m usearch12_tpu.cli {mycmd} -quiet -threads 1", shell=True, capture_output=True)
    if m.returncode != 0:
        print("RC", tag, m.stderr[-200:].decode()); fails += 1; return
    for a, b in outs:
        if open(a,"rb").read() != open(b,"rb").read():
            print("DIFF", tag, a); fails += 1; return

for t in range(15):
    # unoise/uchime with extreme-length amplicons
    n = int(rng.integers(3, 20))
    recs = []
    for i in range(n):
        L = int(rng.choice([4,8,9,15,40,120,300]))
        recs.append((f"a{i};size={int(rng.integers(1,900))};", rs(L,"ACGTN",0.1)))
    recs.sort(key=lambda r: -int(r[0].split("size=")[1].rstrip(";")))
    with open("x.fa","w") as f:
        for l,s in recs: f.write(f">{l}\n{s}\n")
    run_pair("-unoise3 x.fa -zotus r.fa -tabbedout r.tab",
             "-unoise3 x.fa -zotus m.fa -tabbedout m.tab",
             [("r.fa","m.fa"),("r.tab","m.tab")], f"unoise{t}")
    run_pair("-uchime3_denovo x.fa -uchimeout r.tab -nonchimeras r.fa",
             "-uchime3_denovo x.fa -uchimeout m.tab -nonchimeras m.fa",
             [("r.tab","m.tab"),("r.fa","m.fa")], f"uchime{t}")
    run_pair("-cluster_otus x.fa -otus r.fa -uparseout r.up -minsize 1",
             "-cluster_otus x.fa -otus m.fa -uparseout m.up -minsize 1",
             [("r.fa","m.fa"),("r.up","m.up")], f"uparse{t}")
    # fastq edge lengths
    with open("x.fq","w") as f:
        for i in range(int(rng.integers(2, 12))):
            L = int(rng.choice([1,2,5,8,30,100]))
            s=rs(L); q="".join(chr(33+int(x)) for x in rng.integers(2,41,L))
            f.write(f"@r{i}\n{s}\n+\n{q}\n")
    run_pair("-fastq_filter x.fq -fastqout r.fq -fastq_maxee 1.0 -fastaout r.fa",
             "-fastq_filter x.fq -fastqout m.fq -fastq_maxee 1.0 -fastaout m.fa",
             [("r.fq","m.fq"),("r.fa","m.fa")], f"filter{t}")
    run_pair("-fastx_truncate x.fq -trunclen 5 -fastqout r.fq",
             "-fastx_truncate x.fq -trunclen 5 -fastqout m.fq",
             [("r.fq","m.fq")], f"trunc{t}")
print("fails:", fails)

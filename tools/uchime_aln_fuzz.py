import numpy as np, subprocess, sys
fails=0
for seed in range(20):
    rng = np.random.default_rng(seed)
    def rs(n): return "".join("ACGT"[i] for i in rng.integers(0,4,n))
    npar = int(rng.integers(3,8)); L=int(rng.integers(120,400))
    parents=[rs(L) for _ in range(npar)]
    seqs=[(f"P{i};size={2000-i*100};",p) for i,p in enumerate(parents)]
    for k in range(int(rng.integers(4,12))):
        a,b=rng.integers(0,npar,2)
        if a==b: b=(b+1)%npar
        cut=int(rng.integers(L//4,3*L//4))
        s=parents[a][:cut]+parents[b][cut:]
        nmut=int(rng.integers(0,3))
        s=list(s)
        for pos in rng.integers(0,L,nmut): s[int(pos)]="ACGT"[int(rng.integers(0,4))]
        seqs.append((f"C{k};size={int(rng.integers(1,60))};","".join(s)))
    seqs.sort(key=lambda t:-int(t[0].split("size=")[1].rstrip(";")))
    with open("uf_in.fa","w") as f:
        for l,s in seqs: f.write(f">{l}\n{s}\n")
    subprocess.run("/tmp/usearch_ref_test -uchime3_denovo uf_in.fa -uchimeout r.tab -alnout r.aln -quiet -threads 1",shell=True,check=True,capture_output=True)
    subprocess.run("python -m usearch12_tpu.cli -uchime3_denovo uf_in.fa -uchimeout m.tab -alnout m.aln -quiet -threads 1",shell=True,check=True,capture_output=True)
    ok = open("r.tab","rb").read()==open("m.tab","rb").read() and open("r.aln","rb").read()==open("m.aln","rb").read()
    if not ok: fails+=1; print("seed",seed,"DIFF")
print("fails:",fails)

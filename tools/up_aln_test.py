import numpy as np, subprocess
fails=0
for seed in range(15):
    rng=np.random.default_rng(seed+300)
    def rs(n): return "".join("ACGT"[i] for i in rng.integers(0,4,n))
    npar=int(rng.integers(3,7)); L=int(rng.integers(150,350))
    parents=[rs(L) for _ in range(npar)]
    seqs=[(f"P{i};size={5000-i*200};",p) for i,p in enumerate(parents)]
    k=0
    for _ in range(int(rng.integers(6,14))):
        r=rng.random()
        if r<0.5:
            a,b=rng.integers(0,npar,2)
            if a==b: b=(b+1)%npar
            cut=int(rng.integers(L//4,3*L//4))
            s=list(parents[a][:cut]+parents[b][cut:])
        else:
            s=list(parents[int(rng.integers(0,npar))])
        for pos in rng.integers(0,L,int(rng.integers(0,6))):
            s[int(pos)]="ACGT"[int(rng.integers(0,4))]
        seqs.append((f"C{k};size={int(rng.integers(2,80))};","".join(s))); k+=1
    seqs.sort(key=lambda t:-int(t[0].split("size=")[1].rstrip(";")))
    with open("up_in.fa","w") as f:
        for l,s in seqs: f.write(f">{l}\n{s}\n")
    subprocess.run("/tmp/usearch_ref_test -cluster_otus up_in.fa -otus r_otus.fa -uparseout r.up -uparsealnout r.aln -quiet -threads 1",shell=True,check=True,capture_output=True)
    m=subprocess.run("python -m usearch12_tpu.cli -cluster_otus up_in.fa -otus m_otus.fa -uparseout m.up -uparsealnout m.aln -quiet -threads 1",shell=True,capture_output=True)
    if m.returncode: print("RC",seed,m.stderr[-300:]); fails+=1; continue
    for a,b in [("r_otus.fa","m_otus.fa"),("r.up","m.up"),("r.aln","m.aln")]:
        if open(a,"rb").read()!=open(b,"rb").read():
            print("DIFF",seed,a); fails+=1; break
print("fails:",fails)

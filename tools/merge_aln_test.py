import numpy as np, subprocess
fails=0
for seed in range(12):
    rng=np.random.default_rng(seed+700)
    n=int(rng.integers(5,30))
    with open("mr1.fq","w") as f1, open("mr2.fq","w") as f2:
        for i in range(n):
            L=int(rng.integers(80,200))
            frag="".join("ACGT"[j] for j in rng.integers(0,4,L))
            r1len=int(rng.integers(50,min(150,L)))
            r2len=int(rng.integers(50,min(150,L)))
            r1=frag[:r1len]
            comp={"A":"T","C":"G","G":"C","T":"A"}
            r2="".join(comp[c] for c in reversed(frag[-r2len:]))
            # mutations
            r1=list(r1); r2=list(r2)
            for pos in rng.integers(0,len(r1),int(rng.integers(0,4))): r1[int(pos)]="ACGT"[int(rng.integers(0,4))]
            q1="".join(chr(33+int(x)) for x in rng.integers(10,41,len(r1)))
            q2="".join(chr(33+int(x)) for x in rng.integers(10,41,len(r2)))
            f1.write(f"@r{i} 1\n{''.join(r1)}\n+\n{q1}\n")
            f2.write(f"@r{i} 2\n{''.join(r2)}\n+\n{q2}\n")
    subprocess.run("/tmp/usearch_ref_test -fastq_mergepairs mr1.fq -reverse mr2.fq -fastqout rm.fq -alnout rm.aln -eetabbedout rm.ee -quiet -threads 1",shell=True,check=True,capture_output=True)
    m=subprocess.run("python -m usearch12_tpu.cli -fastq_mergepairs mr1.fq -reverse mr2.fq -fastqout mm.fq -alnout mm.aln -eetabbedout mm.ee -quiet -threads 1",shell=True,capture_output=True)
    if m.returncode: print("RC",seed,m.stderr[-300:]); fails+=1; continue
    for a,b in [("rm.fq","mm.fq"),("rm.aln","mm.aln"),("rm.ee","mm.ee")]:
        if open(a,"rb").read()!=open(b,"rb").read():
            print("DIFF",seed,a); fails+=1; break
print("fails:",fails)

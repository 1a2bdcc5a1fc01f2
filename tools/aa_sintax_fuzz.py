import numpy as np, subprocess
fails=0
for seed in range(10):
    rng=np.random.default_rng(seed+900)
    AA="ACDEFGHIKLMNPQRSTVWY"
    n=int(rng.integers(4,20))
    seqs=[ "".join(AA[int(j)] for j in rng.integers(0,20,int(rng.integers(80,300)))) for _ in range(n)]
    with open("sa_db.fa","w") as f:
        for i,s in enumerate(seqs):
            f.write(f">p{i};tax=d:D{i%2},p:P{i%4},g:G{i};\n{s}\n")
    with open("sa_q.fa","w") as f:
        for i in range(int(rng.integers(3,10))):
            s=list(seqs[int(rng.integers(0,n))])
            for pos in rng.integers(0,len(s),int(rng.integers(0,len(s)//8))):
                s[int(pos)]=AA[int(rng.integers(0,20))]
            f.write(f">q{i}\n{''.join(s)}\n")
    cut=float(rng.choice([0.5,0.8,0.9]))
    subprocess.run(f"/tmp/usearch_ref_test -sintax sa_q.fa -db sa_db.fa -tabbedout r.tx -sintax_cutoff {cut} -quiet -threads 1",shell=True,check=True,capture_output=True)
    m=subprocess.run(f"python -m usearch12_tpu.cli -sintax sa_q.fa -db sa_db.fa -tabbedout m.tx -sintax_cutoff {cut} -quiet -threads 1",shell=True,capture_output=True)
    if m.returncode: print("RC",seed,m.stderr[-200:]); fails+=1; continue
    if open("r.tx","rb").read()!=open("m.tx","rb").read():
        print("DIFF",seed); fails+=1
print("fails:",fails)

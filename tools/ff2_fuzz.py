import numpy as np, subprocess
fails=0
for seed in range(15):
    rng=np.random.default_rng(seed+100)
    n=int(rng.integers(5,40))
    with open("r1.fq","w") as f1, open("r2.fq","w") as f2:
        for i in range(n):
            L=int(rng.integers(30,120))
            for f,tag in ((f1,"1"),(f2,"2")):
                s="".join(np.array(list("ACGTN"))[rng.integers(0,5 if rng.random()<0.3 else 4,L)])
                q="".join(chr(33+int(x)) for x in rng.integers(2,41,L))
                f.write(f"@read{i} {tag}\n{s}\n+\n{q}\n")
    maxee = float(rng.choice([0.5,1.0,2.0]))
    ref=f"/tmp/usearch_ref_test -fastq_filter2 r1.fq -reverse r2.fq -fastqout rf1.fq -output2 rf2.fq -fastq_maxee {maxee} -quiet -threads 1"
    mine=f"python -m usearch12_tpu.cli -fastq_filter2 r1.fq -reverse r2.fq -fastqout mf1.fq -output2 mf2.fq -fastq_maxee {maxee} -quiet -threads 1"
    subprocess.run(ref,shell=True,check=True,capture_output=True)
    subprocess.run(mine,shell=True,check=True,capture_output=True)
    ok = open("rf1.fq","rb").read()==open("mf1.fq","rb").read() and open("rf2.fq","rb").read()==open("mf2.fq","rb").read()
    if not ok: fails+=1; print("seed",seed,"DIFF")
print("fails:",fails)

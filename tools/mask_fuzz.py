import numpy as np, subprocess
fails=0
AA="ACDEFGHIKLMNPQRSTVWYBZXbzx"
NT="ACGTNacgtn"
for seed in range(25):
    rng=np.random.default_rng(seed+500)
    nucleo = seed % 2 == 0
    alpha = NT if nucleo else AA
    n=int(rng.integers(3,30))
    with open("mf.fa","w") as f:
        for i in range(n):
            parts=[]
            tgt=int(rng.integers(20,600))
            while sum(len(p) for p in parts) < tgt:
                r=rng.random()
                if r<0.25: parts.append(alpha[int(rng.integers(0,len(alpha)))]*int(rng.integers(2,20)))
                elif r<0.45:
                    d="".join(alpha[int(j)] for j in rng.integers(0,len(alpha),int(rng.integers(2,4))))
                    parts.append(d*int(rng.integers(2,10)))
                else: parts.append("".join(alpha[int(j)] for j in rng.integers(0,len(alpha),int(rng.integers(4,30)))))
            f.write(f">s{i}\n{''.join(parts)[:tgt]}\n")
    masks = ["fastnucleo","dust"] if nucleo else ["fastamino","seg"]
    for mk in masks:
        for hm in ("","-hardmask"):
            r=subprocess.run(f"/tmp/usearch_ref_test -makeudb_usearch mf.fa -output r.udb -dbmask {mk} {hm} -quiet -threads 1",shell=True,capture_output=True)
            m=subprocess.run(f"python -m usearch12_tpu.cli -makeudb_usearch mf.fa -output m.udb -dbmask {mk} {hm} -quiet -threads 1",shell=True,capture_output=True)
            if r.returncode or m.returncode:
                print("RC",seed,mk,hm,r.returncode,m.returncode,m.stderr[-200:]); fails+=1; continue
            if open("r.udb","rb").read()!=open("m.udb","rb").read():
                print("DIFF",seed,mk,hm); fails+=1
print("fails:",fails)

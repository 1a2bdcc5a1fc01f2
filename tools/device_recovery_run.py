"""Poll the tunneled TPU; on recovery run the device evidence suite.

Probes every ~4 min (30s-capped child).  On the first successful probe:
  1. kernel sweep (bench.bench_kernel_device) -> TPU_EVIDENCE.jsonl
  2. TPU test tier (bench.run_tpu_test_tier)   -> TPU_EVIDENCE.jsonl
  3. device ablation (bench.bench_device_ablation, interleaved legs)
then exits 0.  Exits 3 on deadline without recovery.

Usage: python tools/device_recovery_run.py [deadline_seconds]
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))


def main():
    deadline = time.time() + (float(sys.argv[1]) if len(sys.argv) > 1
                              else 6 * 3600)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(HERE, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    while time.time() < deadline:
        ok, cause = bench._device_reachable()
        stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        if ok:
            print(f"{stamp} RECOVERED — collecting evidence", flush=True)
            kern, kc = bench.bench_kernel_device()
            if kern is not None:
                bench._log_tpu_evidence("kernel_sweep", kern)
            print("kernel:", json.dumps(kern) if kern else kc, flush=True)
            tier = bench.run_tpu_test_tier()
            if tier.startswith("pass:"):
                bench._log_tpu_evidence("tpu_test_tier", tier)
            print("tier:", tier, flush=True)
            try:
                import tempfile
                d = tempfile.mkdtemp(prefix="usearch_abl_")
                ref = bench._prepare_ref()
                abl = bench.bench_device_ablation(ref, d)
                if any(isinstance(v, dict) and v.get("device_used")
                       for v in abl.values()):
                    bench._log_tpu_evidence("device_ablation", abl)
                print("ablation:", json.dumps(abl), flush=True)
            except Exception as e:  # noqa: BLE001
                print("ablation failed:", repr(e)[:300], flush=True)
            return 0
        print(f"{stamp} still down: {cause}", flush=True)
        time.sleep(240)
    print("deadline reached without recovery", flush=True)
    return 3


if __name__ == "__main__":
    sys.exit(main())

"""Worker process for tests/test_multihost.py: one simulated host with
4 virtual CPU devices, joined via jax.distributed.

usage: multihost_worker.py <pid> <nproc> <port> <query.fa> <db.fa> <out>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
q_fa, db_fa, out = sys.argv[4], sys.argv[5], sys.argv[6]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from usearch12_tpu.parallel.multihost import init_multihost  # noqa: E402

init_multihost(coordinator=f"127.0.0.1:{port}", num_processes=nproc,
               process_id=pid, platform="cpu")

from usearch12_tpu.cli import parse_argv  # noqa: E402

parse_argv(["-usearch_global", q_fa, "-db", db_fa, "-id", "0.9",
            "-strand", "plus", "-quiet"])

from usearch12_tpu.parallel.multihost import multihost_search  # noqa: E402

stats = multihost_search(q_fa, db_fa, out, topk=32, window=16)
print(f"[{pid}] done {stats}", flush=True)

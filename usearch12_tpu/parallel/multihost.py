"""Multi-host scaffolding: jax.distributed init + host-sharded search.

The reference is strictly single-process (SURVEY.md §2.2); this module
is the DCN story of the TPU-native rebuild:

  - `init_multihost()` wires `jax.distributed.initialize` from either
    explicit arguments or the standard env vars, giving every process a
    view of the GLOBAL device set.
  - Meshes are laid out host-major: the "db" (posting-shard) axis maps
    to devices within a host (collectives ride ICI), while the "data"
    (query-batch) axis spans hosts (only all_gathers of tiny top-K
    tuples cross DCN).
  - `multihost_search()` runs the mesh-sharded ranking step
    (parallel/mesh_search.py) with each host feeding its own query
    slice; per-host outputs concatenate in process order, so the bytes
    equal a single-process run over the concatenated input.

Testable without hardware: two local processes x 4 virtual CPU devices
(tests/test_multihost.py launches the companion worker below).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   platform: Optional[str] = None) -> None:
    """Initialize jax.distributed.  Arguments default to the standard
    env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID); no-op when num_processes <= 1 and no coordinator
    is configured."""
    import jax
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if platform:
        # must be set before backend init; overrides plugin autoload
        jax.config.update("jax_platforms", platform)
    if coordinator is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def host_major_mesh(db_per_host: Optional[int] = None):
    """Mesh(data x db) with the db axis inside each host (ICI) and the
    data axis across hosts (DCN)."""
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    n_proc = jax.process_count()
    per_host = len(devs) // n_proc
    if db_per_host is None:
        db_per_host = per_host
    assert per_host % db_per_host == 0
    data = len(devs) // db_per_host
    arr = np.array(devs).reshape(data, db_per_host)
    return Mesh(arr, ("data", "db"))


def multihost_search(query_path: str, db_path: str, out_path: str,
                     min_id: float, topk: int = 64,
                     window: int = 2048) -> dict:
    """usearch_global with the ranking sharded over the global mesh and
    each host searching its own query stripe (round-robin by record
    block).  Every process runs the same jit programs (SPMD); process 0
    concatenates the per-host blast6 stripes into out_path."""
    import jax
    from ..config import options
    from ..io.seqdb import SeqDB
    from ..engine.batch import BatchEngine
    from ..engine.emit import Blast6Emitter
    from .mesh_search import mesh_search_file

    o = options()
    pid = jax.process_index()
    n_proc = jax.process_count()
    db = SeqDB.from_fastx(db_path)
    db.mask()
    mesh = host_major_mesh()

    # host-side query-source sharding: split the query file into
    # contiguous stripes, one per process (SeqSource sharding)
    from ..engine.batch import _FastaWindows
    win = _FastaWindows(query_path)
    n = win.n
    per = (n + n_proc - 1) // n_proc
    lo, hi = pid * per, min(n, (pid + 1) * per)
    stripe = f"{out_path}.stripe{pid}.fa"
    with open(stripe, "w") as f:
        buf = win.buf
        for i in range(lo, hi):
            lbl = bytes(buf[win.lbl_off[i]:win.lbl_end[i]]).decode("latin1")
            seq = bytes(win.seq(i)).decode("latin1")
            f.write(f">{lbl}\n{seq}\n")

    part = f"{out_path}.part{pid}"
    fpart = open(part, "w")
    emitter = Blast6Emitter(fpart, db, o.flag("output_no_hits"))
    stats = mesh_search_file(stripe, db, mesh, lambda *a: None,
                             fast_emit=emitter.emit, topk=topk,
                             window=window)
    fpart.close()

    # barrier, then process 0 splices the stripes in order
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("usearch_multihost_done")
    if pid == 0:
        with open(out_path, "wb") as out:
            for p in range(n_proc):
                with open(f"{out_path}.part{p}", "rb") as f:
                    out.write(f.read())
    multihost_utils.sync_global_devices("usearch_multihost_merged")
    return stats

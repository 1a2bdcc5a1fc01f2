"""usearch12_tpu — TPU-native sequence search & clustering engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of USEARCH 12
(rcedgar/usearch12): UDB k-mer indexed global/local search with USORT
word-count candidate ranking, banded affine Needleman-Wunsch alignment as a
Pallas TPU kernel, greedy UCLUST clustering, UNOISE3 denoising, UCHIME3
chimera detection, SINTAX taxonomy, and FASTQ preprocessing.

Architecture (TPU-first, not a port):
  - Alignment / word-counting hot loops run as batched fixed-shape device
    kernels (Pallas banded DP over pair batches; one-hot/segment-sum word
    counting on the MXU).
  - Host side streams sequences, buckets them into fixed-shape batches,
    applies accept/terminate logic (exact reference semantics, computed as a
    prefix over speculatively-aligned candidates) and writes output formats.
  - Multi-chip scaling shards the UDB postings / target set over a
    jax.sharding.Mesh; per-shard top candidates merge with deterministic
    tie-breaking (lowest target index first) so greedy semantics and outputs
    are reproducible.
"""

__version__ = "0.1.0"

# An explicit host-only JAX_PLATFORMS env (tests, the driver's
# dryrun_multichip) must win over a site hook that force-registers the
# tunneled accelerator plugin — see device.honor_env_platforms.
from .device import install_env_platform_guard as _guard  # noqa: E402

_guard()
del _guard

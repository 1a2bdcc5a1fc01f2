"""Lazy accelerator-runtime bootstrap.

Interpreter startup in tunneled-accelerator environments pays ~0.7 s of
PJRT plugin registration (a site hook) before main() runs — about 20%
of an amplicon-scale usearch_global command whose DP the adaptive gate
keeps on the host anyway.  The CLI launcher (bin/usearch) stashes the
accelerator pool address into USEARCH_STASH_POOL_IPS and clears the
live variable so interpreter startup skips registration; code paths
that actually engage the device call ensure_device_runtime() first,
which restores the env and performs the registration exactly once.

On hosts with directly-attached TPUs there is no site hook and nothing
stashed; jax's own lazy backend init applies and both calls are no-ops.

JAX_PLATFORMS is deliberately left untouched: with the plugin
unregistered, a stray jax dispatch on a device-capable command raises
"unknown backend" loudly instead of silently computing on CPU.

Reference analog: a static binary with zero startup
(src/usearch_main.cpp) — this recovers that for the common case.
"""

from __future__ import annotations

import os

_STASH = "USEARCH_STASH_POOL_IPS"
_LIVE = "PALLAS_AXON_POOL_IPS"
_done = [False]


def _stashed() -> bool:
    return bool(os.environ.get(_STASH)) and not os.environ.get(_LIVE)


def device_env() -> dict:
    """Environment for subprocess device probes/children: the
    launcher's stashed accelerator address restored."""
    env = dict(os.environ)
    if env.get(_STASH) and not env.get(_LIVE):
        env[_LIVE] = env[_STASH]
    return env


def ensure_device_runtime() -> None:
    """Restore the launcher's stashed accelerator env and register the
    PJRT plugin in-process (idempotent).  Must run before any in-process
    jax backend init on paths that want the real device."""
    if _done[0]:
        return
    _done[0] = True
    if not _stashed():
        return
    os.environ[_LIVE] = os.environ[_STASH]
    try:
        import importlib
        import sitecustomize
        # the startup import saw the cleared env and did nothing;
        # re-running it now performs the registration it skipped
        importlib.reload(sitecustomize)
    except ImportError:
        pass  # no site hook: jax registers its backend lazily itself

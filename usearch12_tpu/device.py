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


def honor_env_platforms() -> None:
    """Make an explicit host-only JAX_PLATFORMS env selection (e.g.
    "cpu" for the virtual-mesh test/dryrun tier) effective even under a
    site hook that force-registers a tunneled accelerator plugin and
    rewrites the live jax config to "axon,cpu" at interpreter start.
    Without this, any bare `python` child (pytest subprocess, the
    driver's dryrun_multichip) that touches jax initializes the
    accelerator backend the user explicitly excluded — and hangs
    un-interruptibly when the tunnel is wedged.  No-op unless the env
    names only host platforms and jax is already imported."""
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if not want:
        return
    allowed = {p.strip() for p in want.split(",") if p.strip()}
    if allowed & {"axon", "tpu", "cuda", "rocm", "auto", ""}:
        return
    import sys
    if "jax" not in sys.modules:
        return
    try:
        import jax
        from jax._src import xla_bridge as xb
        if jax.config.jax_platforms != want:
            if xb.backends_are_initialized():
                from jax.extend.backend import clear_backends
                clear_backends()
            jax.config.update("jax_platforms", want)
        # NOTE: do NOT pop foreign entries from xb._backend_factories —
        # is_known_platform()/known_platforms() read them, and Pallas
        # registers "tpu"-platform MLIR rules lazily even on CPU runs
        # (raises NotImplementedError if the platform vanishes).  The
        # jax_platforms config alone keeps backends() from initializing
        # anything outside `want`.
    except Exception:
        pass


class _JaxLoaderProxy:
    """Wraps jax's module loader to run honor_env_platforms() right
    after jax finishes importing (post-import hook)."""

    def __init__(self, loader):
        self._loader = loader

    def create_module(self, spec):
        return self._loader.create_module(spec)

    def exec_module(self, module):
        self._loader.exec_module(module)
        honor_env_platforms()

    def __getattr__(self, name):
        return getattr(self._loader, name)


class _JaxPostImportFinder:
    """meta_path finder that intercepts the first `import jax` and
    chains honor_env_platforms() onto its loader."""

    _busy = False

    def find_spec(self, fullname, path=None, target=None):
        if fullname != "jax" or _JaxPostImportFinder._busy:
            return None
        _JaxPostImportFinder._busy = True
        try:
            import importlib.util
            spec = importlib.util.find_spec(fullname)
        finally:
            _JaxPostImportFinder._busy = False
        if spec is None or spec.loader is None:
            return None
        import sys
        try:
            sys.meta_path.remove(self)
        except ValueError:
            pass
        spec.loader = _JaxLoaderProxy(spec.loader)
        return spec


def install_env_platform_guard() -> None:
    """Idempotently arrange for honor_env_platforms() to run as soon as
    jax is importable/imported (called from the package __init__)."""
    import sys
    if "jax" in sys.modules:
        honor_env_platforms()
        return
    if not any(isinstance(f, _JaxPostImportFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _JaxPostImportFinder())


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

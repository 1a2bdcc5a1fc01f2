import os
import sys

# Virtual 8-device CPU mesh for sharding tests; must be set before jax
# import.  Forced (not setdefault): the environment profile exports
# JAX_PLATFORMS=axon, which would silently run the whole suite over the
# tunneled TPU (slow, flaky, 1 device).  TPU hardware coverage comes from
# the USEARCH_TPU_TESTS=1 tier (run by bench.py against the real chip)
# plus the driver's dryrun.
if os.environ.get("USEARCH_TPU_TESTS") != "1":
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    # a sitecustomize may have imported jax at interpreter start and
    # captured JAX_PLATFORMS=<accelerator> into the live config — the
    # env overrides above would then be ineffective and the whole CPU
    # suite would try to initialize (and, on a wedged tunnel, hang on)
    # the accelerator plugin.  The package guard rewrites the live
    # config to match the env (and hooks jax's import if it hasn't
    # happened yet); see usearch12_tpu/device.py:honor_env_platforms.
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from usearch12_tpu.device import install_env_platform_guard
    install_env_platform_guard()


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REF_BIN_SRC = "/root/reference/tmp/usearch_linux_x86_12.0-beta"
REF_BIN = "/tmp/usearch_ref_test"


@pytest.fixture(scope="session")
def ref_bin():
    """Executable copy of the reference binary (skip if unavailable)."""
    import shutil
    import stat
    if not os.path.exists(REF_BIN):
        if not os.path.exists(REF_BIN_SRC):
            pytest.skip("reference binary not available")
        shutil.copy(REF_BIN_SRC, REF_BIN)
        os.chmod(REF_BIN, os.stat(REF_BIN).st_mode | stat.S_IXUSR)
    return REF_BIN


@pytest.fixture(scope="session")
def amplicons_fa(tmp_path_factory):
    from tests.genseqs import make_amplicons, write_fasta
    path = str(tmp_path_factory.mktemp("data") / "amplicons.fa")
    write_fasta(path, make_amplicons())
    return path


@pytest.fixture(scope="session")
def amplicons_small_fa(tmp_path_factory):
    from tests.genseqs import make_amplicons, write_fasta
    path = str(tmp_path_factory.mktemp("data") / "amplicons_small.fa")
    write_fasta(path, make_amplicons(n_templates=6, reads_per_template=5,
                                     seed=11))
    return path


@pytest.fixture(autouse=True)
def fresh_options():
    from usearch12_tpu.config import reset_options
    reset_options()
    yield

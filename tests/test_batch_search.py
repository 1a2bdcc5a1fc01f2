"""Device-batched search path vs the serial host driver (byte equality).

Needs a real TPU (wavefront kernel in interpret mode is too slow) or
USEARCH_SLOW_TESTS=1.
"""

import os

import pytest

from usearch12_tpu.cli import main as cli_main


def _have_tpu():
    if os.environ.get("USEARCH_SLOW_TESTS") == "1":
        return True
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _have_tpu(), reason="needs TPU backend or USEARCH_SLOW_TESTS=1")


@pytest.mark.parametrize("extra", [
    ["-strand", "plus"],
    ["-strand", "both", "-maxaccepts", "2", "-maxrejects", "8"],
])
def test_batch_search_matches_host(amplicons_small_fa, tmp_path, extra):
    d_b6, h_b6 = str(tmp_path / "d.b6"), str(tmp_path / "h.b6")
    base = ["-usearch_global", amplicons_small_fa, "-db",
            amplicons_small_fa, "-id", "0.9"] + extra
    assert cli_main(base + ["-blast6out", d_b6, "-use_device",
                            "-quiet"]) == 0
    assert cli_main(base + ["-blast6out", h_b6, "-quiet"]) == 0
    assert open(d_b6).read() == open(h_b6).read()

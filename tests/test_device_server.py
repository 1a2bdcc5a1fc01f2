"""Resident device-kernel server (device_server.py): protocol,
lifecycle, and alignment parity against the oracle, all on CPU
(interpret-mode pallas) so the test needs no accelerator."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

from usearch12_tpu import device_server as ds
from usearch12_tpu.align.oracle import banded_nw_main_diag
from usearch12_tpu.scoring import AlnParams

CONV = np.frombuffer(b"ACGT", np.uint8)


@pytest.fixture
def server(tmp_path):
    sock = str(tmp_path / "srv.sock")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["USEARCH_DEV_SERVER_CPU"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "usearch12_tpu.device_server",
         "--sock", sock, "--idle", "60"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    cli = ds.DeviceServerClient(sock, timeout=300.0)
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        try:
            cli.ping()
            break
        except ds.DeviceServerError:
            if proc.poll() is not None:
                raise RuntimeError(
                    "server died: " + proc.stdout.read().decode())
            time.sleep(0.2)
    else:
        proc.kill()
        raise RuntimeError("server never came up")
    yield cli
    cli.shutdown()
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def test_ping_and_align_parity(server):
    rep = server.ping()
    assert rep["ok"] and rep["backend"] == "interpret"
    ap = AlnParams.from_cmdline(nucleo=True)
    rng = np.random.default_rng(3)
    pairs = []
    for _ in range(5):
        a = CONV[rng.integers(0, 4, 60)]
        b = a.copy()
        b[rng.integers(0, 60, 6)] = CONV[rng.integers(0, 4, 6)]
        pairs.append((a, b))
    scores, paths = server.align(ap, 0, 8, True, pairs)
    assert len(paths) == 5
    for (a, b), s, p in zip(pairs, scores, paths):
        s0, p0 = banded_nw_main_diag(a, b, 8, ap)
        assert p == p0
        assert float(s) == s0


def test_server_class_aligner_facade(server):
    ap = AlnParams.from_cmdline(nucleo=True)
    fa = ds.ServerClassAligner(server, ap, cls_bits=0)
    a = CONV[np.arange(40) % 4]
    b = a.copy()
    b[7] = CONV[(int(b[7]) + 1) % 4]
    scores, paths = fa.align([(a, b)], 8, nucleo=True)
    s0, p0 = banded_nw_main_diag(a, b, 8, ap)
    assert paths[0] == p0 and float(scores[0]) == s0


def test_bad_op_and_error_reply(server):
    with pytest.raises(ds.DeviceServerError):
        server._request({"op": "nope"})
    # server survives a bad request
    assert server.ping()["ok"]


def test_get_client_none_when_disabled(monkeypatch, tmp_path):
    monkeypatch.setenv("USEARCH_DEV_SERVER", "0")
    assert ds.get_client(spawn=True) is None


def test_get_client_no_spawn_when_absent(monkeypatch, tmp_path):
    monkeypatch.delenv("USEARCH_DEV_SERVER", raising=False)
    monkeypatch.setattr(ds, "SOCK", str(tmp_path / "none.sock"))
    assert ds.get_client(spawn=False) is None

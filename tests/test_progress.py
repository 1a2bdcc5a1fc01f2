"""Background progress-thread behavior (reference:
src/progress.cpp:395-413 — a detached thread repaints from shared
counters while workers compute; tick() itself does no IO)."""

import io
import sys
import time

from usearch12_tpu import progress


class _FakeTTY(io.StringIO):
    def isatty(self):
        return True


def test_painter_thread_repaints_without_ticks(monkeypatch):
    buf = _FakeTTY()
    monkeypatch.setattr(sys, "stderr", buf)
    monkeypatch.setattr(progress, "_enabled", lambda: True)
    progress.start("Working")
    progress.tick(3, 10)
    # no further ticks: the painter thread alone must keep repainting
    # (the reference's heartbeat while a worker is stuck in a long call)
    time.sleep(0.7)
    progress.done("ok")
    out = buf.getvalue()
    assert out.startswith("Working")
    assert " 30.0%" in out          # painted from stored counters
    assert out.count("\r") >= 2     # repainted more than once
    assert out.rstrip().endswith("Working 100.0% ok")


def test_tick_does_no_io(monkeypatch):
    buf = _FakeTTY()
    monkeypatch.setattr(sys, "stderr", buf)
    monkeypatch.setattr(progress, "_enabled", lambda: True)
    progress.start("Scan")
    base = len(buf.getvalue())
    for i in range(1000):
        progress.tick(i, 1000)
    # ticks store counters only; any growth comes from the painter
    # thread's <=0.2s cadence, not from the 1000 tick calls
    grown = len(buf.getvalue()) - base
    assert grown < 200
    progress.done()


def test_disabled_when_not_tty(monkeypatch):
    buf = io.StringIO()   # isatty() -> False
    monkeypatch.setattr(sys, "stderr", buf)
    progress.start("Hidden")
    progress.tick(1, 2)
    progress.done()
    assert buf.getvalue() == ""

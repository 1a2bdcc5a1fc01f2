"""Progress/status lines on stderr (the reference's progress thread,
src/progress.cpp — here a lightweight synchronous variant).

Work loops call `start(msg)` / `tick(done, total)` / `done(summary)`;
everything is suppressed under -quiet (like the reference, progress goes
to stderr and never affects file outputs).  Ticks repaint one line in
place at most every 0.1 s.
"""

from __future__ import annotations

import sys
import time

from .config import options

_active = False
_label = ""
_last = 0.0


def _enabled() -> bool:
    """Progress repaints only make sense on a terminal; suppress them
    under -quiet and when stderr is redirected to a file or pipe."""
    try:
        tty = sys.stderr.isatty()
    except Exception:
        tty = False
    return tty and not options().flag("quiet") \
        and not options().flag("no_progress")


def start(label: str) -> None:
    global _active, _label, _last
    if not _enabled():
        return
    _active = True
    _label = label
    _last = 0.0
    sys.stderr.write(f"{label}")
    sys.stderr.flush()


def tick(done: int, total: int) -> None:
    global _last
    if not _active:
        return
    now = time.monotonic()
    if now - _last < 0.1:
        return
    _last = now
    if total > 0:
        pct = 100.0 * done / total
        sys.stderr.write(f"\r{_label} {pct:5.1f}%")
    else:
        sys.stderr.write(f"\r{_label} {done}")
    sys.stderr.flush()


def done(summary: str = "") -> None:
    global _active
    if not _active:
        return
    _active = False
    if summary:
        sys.stderr.write(f"\r{_label} 100.0% {summary}\n")
    else:
        sys.stderr.write(f"\r{_label} 100.0%\n")
    sys.stderr.flush()

"""Resident device-kernel server: one process holds the compiled
wavefront aligners, every CLI invocation reuses them over a unix
socket.

Why: on the tunneled accelerator rig a *process* pays 150-280 s before
its first long-sequence dispatch (PJRT init + pallas tracing + the
axon backend's executable load — the persistent XLA compilation cache
does not help: a cache HIT still reloads the executable through the
remote plugin at roughly compile speed).  The reference binary never
pays a per-run tax because it is one static process
(src/usearch_main.cpp); a CLI that re-enters Python per command needs
the device runtime to outlive the command.  This is the standard
persistent-worker pattern (compile servers, serving runtimes): the
first device-engaging run spawns the daemon, every later run connects
in milliseconds and dispatches against already-loaded executables.

Protocol: one request per connection, 8-byte big-endian length prefix
+ pickle.  Requests:
  {"op": "ping"}                        -> {"ok": True, "pid", "backend"}
  {"op": "align", "ap": AlnParams, "cls_bits": int, "band": int,
   "nucleo": bool, "pairs": [(u8 array, u8 array), ...]}
                                        -> {"ok": True, "scores", "paths"}
  {"op": "shutdown"}                    -> {"ok": True} and exits
The socket lives in a 0700 directory under /tmp keyed by uid; only the
owning user can connect.  The daemon exits after --idle seconds
without a request (default 900) so it never holds the accelerator
forever.
"""

from __future__ import annotations

import os
import pickle
import socket
import struct
import subprocess
import sys
import time
from typing import List, Optional, Tuple

import numpy as np

_DIR = f"/tmp/usearch_devsrv_{os.getuid()}"
SOCK = f"{_DIR}/server.sock"
_LOCK = f"{_DIR}/spawn.lock"
_LOG = f"{_DIR}/server.log"


class DeviceServerError(RuntimeError):
    """Transport or server-side failure; callers fall back to host."""


# ---------------------------------------------------------------- frames

def _send_frame(sock: socket.socket, obj) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(struct.pack(">Q", len(data)) + data)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise DeviceServerError("peer closed mid-frame")
        buf += chunk
    return bytes(buf)


def _recv_frame(sock: socket.socket):
    (n,) = struct.unpack(">Q", _recv_exact(sock, 8))
    if n > (1 << 33):
        raise DeviceServerError(f"oversized frame: {n} bytes")
    return pickle.loads(_recv_exact(sock, n))


# ---------------------------------------------------------------- client

class DeviceServerClient:
    """Per-request unix-socket client for the resident kernel server."""

    def __init__(self, sock_path: str = SOCK, timeout: float = 900.0):
        self.sock_path = sock_path
        self.timeout = timeout
        self.info: dict = {}   # last ping reply (backend, aligns_served)

    def _request(self, obj, timeout: Optional[float] = None):
        try:
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            s.settimeout(timeout if timeout is not None else self.timeout)
            s.connect(self.sock_path)
            try:
                _send_frame(s, obj)
                rep = _recv_frame(s)
            finally:
                s.close()
        except (OSError, pickle.PickleError, struct.error) as e:
            raise DeviceServerError(repr(e)) from e
        if not isinstance(rep, dict) or not rep.get("ok"):
            err = rep.get("error", "?") if isinstance(rep, dict) else "?"
            raise DeviceServerError(f"server error: {err}")
        return rep

    def ping(self, timeout: float = 2.0) -> dict:
        self.info = self._request({"op": "ping"}, timeout=timeout)
        return self.info

    def shutdown(self) -> None:
        try:
            self._request({"op": "shutdown"}, timeout=5.0)
        except DeviceServerError:
            pass

    def align(self, ap, cls_bits: int, band: int, nucleo: bool,
              pairs: List[Tuple[np.ndarray, np.ndarray]]):
        rep = self._request({"op": "align", "ap": _strip_ap(ap),
                             "cls_bits": cls_bits, "band": band,
                             "nucleo": nucleo,
                             "pairs": [(np.ascontiguousarray(a),
                                        np.ascontiguousarray(b))
                                       for a, b in pairs]})
        return rep["scores"], rep["paths"]

    def csr_rank(self, sig, qw, wmax: int, cap: int, loader=None):
        """One CSR rank chunk on the server-resident postings for
        `sig`; `loader()` supplies (v, t, starts, sizes, postings,
        topk, bump) for a one-time csr_load on cache miss."""
        req = {"op": "csr_rank", "sig": tuple(sig),
               "qw": np.ascontiguousarray(qw),
               "wmax": int(wmax), "cap": int(cap)}
        rep = self._request(req)
        if rep.get("need_load"):
            if loader is None:
                raise DeviceServerError("server needs csr_load")
            v, t, starts, sizes, postings, topk, bump = loader()
            self._request({"op": "csr_load", "sig": tuple(sig),
                           "v": int(v), "t": int(t),
                           "starts": np.ascontiguousarray(starts),
                           "sizes": np.ascontiguousarray(sizes),
                           "postings": np.ascontiguousarray(postings),
                           "topk": int(topk), "bump": int(bump)})
            rep = self._request(req)
        return rep["cnts"], rep["tgts"], rep["nextv"]

    def sintax_boots(self, sig, words, nuw, m, stream, rr, loader=None):
        """One SINTAX boot chunk on the server-resident incidence for
        `sig`.  On a cache miss the server replies need_load and
        `loader()` supplies (v, t, sizes, postings, boots) for a one-
        time sintax_load (~CSR-sized) before retrying."""
        req = {"op": "sintax_boots", "sig": tuple(sig),
               "words": np.ascontiguousarray(words),
               "nuw": np.ascontiguousarray(nuw),
               "m": np.ascontiguousarray(m),
               "stream": np.ascontiguousarray(stream),
               "rr": np.ascontiguousarray(rr)}
        rep = self._request(req)
        if rep.get("need_load"):
            if loader is None:
                raise DeviceServerError("server needs sintax_load")
            v, t, sizes, postings, boots = loader()
            self._request({"op": "sintax_load", "sig": tuple(sig),
                           "v": int(v), "t": int(t),
                           "sizes": np.ascontiguousarray(sizes),
                           "postings": np.ascontiguousarray(postings),
                           "boots": int(boots)})
            rep = self._request(req)
        return rep["winners"], rep["tops"]


class ServerDevice:
    """Stands in for WavefrontNWDevice in BatchEngine when a resident
    server handles the dispatches: no jax import in the CLI process."""

    is_server = True
    interpret = False
    pb = 32
    chunk = 32

    def __init__(self, client: DeviceServerClient):
        self.client = client

    @property
    def server_warm(self) -> bool:
        """True when the resident server has already served align
        requests: its executables are loaded, so a new CLI process pays
        no first-dispatch compile tax (the DevicePerfModel warm_tax is a
        per-SERVER cost, not per-process)."""
        return bool(self.client.info.get("aligns_served", 0))


class ServerClassAligner:
    """FusedWaveAligner-compatible facade: one terminal-penalty class,
    dispatches through the resident server."""

    def __init__(self, client: DeviceServerClient, ap, cls_bits: int):
        self.client = client
        self.ap = ap
        self.cls_bits = cls_bits

    def align(self, pairs, band_radius: int, nucleo: bool = True):
        return self.client.align(self.ap, self.cls_bits, band_radius,
                                 nucleo, pairs)


def _strip_ap(ap):
    """AlnParams travels by value; drop nothing (numpy fields pickle)."""
    return ap


def get_client(spawn: bool = True,
               spawn_timeout: float = 60.0) -> Optional[DeviceServerClient]:
    """Connect to the resident server, spawning it if needed.  Returns
    None when the server can't be reached (callers use the in-process
    device path).  Disabled entirely by USEARCH_DEV_SERVER=0."""
    if os.environ.get("USEARCH_DEV_SERVER", "1") == "0":
        return None
    cli = DeviceServerClient(SOCK)
    try:
        cli.ping()
        return cli
    except DeviceServerError as e:
        # a timeout may just mean a (pre-threading) busy server —
        # connection refused / missing socket means definitely dead.
        # Retry a timeout once with patience before declaring death.
        if "timed out" in repr(e):
            try:
                cli.ping(timeout=15.0)
                return cli
            except DeviceServerError:
                pass
    if not spawn:
        return None
    os.makedirs(_DIR, mode=0o700, exist_ok=True)
    # single-spawner lock; stale (>180s) locks are stolen
    got_lock = False
    try:
        fd = os.open(_LOCK, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        got_lock = True
    except FileExistsError:
        try:
            if time.time() - os.path.getmtime(_LOCK) > 180:
                os.unlink(_LOCK)
                return get_client(spawn=spawn, spawn_timeout=spawn_timeout)
        except OSError:
            pass
    if got_lock:
        try:
            try:
                os.unlink(SOCK)
            except OSError:
                pass
            from .device import device_env
            env = device_env()
            with open(_LOG, "ab") as log:
                subprocess.Popen(
                    [sys.executable, "-m", "usearch12_tpu.device_server",
                     "--sock", SOCK,
                     "--idle", os.environ.get("USEARCH_DEV_SERVER_IDLE",
                                              "900")],
                    env=env, stdout=log, stderr=log,
                    start_new_session=True)
        except Exception:
            try:
                os.unlink(_LOCK)
            except OSError:
                pass
            return None
    deadline = time.monotonic() + spawn_timeout
    while time.monotonic() < deadline:
        try:
            cli.ping()
            if got_lock:
                try:
                    os.unlink(_LOCK)
                except OSError:
                    pass
            return cli
        except DeviceServerError:
            time.sleep(0.25)
    if got_lock:
        try:
            os.unlink(_LOCK)
        except OSError:
            pass
    return None


def shutdown_server() -> None:
    """Ask a running server to exit (frees the accelerator for
    in-process users, e.g. bench kernel sweeps)."""
    try:
        DeviceServerClient(SOCK).shutdown()
    except Exception:
        pass


# ---------------------------------------------------------------- server

def _serve(sock_path: str, idle_s: float) -> int:
    # device runtime bootstrap mirrors commands.py:make_device
    from .device import ensure_device_runtime
    ensure_device_runtime()
    import jax
    interpret = os.environ.get("USEARCH_DEV_SERVER_CPU") == "1"
    if not interpret:
        backend = jax.default_backend()
        if backend not in ("tpu", "axon"):
            print(f"device_server: backend {backend!r} is not an "
                  "accelerator; refusing to serve", flush=True)
            return 1
        try:
            jax.config.update("jax_compilation_cache_dir",
                              f"/tmp/usearch_jax_cache_{backend}")
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              0)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
        except Exception:
            pass
    from .ops.wavefront_nw import FusedWaveAligner, WavefrontNWDevice

    aligners = {}
    # SINTAX boot engines keyed by DB signature: the (V, T) incidence
    # matrix stays device-resident across CLI processes (the per-process
    # upload/build is the dominant cost of the device SINTAX path).
    # Bounded: one DB switch drops the previous engine.
    sintax_engines = {}
    SINTAX_MAX = 2
    # CSR rank engines keyed by DB signature (same residency rationale)
    csr_engines = {}
    CSR_MAX = 2

    def aligner_for(ap, cls_bits: int):
        key = (float(ap.open_a), float(ap.open_b), float(ap.ext_a),
               float(ap.ext_b), float(ap.l_open_a), float(ap.l_open_b),
               float(ap.r_open_a), float(ap.r_open_b), float(ap.l_ext_a),
               float(ap.l_ext_b), float(ap.r_ext_a), float(ap.r_ext_b),
               float(ap.subst_mx[ord("A"), ord("A")]),
               float(ap.subst_mx[ord("A"), ord("C")]),
               bool(ap.nucleo), int(cls_bits))
        fa = aligners.get(key)
        if fa is None:
            local_ap = ap.hole_params(bool(cls_bits & 1),
                                      bool(cls_bits & 2),
                                      bool(cls_bits & 4),
                                      bool(cls_bits & 8))
            dev = WavefrontNWDevice(local_ap, pb=32, chunk=32,
                                    interpret=interpret,
                                    steps_quantum=512)
            fa = FusedWaveAligner(dev)
            aligners[key] = fa
        return fa

    import threading

    os.makedirs(os.path.dirname(sock_path), mode=0o700, exist_ok=True)
    try:
        os.unlink(sock_path)
    except OSError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sock_path)
    os.chmod(sock_path, 0o600)
    srv.listen(16)
    srv.settimeout(5.0)
    # remember the inode of OUR socket so exit-time cleanup can't delete
    # a successor server's freshly-bound socket at the same path
    try:
        my_ino = os.stat(sock_path).st_ino
    except OSError:
        my_ino = None
    print(f"device_server: serving on {sock_path} "
          f"(pid {os.getpid()})", flush=True)
    state = {"last": time.monotonic(), "served": 0, "busy": 0}
    state_lock = threading.Lock()
    align_lock = threading.Lock()   # one align on the device at a time
    stop = threading.Event()

    def handle(conn):
        # Each connection gets its own thread so cheap ping/shutdown
        # requests answer instantly while a multi-minute align is in
        # flight — a blocked ping used to make clients declare the live
        # server dead, unlink its socket, and spawn a duplicate
        # accelerator-holding server (advisor r4, medium).
        try:
            conn.settimeout(60.0)
            req = _recv_frame(conn)
            op = req.get("op")
            if op not in ("ping",):
                print(f"device_server: {op} begin", flush=True)
                _t_op = time.monotonic()
            if op == "ping":
                with state_lock:
                    served, busy = state["served"], state["busy"]
                _send_frame(conn, {"ok": True, "pid": os.getpid(),
                                   "backend": "interpret" if interpret
                                   else jax.default_backend(),
                                   "aligns_served": served,
                                   "busy_aligns": busy})
            elif op == "shutdown":
                _send_frame(conn, {"ok": True})
                stop.set()
            elif op == "align":
                conn.settimeout(1800.0)
                with state_lock:
                    state["busy"] += 1
                try:
                    with align_lock:
                        fa = aligner_for(req["ap"], req["cls_bits"])
                        scores, paths = fa.align(req["pairs"],
                                                 req["band"],
                                                 nucleo=req["nucleo"])
                    with state_lock:
                        state["served"] += 1
                    _send_frame(conn, {"ok": True,
                                       "scores": np.asarray(scores),
                                       "paths": list(paths)})
                except Exception as e:  # noqa: BLE001 — reply, don't die
                    _send_frame(conn, {"ok": False,
                                       "error": repr(e)[:500]})
                finally:
                    with state_lock:
                        state["busy"] -= 1
            elif op == "csr_load":
                conn.settimeout(1800.0)
                with state_lock:
                    state["busy"] += 1
                try:
                    from .ops.csr_rank import CSRDeviceRanker
                    with align_lock:
                        if req["sig"] not in csr_engines:
                            while len(csr_engines) >= CSR_MAX:
                                csr_engines.pop(next(iter(csr_engines)))
                            csr_engines[req["sig"]] = \
                                CSRDeviceRanker.from_arrays(
                                    req["v"], req["t"], req["starts"],
                                    req["sizes"], req["postings"],
                                    req["topk"], req["bump"])
                    _send_frame(conn, {"ok": True})
                except Exception as e:  # noqa: BLE001
                    _send_frame(conn, {"ok": False,
                                       "error": repr(e)[:500]})
            elif op == "csr_rank":
                conn.settimeout(1800.0)
                eng = csr_engines.get(req["sig"])
                if eng is None:
                    _send_frame(conn, {"ok": True, "need_load": True})
                else:
                    with state_lock:
                        state["busy"] += 1
                    try:
                        with align_lock:
                            c, t, n = eng.run_chunk_device(
                                req["qw"], req["wmax"], req["cap"])
                        with state_lock:
                            state["served"] += 1
                        _send_frame(conn, {"ok": True, "cnts": c,
                                           "tgts": t, "nextv": n})
                    except Exception as e:  # noqa: BLE001
                        _send_frame(conn, {"ok": False,
                                           "error": repr(e)[:500]})
                    finally:
                        with state_lock:
                            state["busy"] -= 1
            elif op == "sintax_load":
                conn.settimeout(1800.0)
                with state_lock:
                    state["busy"] += 1
                try:
                    from .amplicon.sintax_device import BootEngine
                    with align_lock:
                        if req["sig"] not in sintax_engines:
                            while len(sintax_engines) >= SINTAX_MAX:
                                sintax_engines.pop(
                                    next(iter(sintax_engines)))
                            sintax_engines[req["sig"]] = BootEngine(
                                req["v"], req["t"], req["sizes"],
                                req["postings"], req["boots"])
                    _send_frame(conn, {"ok": True})
                except Exception as e:  # noqa: BLE001
                    _send_frame(conn, {"ok": False,
                                       "error": repr(e)[:500]})
                finally:
                    with state_lock:
                        state["busy"] -= 1
            elif op == "sintax_boots":
                conn.settimeout(1800.0)
                eng = sintax_engines.get(req["sig"])
                if eng is None:
                    _send_frame(conn, {"ok": True, "need_load": True})
                else:
                    with state_lock:
                        state["busy"] += 1
                    try:
                        with align_lock:
                            w, t = eng.run_chunk(
                                req["words"], req["nuw"], req["m"],
                                req["stream"], req["rr"])
                        with state_lock:
                            state["served"] += 1
                        _send_frame(conn, {"ok": True, "winners": w,
                                           "tops": t})
                    except Exception as e:  # noqa: BLE001
                        _send_frame(conn, {"ok": False,
                                           "error": repr(e)[:500]})
                    finally:
                        with state_lock:
                            state["busy"] -= 1
            else:
                _send_frame(conn, {"ok": False,
                                   "error": f"unknown op {op!r}"})
            if op not in ("ping",):
                print(f"device_server: {op} done "
                      f"{time.monotonic() - _t_op:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — bad frame, next conn
            print(f"device_server: request failed: {e!r}", flush=True)
        finally:
            with state_lock:
                state["last"] = time.monotonic()
            try:
                conn.close()
            except OSError:
                pass

    try:
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                with state_lock:
                    idle = (time.monotonic() - state["last"] > idle_s
                            and state["busy"] == 0)
                if idle:
                    print("device_server: idle, exiting", flush=True)
                    return 0
                continue
            with state_lock:
                state["last"] = time.monotonic()
            threading.Thread(target=handle, args=(conn,),
                             daemon=True).start()
        return 0
    finally:
        try:
            if my_ino is None or os.stat(sock_path).st_ino == my_ino:
                os.unlink(sock_path)
        except OSError:
            pass


def main(argv=None) -> int:
    import argparse
    pa = argparse.ArgumentParser()
    pa.add_argument("--sock", default=SOCK)
    pa.add_argument("--idle", type=float, default=900.0)
    args = pa.parse_args(argv)
    return _serve(args.sock, args.idle)


if __name__ == "__main__":
    sys.exit(main())

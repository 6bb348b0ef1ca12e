"""TCP line input (S3 in SURVEY.md §2.1) — the push-ingest analog.

The reference family's tcp/http inputs listen for pushed line-oriented
events (``[U-arch]``). The Ray-native analog is a micro-batch source for
the incremental/tail mode: a listener buffers newline-delimited UTF-8
lines from client connections and surfaces them as Arrow tables
(``text:string``), which feed the SAME vectorized filter chain as every
other source (``pipelines/incremental.py``'s ``process_chunk`` or a
``ray.data.from_arrow`` one-shot).

Scope note: this is the single-node ingest edge — on a real cluster each
ingest node runs its own listener and ships chunk tables; the engine
side (filter chain, sinks, running counts) is identical. The accept loop
is deliberately simple (thread per listener, blocking reads with a
deadline); it is an INPUT adapter, not a throughput path — bulk data
enters via Parquet (S1).
"""

from __future__ import annotations

import socket
import threading
from collections import deque

import pyarrow as pa


class TcpLineSource:
    """Listen on ``host:port`` (port 0 → ephemeral, see ``.port``) and
    buffer newline-delimited lines from any number of connections.

    ``poll_batch(max_lines, timeout_s)`` drains up to ``max_lines``
    buffered lines into a ``text:string`` Arrow table (None if nothing
    arrived before the deadline). ``close()`` stops the listener."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 backlog: int = 8):
        self._srv = socket.create_server((host, port), backlog=backlog)
        self._srv.settimeout(0.1)
        self.host, self.port = self._srv.getsockname()[:2]
        self._lines: deque[str] = deque()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._ready = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        conns: list[tuple[socket.socket, bytearray]] = []
        while not self._stop.is_set():
            try:
                c, _ = self._srv.accept()
                c.settimeout(0.05)
                conns.append((c, bytearray()))
            except (TimeoutError, socket.timeout, OSError):
                pass
            alive = []
            for c, buf in conns:
                closed = False
                try:
                    chunk = c.recv(65536)
                    if chunk:
                        buf.extend(chunk)
                    else:
                        closed = True
                except (TimeoutError, socket.timeout):
                    pass
                except OSError:
                    closed = True
                # split out complete lines
                while True:
                    nl = buf.find(b"\n")
                    if nl < 0:
                        break
                    line = bytes(buf[:nl]).decode("utf-8", errors="replace")
                    del buf[: nl + 1]
                    with self._lock:
                        self._lines.append(line.rstrip("\r"))
                    self._ready.set()
                if closed:
                    if buf:  # trailing line without newline
                        with self._lock:
                            self._lines.append(
                                bytes(buf).decode("utf-8", errors="replace"))
                        self._ready.set()
                    c.close()
                else:
                    alive.append((c, buf))
            conns = alive
        for c, _ in conns:
            c.close()
        self._srv.close()

    def poll_batch(self, max_lines: int = 4096,
                   timeout_s: float = 1.0) -> pa.Table | None:
        """Up to ``max_lines`` buffered lines as a ``text`` table, or
        None if nothing arrives before the deadline."""
        if not self._ready.wait(timeout_s):
            return None
        out: list[str] = []
        with self._lock:
            while self._lines and len(out) < max_lines:
                out.append(self._lines.popleft())
            if not self._lines:
                self._ready.clear()
        if not out:
            return None
        return pa.table({"text": pa.array(out, type=pa.string())})

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)

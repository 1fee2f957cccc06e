"""Thin REST ingest/query wrapper over :class:`IceTable` — the Spark
analog of the reference's Flask/Falcon examples
(``/root/reference/examples/api-flask.py:184-217``: POST ``/insert``
buffers JSON rows and a background batcher flushes them every few
seconds; GET ``/query`` runs SQL over the alive files and returns the
result). stdlib-only (``http.server``), so it runs anywhere the engine
does.

Endpoints:

* ``POST /insert`` — body is a JSON object (one row) or array (many);
  rows are BUFFERED and committed by the batcher every
  ``flush_interval_s`` seconds or ``flush_rows`` rows, whichever comes
  first (one atomic log commit per flush, exactly the reference's
  async-ingest pattern). Returns ``{"buffered": n}``.
* ``GET /query?q=<sql>[&limit=n]`` — runs the SQL through
  :meth:`IceTable.sql` (the table is the view ``ice``; DML statements
  route to the transactional operators like everywhere else) and
  returns ``{"columns": [...], "rows": [[...], ...]}``. ``limit``
  caps the driver-side materialization (default 1000) — this is an
  operational endpoint, not a bulk-export path.
* ``POST /flush`` — force the buffer out now (returns the commit's
  file count). Useful for tests and graceful drains.
* ``GET /state`` — log/file counts and buffered-row gauge, the
  observability ping the reference examples print by hand.

Driver-side service: handlers run on the Spark DRIVER (Spark job
submission is thread-safe); this wrapper adds ingest/query HTTP
plumbing, not a distributed query endpoint — put it next to the driver
exactly like the reference puts Flask next to DuckDB.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlsplit


class BufferFullError(RuntimeError):
    """The batcher's ``max_buffered_rows`` bound is hit — rows NOT
    accepted. The REST server answers 503; clients back off and retry."""


class RowBatcher:
    """The reference's async-insert buffer (api-flask.py's IceDBBatcher):
    ``add`` appends to an in-memory list; a daemon timer flushes every
    ``flush_interval_s`` seconds, and ``add`` flushes inline once
    ``flush_rows`` is buffered. Each flush is ONE ``IceTable.insert``
    (one atomic log commit). A flush failure keeps the rows buffered for
    the next tick (at-least-once; the durable unit is the commit)."""

    def __init__(self, table, flush_interval_s: float = 3.0,
                 flush_rows: int = 10_000,
                 max_buffered_rows: int = 1_000_000):
        self.table = table
        self.flush_interval_s = flush_interval_s
        self.flush_rows = flush_rows
        # backpressure bound: when flushes keep failing (storage outage)
        # the buffer must not grow without limit — add() refuses past
        # this (the server maps that to 503), callers retry later
        self.max_buffered_rows = max_buffered_rows
        self._rows: list[dict] = []
        self._lock = threading.Lock()
        self._timer: Optional[threading.Timer] = None
        self._stopped = False

    def start(self) -> "RowBatcher":
        self._schedule()
        return self

    def _schedule(self) -> None:
        if self._stopped:
            return
        self._timer = threading.Timer(self.flush_interval_s, self._tick)
        self._timer.daemon = True
        self._timer.start()

    def _tick(self) -> None:
        try:
            self.flush()
        finally:
            self._schedule()

    def add(self, rows: list[dict]) -> int:
        with self._lock:
            if len(self._rows) + len(rows) > self.max_buffered_rows:
                raise BufferFullError(
                    f"insert buffer full ({len(self._rows)} rows "
                    f"buffered, cap {self.max_buffered_rows}); flushes "
                    "are failing or lagging — retry later"
                )
            self._rows.extend(rows)
            n = len(self._rows)
        if n >= self.flush_rows:
            self.flush()
        return len(rows)

    def buffered(self) -> int:
        with self._lock:
            return len(self._rows)

    def flush(self) -> int:
        """Commit the buffer now; returns files written (0 = empty)."""
        with self._lock:
            rows, self._rows = self._rows, []
        if not rows:
            return 0
        try:
            markers = self.table.insert(rows)
            return len(markers)
        except Exception:
            with self._lock:
                # keep ordering: failed rows go back in FRONT
                self._rows = rows + self._rows
            raise

    def stop(self, drain: bool = True) -> None:
        self._stopped = True
        if self._timer is not None:
            self._timer.cancel()
        if drain:
            self.flush()


class IceRestServer:
    """``with IceRestServer(table, port=0) as srv: ... srv.port ...``"""

    def __init__(self, table, host: str = "127.0.0.1", port: int = 0,
                 flush_interval_s: float = 3.0, flush_rows: int = 10_000,
                 default_limit: int = 1000,
                 max_buffered_rows: int = 1_000_000):
        self.table = table
        self.batcher = RowBatcher(table, flush_interval_s, flush_rows,
                                  max_buffered_rows)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # quiet
                pass

            def _json(self, code: int, obj) -> None:
                # default=str: timestamps/decimals/bytes serialize as text
                # (a display endpoint, not a typed interchange format)
                body = json.dumps(obj, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                path = urlsplit(self.path).path
                if path == "/flush":
                    try:
                        self._json(200, {"files": outer.batcher.flush()})
                    except Exception as e:
                        self._json(500, {"error": str(e)})
                    return
                if path != "/insert":
                    self._json(404, {"error": "POST /insert or /flush"})
                    return
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if ctype != "application/json":
                    self._json(415, {"error": "Content-Type must be "
                                              "application/json"})
                    return
                n = int(self.headers.get("Content-Length") or 0)
                try:
                    doc = json.loads(self.rfile.read(n) or b"null")
                except ValueError:
                    self._json(400, {"error": "bad JSON"})
                    return
                if isinstance(doc, dict):
                    rows = [doc]
                elif isinstance(doc, list) and all(
                    isinstance(r, dict) for r in doc
                ):
                    rows = doc
                else:
                    self._json(400, {"error": "body must be a JSON object "
                                              "or array of objects"})
                    return
                try:
                    self._json(200, {"buffered": outer.batcher.add(rows)})
                except BufferFullError as e:
                    # bounded backpressure: the rows were NOT accepted —
                    # the client must retry after flushes recover
                    self._json(503, {"error": str(e)})
                except Exception as e:
                    # add() may flush inline past the row threshold; a
                    # flush failure re-buffers the rows (at-least-once),
                    # so the rows ARE accepted — say so, with the error
                    self._json(202, {"buffered": len(rows),
                                     "flush_error": str(e)})

            def do_GET(self):
                u = urlsplit(self.path)
                q = parse_qs(u.query)
                if u.path == "/state":
                    try:
                        state = outer.table.snapshot()
                        self._json(200, {
                            "log_files": len(state.log_files),
                            "alive_files": len(state.alive_files()),
                            "buffered_rows": outer.batcher.buffered(),
                        })
                    except Exception as e:
                        self._json(500, {"error": str(e)})
                    return
                if u.path != "/query":
                    self._json(404, {"error": "GET /query?q=... or /state"})
                    return
                sql = (q.get("q") or [""])[0]
                if not sql:
                    self._json(400, {"error": "missing q parameter"})
                    return
                try:
                    limit = int((q.get("limit") or [outer.default_limit])[0])
                except ValueError:
                    self._json(400, {"error": "limit must be an integer"})
                    return
                try:
                    df = outer.table.sql(sql)
                    rows = df.limit(limit).collect()
                    self._json(200, {
                        "columns": df.columns,
                        "rows": [[r[c] for c in df.columns] for r in rows],
                    })
                except Exception as e:
                    self._json(400, {"error": str(e)})

        self.default_limit = default_limit
        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def __enter__(self) -> "IceRestServer":
        self.batcher.start()
        self._thread.start()
        return self

    def __exit__(self, *exc) -> bool:
        try:
            self.batcher.stop(drain=True)
        finally:
            # a drain-flush failure must not leak the running server
            self._server.shutdown()
            self._server.server_close()
        return False

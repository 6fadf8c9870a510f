"""Thin HTTP serving analogue of the reference's REST API
(api/api.py + api/flask_api.py) over the SparkHunter facade —
stdlib-only (no Flask in this container), one handler per route the
reference exposes:

| reference route (api/api.py)      | here                          |
|-----------------------------------|-------------------------------|
| GET /api/youtube/<id>  (:74-78)   | GET /api/youtube/<id> — scenes of a LINKED video (404 if absent) |
| GET /api/entity/<e>    (:100-109) | GET /api/entity/<e> — scenes depicting a label or URI |
| POST /api/query        (:81-97)   | POST /api/query {"where": sql} or {"sql": raw graph-pattern SQL} |

Deliberate shape change, documented: the reference's /api/youtube
fires a fire-and-forget linking THREAD per request
(api.py:74-78 → flask_api.py:50-83) because its engine is
one-video-per-process; here linking is a batch Spark job (submit
`jobs/link_job.py` or call hunter.link) and the API is a READ surface
over the committed triple table — the serving model the north_star
describes (queries served by spark.sql on the shared table).  Spark
supports multi-threaded job submission, so the threading server's
concurrent reads are safe; model state lives in per-executor
singletons exactly like the reference's once-per-process build
(flask_api.py:40-45).
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_MAX_ROWS = 10_000  # serving guard: never collect an unbounded result


def _rows(df, limit: int = _MAX_ROWS) -> list[dict]:
    return [r.asDict() for r in df.limit(limit).collect()]


def make_handler(hunter):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet test output
            pass

        def do_GET(self):
            path = urllib.parse.unquote(self.path)
            try:
                if path.startswith("/api/youtube/"):
                    doc_id = path[len("/api/youtube/"):]
                    if not hunter.video_exists(doc_id):
                        self._send(404, {"success": False,
                                         "error": "video not linked; "
                                                  "run the link job"})
                        return
                    df = hunter.scenes_of(doc_id)
                    self._send(200, {"success": True, "scenes": _rows(df)})
                elif path.startswith("/api/entity/"):
                    ident = path[len("/api/entity/"):]
                    df = hunter.search(ident)
                    if df is None:
                        self._send(404, {"success": False,
                                         "error": f"unknown entity {ident!r}"})
                        return
                    self._send(200, {"success": True, "scenes": _rows(df)})
                else:
                    self._send(404, {"success": False, "error": "no route"})
            except Exception as exc:  # serving surface: report, don't die
                self._send(500, {"success": False, "error": str(exc)})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path != "/api/query":
                    self._send(404, {"success": False, "error": "no route"})
                    return
                if "sql" in req:
                    df = hunter.sql(req["sql"])
                elif "where" in req:
                    df = hunter.query(req["where"])
                else:
                    self._send(400, {"success": False,
                                     "error": "need 'where' or 'sql'"})
                    return
                if df is None:
                    self._send(404, {"success": False,
                                     "error": "no triples committed yet"})
                    return
                self._send(200, {"success": True, "rows": _rows(df)})
            except Exception as exc:
                self._send(500, {"success": False, "error": str(exc)})

    return Handler


def serve(hunter, host: str = "127.0.0.1",
          port: int = 0) -> ThreadingHTTPServer:
    """Start the API in a daemon thread; returns the server (its bound
    port is ``server.server_address[1]``; ``server.shutdown()`` stops
    it)."""
    server = ThreadingHTTPServer((host, port), make_handler(hunter))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server

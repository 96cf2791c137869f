"""RemoteControl — drive a running crawl over HTTP (S11).

Re-expresses /root/reference/src/kermit/extensions/ext.RemoteControl.coffee:6-45
(koa REST endpoints ``POST /requests/schedule`` and
``POST /commands/{start,stop,shutdown}`` on port 8011) for wave execution:
the server runs on the DRIVER (the only place with a SparkSession) and its
commands take effect at wave boundaries — the natural control points of a
batch engine, where the reference's event loop could act immediately.

  POST /requests/schedule   {"url": "...", "meta": {...}}   queue a URL
  POST /commands/stop                                        stop after the
                                                             current wave
  GET  /status                                               JSON counters

Scale note: scheduled URLs buffer driver-side and merge into the frontier
through the SAME ``Frontier.schedule`` dedup path as discovery — one
snapshot commit per wave regardless of how many requests arrived, and the
buffer is bounded (oldest requests merge first; HTTP 429 above the cap).
"""

from __future__ import annotations

import http.server
import json
import threading

from pyspark.sql import functions as F


class RemoteControl:
    """Driver-side control server bound to a Crawler.

    Usage::

        rc = RemoteControl(crawler)
        rc.start()                     # -> (host, port)
        crawler.crawl(remote=rc)       # drains schedules / honors stop
        rc.stop_server()
    """

    def __init__(self, crawler, host: str = "127.0.0.1", port: int = 0,
                 max_buffer: int = 100_000):
        self.crawler = crawler
        self._host = host
        self._port = port
        self.max_buffer = max_buffer
        self._pending: list[tuple[str, dict]] = []
        self._lock = threading.Lock()
        self._stop_requested = threading.Event()
        self._server: http.server.ThreadingHTTPServer | None = None

    # -- crawl-loop side ---------------------------------------------------

    @property
    def stop_requested(self) -> bool:
        return self._stop_requested.is_set()

    def drain_schedules(self, wave: int) -> int:
        """Merge buffered schedule requests into the frontier (one commit).
        Called by the crawl loop at each wave boundary. Returns n_new."""
        with self._lock:
            batch, self._pending = self._pending, []
        if not batch:
            return 0
        urls = self.crawler.spark.createDataFrame(
            [(u,) for u, _ in batch], "url string"
        ).filter(self.crawler.config.url_filter.expr(F.col("url")))
        return self.crawler.frontier.schedule(urls, wave=wave)

    # -- HTTP side ---------------------------------------------------------

    def start(self) -> tuple[str, int]:
        control = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/status":
                    with control._lock:
                        n_pending = len(control._pending)
                    self._reply(200, {
                        "pending_schedules": n_pending,
                        "stop_requested": control.stop_requested,
                        "last_wave": control.crawler.last_wave,
                    })
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n) if n else b"{}"
                try:
                    payload = json.loads(raw or b"{}")
                except json.JSONDecodeError:
                    self._reply(400, {"error": "bad json"})
                    return
                if self.path == "/requests/schedule":
                    url = payload.get("url")
                    if not isinstance(url, str) or "://" not in url:
                        self._reply(400, {"error": "missing/invalid url"})
                        return
                    with control._lock:
                        if len(control._pending) >= control.max_buffer:
                            self._reply(429, {"error": "buffer full"})
                            return
                        control._pending.append((url, payload.get("meta") or {}))
                    self._reply(202, {"queued": url})
                elif self.path in ("/commands/stop", "/commands/shutdown"):
                    control._stop_requested.set()
                    self._reply(202, {"stopping": True})
                elif self.path == "/commands/start":
                    # wave crawls are started by the driver program; accept
                    # for API parity (the reference queues a start command)
                    self._reply(202, {"running": True})
                else:
                    self._reply(404, {"error": "not found"})

        self._server = http.server.ThreadingHTTPServer((self._host, self._port), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self._server.server_address[:2]

    def stop_server(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server = None

"""Dashboard HTTP backend.

Rebuild of reference ``metadata/dashboard/dashboard_metadata.go``: a
read-only HTTP/JSON API over metadata (resource listings, variants,
task runs, search, provider health) + a Prometheus ``/metrics``
endpoint.  stdlib http.server; no external web framework.

Endpoints:
    GET /data/<type>                  list resources of a type
    GET /data/<type>/<name>           variants of a resource
    GET /search?q=...                 full-text resource search
    GET /tasks                        task runs (status, logs)
    GET /health                       provider health checks
    GET /metrics                      Prometheus text metrics
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from embeddinghub_tpu.featurestore import health as health_mod
from embeddinghub_tpu.featurestore.metrics import METRICS
from embeddinghub_tpu.featurestore.resources import ResourceType
from embeddinghub_tpu.featurestore.search import SearchIndex

_TYPE_ALIASES = {
    "features": ResourceType.FEATURE_VARIANT,
    "sources": ResourceType.SOURCE_VARIANT,
    "labels": ResourceType.LABEL_VARIANT,
    "training-sets": ResourceType.TRAINING_SET_VARIANT,
    "trainingsets": ResourceType.TRAINING_SET_VARIANT,
    "entities": ResourceType.ENTITY,
    "users": ResourceType.USER,
    "providers": ResourceType.PROVIDER,
    "models": ResourceType.MODEL,
}


def _resource_json(res) -> dict:
    return {
        "name": res.name,
        "variant": getattr(res, "variant", ""),
        "type": res.rtype.value,
        "description": res.description,
        "owner": res.owner,
        "status": res.status.value,
        "status_error": res.status_error,
        "tags": res.tags,
        "created_at": res.created_at,
    }


def make_handler(metadata, coordinator, search_index: SearchIndex):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, payload, status=200, content_type="application/json"):
            body = (
                json.dumps(payload, default=str).encode()
                if content_type == "application/json"
                else payload.encode()
            )
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            try:
                if url.path in ("/", "/index.html"):
                    import os

                    ui = os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "dashboard_ui.html",
                    )
                    with open(ui, encoding="utf-8") as f:
                        self._send(f.read(), content_type="text/html")
                elif url.path == "/metrics":
                    self._send(METRICS.render(), content_type="text/plain")
                elif url.path == "/health":
                    self._send(health_mod.check_all(metadata))
                elif url.path == "/search":
                    q = parse_qs(url.query).get("q", [""])[0]
                    self._send(search_index.search(q))
                elif url.path == "/tasks":
                    runs = []
                    if coordinator is not None:
                        for run in coordinator.tasks.all_runs():
                            task = coordinator.tasks.task(run.task_id)
                            runs.append(
                                {
                                    "run_id": run.run_id,
                                    "task": task.name,
                                    "type": task.task_type,
                                    "target": task.target.key(),
                                    "status": run.status.value,
                                    "error": run.error,
                                    "logs": run.logs,
                                }
                            )
                    self._send(runs)
                elif parts and parts[0] == "data" and len(parts) == 2:
                    rtype = _TYPE_ALIASES.get(parts[1])
                    if rtype is None:
                        self._send({"error": f"unknown type {parts[1]}"}, 404)
                        return
                    self._send(
                        [_resource_json(r) for r in metadata.list_type(rtype)]
                    )
                elif parts and parts[0] == "data" and len(parts) == 3:
                    rtype = _TYPE_ALIASES.get(parts[1])
                    if rtype is None:
                        self._send({"error": f"unknown type {parts[1]}"}, 404)
                        return
                    self._send(
                        [
                            _resource_json(r)
                            for r in metadata.variants(rtype, parts[2])
                        ]
                    )
                else:
                    self._send({"error": "not found"}, 404)
            except Exception as e:  # noqa: BLE001
                self._send({"error": str(e)}, 500)

    return Handler


class DashboardServer:
    """Reference METADATA_HTTP_PORT default: 3001 (main.go)."""

    def __init__(self, metadata, coordinator=None, port: int = 3001):
        self.search = SearchIndex(metadata)
        self._httpd = ThreadingHTTPServer(
            ("0.0.0.0", port), make_handler(metadata, coordinator, self.search)
        )
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)

"""Synthetic metrics traffic generator (reference parity:
``test-metrics/main.go:22-66``) — drives the MetricsHandler with
sinusoidally-oscillating online-serve and training-serve traffic plus
gaussian-tail errors, and exposes the Prometheus text endpoint so
dashboards/alerts can be exercised without a real workload.

Usage:
  python -m embeddinghub_tpu.featurestore.load_generator --port 2113 \
      --oscillation-period 600 --duration 60
"""

from __future__ import annotations

import argparse
import math
import threading
import time

import numpy as np

from embeddinghub_tpu.featurestore.metrics import MetricsHandler


class MetricsLoadGenerator:
    """Two traffic loops mirroring the reference generator: an online
    feature-serve stream and a batched training-row stream, each with
    ~2.3%% error rates (NormFloat64 > 2.0) and a shared oscillation
    factor ``2 + sin(sin(2*pi*t/period))``."""

    def __init__(
        self,
        metrics: MetricsHandler | None = None,
        oscillation_period_s: float = 600.0,
        seed: int = 99,
    ):
        self.metrics = metrics or MetricsHandler(namespace="test")
        self.period = float(oscillation_period_s)
        self._rng = np.random.default_rng(seed)
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._start = time.monotonic()

    def _oscillation(self) -> float:
        t = time.monotonic() - self._start
        return 2.0 + math.sin(math.sin(2.0 * math.pi * t / self.period))

    def _online_loop(self) -> None:
        while not self._stop.is_set():
            t0 = time.perf_counter()
            time.sleep(0.003 * self._oscillation())
            if self._rng.standard_normal() > 2.0:
                self.metrics.feature_error(
                    "Non-free Sulfur Dioxide", "first-variant"
                )
            else:
                self.metrics.feature_served(
                    "Non-free Sulfur Dioxide", "first-variant",
                    time.perf_counter() - t0,
                )

    def _training_loop(self) -> None:
        while not self._stop.is_set():
            rows = 0
            for _ in range(99):
                if self._stop.is_set():
                    break
                if self._rng.standard_normal() > 2.0:
                    self.metrics.feature_error(
                        "Wine Quality Dataset", "default-variant"
                    )
                else:
                    rows += 1
                time.sleep(0.001 * self._oscillation())
            self.metrics.training_rows(
                "Wine Quality Dataset", "default-variant", rows
            )
            self._stop.wait(10.0)

    def start(self) -> None:
        for fn in (self._online_loop, self._training_loop):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5.0)


def main() -> None:
    from http.server import BaseHTTPRequestHandler, HTTPServer

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=2113)
    ap.add_argument("--oscillation-period", type=float, default=600.0)
    ap.add_argument("--duration", type=float, default=0.0,
                    help="seconds to run (0 = forever)")
    args = ap.parse_args()

    gen = MetricsLoadGenerator(oscillation_period_s=args.oscillation_period)
    gen.start()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = gen.metrics.render().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("0.0.0.0", args.port), Handler)
    srv.timeout = 0.5
    print(f"metrics load generator on :{args.port}", flush=True)
    deadline = time.time() + args.duration if args.duration else None
    try:
        while deadline is None or time.time() < deadline:
            srv.handle_request()
    finally:
        gen.stop()


if __name__ == "__main__":
    main()

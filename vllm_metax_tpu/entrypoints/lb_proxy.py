"""External load-balancing proxy for multi-node data parallelism.

Reference analog: the DP serving topologies the reference tests —
tests/v1/test_external_lb_dp.py (an external LB in front of independent
engine servers) and examples/offline_inference/data_parallel.py's
multi-node mode. Each node runs its own full engine server
(`vllm-metax-tpu serve`); this stdlib HTTP proxy spreads requests across
them least-pending-first with passive health checks — no shared state
between nodes (the TPU-native analog of per-node DP ranks with their own
device slices).

    python -m vllm_metax_tpu.entrypoints.lb_proxy \
        --port 9000 --backends http://h1:8000 http://h2:8000
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from vllm_metax_tpu.logger import init_logger

logger = init_logger(__name__)


class Backend:
    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self.pending = 0
        self.failures = 0
        self.down_until = 0.0
        self.lock = threading.Lock()

    @property
    def healthy(self) -> bool:
        return time.monotonic() >= self.down_until

    def mark_failure(self):
        with self.lock:
            self.failures += 1
            # passive health: back off 2^failures seconds, capped
            self.down_until = time.monotonic() + min(
                2.0 ** min(self.failures, 5), 30.0
            )

    def mark_success(self):
        with self.lock:
            self.failures = 0


class LBState:
    def __init__(self, backends: list[str]):
        self.backends = [Backend(b) for b in backends]
        self.lock = threading.Lock()

    def pick(self) -> Backend:
        with self.lock:
            healthy = [b for b in self.backends if b.healthy]
            pool = healthy or self.backends
            b = min(pool, key=lambda x: x.pending)
            b.pending += 1
            return b

    def release(self, b: Backend):
        with self.lock:
            b.pending -= 1


def make_handler(state: LBState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _proxy(self, method: str):
            if self.path == "/lb/health":
                body = json.dumps(
                    {
                        b.url: {
                            "healthy": b.healthy,
                            "pending": b.pending,
                            "failures": b.failures,
                        }
                        for b in state.backends
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            length = int(self.headers.get("Content-Length") or 0)
            payload = self.rfile.read(length) if length else None
            last_err = None
            for _ in range(len(state.backends)):
                b = state.pick()
                try:
                    req = urllib.request.Request(
                        b.url + self.path,
                        data=payload,
                        method=method,
                        headers={
                            "Content-Type": self.headers.get(
                                "Content-Type", "application/json"
                            )
                        },
                    )
                    with urllib.request.urlopen(req, timeout=600) as resp:
                        body = resp.read()
                        b.mark_success()
                        self.send_response(resp.status)
                        ct = resp.headers.get(
                            "Content-Type", "application/json"
                        )
                        self.send_header("Content-Type", ct)
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                        return
                except urllib.error.HTTPError as e:
                    # application error: forward as-is (request is bad, not
                    # the backend)
                    body = e.read()
                    b.mark_success()
                    self.send_response(e.code)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                except (OSError, urllib.error.URLError) as e:
                    b.mark_failure()
                    last_err = e
                    logger.warning("backend %s failed: %s", b.url, e)
                finally:
                    state.release(b)
            body = json.dumps(
                {"error": {"message": f"all backends failed: {last_err}"}}
            ).encode()
            self.send_response(503)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            self._proxy("POST")

        def do_GET(self):
            self._proxy("GET")

    return Handler


def build_proxy(host: str, port: int, backends: list[str]):
    state = LBState(backends)
    server = ThreadingHTTPServer((host, port), make_handler(state))
    server.state = state
    return server


def main(argv=None):
    p = argparse.ArgumentParser(description="external DP load balancer")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=9000)
    p.add_argument("--backends", nargs="+", required=True)
    args = p.parse_args(argv)
    server = build_proxy(args.host, args.port, args.backends)
    logger.info("LB on %s:%d → %s", args.host, args.port, args.backends)
    server.serve_forever()


if __name__ == "__main__":
    main()

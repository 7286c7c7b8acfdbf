"""Prometheus text-format metrics (reference src/metrics.py +
src/middleware/metrics.py): request counters/latency by route + status,
exposed at GET /metrics. Dependency-free (text exposition format 0.0.4 is
a stable public spec); counters are process-local like the reference's
default registry."""

from __future__ import annotations

import threading
import time


class Metrics:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._requests: dict[tuple[str, str, int], int] = {}
        self._latency_sum: dict[tuple[str, str], float] = {}
        self._latency_count: dict[tuple[str, str], int] = {}
        self.started_at = time.time()

    def observe(self, method: str, route: str, status: int,
                seconds: float) -> None:
        with self._lock:
            k = (method, route, status)
            self._requests[k] = self._requests.get(k, 0) + 1
            lk = (method, route)
            self._latency_sum[lk] = self._latency_sum.get(lk, 0.0) + seconds
            self._latency_count[lk] = self._latency_count.get(lk, 0) + 1

    def render(self) -> str:
        out = [
            "# HELP storage_http_requests_total HTTP requests by route/status",
            "# TYPE storage_http_requests_total counter",
        ]
        with self._lock:
            for (m, r, s), n in sorted(self._requests.items()):
                out.append(
                    f'storage_http_requests_total{{method="{m}",'
                    f'route="{r}",status="{s}"}} {n}')
            out += [
                "# HELP storage_http_request_seconds Cumulative request latency",
                "# TYPE storage_http_request_seconds summary",
            ]
            for (m, r), total in sorted(self._latency_sum.items()):
                out.append(
                    f'storage_http_request_seconds_sum{{method="{m}",'
                    f'route="{r}"}} {total:.6f}')
                out.append(
                    f'storage_http_request_seconds_count{{method="{m}",'
                    f'route="{r}"}} {self._latency_count[(m, r)]}')
        out.append("# HELP storage_uptime_seconds Process uptime")
        out.append("# TYPE storage_uptime_seconds gauge")
        out.append(f"storage_uptime_seconds {time.time() - self.started_at:.3f}")
        return "\n".join(out) + "\n"

"""Prometheus text-format metrics (reference src/metrics.py +
src/middleware/metrics.py): request counters/latency by route + status,
exposed at GET /metrics. Dependency-free (text exposition format 0.0.4 is
a stable public spec); counters are process-local like the reference's
default registry. Latency is BOTH a summary (sum/count → averages) and a
histogram (cumulative ``le`` buckets → client-side percentiles, the form
the reference dashboard interpolates p95 from)."""

from __future__ import annotations

import threading
import time

# standard Prometheus latency buckets (seconds), cumulative; +Inf implicit
BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)


class Metrics:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._requests: dict[tuple[str, str, int], int] = {}
        self._latency_sum: dict[tuple[str, str], float] = {}
        self._latency_count: dict[tuple[str, str], int] = {}
        self._buckets: dict[tuple[str, str], list[int]] = {}
        self.started_at = time.time()

    def observe(self, method: str, route: str, status: int,
                seconds: float) -> None:
        with self._lock:
            k = (method, route, status)
            self._requests[k] = self._requests.get(k, 0) + 1
            lk = (method, route)
            self._latency_sum[lk] = self._latency_sum.get(lk, 0.0) + seconds
            self._latency_count[lk] = self._latency_count.get(lk, 0) + 1
            b = self._buckets.setdefault(lk, [0] * (len(BUCKETS) + 1))
            for i, le in enumerate(BUCKETS):
                if seconds <= le:
                    b[i] += 1
            b[-1] += 1                                     # +Inf

    def render(self) -> str:
        # snapshot under the lock, format outside it (ADVICE r7): a
        # request observed mid-scrape must neither mutate a dict while
        # it is iterated nor wait on the scrape's string formatting
        with self._lock:
            requests = dict(self._requests)
            latency_sum = dict(self._latency_sum)
            latency_count = dict(self._latency_count)
            buckets = {k: list(v) for k, v in self._buckets.items()}
        out = [
            "# HELP storage_http_requests_total HTTP requests by route/status",
            "# TYPE storage_http_requests_total counter",
        ]
        for (m, r, s), n in sorted(requests.items()):
            out.append(
                f'storage_http_requests_total{{method="{m}",'
                f'route="{r}",status="{s}"}} {n}')
        out += [
            "# HELP storage_http_request_seconds Cumulative request latency",
            "# TYPE storage_http_request_seconds summary",
        ]
        for (m, r), total in sorted(latency_sum.items()):
            out.append(
                f'storage_http_request_seconds_sum{{method="{m}",'
                f'route="{r}"}} {total:.6f}')
            out.append(
                f'storage_http_request_seconds_count{{method="{m}",'
                f'route="{r}"}} {latency_count[(m, r)]}')
        out += [
            "# HELP storage_http_request_seconds_hist Request latency"
            " histogram",
            "# TYPE storage_http_request_seconds_hist histogram",
        ]
        for (m, r), cells in sorted(buckets.items()):
            for le, n in zip(
                    [str(b) for b in BUCKETS] + ["+Inf"], cells):
                out.append(
                    f'storage_http_request_seconds_hist_bucket{{'
                    f'method="{m}",route="{r}",le="{le}"}} {n}')
            # the exposition format requires _sum/_count with every
            # histogram; same observations as the summary above
            out.append(
                f'storage_http_request_seconds_hist_sum{{method="{m}",'
                f'route="{r}"}} {latency_sum[(m, r)]:.6f}')
            out.append(
                f'storage_http_request_seconds_hist_count{{'
                f'method="{m}",route="{r}"}} '
                f'{latency_count[(m, r)]}')
        out.append("# HELP storage_uptime_seconds Process uptime")
        out.append("# TYPE storage_uptime_seconds gauge")
        out.append(f"storage_uptime_seconds {time.time() - self.started_at:.3f}")
        return "\n".join(out) + "\n"

"""Server telemetry parsing (F11).

The reference proxies llama-server's /metrics endpoint and flattens every
prometheus sample to {sample_name: value} via prometheus_client
(webapp/llm_processing/routes.py:165-177). This is the stdlib twin of
that flatten — same output contract, no client library. On a cluster the
natural use is per-executor: each host polls ITS server and emits a
metrics row; the rows aggregate like any other DataFrame.
"""

from __future__ import annotations


def parse_prometheus_text(metrics_text: str) -> dict[str, float]:
    """Flatten prometheus text-exposition samples to {name: value}
    (labels ignored, last sample wins — exactly the reference's
    parse_metrics semantics for llama.cpp's label-free gauges/counters).
    Comment/blank/malformed lines are skipped, never fatal."""
    out: dict[str, float] = {}
    for line in (metrics_text or "").splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        # metric_name[{labels}] value [timestamp]
        if "{" in line:
            name, _, rest = line.partition("{")
            _, _, rest = rest.partition("}")
        else:
            name, _, rest = line.partition(" ")
        parts = rest.split()
        if not parts:
            continue
        try:
            value = float(parts[0])
        except ValueError:
            continue
        out[name.strip()] = value
    return out


def fetch_prometheus_metrics(url: str, timeout: float = 10.0) -> dict[str, float]:
    """GET url → flattened samples (reference fetch_metrics + parse_metrics,
    routes.py:165-177). stdlib urllib; raises on bad responses like the
    reference's raise_for_status."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as r:
        if r.status != 200:
            raise RuntimeError(f"metrics endpoint returned {r.status}")
        return parse_prometheus_text(r.read().decode("utf-8", "replace"))

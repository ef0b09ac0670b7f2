"""Observability tests (reference tests/unit/observability/ObservabilityTest)."""

import time

from diagon_tpu.observability import (
    Counter,
    Gauge,
    HealthCheckResult,
    HealthRegistry,
    HealthStatus,
    Histogram,
    MetricsRegistry,
    ProfileScope,
    QueryProfiler,
    Timer,
)
from diagon_tpu.observability.health import device_health_check


def test_counter_gauge():
    c = Counter("c")
    c.increment()
    c.increment(5)
    assert c.value() == 6
    g = Gauge("g")
    g.set(2.5)
    g.add(0.5)
    assert g.value() == 3.0


def test_histogram_percentiles():
    h = Histogram("h", buckets=[1, 2, 4, 8])
    for v in [0.5, 1.5, 3, 3, 7, 100]:
        h.observe(v)
    assert h.count() == 6
    assert h.mean() == sum([0.5, 1.5, 3, 3, 7, 100]) / 6
    assert h.percentile(0.5) <= 4
    assert h.percentile(1.0) == float("inf")


def test_timer_scoped():
    t = Timer("t", buckets=[0.0001, 0.01, 1])
    with t.time():
        time.sleep(0.001)
    assert t.count() == 1
    assert 0 < t.sum() < 1


def test_registry():
    r = MetricsRegistry()
    c1 = r.counter("x")
    c2 = r.counter("x")
    assert c1 is c2
    r.gauge("y").set(5)
    snap = r.snapshot()
    assert snap["x"] == 0 and snap["y"] == 5
    try:
        r.gauge("x")
        assert False
    except TypeError:
        pass


def test_health():
    hr = HealthRegistry()
    hr.register("ok", lambda: HealthCheckResult("ok", HealthStatus.HEALTHY))
    assert hr.overall() == HealthStatus.HEALTHY
    hr.register(
        "warn",
        lambda: HealthCheckResult("warn", HealthStatus.DEGRADED),
        critical=False,
    )
    assert hr.overall() == HealthStatus.DEGRADED
    hr.register("boom", lambda: 1 / 0)
    assert hr.overall() == HealthStatus.UNHEALTHY

    r = device_health_check()
    assert r.status == HealthStatus.HEALTHY


def test_query_profiler():
    p = QueryProfiler.enable()
    with ProfileScope("phase1"):
        time.sleep(0.001)
    with ProfileScope("phase1"):
        pass
    p.begin_phase("manual")
    p.end_phase("manual")
    rep = p.report()
    assert rep["phase1"]["count"] == 2
    assert rep["phase1"]["max_us"] >= 1000
    assert "manual" in rep
    # disabled profiler records nothing
    q = QueryProfiler(enabled=False)
    q.begin_phase("x")
    q.end_phase("x")
    assert q.report() == {}

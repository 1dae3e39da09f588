"""A3 resource monitor: real driver-side cpu/mem gauges (psutil-or-/proc)
feeding the health gate, recorded in round metrics and exported via
prometheus_metrics (reference monitor.py:175-238)."""

from __future__ import annotations

import hashlib

from deepcrawl4ai_spark.frontier import webgraph as WG
from deepcrawl4ai_spark.frontier.engine import CrawlEngine, EngineConfig
from deepcrawl4ai_spark.frontier.monitor import SystemSampler


def test_sampler_fractions_in_range():
    s = SystemSampler()
    cpu0, mem0 = s()
    # burn some cpu so the second interval sample has signal
    for i in range(200_000):
        hashlib.sha1(str(i).encode())
    cpu1, mem1 = s()
    for v in (cpu0, mem0, cpu1, mem1):
        assert 0.0 <= v <= 1.0
    assert mem1 > 0.0  # a running JVM+python leaves real memory used


def test_engine_records_gauges_and_prometheus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gauges"))
    eng = CrawlEngine(
        spark,
        root,
        EngineConfig(
            max_rounds=1,
            global_budget=60,
            max_depth=2,
            health_gauges=SystemSampler(),
        ),
    )
    metrics = eng.run(WG.gen_seeds(16))
    assert metrics, "no rounds ran"
    m = metrics[0]
    assert 0.0 <= m["cpu_frac"] <= 1.0
    assert 0.0 < m["mem_frac"] <= 1.0
    text = eng.store.prometheus_metrics()
    assert "crawl_cpu_frac" in text and "crawl_mem_frac" in text


def test_injected_gauges_scale_budget(spark, tmp_path_factory):
    """A fake 60%-cpu sampler must cut the round budget to base*0.4 —
    the reference DynamicRateLimiter formula (monitor.py:220-238)."""
    root = str(tmp_path_factory.mktemp("fakegauge"))
    eng = CrawlEngine(
        spark,
        root,
        EngineConfig(
            max_rounds=1,
            global_budget=100,
            max_depth=2,
            health_gauges=lambda: (0.6, 0.1),
        ),
    )
    metrics = eng.run(WG.gen_seeds(16))
    assert metrics[0]["round_budget"] == 40
    assert metrics[0]["cpu_frac"] == 0.6 and metrics[0]["mem_frac"] == 0.1

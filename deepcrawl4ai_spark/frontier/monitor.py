"""A3/R7 resource monitor: driver-side cpu/mem sampling feeding the engine's
health gate (reference monitor.py:175-238: SystemStats sampled from
psutil.cpu_percent()/virtual_memory().percent, and DynamicRateLimiter scales
the budget by min(1-cpu, 1-mem, 1-err) floored at 10).

psutil is not in this sandbox: the sampler prefers it when importable and
falls back to /proc (Linux: /proc/stat deltas for cpu, /proc/meminfo
MemAvailable for mem) — REAL gauges either way, no third-party dependency.
Fractions in [0, 1]. A SystemSampler instance is directly usable as
``EngineConfig.health_gauges`` (it is a callable returning (cpu, mem)).

Gauges are wall-clock state — non-replayable by nature. Golden tests and
deterministic replays leave health_gauges=None; the bench opts in to record
real utilization next to throughput.
"""

from __future__ import annotations


def _read_proc_stat() -> tuple[int, int] | None:
    """(busy, total) jiffies from /proc/stat's aggregate cpu line."""
    try:
        with open("/proc/stat") as f:
            line = f.readline()
    except OSError:
        return None
    parts = line.split()
    if parts[0] != "cpu" or len(parts) < 5:
        return None
    vals = [int(x) for x in parts[1:]]
    total = sum(vals)
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    return total - idle, total


def _read_meminfo_frac() -> float:
    """Used-memory fraction = 1 - MemAvailable/MemTotal (psutil's formula)."""
    total = avail = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total = int(line.split()[1])
                elif line.startswith("MemAvailable:"):
                    avail = int(line.split()[1])
                if total is not None and avail is not None:
                    break
    except OSError:
        return 0.0
    if not total or avail is None:
        return 0.0
    return max(0.0, min(1.0, 1.0 - avail / total))


class SystemSampler:
    """Callable (cpu_frac, mem_frac) sampler.

    cpu is measured over the interval since the PREVIOUS call (exactly
    psutil.cpu_percent(interval=None) semantics, including the 0.0 first
    call); mem is instantaneous."""

    def __init__(self) -> None:
        try:  # pragma: no cover — psutil absent in-sandbox
            import psutil

            self._psutil = psutil
            psutil.cpu_percent()  # prime the interval baseline
        except ImportError:
            self._psutil = None
        self._last: tuple[int, int] | None = _read_proc_stat()

    def cpu_mem(self) -> tuple[float, float]:
        if self._psutil is not None:  # pragma: no cover
            return (
                self._psutil.cpu_percent() / 100.0,
                self._psutil.virtual_memory().percent / 100.0,
            )
        cur = _read_proc_stat()
        cpu = 0.0
        if cur is not None and self._last is not None:
            dbusy = cur[0] - self._last[0]
            dtotal = cur[1] - self._last[1]
            if dtotal > 0:
                cpu = max(0.0, min(1.0, dbusy / dtotal))
        self._last = cur
        return cpu, _read_meminfo_frac()

    __call__ = cpu_mem

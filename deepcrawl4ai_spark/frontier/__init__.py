"""Frontier package. Shared constants live here so the Spark engine, the
pure-Python simulator, and bench tooling agree by construction (ADVICE r4).
"""

# per-round token budget for a host with NO robots row, before budget_scale.
# Used by engine.py (selection fallback), simulator.py (golden twin), and
# tools/bench_scaling.py --verify-politeness (invariant check).
DEFAULT_HOST_MAX_TOKENS = 2

"""robots.txt parsing — the real-text half of the politeness scheduler
(north_rule: "per-host politeness scheduler (robots.txt cache, crawl-delay,
token-bucket budget)"). The engine's broadcast robots dim table has so far
been synthesized (webgraph.robots_rows); this module parses actual
robots.txt BODIES into those rows, so a crawl over real hosts feeds the
same politeness machinery unchanged.

Grammar per the public robots.txt spec (REP, RFC 9309) plus the de facto
Crawl-delay extension:
- groups = consecutive ``User-agent:`` lines followed by rules; a crawler
  obeys the group whose agent token is the LONGEST prefix match of its own
  UA, falling back to ``*``;
- ``Allow``/``Disallow`` match by longest rule path, allow winning ties;
- ``*`` wildcards and ``$`` end anchors in rule paths;
- comments (#) and blank lines ignored, keys case-insensitive.

Spark path: ``robots_rules_df`` maps a (host, robots_txt) table to rule
rows Arrow-batched — one robots.txt is small, but a 10^7-host crawl parses
them as a DataFrame column, never on the driver.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_UA = "deepcrawl4ai"


def parse_robots_txt(body: str | None, user_agent: str = DEFAULT_UA) -> dict:
    """Parse one robots.txt body → the group applying to *user_agent*:
    {"disallow": [...], "allow": [...], "crawl_delay": float | None}."""
    groups: list[dict] = []  # {"agents": [...], "allow": [], "disallow": [], "delay": None}
    cur: dict | None = None
    in_agent_run = False  # consecutive User-agent lines share one group
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                cur = {"agents": [], "allow": [], "disallow": [], "delay": None}
                groups.append(cur)
                in_agent_run = True
            cur["agents"].append(val.lower())
            continue
        in_agent_run = False
        if cur is None:  # rules before any User-agent line: ignored per spec
            continue
        if key == "disallow" and val:
            cur["disallow"].append(val)
        elif key == "allow" and val:
            cur["allow"].append(val)
        elif key == "crawl-delay":
            try:
                cur["delay"] = float(val)
            except ValueError:
                pass
    # group selection: longest agent token that prefixes our UA; '*' = len 0
    ua = user_agent.lower()
    best: dict | None = None
    best_len = -1
    for g in groups:
        for a in g["agents"]:
            if a == "*":
                match_len = 0
            elif ua.startswith(a):
                match_len = len(a)
            else:
                continue
            if match_len > best_len:
                best, best_len = g, match_len
    if best is None:
        return {"disallow": [], "allow": [], "crawl_delay": None}
    return {
        "disallow": list(best["disallow"]),
        "allow": list(best["allow"]),
        "crawl_delay": best["delay"],
    }


def _rule_regex(rule: str) -> re.Pattern:
    """A rule path → anchored regex: '*' = any run, trailing '$' = end."""
    anchored = rule.endswith("$")
    core = rule[:-1] if anchored else rule
    pat = "".join(".*" if ch == "*" else re.escape(ch) for ch in core)
    return re.compile("^" + pat + ("$" if anchored else ""))


def is_allowed(rules: dict, path: str) -> bool:
    """Longest-match REP semantics over the parsed group; allow wins ties.
    No matching rule → allowed."""
    best_len = -1
    allowed = True
    for verdict, lst in ((False, rules.get("disallow", [])), (True, rules.get("allow", []))):
        for rule in lst:
            if _rule_regex(rule).match(path):
                # RFC 9309 §2.2.2 ranks by octet length of the full rule
                # path ('*' counts; only a trailing '$' anchor doesn't) —
                # stripping '*' here would let '/ab' outrank '/a*' (ADVICE r3)
                specificity = len(rule) - (1 if rule.endswith("$") else 0)
                if specificity > best_len or (specificity == best_len and verdict):
                    best_len = specificity
                    allowed = verdict
    return allowed


ROBOTS_RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_rules", T.ArrayType(T.StringType()), False),
        T.StructField("allow_rules", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)


def robots_rules_df(robots_docs: DataFrame, user_agent: str = DEFAULT_UA) -> DataFrame:
    """(host, robots_txt) → parsed per-host rule rows, Arrow-batched."""

    def _parse(batches):
        for pdf in batches:
            rows = [parse_robots_txt(b, user_agent) for b in pdf["robots_txt"]]
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "disallow_rules": [r["disallow"] for r in rows],
                    "allow_rules": [r["allow"] for r in rows],
                    "crawl_delay": [r["crawl_delay"] for r in rows],
                }
            )

    return robots_docs.select("host", "robots_txt").mapInPandas(
        _parse, ROBOTS_RULES_SCHEMA
    )


def to_engine_rows(parsed: list[dict], budget_base: float = 8.0) -> list[dict]:
    """Parsed rules → the engine's robots dim rows (webgraph.robots_rows
    shape): crawl delay ⇒ per-round fetch capacity, same formula the
    synthetic table uses (budget = max(1, int(base/delay/2)))."""
    out = []
    for p in parsed:
        delay = p.get("crawl_delay") or 1.0
        budget = max(1, int(budget_base / delay / 2))
        out.append(
            {
                "host": p["host"],
                "crawl_delay": delay,
                "rps_budget": float(budget),
                "max_tokens": budget,
                "disallow_rules": list(p.get("disallow", [])),
            }
        )
    return out


def render_robots_txt(rules: dict) -> str:
    """Serialize an engine rule row back to robots.txt text (the synthetic
    web server's /robots.txt body) — with a decoy group for another UA so
    parsers must do real group selection."""
    lines = [
        "# synthetic robots.txt",
        "User-agent: otherbot",
        "Disallow: /",
        "",
        "User-agent: *",
    ]
    for d in rules.get("disallow_rules", []):
        lines.append(f"Disallow: {d}")
    delay = rules.get("crawl_delay")
    if delay is not None:
        lines.append(f"Crawl-delay: {delay}")
    return "\n".join(lines) + "\n"

"""robots.txt parser: REP grammar (groups, longest-prefix UA selection,
wildcard/anchor rules, longest-match allow-vs-disallow), round-trip against
the synthetic politeness table, the Spark Arrow-batched derivation, and the
HTTP wire (server /robots.txt route → parse → engine rows)."""

from __future__ import annotations

import urllib.request

from deepcrawl4ai_spark.frontier import webgraph as WG
from deepcrawl4ai_spark.functions.robots import (
    is_allowed,
    parse_robots_txt,
    render_robots_txt,
    robots_rules_df,
    to_engine_rows,
)

MESSY = """
# global group
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2

User-agent: deepcrawl4ai
User-agent: otherbot
Disallow: /api/*.json$
Disallow: /tmp
Crawl-delay: 0.5

User-agent: deepcrawl4ai-images
Disallow: /
"""


def test_group_selection_longest_prefix():
    # our UA matches both '*' and 'deepcrawl4ai' — the longer token wins
    g = parse_robots_txt(MESSY, "deepcrawl4ai")
    assert g["disallow"] == ["/api/*.json$", "/tmp"]
    assert g["crawl_delay"] == 0.5
    # a sub-agent UA prefers its exact group over the shorter prefix
    gi = parse_robots_txt(MESSY, "deepcrawl4ai-images")
    assert gi["disallow"] == ["/"]
    # unknown UA falls back to '*'
    gu = parse_robots_txt(MESSY, "somebody-else")
    assert gu["disallow"] == ["/private/"] and gu["crawl_delay"] == 2.0


def test_rule_matching_wildcards_and_precedence():
    g = parse_robots_txt(MESSY, "deepcrawl4ai")
    assert not is_allowed(g, "/api/data.json")  # wildcard + $ anchor
    assert is_allowed(g, "/api/data.jsonl")  # $ anchor stops the match
    assert not is_allowed(g, "/tmp/x")  # prefix rule
    assert is_allowed(g, "/open/page")  # no rule → allowed
    gstar = parse_robots_txt(MESSY, "nobody")
    assert not is_allowed(gstar, "/private/secret")
    assert is_allowed(gstar, "/private/ok/page")  # longer Allow wins


def test_empty_and_malformed_bodies():
    assert parse_robots_txt(None) == {"disallow": [], "allow": [], "crawl_delay": None}
    g = parse_robots_txt("Disallow: /lost\nnonsense line\nCrawl-delay: abc")
    assert g["disallow"] == []  # rules before any User-agent are ignored


def test_roundtrip_synthetic_politeness_table():
    """render → parse → to_engine_rows reproduces every synthetic host's
    politeness row (the engine's broadcast dim) exactly."""
    for row in WG.robots_rows():
        parsed = parse_robots_txt(render_robots_txt(row), "deepcrawl4ai")
        parsed["host"] = row["host"]
        (eng,) = to_engine_rows([parsed])
        assert eng["host"] == row["host"]
        assert eng["disallow_rules"] == row["disallow_rules"]
        assert eng["crawl_delay"] == row["crawl_delay"]
        assert eng["max_tokens"] == row["max_tokens"]


def test_robots_rules_df_spark(spark):
    docs = spark.createDataFrame(
        [
            ("a.example.com", MESSY),
            ("b.example.com", "User-agent: *\nDisallow: /x\n"),
            ("c.example.com", None),
        ],
        "host string, robots_txt string",
    )
    rows = {r["host"]: r for r in robots_rules_df(docs).collect()}
    assert rows["a.example.com"]["disallow_rules"] == ["/api/*.json$", "/tmp"]
    assert rows["a.example.com"]["crawl_delay"] == 0.5
    assert rows["b.example.com"]["disallow_rules"] == ["/x"]
    assert rows["c.example.com"]["disallow_rules"] == []


def test_robots_over_http_wire():
    """The synthetic web server serves real robots.txt bodies; fetching and
    parsing one yields the host's engine row — the robots-cache fill path a
    live crawl runs before fetching a new host."""
    from deepcrawl4ai_spark.frontier.httpserver import SyntheticWebServer

    host = WG.robots_rows()[3]["host"]  # i%7==3 → has a disallow rule
    with SyntheticWebServer() as srv:
        body = (
            urllib.request.urlopen(f"{srv.base}/robots.txt?h={host}", timeout=10)
            .read()
            .decode()
        )
    parsed = parse_robots_txt(body, "deepcrawl4ai")
    parsed["host"] = host
    (eng,) = to_engine_rows([parsed])
    ref = next(r for r in WG.robots_rows() if r["host"] == host)
    assert eng["disallow_rules"] == ref["disallow_rules"] == ["/p/9"]
    assert eng["max_tokens"] == ref["max_tokens"]

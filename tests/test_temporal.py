"""Invariant tests for the temporal family (operators/temporal.py) and the
F4/F5 page-variant batch model — properties the DuckDB oracle parity check
can't express (the oracle proves Spark==SQL; these prove the semantics are
the ones we advertised)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from tests.conftest import SF_SMALL

GAP_US = 1800 * 1_000_000


def test_sessionize_gap_invariants(spark):
    """Consecutive sessions of one user are separated by > 30 min, and
    every session's span is consistent (start ≤ end, n_events ≥ 1)."""
    from deepcrawl4ai_spark.operators.temporal import sessionize_events

    rows = sessionize_events(spark, SF_SMALL).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1
        by_user[r["user_id"]].append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r["session_idx"])
        # session indices are 1..n dense
        assert [r["session_idx"] for r in sess] == list(range(1, len(sess) + 1))
        for a, b in zip(sess, sess[1:]):
            gap = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap * 1e6 > GAP_US, (a, b)


def test_asof_join_backward_and_exact(spark):
    """Every attached view value is the max-(ts, event_id) view at or before
    the click, recomputed independently driver-side."""
    from deepcrawl4ai_spark.operators.temporal import asof_join_events
    from deepcrawl4ai_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    views = defaultdict(list)
    for r in ev:
        if r["event_type"] == "view":
            views[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    for v in views.values():
        v.sort()
    out = asof_join_events(spark, SF_SMALL).collect()
    assert out
    n_matched = 0
    for r in out:
        cands = [v for v in views.get(r["user_id"], []) if v[0] <= r["click_ts"]]
        expect = cands[-1][2] if cands else None
        assert r["last_view_value"] == expect, r
        n_matched += expect is not None
    assert n_matched > 0


def test_train_split_deterministic_and_proportional(spark):
    from deepcrawl4ai_spark.operators.temporal import train_split_docs

    a = {r["doc_id"]: r["split"] for r in train_split_docs(spark, SF_SMALL).collect()}
    b = {r["doc_id"]: r["split"] for r in train_split_docs(spark, SF_SMALL).collect()}
    assert a == b
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.6 < frac_train < 0.95  # 80% nominal, small-sample slack


def test_asof_join_tie_breaks(spark, tmp_path):
    """Hand-built boundary cases — the places as-of implementations diverge:
    a view at EXACTLY the click's ts matches (backward-inclusive); among
    equal-ts views the highest event_id wins; a view strictly after the
    click never matches."""
    import datetime as dt

    from deepcrawl4ai_spark.operators.temporal import asof_join_events

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    sec = dt.timedelta(seconds=1)
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, t, 1, "view", 10.0, "{}"),
        (2, t, 1, "view", 20.0, "{}"),       # same ts, higher id → wins ties
        (3, t, 1, "click", 0.0, "{}"),       # same-ts click → sees view 2
        (4, t + sec, 1, "view", 30.0, "{}"),  # after click 3, before click 5
        (5, t + 2 * sec, 1, "click", 0.0, "{}"),
        (6, t + 3 * sec, 2, "view", 99.0, "{}"),
        (7, t + 2 * sec, 2, "click", 0.0, "{}"),  # view is in the future → null
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["click_id"]: r["last_view_value"]
        for r in asof_join_events(spark, str(tmp_path)).collect()
    }
    assert out == {3: 20.0, 5: 30.0, 7: None}


def test_f4_variants_monotone_and_complete(spark):
    """Scroll variants accumulate: n_items non-decreasing in page_variant,
    final variant exposes the whole page, n_media ≤ n_items."""
    from deepcrawl4ai_spark.operators.spans import (
        _with_spans,
        f4_scroll_variants,
    )
    from deepcrawl4ai_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    total = {
        r["doc_id"]: r["n"]
        for r in _with_spans(load_table(spark, SF_SMALL, "documents"))
        .select("doc_id", F.size("spans").alias("n"))
        .collect()
    }
    by_doc = defaultdict(dict)
    for r in f4_scroll_variants(spark, SF_SMALL).collect():
        assert 0 <= r["n_media"] <= r["n_items"]
        by_doc[r["doc_id"]][r["page_variant"]] = r["n_items"]
    assert by_doc
    for d, vs in by_doc.items():
        seq = [vs[v] for v in sorted(vs)]
        assert seq == sorted(seq)
        assert seq[-1] == total[d]

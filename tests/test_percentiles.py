"""a9_percentiles_approx's in-query verification gate (ADVICE r4): the
rank-based band must stay TRUE for a correct sketch at ANY group size —
including tiny groups where approx_percentile returns an actual data point
that can sit outside an interpolated ±1% band."""

from __future__ import annotations

import pytest

from deepcrawl4ai_spark.operators.relational import a9_percentiles_approx


@pytest.mark.parametrize("group_n", [7, 10, 53, 200])
def test_approx_band_robust_at_small_n(spark, tmp_path_factory, group_n):
    sf_dir = str(tmp_path_factory.mktemp(f"tinyevents{group_n}"))
    rows = [
        (f"type{g}", f"u{i}", float((i * 37 + g * 11) % 100) + g, "2024-01-01 00:00:00")
        for g in range(3)
        for i in range(group_n)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, user_id string, value double, ts string"
    ).selectExpr("event_type", "user_id", "value", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    df.write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    out = a9_percentiles_approx(spark, sf_dir).collect()
    assert len(out) == 3
    for r in out:
        assert r["n"] == group_n
        assert r["approx_ok"], f"gate tripped on a correct sketch at n={group_n}: {r}"


def test_bpe_merges_chain(spark):
    """BPE induction sanity beyond the oracle: 8 ordered merges, counts
    non-increasing is NOT required (merges change pair counts), but ranks
    are 1..8, every merged symbol is the concat of its pair, and at least
    one later merge builds on an earlier merged symbol (the iterative
    dependency actually exercised)."""
    from deepcrawl4ai_spark.operators.textops import bpe_merges

    rows = sorted(
        bpe_merges(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["merge_rank"],
    )
    assert [r["merge_rank"] for r in rows] == list(range(1, 9))
    for r in rows:
        assert r["merged"] == r["a"] + r["b"]
        assert r["pair_cnt"] > 0
    merged_syms = {r["merged"] for r in rows}
    assert any(
        r["a"] in merged_syms or r["b"] in merged_syms for r in rows
    ), "no merge ever used an earlier merged symbol"

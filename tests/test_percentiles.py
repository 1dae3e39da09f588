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


def _write_docs(spark, sf_dir, texts):
    rows = [
        (i + 1, t, "en", "web", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")


def test_dedup_substring_spans_islands(spark, tmp_path_factory):
    """Two docs share a verbatim 7-word run: every in-run 5-shingle is
    duplicated, and consecutive duplicated starts must merge into ONE
    maximal island per doc with span_words = 7 and n_shingles = 3."""
    from deepcrawl4ai_spark.operators.dedup import dedup_substring_spans

    sf_dir = str(tmp_path_factory.mktemp("substrspans"))
    shared = "alpha beta gamma delta epsilon zeta eta"
    _write_docs(
        spark,
        sf_dir,
        [f"u1 u2 {shared} u3", f"v1 {shared} v2 v3"],
    )
    rows = sorted(
        dedup_substring_spans(spark, sf_dir).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [
        (r["doc_id"], r["span_start"], r["span_words"], r["n_shingles"])
        for r in rows
    ] == [(1, 2, 7, 3), (2, 1, 7, 3)]


def test_dedup_paragraphs_apply_keeps_first_occurrence(spark, tmp_path_factory):
    """The corpus-wide FIRST occurrence of a repeated paragraph survives
    (C4's remove-all-but-one policy); later occurrences are cut while the
    <8-word tail always survives."""
    from deepcrawl4ai_spark.operators.dedup import dedup_paragraphs_apply

    sf_dir = str(tmp_path_factory.mktemp("paraapply"))
    para_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    para_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    _write_docs(
        spark,
        sf_dir,
        [f"{para_a} {para_b}", f"{para_a} t1 t2 t3"],
    )
    rows = {r["doc_id"]: r for r in dedup_paragraphs_apply(spark, sf_dir).collect()}
    assert rows[1]["n_paras"] == 2 and rows[1]["n_removed"] == 0
    assert rows[1]["clean_text"] == f"{para_a} {para_b}"
    assert rows[2]["n_paras"] == 1 and rows[2]["n_removed"] == 1
    assert rows[2]["clean_text"] == "t1 t2 t3"


def test_dedup_substring_apply_cuts_non_keeper(spark, tmp_path_factory):
    """The cut step keeps the corpus-first occurrence of a duplicated run
    and removes every word covered by later occurrences, leaving the rest
    of the doc intact."""
    from deepcrawl4ai_spark.operators.dedup import dedup_substring_apply

    sf_dir = str(tmp_path_factory.mktemp("substrapply"))
    shared = "alpha beta gamma delta epsilon"
    _write_docs(
        spark,
        sf_dir,
        [f"u1 {shared} u2", f"v1 v2 {shared} v3"],
    )
    rows = {r["doc_id"]: r for r in dedup_substring_apply(spark, sf_dir).collect()}
    assert rows[1]["n_removed"] == 0
    assert rows[1]["clean_text"] == f"u1 {shared} u2"
    assert rows[2]["n_removed"] == 5
    assert rows[2]["clean_text"] == "v1 v2 v3"

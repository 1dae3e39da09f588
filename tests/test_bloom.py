"""Unit tests for the partitioned bloom filter (SURVEY.md J3)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from deepcrawl4ai_spark.frontier import bloom


def _hashes(prefix: str, n: int) -> list[str]:
    return [hashlib.sha1(f"{prefix}:{i}".encode()).hexdigest() for i in range(n)]


def test_no_false_negatives(spark):
    inserted = _hashes("in", 500)
    df = spark.createDataFrame([(h,) for h in inserted], ["url_hash"])
    filters = bloom.build_filters(df, 0)
    flagged = bloom.maybe_seen(df, filters)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_low_false_positive_rate(spark):
    inserted = _hashes("in", 500)
    other = _hashes("out", 2000)
    filters = bloom.build_filters(
        spark.createDataFrame([(h,) for h in inserted], ["url_hash"]), 0
    )
    probe = spark.createDataFrame([(h,) for h in other], ["url_hash"])
    fp = bloom.maybe_seen(probe, filters).filter(F.col("maybe_seen")).count()
    assert fp / len(other) < 0.05  # 2^17 bits/partition, k=4, tiny load


def test_merge_is_union(spark):
    a = _hashes("a", 300)
    b = _hashes("b", 300)
    fa = bloom.build_filters(spark.createDataFrame([(h,) for h in a], ["url_hash"]), 0)
    fb = bloom.build_filters(spark.createDataFrame([(h,) for h in b], ["url_hash"]), 1)
    merged = bloom.merge_filters(fa, fb, 1)
    probe = spark.createDataFrame([(h,) for h in a + b], ["url_hash"])
    assert bloom.maybe_seen(probe, merged).filter(~F.col("maybe_seen")).count() == 0
    # idempotent: merging the same filter twice changes nothing
    again = bloom.merge_filters(merged, fb, 2)
    bits1 = {r["partition_id"]: r["bits"] for r in merged.collect()}
    bits2 = {r["partition_id"]: r["bits"] for r in again.collect()}
    assert bits1 == bits2


def test_empty_filter_partition(spark):
    """Candidates landing in a partition with no filter row → definitely new."""
    inserted = _hashes("in", 10)
    filters = bloom.build_filters(
        spark.createDataFrame([(h,) for h in inserted], ["url_hash"]), 0
    )
    probe = spark.createDataFrame([(h,) for h in _hashes("probe", 200)], ["url_hash"])
    out = bloom.maybe_seen(probe, filters)
    assert out.count() == 200  # every candidate row survives the cogroup

"""S8 blob sink/source analog: multipart roundtrip, bucket pruning layout,
span read-back join, presigned tokens (reference storage.py:91-341)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from deepcrawl4ai_spark.sources import blobstore as B


def test_multipart_roundtrip(spark, tmp_path):
    """Payloads above the part size split into ordered parts and reassemble
    byte-exact; small payloads stay single-part."""
    big = bytes(range(256)) * 40  # 10240 B → 3 parts at 4 KiB
    small = b"tiny"
    df = spark.createDataFrame(
        [("media://a", bytearray(big)), ("media://b", bytearray(small))],
        "media_ref string, payload binary",
    )
    path = str(tmp_path / "blobs")
    B.put_blobs(df, path, part_bytes=4096)
    blobs = B.read_blobs(spark, path)
    parts = {r["media_ref"]: r["n"] for r in blobs.groupBy("media_ref").agg(F.count("*").alias("n")).collect()}
    assert parts == {"media://a": 3, "media://b": 1}
    assert B.get_blob(spark, path, "media://a") == big
    assert B.get_blob(spark, path, "media://b") == small
    # hive bucket layout on disk — the GET's partition pruning surface
    assert any(d.startswith("bucket=") for d in os.listdir(path))


def test_media_table_roundtrip_and_resolve(spark, tmp_path):
    """The synthetic media table survives a put/resolve cycle: every payload
    reattaches to its ref byte-exact via the bucketed join."""
    from deepcrawl4ai_spark.multimodal.media import synth_media_df

    media = synth_media_df(spark, 64)
    path = str(tmp_path / "mblobs")
    B.put_blobs(media.select("media_ref", "payload"), path, part_bytes=64)
    spans = media.select("media_ref", "kind")  # a spans-like ref table
    resolved = B.resolve_media(spans, B.read_blobs(spark, path))
    got = {r["media_ref"]: bytes(r["payload"]) for r in resolved.collect()}
    want = {r["media_ref"]: bytes(r["payload"]) for r in media.collect()}
    assert got == want


def test_read_any_content_negotiation(spark, tmp_path):
    """S3 reader dispatch: parquet/json/csv/text round-trip the same rows;
    unknown extensions fail loudly."""
    import pytest

    from deepcrawl4ai_spark.sources.tables import read_any

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    p = {ext: str(tmp_path / f"t_{ext}") for ext in ("parquet", "json", "csv")}
    df.write.parquet(p["parquet"])
    df.write.json(p["json"])
    df.write.options(header=True).csv(p["csv"])
    for ext, path in p.items():
        got = {
            (r["id"], r["name"])
            for r in read_any(spark, path, fmt=ext).select("id", "name").collect()
        }
        assert got == {(1, "a"), (2, "b")}, ext
    # extension-based dispatch (no fmt) + loud failure on unknown types
    f = str(tmp_path / "byext.json")
    df.write.json(f)
    assert read_any(spark, f).count() == 2
    with pytest.raises(ValueError, match="unsupported content type"):
        read_any(spark, "/tmp/file.xyz")
    with pytest.raises(ValueError, match="unsupported content type"):
        read_any(spark, p["parquet"])  # extension-less dir needs fmt=


def test_prometheus_exposition(spark, tmp_path_factory):
    """A5: committed round metrics render as Prometheus text format."""
    from deepcrawl4ai_spark.frontier import webgraph as WG
    from deepcrawl4ai_spark.frontier.engine import CrawlEngine, EngineConfig

    root = str(tmp_path_factory.mktemp("prom"))
    eng = CrawlEngine(spark, root, EngineConfig(global_budget=40, max_rounds=2))
    metrics = eng.run(WG.gen_seeds(16))
    text = eng.store.prometheus_metrics()
    assert f"crawl_rounds_total {len(metrics)}" in text
    total_fetched = sum(m["urls_fetched"] for m in metrics)
    assert f"crawl_urls_fetched_total {total_fetched}" in text
    assert f"crawl_urls_fetched_last {metrics[-1]['urls_fetched']}" in text
    assert 'crawl_table_bytes{table="results"}' in text
    for line in text.strip().splitlines():
        assert line.startswith("#") or " " in line  # exposition shape


def test_warm_pool(spark):
    """F8: pool warm-up touches executor workers ahead of the first fetch."""
    from deepcrawl4ai_spark.frontier.fetcher import warm_pool

    n = warm_pool(spark, "warm_cfg")
    assert 1 <= n <= spark.sparkContext.defaultParallelism


def test_presign_roundtrip():
    url = B.presign("media://x/1", expires_round=7)
    assert url.startswith("blob://media://x/1?expires=7&sig=")
    assert B.presign("media://x/1", 7) == url  # deterministic
    assert B.verify_presigned(url, current_round=7)
    assert not B.verify_presigned(url, current_round=8)  # expired
    assert not B.verify_presigned(url.replace("sig=", "sig=00"), 7)  # tampered
    assert not B.verify_presigned("blob://garbage", 0)

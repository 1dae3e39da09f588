"""S8: object-store blob sink/source analog (reference storage.py:91-341).

The reference streams zstd-compressed crawl blobs to S3: multipart upload
(storage.py:91-169), presigned GET URLs (storage.py:223-247), and streaming
decompression on read-back (storage.py:282-341). The columnar analog keeps
payloads in bucketed parquet — the zstd parquet codec IS the compression
layer — with the same three capabilities:

- ``put_blobs``: payloads larger than PART_BYTES are split into ordered
  parts (the multipart analog, vectorized fan-out — no per-row Python),
  and the table is hive-partitioned by a media_ref-hash bucket so a
  single-ref GET prunes to one directory instead of scanning the store.
- ``get_blob``: reassemble one ref's parts in order (the streaming-download
  analog; driver-side concat is fine — this is the API edge).
- ``resolve_media``: the engine-side read-back path — join a span table's
  media_ref column to payloads with the bucket derived on the fly, so only
  metadata travels until the payload bytes are actually needed.
- ``presign``: a deterministic token standing in for the presigned URL
  (no wall clock — expiry is a round number, replays are exact).

At 100 TB: payload bytes never enter a shuffle — puts write straight to
bucketed storage; gets/joins prune by bucket; only (media_ref, bucket,
part_idx) key columns move.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_BYTES = int(os.environ.get("CRAWL_BLOB_PART_BYTES", str(1 << 20)))  # 1 MiB
N_BUCKETS = int(os.environ.get("CRAWL_BLOB_BUCKETS", "16"))


def bucket_col(media_ref_col):
    """Storage bucket from the ref's md5 prefix — pure SQL, computable by
    writers and readers alike without a lookup."""
    return (F.conv(F.substring(F.md5(media_ref_col), 1, 4), 16, 10) % N_BUCKETS).cast(
        "int"
    )


def put_blobs(media: DataFrame, path: str, part_bytes: int = PART_BYTES) -> None:
    """Write (media_ref, payload) rows as a bucketed multipart blob table.

    Vectorized multipart split: sequence → transform → explode (JVM-side);
    substr on binary slices the payload per part. One file per bucket per
    put (repartition by bucket before the partitioned write)."""
    n_parts = F.greatest(
        F.lit(1), F.ceil(F.length("payload") / F.lit(part_bytes)).cast("int")
    )
    parts = (
        media.select(
            "media_ref",
            "payload",
            bucket_col(F.col("media_ref")).alias("bucket"),
            n_parts.alias("n_parts"),
        )
        .select(
            "media_ref",
            "bucket",
            "n_parts",
            F.explode(F.sequence(F.lit(0), F.col("n_parts") - 1)).alias("part_idx"),
            F.col("payload"),
        )
        .select(
            "media_ref",
            "bucket",
            "n_parts",
            "part_idx",
            F.expr(f"substring(payload, part_idx * {part_bytes} + 1, {part_bytes})").alias(
                "part"
            ),
        )
    )
    (
        parts.repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_blobs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def get_blob(spark: SparkSession, path: str, media_ref: str) -> bytes:
    """Reassemble one blob (bucket-pruned single-directory scan)."""
    b = int(
        hashlib.md5(media_ref.encode("utf-8")).hexdigest()[:4], 16
    ) % N_BUCKETS
    rows = (
        read_blobs(spark, path)
        .filter((F.col("bucket") == b) & (F.col("media_ref") == media_ref))
        .select("part_idx", "part")
        .orderBy("part_idx")
        .collect()
    )
    return b"".join(bytes(r["part"]) for r in rows)


def resolve_media(spans_df: DataFrame, blobs: DataFrame) -> DataFrame:
    """Engine-side read-back: attach payloads to media spans by
    (bucket, media_ref) — the bucket equi-key keeps the join storage-aligned
    so only the referenced buckets are scanned."""
    refs = spans_df.withColumn("bucket", bucket_col(F.col("media_ref")))
    whole = (
        blobs.groupBy("media_ref", "bucket")
        .agg(F.array_sort(F.collect_list(F.struct("part_idx", "part"))).alias("ps"))
        .select(
            "media_ref",
            "bucket",
            F.aggregate(
                F.col("ps"),
                F.lit(b""),
                lambda acc, p: F.concat(acc, p["part"]),
            ).alias("payload"),
        )
    )
    return refs.join(whole, ["media_ref", "bucket"], "left")


def presign(media_ref: str, expires_round: int, secret: str = "blobstore") -> str:
    """Deterministic presigned-GET analog (reference storage.py:223-247):
    token binds the ref and an expiry round — no wall clock, replayable."""
    sig = hashlib.sha1(f"{secret}:{media_ref}:{expires_round}".encode()).hexdigest()
    return f"blob://{media_ref}?expires={expires_round}&sig={sig[:16]}"


def verify_presigned(url: str, current_round: int, secret: str = "blobstore") -> bool:
    """True iff the token matches and has not expired (round arithmetic)."""
    try:
        ref, rest = url[len("blob://") :].split("?", 1)
        params = dict(kv.split("=", 1) for kv in rest.split("&"))
        expires = int(params["expires"])
    except (ValueError, KeyError):
        return False
    if current_round > expires:
        return False
    expect = hashlib.sha1(f"{secret}:{ref}:{expires}".encode()).hexdigest()[:16]
    return params.get("sig") == expect

"""Parquet table loaders for the driver testdata star schema."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_any(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """S3: content-negotiated reader (reference api.py:731-753 dispatches on
    Accept/Content-Type) — format from the explicit *fmt* else the path
    extension. Columnar formats keep pushdown; text formats get schema
    inference. Unknown extensions raise rather than guess."""
    ext = (fmt or os.path.splitext(path.rstrip("/"))[1].lstrip(".")).lower()
    if ext in ("parquet", "pq"):
        return spark.read.parquet(path)
    if ext == "orc":
        return spark.read.orc(path)
    if ext in ("json", "ndjson", "jsonl"):
        return spark.read.json(path)
    if ext in ("csv", "tsv"):
        return spark.read.options(
            header=True, inferSchema=True, sep="\t" if ext == "tsv" else ","
        ).csv(path)
    if ext in ("txt", "text", "md"):
        return spark.read.text(path)
    raise ValueError(f"unsupported content type: {ext!r} for {path}")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

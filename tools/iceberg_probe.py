"""Iceberg runtime probe (standing VERDICT cadence item): one scripted
attempt per round to bring up the real Iceberg runtime; the outcome is
recorded in BENCH/iceberg_probe_r{N}.md regardless. The parquet+manifest
checkpoint analog stays behind tests/test_checkpoint_conformance.py, which
is the acceptance gate for any future swap-in.

Usage: PYTHONPATH=. python tools/iceberg_probe.py
Prints OK or the failure class + first error lines.
"""

from __future__ import annotations

import sys
import tempfile


def main() -> int:
    from pyspark.sql import SparkSession

    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    try:
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("iceberg_probe")
            .config(
                "spark.jars.packages",
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0",
            )
            .config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", wh)
            .getOrCreate()
        )
        spark.sql("CREATE TABLE local.db.probe (id BIGINT) USING iceberg")
        spark.sql("INSERT INTO local.db.probe VALUES (1), (2)")
        n = spark.sql("SELECT count(*) FROM local.db.probe").head()[0]
        print(f"OK: iceberg table round-trip, {n} rows")
        return 0
    except Exception as e:  # noqa: BLE001
        lines = str(e).splitlines()
        print("FAILED:", lines[0] if lines else type(e).__name__)
        for ln in lines[1:6]:
            print("  " + ln)
        return 1


if __name__ == "__main__":
    sys.exit(main())

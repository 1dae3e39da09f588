"""Structured Streaming surface (SURVEY.md §2.9): the reference's
micro-batch worker loop + SSE fan-out (crawl.py:189-214, tasks.py:580-636)
as readStream → watermark → windowed agg → sink.

The frontier round IS the micro-batch (T1); these helpers cover the
streaming-API surface for consumers that want live tailing of results or
event-time rollups with late-data handling (T4/T8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepcrawl4ai_spark.frontier.engine import CrawlEngine


def results_stream(spark: SparkSession, results_glob: str) -> DataFrame:
    """Tail the results table as a file stream (micro-batch per committed
    round; maxFilesPerTrigger bounds batch size like XREAD COUNT 20,
    reference job.py:405-408)."""
    return (
        spark.readStream.schema(CrawlEngine._results_schema())
        .option("maxFilesPerTrigger", 4)
        .option("recursiveFileLookup", "true")
        .parquet(results_glob)
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour", slide: str | None = None,
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed aggregation with a watermark for late data (T4/T8):
    counts + value sums per (window, event_type)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> list:
    """Drain everything currently available into an in-memory sink and return
    the rows (availableNow trigger = the reference's 'completed' watermark,
    T3 — the stream ends when all committed data is consumed)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q.sparkSession.sql(f"SELECT * FROM {query_name}").collect()

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


def run_streaming_crawl(
    spark: SparkSession,
    store_root: str,
    cfg,
    seed_urls: list[str] | None = None,
    robots_rows: list[dict] | None = None,
    robots_df: DataFrame | None = None,
    timeout_s: float = 600.0,
    stop_after_rounds: int | None = None,
) -> list[dict]:
    """T1 under the STREAMING RUNTIME (VERDICT r3 #6): drive the frontier
    loop from a Structured-Streaming query — a rate source ticks micro-
    batches and each foreachBatch invocation executes exactly one committed
    engine round via CrawlEngine.round_iter, with the checkpoint store as
    the (only) state. Engine semantics are untouched: foreachBatch consumes
    the SAME generator the batch driver does, so a streaming drain is
    metric-equal to the batch loop round for round (tests/test_streaming.py
    asserts it), and a killed stream resumes from the last committed
    snapshot exactly like a killed batch run (T2/T7).

    The rate-source rows themselves are ignored — the tick is a scheduler,
    not data (the reference's worker loop wakes on queue signal the same
    way, crawl.py:189-214). Returns the per-round metrics list.

    ``robots_df`` passes the distributed robots dim straight through to the
    engine (ADVICE r4: parity with the batch constructor — the
    fetch_robots_df path works under the streaming driver too).
    ``stop_after_rounds`` stops the query from the monitor thread once that
    many rounds have committed — a bounded drain; a later call with no
    seeds resumes from the checkpoint exactly like a killed batch run."""
    import time

    from deepcrawl4ai_spark.frontier.engine import CrawlEngine

    eng = CrawlEngine(
        spark, store_root, cfg, robots_rows=robots_rows, robots_df=robots_df
    )
    gen = eng.round_iter(seed_urls)
    out: list[dict] = []
    state = {"done": False, "err": None}

    def _one_round(df, batch_id):  # noqa: ARG001 — tick only, data unused
        if state["done"]:
            return
        if stop_after_rounds is not None and len(out) >= stop_after_rounds:
            # bounded drain: the limit is checked at the batch BOUNDARY, so
            # the stop never interrupts an engine round mid-commit — the
            # store is left exactly as a post-round kill would leave it
            state["done"] = True
            return
        try:
            out.append(next(gen))
        except StopIteration:
            state["done"] = True
        except Exception as e:  # noqa: BLE001 — surface to the main thread
            state["err"] = e
            state["done"] = True

    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "10")
        .load()
        .writeStream.foreachBatch(_one_round)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        t0 = time.time()
        while q.isActive and not state["done"] and time.time() - t0 < timeout_s:
            time.sleep(0.2)
    finally:
        # stop from the MAIN thread (stop() inside foreachBatch deadlocks —
        # it joins the very micro-batch thread that called it)
        q.stop()
        q.awaitTermination(30)
    if state["err"] is not None:
        raise state["err"]
    return out

"""Streaming-contract tests — the reference's SSE assertions
(tests/test_stream.py:36-57) ported to the results-table-backed shim, plus
Structured Streaming micro-batch semantics."""

from __future__ import annotations

import json

import pytest

from deepcrawl4ai_spark.frontier import webgraph as WG
from deepcrawl4ai_spark.frontier.engine import CrawlEngine, EngineConfig


@pytest.fixture(scope="module")
def small_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ssestore"))
    eng = CrawlEngine(spark, root, EngineConfig(global_budget=40, max_rounds=2))
    eng.run(WG.gen_seeds(16))
    return eng.store


def test_sse_framing_and_completion(spark, small_store):
    from deepcrawl4ai_spark.streaming.sse import stream_results_sse

    frames = list(stream_results_sse(spark, small_store))
    assert len(frames) > 2
    # reference test_stream.py:36-37 — framing
    for f in frames:
        assert f.startswith("data: ")
        assert f.endswith("\n\n")
    # reference utils.py:368 / job.py:461-468 — completion then [DONE]
    assert json.loads(frames[-2][len("data: ") : -2])["status"] == "completed"
    assert frames[-1] == "data: [DONE]\n\n"


def test_sse_chunk_fields_and_dedup(spark, small_store):
    from deepcrawl4ai_spark.streaming.sse import stream_results_sse

    frames = list(stream_results_sse(spark, small_store))
    seen = set()
    for f in frames[:-2]:
        payload = json.loads(f[len("data: ") : -2])
        # reference test_stream.py:44-51 — chunk fields
        for field in ("url", "chunk_index", "total_chunks", "dump", "type"):
            assert field in payload
        key = f"{payload['chunk_index']}_{payload['url']}"
        assert key not in seen  # reference job.py:471-484 — duplicate suppression
        seen.add(key)
        # reconstructed dump must parse once all chunks concatenated — spot
        # check single-chunk payloads
        if payload["total_chunks"] == 1:
            doc = json.loads(payload["dump"])
            assert "spans" in doc and "doc_id" in doc


def test_openai_chunk_stream(spark, small_store):
    """C10/F6 — the OpenAI chat.completion.chunk dialect; field assertions
    ported from reference tests/test_stream.py:44-51 (id/object/created/
    model/choices/delta/content) and the trailing [DONE]."""
    from deepcrawl4ai_spark.streaming.sse import stream_results_openai

    frames = list(stream_results_openai(spark, small_store))
    assert len(frames) > 2
    assert frames[-1] == "data: [DONE]\n\n"
    finish_seen = 0
    for f in frames[:-1]:
        assert f.startswith("data: ") and f.endswith("\n\n")
        payload = json.loads(f[len("data: ") : -2])
        for field in ("id", "object", "created", "model", "choices"):
            assert field in payload
        assert payload["object"] == "chat.completion.chunk"
        assert payload["id"].startswith("chatcmpl-")
        assert isinstance(payload["created"], int)
        choice = payload["choices"][0]
        assert choice["index"] == 0 and "delta" in choice
        if choice["finish_reason"] == "stop":
            finish_seen += 1
            assert choice["delta"] == {}
        else:
            assert "content" in choice["delta"]
    # exactly one stop chunk per streamed doc
    n_docs = small_store.read(spark, "results").count()
    assert finish_seen == n_docs
    # deterministic replay: created derives from the doc, not wall clock
    again = list(stream_results_openai(spark, small_store))
    assert frames == again


def test_session_pool_reuse_and_ttl():
    """F7 — get-or-create under config signature, reuse across batches,
    idle-TTL eviction (reference crawler_pool.py:25-74)."""
    from deepcrawl4ai_spark.frontier import fetcher as FE

    FE.pool_reset()
    a1 = FE.get_session("cfg_a")
    a2 = FE.get_session("cfg_a")
    assert a1 is a2 and a2.n_uses == 2  # reuse, not re-create
    b = FE.get_session("cfg_b")
    assert b is not a1
    # idle past the TTL: touching only cfg_b evicts (and closes) cfg_a
    for _ in range(FE.SESSION_IDLE_TTL + 1):
        FE.get_session("cfg_b")
    assert a1.closed
    a3 = FE.get_session("cfg_a")
    assert a3 is not a1 and a3.n_uses == 1  # fresh session after eviction
    FE.pool_reset()


def test_health_gauge_budget(spark, tmp_path_factory):
    """A3/R7 — injected cpu/mem gauges gate the next round's budget via
    min(1-cpu, 1-mem, 1-err) (reference monitor.py:200-238)."""
    root = str(tmp_path_factory.mktemp("gauge"))
    eng = CrawlEngine(
        spark,
        root,
        EngineConfig(
            global_budget=100,
            min_budget=10,
            adaptive_budget=True,
            health_gauges=lambda: (0.40, 0.25),
        ),
    )
    # no history: gauge factor alone → 100 * (1-0.40) = 60
    assert eng._next_budget(None) == 60
    # error rate 0.5 dominates the gauges → 100 * 0.5 = 50
    assert eng._next_budget({"urls_popped": 10, "urls_failed": 5}) == 50
    # healthy gauges, clean round → full budget
    eng.cfg.health_gauges = lambda: (0.0, 0.0)
    assert eng._next_budget({"urls_popped": 10, "urls_failed": 0}) == 100
    # overloaded gauges floor at min_budget
    eng.cfg.health_gauges = lambda: (0.99, 0.10)
    assert eng._next_budget(None) == 10


def test_c4_overlap_and_merge(spark):
    """C4 — chunk windows overlap by 10% and a late chunk's field value
    survives the merge (reference crawl.py:355-366)."""
    from deepcrawl4ai_spark.multimodal.media import (
        chunk_text,
        extract_structured,
        stub_extract_chunk,
    )

    text = "".join(chr(97 + (i % 26)) for i in range(3000))
    chunks = chunk_text(text, chunk_chars=1200, overlap=0.1)
    assert len(chunks) == 3
    for a, b in zip(chunks, chunks[1:]):
        assert a[-120:] == b[: len(a[-120:])]  # consecutive windows share 10%

    # find a doc where a late chunk overrides chunk 0 for some field
    fields = ["title", "author"]
    doc_id, expected = None, None
    for i in range(200):
        d = f"doc{i}"
        t = f"{i}:" + text
        cs = chunk_text(t, 1200, 0.1)
        merged = {}
        late = {}
        for ci, c in enumerate(cs):
            got = stub_extract_chunk(d, fields, ci, c)
            if ci > 0:
                late.update(got)
            merged.update(got)
        if late:  # at least one field overridden by a late chunk
            doc_id, doc_text, expected, late_fields = d, t, merged, late
            break
    assert doc_id is not None, "stub never produced a late-chunk field"
    df = spark.createDataFrame([(doc_id, doc_text)], "doc_id string, text string")
    row = extract_structured(df, fields).collect()[0]
    got = json.loads(row["extracted"])
    assert got == expected
    for f, v in late_fields.items():
        assert got[f] == v  # the late chunk's value won the merge
    assert row["n_chunks"] == 3


def test_sse_from_round_filter(spark, small_store):
    from deepcrawl4ai_spark.streaming.sse import stream_results_sse

    all_frames = list(stream_results_sse(spark, small_store, from_round=0))
    late_frames = list(stream_results_sse(spark, small_store, from_round=1))
    assert len(late_frames) < len(all_frames)


def test_structured_streaming_results_tail(spark, small_store, tmp_path):
    """readStream over the committed results files drains every round's docs
    with availableNow (T1/T3)."""
    from deepcrawl4ai_spark.streaming.structured import results_stream

    import os

    snap = small_store.current_snapshot()
    paths = snap["tables"]["results"]
    # file-stream sources take one directory: the results table root covers
    # every committed round's files
    results_root = os.path.dirname(paths[0])
    sdf = results_stream(spark, results_root)
    q = (
        sdf.writeStream.format("memory")
        .queryName("res_tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM res_tail").collect()[0]["n"]
    batch_total = small_store.read(spark, "results").count()
    assert got == batch_total


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    """Streaming windowed agg (watermark path) equals the batch computation
    on a bounded input (T4/T8 semantics check)."""
    from deepcrawl4ai_spark.sources.tables import load_table
    from deepcrawl4ai_spark.streaming.structured import windowed_event_counts

    from pyspark.sql import functions as F

    # watermarks need TIMESTAMP (tz-aware); testdata ts is TIMESTAMP_NTZ
    events = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # bounded batch reference
    batch = {
        (r["win_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(events).collect()
    }
    # same via streaming file source
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_event_counts(sdf)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    # append mode only emits windows the watermark has closed; every emitted
    # window must match the batch result exactly
    assert got
    for k, v in got.items():
        assert batch[k] == v


def test_session_window_stream_matches_batch(spark, tmp_path):
    """The sessionize_native operator's session_window aggregate runs
    unchanged under Structured Streaming (watermark + append mode) and every
    emitted closed session equals the batch computation — the temporal
    family's batch/streaming-shared contract."""
    from pyspark.sql import functions as F

    from deepcrawl4ai_spark.sources.tables import load_table

    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts", "value")
    )

    def sessions(df):
        return (
            df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .select(
                "user_id",
                F.col("sw.start").alias("session_start"),
                "n_events",
                "total_value",
            )
        )

    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in sessions(events).collect()
    }
    src = str(tmp_path / "sess_stream")
    events.write.parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src).withWatermark(
        "ts", "1 hour"
    )
    q = (
        sessions(sdf)
        .writeStream.format("memory")
        .queryName("sess_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM sess_win").collect()
    }
    assert got
    for k, v in got.items():
        assert batch[k] == v


def test_stateful_stream_dedup(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup (T4/J1 streaming mirror of
    J3): duplicates inside a batch are dropped, and state survives a query
    RESTART — keys from batch 1 are still suppressed in batch 2 run later
    with the same checkpoint (exactly-once downstream)."""
    import hashlib

    from deepcrawl4ai_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def h(s):
        return hashlib.sha1(s.encode()).hexdigest()

    def run_available():
        # file sink: the one that supports checkpoint recovery (memory
        # sink does not), so the restart actually replays the state store
        sdf = spark.readStream.schema("url_hash string").parquet(src)
        q = (
            dedup_stream(sdf)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["url_hash"] for r in spark.read.parquet(out).collect()}

    batch1 = [h("a"), h("b"), h("c"), h("a")]  # in-batch duplicate
    spark.createDataFrame([(x,) for x in batch1], "url_hash string").write.mode(
        "append"
    ).parquet(src)
    got1 = run_available()
    assert got1 == {h("a"), h("b"), h("c")}

    # second micro-batch arrives AFTER a restart: b/c are replays, d is new
    batch2 = [h("b"), h("c"), h("d")]
    spark.createDataFrame([(x,) for x in batch2], "url_hash string").write.mode(
        "append"
    ).parquet(src)
    got2 = run_available()  # fresh query, same checkpoint/state
    # cumulative sink: batch 1's rows plus ONLY the genuinely-new d
    assert got2 == {h("a"), h("b"), h("c"), h("d")}, got2


def test_multimodal_plumbing(spark):
    from deepcrawl4ai_spark.multimodal import media as M

    df = M.synth_media_df(spark, 64)
    feats = M.extract_features(df).collect()
    assert len(feats) == 64
    for r in feats:
        assert len(r["feature"]) == M.FEATURE_DIM
    # determinism: same payload → same features
    again = {r["media_ref"]: r["feature"] for r in M.extract_features(df).collect()}
    assert all(again[r["media_ref"]] == r["feature"] for r in feats)

    imgs = M.resize_images(df, max_side=32).collect()
    assert all(r["meta"]["width"] <= 32 and r["meta"]["height"] <= 32 for r in imgs)
    assert all(r["kind"] == "image" for r in imgs)

    frames = M.sample_frames(df, every_s=2.0).collect()
    assert frames and all(len(r["frame"]) == 20 for r in frames)

    with pytest.raises(Exception, match="NotImplementedError|not in this container|PIL"):
        M.extract_features(df, decode_stub=False).collect()


def test_c4_extraction_stub(spark):
    from deepcrawl4ai_spark.multimodal.media import extract_structured
    from deepcrawl4ai_spark.sources.tables import load_table
    import json as _json

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    out = extract_structured(docs, ["title", "author"]).collect()
    assert len(out) == 20
    for r in out:
        parsed = _json.loads(r["extracted"])
        assert set(parsed) == {"title", "author"}
        assert r["n_chunks"] >= 1
    # deterministic
    again = {r["doc_id"]: r["extracted"] for r in extract_structured(docs, ["title", "author"]).collect()}
    assert all(again[r["doc_id"]] == r["extracted"] for r in out)


# --- WS-analog liveness (reference job.py:107-131 + tests/test_websocket.py) --


def test_ws_events_first_message_and_transitions(small_store):
    from deepcrawl4ai_spark.streaming.events import event_stream

    evts = list(event_stream(small_store, max_polls=3))
    # reference test_websocket.py: the first received message contains
    # "server event"
    assert "server event" in evts[0]["message"]
    rounds = [e for e in evts if e["event"] == "round_committed"]
    # seed commit (-1) + 2 crawl rounds, in order, all committed
    assert [e["round"] for e in rounds] == [-1, 0, 1]
    assert all(e["state"] in ("committed", "resubmitted") for e in rounds)
    assert sum(e["urls_fetched"] for e in rounds) > 0


def test_ws_events_keepalive_and_multiclient(small_store):
    from deepcrawl4ai_spark.streaming.events import event_stream

    # keep-alive: once the commit log is drained, every poll heartbeats
    # (the reference's 120 s held-open connection, test_websocket.py:27-44)
    evts = list(event_stream(small_store, max_polls=5))
    beats = [e for e in evts if e["event"] == "heartbeat"]
    assert len(beats) == 4  # polls after the one that drained the log
    assert [b["poll"] for b in beats] == sorted(b["poll"] for b in beats)

    # a second subscriber sees the same events — reading has no side effects
    again = list(event_stream(small_store, max_polls=5))
    assert [e for e in again if e["event"] == "round_committed"] == [
        e for e in evts if e["event"] == "round_committed"
    ]

    # resume from a cursor: only rounds past it are replayed
    tail = list(event_stream(small_store, from_round=0, max_polls=2))
    assert [e["round"] for e in tail if e["event"] == "round_committed"] == [1]


def test_c4_pluggable_extractor(spark):
    """C4's model call is a seam (reference llm_strategy.extract boundary,
    tasks.py:173-210): a custom per-chunk extractor replaces the stub with
    no other change; chunking/merge plumbing is shared."""
    import json

    from deepcrawl4ai_spark.multimodal.media import extract_structured

    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma " * 200)], "doc_id string, text string"
    )

    def fake_model(doc_id, fields, ci, chunk):
        # chunk 0 answers everything; later chunks add a per-chunk field so
        # the cross-chunk merge is visible
        out = {f: f"{f}:{len(chunk.split())}" for f in fields} if ci == 0 else {}
        out[f"seen_chunk_{ci}"] = str(ci)
        return out

    row = extract_structured(docs, ["wc"], extractor=fake_model).collect()[0]
    assert row["n_chunks"] > 1
    merged = json.loads(row["extracted"])
    assert merged["wc"].startswith("wc:")
    assert merged[f"seen_chunk_{row['n_chunks'] - 1}"] == str(row["n_chunks"] - 1)


def test_client_rate_limiter_token_bucket():
    """API-edge per-client token bucket (reference server.py:302-348,
    redisCache.py:85-96): burst to capacity, reject past it, refill over
    time, per-client isolation, Retry-After arithmetic — all on a logical
    clock (deterministic, replay-exact)."""
    from deepcrawl4ai_spark.streaming.ratelimit import ClientRateLimiter

    rl = ClientRateLimiter(capacity=10, refill_rate=5.0)
    # burst: exactly `capacity` requests pass at t=0
    grants = [rl.allow("alice", 0.0) for _ in range(12)]
    assert grants == [True] * 10 + [False] * 2
    # another client is unaffected by alice's exhaustion
    assert rl.allow("bob", 0.0)
    # retry-after: 1 token needs 1/refill_rate seconds
    assert rl.retry_after("alice", 0.0) == pytest.approx(0.2)
    # refill: after 1 s at 5 tokens/s alice can make 5 more requests
    grants = [rl.allow("alice", 1.0) for _ in range(6)]
    assert grants == [True] * 5 + [False]
    # balance never exceeds capacity no matter how long idle
    assert rl.balance("bob", 1000.0) == 10.0
    # non-monotonic timestamps never mint tokens (replayed frames)
    rl.allow("carol", 5.0)
    assert rl.balance("carol", 4.0) == 9.0


def test_streaming_round_loop_drain_parity(spark, tmp_path_factory):
    """T1 under the streaming runtime (VERDICT r3 #6): a rate-source
    foreachBatch loop driving CrawlEngine.round_iter drains the SAME crawl
    as the batch driver — round count, crawl order, and every per-round
    metric equal. Default 10 rounds in CI; CRAWL_STREAM_PARITY_ROUNDS=25
    runs the full drain-parity leg (recorded in BENCH/)."""
    import os

    from deepcrawl4ai_spark.streaming.structured import run_streaming_crawl

    rounds = int(os.environ.get("CRAWL_STREAM_PARITY_ROUNDS", "10"))
    cfg = dict(
        global_budget=60, max_depth=4, max_attempts=2, record_order=True,
        max_rounds=rounds,
    )
    seeds = WG.gen_seeds(24)
    m_stream = run_streaming_crawl(
        spark,
        str(tmp_path_factory.mktemp("streamloop")),
        EngineConfig(**cfg),
        seed_urls=seeds,
    )
    eng_b = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("batchloop")), EngineConfig(**cfg)
    )
    m_batch = eng_b.run(seeds)
    assert len(m_stream) == len(m_batch) > 0
    keys = (
        "round urls_popped urls_fetched urls_failed outlinks_seen "
        "dedup_dropped new_frontier"
    ).split()
    for a, b in zip(m_stream, m_batch):
        assert a["crawl_order"] == b["crawl_order"]
        for k in keys:
            assert a[k] == b[k], k


def test_streaming_crash_resume(spark, tmp_path_factory):
    """T7 under the STREAMING runtime (VERDICT r4 #6): kill the streaming
    query mid-drain (after >=2 rounds committed), restart run_streaming_crawl
    with NO seeds on the same store — the drain resumes from the last
    committed snapshot with zero re-fetches (one rounds-table row per round)
    and the final per-round metrics equal an uninterrupted batch run."""
    from deepcrawl4ai_spark.streaming.structured import run_streaming_crawl

    rounds = 4
    cfg = dict(
        global_budget=60, max_depth=4, max_attempts=2, record_order=True,
        max_rounds=rounds,
    )
    seeds = WG.gen_seeds(24)
    root = str(tmp_path_factory.mktemp("streamcrash"))

    m1 = run_streaming_crawl(
        spark, root, EngineConfig(**cfg), seed_urls=seeds, stop_after_rounds=2
    )
    k = len(m1)
    assert 2 <= k < rounds  # killed mid-drain, at least 2 rounds committed

    m2 = run_streaming_crawl(spark, root, EngineConfig(**cfg))  # no seeds
    assert len(m2) == rounds - k
    assert m2[0]["round"] == k

    eng_b = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("streamcrash_batch")), EngineConfig(**cfg)
    )
    m_batch = eng_b.run(seeds)
    assert len(m1) + len(m2) == len(m_batch)
    keys = (
        "round urls_popped urls_fetched urls_failed outlinks_seen "
        "dedup_dropped new_frontier"
    ).split()
    for a, b in zip(list(m1) + list(m2), m_batch):
        assert a["crawl_order"] == b["crawl_order"]
        for key in keys:
            assert a[key] == b[key], key

    # zero re-fetches: exactly one committed row per round, no duplicates
    from deepcrawl4ai_spark.frontier.engine import CrawlEngine as CE

    eng_r = CE(spark, root, EngineConfig(**cfg))
    per_round = [
        r["round"] for r in eng_r.store.read(spark, "rounds").collect()
    ]
    assert sorted(per_round) == list(range(rounds))

    # final frontier/seen state equals the uninterrupted run
    got = {
        r["url_hash"]: r["state"]
        for r in eng_r.store.read(spark, "frontier").collect()
    }
    want = {
        r["url_hash"]: r["state"]
        for r in eng_b.store.read(spark, "frontier").collect()
    }
    assert got == want


def test_streaming_robots_df_passthrough(spark, tmp_path_factory):
    """ADVICE r4: run_streaming_crawl accepts the distributed robots dim
    (robots_df) like the batch constructor — drain metrics equal the
    robots_rows path on the same universe."""
    from deepcrawl4ai_spark.streaming.structured import run_streaming_crawl

    cfg = dict(
        global_budget=40, max_depth=3, max_attempts=2, record_order=True,
        max_rounds=2,
    )
    seeds = WG.gen_seeds(16)
    rows = WG.robots_rows()
    rdf = spark.createDataFrame(
        [
            (
                r["host"],
                float(r["crawl_delay"]),
                float(r["rps_budget"]),
                int(r["max_tokens"]),
                list(r["disallow_rules"]),
            )
            for r in rows
        ],
        "host string, crawl_delay double, rps_budget double, max_tokens int,"
        " disallow_rules array<string>",
    )
    m_df = run_streaming_crawl(
        spark, str(tmp_path_factory.mktemp("srdf")), EngineConfig(**cfg),
        seed_urls=seeds, robots_df=rdf,
    )
    m_rows = run_streaming_crawl(
        spark, str(tmp_path_factory.mktemp("srrows")), EngineConfig(**cfg),
        seed_urls=seeds, robots_rows=rows,
    )
    assert len(m_df) == len(m_rows) > 0
    for a, b in zip(m_df, m_rows):
        assert a["crawl_order"] == b["crawl_order"]
        assert a["urls_fetched"] == b["urls_fetched"]

"""SSE results façade — the reference's Redis-Stream → SSE path
(utils.py:305-380 publish, job.py:388-526 consume) re-expressed over the
checkpointed results table.

Contract preserved (reference tests/test_stream.py:36-57):
- every frame is ``data: <json>\\n\\n``
- chunked payloads carry url / chunk_index / total_chunks (4096-char chunks,
  utils.py:345)
- duplicates with the same (chunk_index, url) are suppressed (job.py:471-484)
- the stream ends with a ``completed`` message then ``data: [DONE]\\n\\n``
  (utils.py:368, job.py:461-468)

Columnar storage removes the need for chunking inside the engine (SURVEY.md
X6); chunking happens only here, at the API edge, for wire compatibility.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import SparkSession

from deepcrawl4ai_spark.frontier.checkpoint import CheckpointStore

CHUNK_SIZE = 4096


def _frame(payload: dict | str) -> str:
    body = payload if isinstance(payload, str) else json.dumps(payload)
    return f"data: {body}\n\n"


def result_row_to_chunks(row: dict) -> Iterator[dict]:
    """Serialize one result doc into chunked SSE payloads (html already absent
    — the engine never stored it, the columnar analog of utils.py:322-327)."""
    dump = json.dumps(
        {
            "doc_id": row["doc_id"],
            "url": row["url"],
            "round": row["round"],
            "fetch_status": row["fetch_status"],
            "spans": row["spans"],
            "links": row["links"],
        }
    )
    chunks = [dump[i : i + CHUNK_SIZE] for i in range(0, len(dump), CHUNK_SIZE)] or [""]
    for i, chunk in enumerate(chunks):
        yield {
            "status": "streaming",
            "type": "batch_chunk",
            "url": row["url"],
            "chunk_index": i,
            "total_chunks": len(chunks),
            "dump": chunk,
        }


def result_row_to_openai_chunks(
    row: dict, model: str = "deepcrawl4ai-spark"
) -> Iterator[dict]:
    """C10/F6: wrap one result doc as OpenAI ``chat.completion.chunk``
    payloads (reference triggers.py:91-135; field shape asserted by
    reference tests/test_stream.py:44-51). The doc's text spans stream as
    delta.content pieces; the final chunk carries finish_reason="stop".
    ``created`` derives from the doc hash — deterministic replays, no wall
    clock."""
    doc_id = row["doc_id"]
    cid = f"chatcmpl-{doc_id[:24]}"
    created = int(doc_id[:8], 16)
    text = "\n".join(
        s["text"] for s in (row.get("spans") or ()) if s["kind"] == "text"
    )
    pieces = [text[i : i + CHUNK_SIZE] for i in range(0, len(text), CHUNK_SIZE)] or [""]
    for piece in pieces:
        yield {
            "id": cid,
            "object": "chat.completion.chunk",
            "created": created,
            "model": model,
            "choices": [
                {"index": 0, "delta": {"content": piece}, "finish_reason": None}
            ],
        }
    yield {
        "id": cid,
        "object": "chat.completion.chunk",
        "created": created,
        "model": model,
        "choices": [{"index": 0, "delta": {}, "finish_reason": "stop"}],
    }


def stream_results_openai(
    spark: SparkSession,
    store: CheckpointStore,
    from_round: int = 0,
    model: str = "deepcrawl4ai-spark",
) -> Iterator[str]:
    """SSE stream in the OpenAI chunk dialect (reference triggers.py:126-135
    ends with [DONE] exactly like the chat completions API)."""
    last = store.last_round()
    if last is not None:
        results = store.read(spark, "results")
        if results is not None:
            rows = (
                results.filter(f"round >= {from_round}")
                .orderBy("round", "doc_id")
                .toLocalIterator()  # API edge only — never in the engine
            )
            for r in rows:
                for chunk in result_row_to_openai_chunks(
                    r.asDict(recursive=True), model=model
                ):
                    yield _frame(chunk)
    yield "data: [DONE]\n\n"


def stream_results_sse(
    spark: SparkSession,
    store: CheckpointStore,
    from_round: int = 0,
    max_rows_per_poll: int = 20,
) -> Iterator[str]:
    """Yield SSE frames for all committed results from *from_round* on, then
    the completion marker. Incremental: reads round-by-round (the micro-batch
    = the frontier round, SURVEY.md T1), pages like the reference's
    XREAD COUNT 20 (job.py:405-436)."""
    last = store.last_round()
    seen: set[str] = set()  # duplicate suppression key: f"{chunk_index}_{url}"
    if last is not None:
        results = store.read(spark, "results")
        if results is not None:
            rows = (
                results.filter(f"round >= {from_round}")
                .orderBy("round", "doc_id")
                .toLocalIterator()  # API edge only — never in the engine
            )
            batch = []
            for r in rows:
                batch.append(r.asDict(recursive=True))
                if len(batch) >= max_rows_per_poll:
                    yield from _emit(batch, seen)
                    batch = []
            yield from _emit(batch, seen)
    yield _frame({"status": "completed", "type": "completed"})
    yield "data: [DONE]\n\n"


def _emit(batch: list[dict], seen: set[str]) -> Iterator[str]:
    for row in batch:
        for chunk in result_row_to_chunks(row):
            key = f"{chunk['chunk_index']}_{chunk['url']}"
            if key in seen:
                continue
            seen.add(key)
            yield _frame(chunk)

"""Custom stateful streaming operator (SURVEY §2.9): cross-batch dedup with
``applyInPandasWithState`` — the Structured-Streaming mirror of the batch
URL-seen set (J3) and the SSE duplicate suppression (T4, reference
job.py:471-484), generalized to any keyed stream.

Each bucket group (url_hash-derived, same partitioning as the batch bloom)
carries its seen set in GroupState; the first occurrence of a hash passes,
replays and duplicates are dropped — an at-least-once upstream becomes
exactly-once downstream. State survives query restarts via the state store
(the streaming analog of the engine's checkpointed seen_filter).

Scale note: the shim keeps the exact seen set in state (test-sized). At
10^10 keys per-bucket state becomes the same bloom-bits + append-log split
the batch engine uses: a BinaryType bloom in GroupState for the fast path
and an external exact store for rescue — the operator shape (grouped
Arrow batches + typed state struct) is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from deepcrawl4ai_spark.frontier.bloom import seen_bucket_col

OUT_SCHEMA = "bucket int, url_hash string"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh = pdf.loc[~pdf["url_hash"].isin(seen), "url_hash"].drop_duplicates()
        if len(fresh):
            seen.update(fresh)
            yield pd.DataFrame({"bucket": [key[0]] * len(fresh), "url_hash": fresh})
    state.update((sorted(seen),))


def dedup_stream(stream_df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
    """First-occurrence-only filter over a streaming DataFrame with a
    *hash_col* column; emits (bucket, url_hash) for fresh keys only."""
    keyed = stream_df.select(
        F.col(hash_col).alias("url_hash"), seen_bucket_col(F.col(hash_col))
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference ships media as src-URL lists inside CrawlResult
(actions.py:62-88, triggers.py:221-226); a training-data pipeline needs the
payloads themselves. Pattern here:

- media table: (media_ref string, kind string, payload binary,
  meta struct<width int, height int, duration_s double, codec string>)
- decode / feature-extract / resize / frame-sample run as mapInPandas over
  Arrow batches — the Spark-side plumbing (schema, batch shape, partitioning)
  is real and tested; the codec step itself is STUBBED (no image/audio libs
  in this container): `decode_stub=True` produces a deterministic fake
  derived from the payload hash, `decode_stub=False` raises
  NotImplementedError where PIL/ffmpeg would be called.

At 100 TB: payloads stay columnar (parquet zstd), partitioned by
media_ref-hash bucket so a resize sweep shuffles nothing; only metadata
columns travel through joins.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


def synth_media_df(spark: SparkSession, n: int = 256) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        h = hashlib.sha1(f"media:{i}".encode()).digest()
        kind = kinds[h[0] % 3]
        payload = (h * (4 + h[1] % 8))[: 64 + h[2]]
        meta = {
            "width": 64 + h[3] if kind == "image" else None,
            "height": 64 + h[4] if kind == "image" else None,
            "duration_s": float(h[5]) / 4.0 if kind != "image" else None,
            "codec": {"image": "png", "audio": "opus", "video": "av1"}[kind],
        }
        rows.append((f"media://synth/{i}", kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: hash-seeded
    pseudo-features. Replaced by PIL/torchaudio/ffmpeg on a real cluster."""
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(FEATURE_DIM).astype(np.float32)]


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    decode_stub=False is the real-codec path — deliberately unimplemented in
    this container."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": pdf["payload"].map(_fake_decode_features),
                }
            )

    return media.select("media_ref", "kind", "payload").mapInPandas(
        _extract, FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, max_side: int = 32, decode_stub: bool = True) -> DataFrame:
    """Resize plumbing: images only, payload → payload, meta rewritten.
    Stub 'resize' truncates the payload deterministically."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real resize requires PIL")
            out = pdf.copy()
            out["payload"] = out["payload"].map(lambda b: bytes(b)[: max_side * 8])
            out["meta"] = out.apply(
                lambda row: {
                    "width": min(row["meta"]["width"] or 0, max_side),
                    "height": min(row["meta"]["height"] or 0, max_side),
                    "duration_s": row["meta"]["duration_s"],
                    "codec": row["meta"]["codec"],
                },
                axis=1,
            )
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(_resize, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_s: float = 1.0, decode_stub: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video: one output row per sampled frame."""
    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("t_s", T.DoubleType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            refs, idxs, ts, frames = [], [], [], []
            for _, row in pdf.iterrows():
                dur = row["meta"]["duration_s"] or 0.0
                n = max(1, int(dur / every_s))
                payload = bytes(row["payload"])
                for k in range(n):
                    refs.append(row["media_ref"])
                    idxs.append(k)
                    ts.append(k * every_s)
                    frames.append(hashlib.sha1(payload + k.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idxs, "t_s": ts, "frame": frames}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(_sample, schema)


# --- C4: schema-guided extraction stub (reference LLMContentFilter /
# extraction_strategy, api.py:219-226, tasks.py:173-210) -----------------------

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("extracted", T.StringType(), False),  # JSON per schema
        T.StructField("n_chunks", T.IntegerType(), False),
    ]
)


def extract_structured(docs: DataFrame, field_names: list[str],
                       chunk_chars: int = 1200, llm_stub: bool = True) -> DataFrame:
    """C4 plumbing: chunk each doc's text (chunk_token_threshold analog),
    run schema-guided extraction per chunk, merge. The LLM call itself is
    STUBBED (deterministic fake: field values are hash-derived tokens);
    schema, chunking, batch shape, and merge are real."""
    import hashlib as _h
    import json as _json

    def _extract(batches):
        for pdf in batches:
            out_ids, out_json, out_n = [], [], []
            for _, row in pdf.iterrows():
                if not llm_stub:
                    raise NotImplementedError("LLM extraction requires an external API")
                text = row["text"] or ""
                chunks = [text[i:i + chunk_chars] for i in range(0, max(len(text), 1), chunk_chars)]
                merged = {}
                for f in field_names:
                    h = _h.sha1(f"{row['doc_id']}:{f}:{chunks[0][:64]}".encode()).hexdigest()
                    merged[f] = f"{f}_{h[:8]}"
                out_ids.append(str(row["doc_id"]))
                out_json.append(_json.dumps(merged, sort_keys=True))
                out_n.append(len(chunks))
            yield pd.DataFrame({"doc_id": out_ids, "extracted": out_json, "n_chunks": out_n})

    return docs.select("doc_id", "text").mapInPandas(_extract, EXTRACT_SCHEMA)

"""Multimodal (image/audio/video) column plumbing.

Media payloads are **opaque binary columns with typed metadata** — the
engine never shuffles image bytes with text (SURVEY §1.2: media spans
carry ``media_ref`` pointers). This module provides the Spark-side
plumbing for decode / feature-extract stages:

* :func:`media_manifest` — per-media-span manifest with deterministic
  storage metadata (bucket assignment for co-located fetch, synthetic
  byte sizes standing in for object-store stat calls);
* :func:`fetch_bytes` — resolves ``media_ref`` → payload bytes. The
  sandbox has no object store, so payloads are deterministic synthetic
  bytes derived from the ref (clearly marked stub);
* :func:`decode_features` — the ``mapInPandas`` decode/feature stage
  with the real batch shape (Arrow binary in → struct features out).
  Actual image decoding needs PIL/cv2 which this container does not
  ship; the decode body is a STUB producing deterministic pseudo
  dimensions. The Spark plumbing — schema, batching, partition layout —
  is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FETCH_BUCKETS = 64

DECODE_SCHEMA = (
    "doc_id string, media_ref string, n_bytes long, width int, height int, "
    "channels int, format string"
)


def media_manifest(extracted: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Extraction output → one row per media span with fetch metadata."""
    media = F.filter(F.col(spans_col), lambda s: s["kind"] == "media")
    rows = extracted.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(media).alias("s"),
    )
    href = F.conv(F.substring(F.md5(F.col("s.media_ref")), 1, 8), 16, 10).cast(
        "long"
    )
    return rows.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.order").cast("long").alias("ord"),
        (href % 100000).alias("n_bytes_est"),
        (href % N_FETCH_BUCKETS).cast("int").alias("fetch_bucket"),
    )


def _stub_payload(media_ref: str) -> bytes:
    """STUB: deterministic synthetic payload (no object store in the
    sandbox). Real deployment: object-store ranged GET by media_ref."""
    h = hashlib.md5(media_ref.encode()).digest()
    return h * 4  # 64 bytes


def fetch_bytes(manifest: DataFrame) -> DataFrame:
    """media manifest → + payload binary column, batched via Arrow."""

    @F.pandas_udf("binary")
    def _fetch(refs: pd.Series) -> pd.Series:
        return refs.map(_stub_payload)

    return manifest.withColumn("payload", _fetch("media_ref"))


def decode_features(with_payload: DataFrame) -> DataFrame:
    """mapInPandas decode/feature stage.

    The decode body is a STUB (container has no image codecs): it derives
    deterministic pseudo width/height/channels from the payload bytes.
    Swap `_decode_one` for PIL/cv2 in deployment — the batch shape,
    schema and partitioning stay identical.
    """

    def _decode_one(payload: bytes) -> tuple[int, int, int, str]:
        if payload is None or len(payload) < 4:
            raise NotImplementedError("real decoder required for payload")
        w = 64 + payload[0] % 192
        h = 64 + payload[1] % 192
        c = 1 + payload[2] % 4
        return w, h, c, "stub"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(_decode_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "channels": decoded.map(lambda t: t[2]).astype("int32"),
                    "format": decoded.map(lambda t: t[3]),
                }
            )

    return with_payload.select("doc_id", "media_ref", "payload").mapInPandas(
        _batches, DECODE_SCHEMA
    )

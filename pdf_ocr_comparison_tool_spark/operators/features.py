"""Feature extraction over the pages IR (SURVEY §2.7 T1-T5, §2.2 F7).

Rebuilds the reference's regex feature extractors (ocr_engine.py:325-373)
and content hash (content_matcher.py:30-35) as pure built-in column
expressions — ``regexp_extract_all`` + array ops, JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import sqlgen as G


def _extract_multi(col: Column, patterns: list[str]) -> Column:
    """Union of regex extraction results, deduped and sorted (the
    reference dedups via list(set(...)) with unspecified order,
    ocr_engine.py:351-373 — we fix a deterministic sorted order)."""
    parts = [F.regexp_extract_all(col, F.lit(p), 0) for p in patterns]
    arr = parts[0] if len(parts) == 1 else F.concat(*parts)
    return F.array_sort(F.array_distinct(arr))


def text_hash(col: Column) -> Column:
    """md5 of lowercased, whitespace-stripped text (T1)."""
    return F.md5(F.lower(F.regexp_replace(col, r"\s+", "")))


def normalize_amount(col: Column) -> Column:
    """Strip [,，space] from amount strings (T5, content_matcher.py:188)."""
    return F.regexp_replace(col, r"[,，\s]", "")


def add_features(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages(…, text) → + dates, amounts, numbers, text_hash columns."""
    c = F.col(text_col)
    return (
        pages.withColumn("dates", _extract_multi(c, G.DATE_RES))
        .withColumn("amounts", _extract_multi(c, G.AMOUNT_RES))
        .withColumn("numbers", _extract_multi(c, G.NUMBER_RES))
        .withColumn("text_hash", text_hash(c))
    )

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


def token_count_entries(toks: Column) -> Column:
    """``array<struct<tok,cnt>>`` term-frequency entries via sort +
    run-length over the token array — O(n log n + n) per page, vs the
    O(distinct·n) per-token rescan form (HOF lambdas evaluate
    interpreted, so the asymptotics show up directly in wall time).
    Narrow and shuffle-free: the right per-page shape at 100 TB, where
    relational token counting would shuffle the whole token stream."""
    s = F.array_sort(toks)
    n = F.size(s)
    # run starts: positions whose token differs from the previous one
    starts = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: (i == 0) | (F.try_element_at(s, i + 1) != F.try_element_at(s, i)),
    )
    m = F.size(starts)
    entries = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda j: F.struct(
            F.try_element_at(s, F.try_element_at(starts, j + 1) + 1).alias("tok"),
            (
                F.coalesce(F.try_element_at(starts, j + 2), n)
                - F.try_element_at(starts, j + 1)
            )
            .cast("long")
            .alias("cnt"),
        ),
    )
    empty = F.array().cast("array<struct<tok:string,cnt:bigint>>")
    # sequence(0, -1) throws; CASE branches evaluate lazily
    return F.when(n == 0, empty).otherwise(entries)


def page_keywords_expr(text_col: Column, top_n: int = 10) -> Column:
    """Per-page top-N keywords by term frequency (reference
    ocr_engine.py:392-412: tokens of length ≥ 2, non-digit,
    Counter.most_common(top_n); jieba's segmentation replaced by the
    deterministic alnum-run tokenizer, ties broken count desc → token
    asc instead of insertion order).

    Fully native: run-length TF entries, each encoded as
    ``lpad(10^7 − count) || token`` so one ascending array_sort yields
    (count desc, token asc); computed once per page, no shuffle.
    """
    toks = F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"),
        lambda t: (F.length(t) >= 2) & ~t.rlike(r"^[0-9]+$"),
    )
    enc = F.transform(
        token_count_entries(toks),
        lambda e: F.concat(
            F.lpad((F.lit(10000000) - e["cnt"]).cast("string"), 8, "0"), e["tok"]
        ),
    )
    return F.transform(
        F.slice(F.array_sort(enc), 1, top_n), lambda s: F.substring(s, 9, 1000000)
    )


def add_features(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages(…, text) → + dates, amounts, numbers, text_hash columns."""
    c = F.col(text_col)
    return (
        pages.withColumn("dates", _extract_multi(c, G.DATE_RES))
        .withColumn("amounts", _extract_multi(c, G.AMOUNT_RES))
        .withColumn("numbers", _extract_multi(c, G.NUMBER_RES))
        .withColumn("text_hash", text_hash(c))
    )

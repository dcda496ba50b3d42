"""Consecutive-match merge — gaps-and-islands (SURVEY §2.5 W3, §2.4 A14,
§2.5 W6).

Rebuilds the reference's merge_page_results walk
(content_matcher.py:415-508): consecutive voucher pages that match the
same target document with consecutive target pages and the same status
merge into one document-level range row.

Spark shape: lag() break flags → running-sum island ids → one groupBy.
Null-safe comparisons so 未找到 runs merge with each other too (the
reference groups them because target_file '' equals '').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _page_range(lo, hi) -> "F.Column":
    """W6: 'P3' when single page else 'P3-P5' (content_matcher.py:481-508)."""
    return F.when(lo == hi, F.concat(F.lit("P"), lo)).otherwise(
        F.concat(F.lit("P"), lo, F.lit("-P"), hi)
    )


def merge_page_matches(best: DataFrame, keywords: bool = False) -> DataFrame:
    """best: (doc_id, page_num, t_doc, t_page, sim, status) →
    island rows (doc_id, island, page_range, t_doc, t_range, status,
    avg_sim, n_pages).

    With ``keywords=True``, ``best`` must carry ``matched_kw_arr`` and
    the islands additionally emit ``matched_kw`` — the deduped union of
    the member pages' matched keywords (content_matcher.py:493-497),
    sorted + '|'-joined for determinism."""
    w = Window.partitionBy("doc_id").orderBy("page_num")
    same_doc = F.col("t_doc").eqNullSafe(F.lag("t_doc").over(w))
    same_status = F.col("status").eqNullSafe(F.lag("status").over(w))
    # next target page OR both unmatched; the "no previous row" ambiguity
    # of lag()=null is resolved by same_status being false on row 1
    consecutive_target = F.coalesce(
        F.col("t_page") == (F.lag("t_page").over(w) + 1),
        F.col("t_page").isNull() & F.lag("t_page").over(w).isNull(),
    )
    brk = F.when(
        same_doc & same_status & consecutive_target, F.lit(0)
    ).otherwise(F.lit(1))
    islands = best.withColumn("brk", brk).withColumn(
        "island", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    kw_aggs = (
        [
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("matched_kw_arr")))
            ).alias("kw_u")
        ]
        if keywords
        else []
    )
    kw_out = [F.array_join("kw_u", "|").alias("matched_kw")] if keywords else []
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            *kw_aggs,
            F.min("page_num").alias("p_lo"),
            F.max("page_num").alias("p_hi"),
            F.min("t_doc").alias("t_doc"),  # constant within an island
            F.min("t_page").alias("t_lo"),
            F.max("t_page").alias("t_hi"),
            F.min("status").alias("status"),  # constant within an island
            # decimal SUM (order-exact under any partitioning), then ONE
            # IEEE double division by the count — both engines perform
            # the identical double op on identical operands, so the
            # result is bit-exact cross-engine. (Decimal AVG is not:
            # Spark divides in decimal then casts, DuckDB accumulates in
            # double — last-ulp mismatches.)
            (
                F.sum(F.col("sim").cast("decimal(28,12)")).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_sim"),
            F.count("*").alias("n_pages"),
        )
        .select(
            "doc_id",
            "island",
            _page_range(F.col("p_lo"), F.col("p_hi")).alias("page_range"),
            "t_doc",
            F.when(F.col("t_doc").isNull(), F.lit(None).cast("string"))
            .otherwise(_page_range(F.col("t_lo"), F.col("t_hi")))
            .alias("t_range"),
            "status",
            "avg_sim",
            F.col("n_pages").cast("long").alias("n_pages"),
            *kw_out,
        )
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction query on sf0.001.
``queries()`` / ``oracle_sql()`` — registry re-exported from
``pdf_ocr_comparison_tool_spark.queries``; the driver runs each Spark
query against its DuckDB oracle at sf=0.01 (row-count + schema +
order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_ocr_comparison_tool_spark import queries as _Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full extraction pipeline (synth interleaved
    spans → normalize → reading-order sort → reindex), exploded to the
    per-row contract (doc_id, ord, kind, text, media_ref)."""
    return _Q.q_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    return _Q.oracle_sql()

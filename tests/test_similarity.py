"""Pandas-UDF similarity path (T9/T10/T12) vs pure-python oracle."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pdf_ocr_comparison_tool_spark.functions import similarity as S

PAIRS = [
    ("the quick brown fox", "the quick brown fox"),
    ("the quick brown fox", "the slow brown fox"),
    ("记账凭证 金额300000元", "记账凭证 金额300001元"),
    ("spark query", "完全不同的内容"),
    ("", ""),
    ("abc", ""),
    ("单", "单"),
]


def test_tokenizer_deterministic_bigrams():
    assert S.tokenize_py("abc 记账凭证 x1") == ["abc", "x1", "记账", "账凭", "凭证"]
    assert S.tokenize_py("单") == ["单"]
    assert S.tokenize_py("") == []


def test_cosine_udf_matches_python(spark):
    df = spark.createDataFrame(PAIRS, "t1 string, t2 string")
    got = df.select("t1", "t2", S.cosine_udf("t1", "t2").alias("sim")).collect()
    for r in got:
        assert math.isclose(
            r["sim"], S.cosine_py(r["t1"], r["t2"]), rel_tol=1e-12
        ), (r["t1"], r["t2"])


def test_jaccard_native_matches_python(spark):
    df = spark.createDataFrame(PAIRS, "t1 string, t2 string")
    got = df.select(
        "t1", "t2", S.similarity(F.col("t1"), F.col("t2"), "jaccard").alias("sim")
    ).collect()
    for r in got:
        assert math.isclose(
            r["sim"], S.jaccard_py(r["t1"], r["t2"]), rel_tol=1e-12
        ), (r["t1"], r["t2"])


def test_dispatch_levenshtein(spark):
    df = spark.createDataFrame([("kitten", "sitting")], "t1 string, t2 string")
    r = df.select(
        S.similarity(F.col("t1"), F.col("t2"), "levenshtein").alias("sim")
    ).collect()[0]
    assert math.isclose(r["sim"], 1 - 3 / 7, rel_tol=1e-12)


def test_identical_text_cosine_one(spark):
    df = spark.createDataFrame(
        [("记账凭证 合同号 HT20030001",) * 2], "t1 string, t2 string"
    )
    r = df.select(S.cosine_udf("t1", "t2").alias("sim")).collect()[0]
    assert math.isclose(r["sim"], 1.0, rel_tol=1e-12)

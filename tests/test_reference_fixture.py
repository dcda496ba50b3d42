"""Parity with the reference's canonical inline fixtures.

The reference repo has no test framework; its ground truth is the
``__main__`` smoke fixtures. This file re-creates them (as data, from
the documented semantics) and asserts our staged pipeline reproduces
the expected outcomes:

* matching fixture (content_matcher.py:511-553): a voucher page that is
  the reference page plus a ``（首期）`` insertion, sharing date
  2003-05-31 and amount 300000元 — must match its reference twin as a
  partial match (sim in [0.75, 0.95) for levenshtein; the reference's
  default cosine also lands partial);
* classification fixtures (document_classifier.py:349-377): keyword
  texts must classify to their expected types.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_comparison_tool_spark import config as C
from pdf_ocr_comparison_tool_spark.functions import similarity as S
from pdf_ocr_comparison_tool_spark.operators import classify, features, matching

REF_TEXT = "生物孵化器SARS项目加固工程款 日期：2003-05-31 金额：300000元"
VOUCHER_TEXT = "生物孵化器SARS项目加固工程款（首期）日期：2003-05-31 金额：300000元"


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, page_num int, text string")
    return features.add_features(df)


def test_canonical_match_fixture(spark):
    refs = _pages(spark, [(0, 1, REF_TEXT)])
    vouchers = _pages(spark, [(1, 1, VOUCHER_TEXT)])

    # feature extraction fires on the fixture exactly as in the reference
    vrow = vouchers.collect()[0]
    assert "2003-05-31" in vrow["dates"]
    assert any("300000元" in a for a in vrow["amounts"])

    ranked = matching.match_pages(vouchers, refs)
    best = matching.best_matches(vouchers, ranked).collect()
    assert len(best) == 1
    b = best[0]
    assert (b["t_doc"], b["t_page"]) == (0, 1)
    # （首期）insertion: 4 chars on a 35-char string -> partial band
    assert C.SIMILARITY_THRESHOLD <= b["sim"] < C.EXACT_THRESHOLD
    assert b["status"] == C.STATUS_PARTIAL

    # the reference's default algorithm (cosine) also matches partial
    cos = S.cosine_py(VOUCHER_TEXT, REF_TEXT)
    assert cos >= C.SIMILARITY_THRESHOLD


def test_canonical_match_exact_twin(spark):
    refs = _pages(spark, [(0, 1, REF_TEXT)])
    vouchers = _pages(spark, [(1, 1, REF_TEXT)])
    best = matching.best_matches(
        vouchers, matching.match_pages(vouchers, refs)
    ).collect()[0]
    assert best["sim"] == 1.0 and best["status"] == C.STATUS_EXACT


def test_canonical_classification_fixture(spark):
    """document_classifier.py:362-368-style texts → expected types."""
    rows = [
        (0, "voucher", 1, "记账凭证 借方 贷方 会计科目 摘要"),
        (1, "voucher", 1, "发票 税号 发票代码 价税合计"),
        (2, "voucher", 1, "合同 甲方 乙方 合同编号 签章"),
        (3, "voucher", 1, "会议纪要 参会人员 议题 决议"),
        (4, "voucher", 1, "完全无关的文本内容"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, role string, page_num int, text string")
    out = {
        r["doc_id"]: (r["doc_type"], r["confidence"])
        for r in classify.classify_pages(df).collect()
    }
    assert out[0][0] == "凭证"
    assert out[1][0] == "发票"
    assert out[2][0] == "合同书"
    assert out[3][0] == "会议纪要"
    assert out[4] == (C.DEFAULT_DOC_TYPE, C.DEFAULT_CONFIDENCE)


def test_nested_keywords_count_once(spark):
    """findall alternation semantics (document_classifier.py:59,76):
    合同编号 contains both the 合同 and 合同编号 keywords, but leftmost-
    first non-overlapping matching counts exactly ONE match — per-
    keyword substring counting would report 2."""
    df = spark.createDataFrame(
        [(0, "voucher", 1, "合同编号"), (1, "voucher", 1, "发票 发票代码")],
        "doc_id long, role string, page_num int, text string",
    )
    out = {r["doc_id"]: r for r in classify.classify_pages(df).collect()}
    assert out[0]["doc_type"] == "合同书" and out[0]["n_matched"] == 1
    # 发票代码 starts with 发票 -> 发票(standalone) + 发票(prefix of 代码)
    # = 2 matches, not 3
    assert out[1]["doc_type"] == "发票" and out[1]["n_matched"] == 2

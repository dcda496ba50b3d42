"""jusText-style DOM boilerplate strip: parse inversion, classification
invariants, char accounting, plan shape (one shuffle end to end)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_comparison_tool_spark import htmlgen as H
from pdf_ocr_comparison_tool_spark import synth
from pdf_ocr_comparison_tool_spark.operators import boilerplate as B

from tests.conftest import SF_DIR


def _classified(spark):
    return B.classify_blocks(B.parse_blocks(synth.html_df(spark, SF_DIR)))


def test_parse_inverts_synthesis(spark):
    """Block count, tag mix and anchor counts recovered from the markup
    must equal the htmlgen spec's arithmetic."""
    rows = (
        _classified(spark)
        .select("doc_id", "b", "tag", "n_links")
        .collect()
    )
    per_doc: dict[int, int] = {}
    for r in rows:
        per_doc[r.doc_id] = max(per_doc.get(r.doc_id, 0), r.b + 1)
        bh = (r.doc_id * H.HB_MULT + r.b * H.HB_BMULT + H.HB_ADD) % H.HB_MOD
        tag = dict(H.HB_TAG_CASES).get(bh % 10, H.HB_TAG_DEFAULT)
        assert r.tag == tag, (r.doc_id, r.b)
        if tag in H.HB_CHROME_TAGS:
            expect_a = 2 + bh % 3
        elif tag == "li":
            expect_a = 1
        else:
            expect_a = 1 if bh % 5 == 0 else 0
        assert r.n_links == expect_a, (r.doc_id, r.b, tag)
    for doc_id, n in per_doc.items():
        assert n == 3 + doc_id % H.HB_NBLOCK_MOD


def test_classification_invariants(spark):
    df = _classified(spark)
    bad_kept = df.filter(
        (F.col("cf_class") == "bad") & (F.col("final_class") == "content")
    ).count()
    assert bad_kept == 0  # bad blocks are never promoted
    good_dropped = df.filter(
        (F.col("cf_class") == "good") & (F.col("final_class") == "boilerplate")
    ).count()
    assert good_dropped == 0  # good blocks are always kept
    # link-dense chrome must overwhelmingly classify bad
    nav = df.filter(F.col("tag").isin(*H.HB_CHROME_TAGS))
    frac_bad = (
        nav.filter(F.col("cf_class") == "bad").count() / max(nav.count(), 1)
    )
    assert frac_bad > 0.5
    # every class actually occurs at test scale
    classes = {r.cf_class for r in df.select("cf_class").distinct().collect()}
    assert classes == {"bad", "short", "good", "near_good"}


def test_main_content_accounting(spark):
    df = _classified(spark).cache()
    out = B.main_content(df)
    row = (
        out.agg(
            F.sum("n_blocks").alias("nb"),
            F.sum("n_content").alias("nc"),
            F.sum("content_chars").alias("cc"),
            F.sum("boiler_chars").alias("bc"),
        ).collect()[0]
    )
    tot = df.agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum((F.col("final_class") == "content").cast("long")).alias("nc"),
        F.sum("text_chars").alias("tc"),
    ).collect()[0]
    assert row.nb == tot.nb and row.nc == tot.nc
    assert row.cc + row.bc == tot.tc
    # main_text length = kept chars + newline separators
    lens = out.select(
        (F.length("main_text")
         - (F.col("content_chars") + F.greatest(F.col("n_content"), F.lit(1)) - 1)
         ).alias("delta")
    ).agg(F.max(F.abs(F.col("delta")))).collect()[0][0]
    assert lens == 0
    # media refs only from content blocks, comma-joined
    kept_refs = df.filter(
        (F.col("final_class") == "content") & (F.col("media_ref") != "")
    ).count()
    n_refs = out.select(
        F.when(F.col("media_refs") == "", 0)
        .otherwise(F.size(F.split("media_refs", ",")))
        .alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert n_refs == kept_refs
    df.unpersist()


def test_strip_plan_single_exchange(spark):
    """Parse + classify + strip must shuffle once: the classify
    window's doc_id exchange is reused by the groupBy (partial agg on
    the same partitioning), and synthesis is narrow."""
    out = B.main_content(_classified(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    # loader rebalance (round-robin) is not a hash exchange; allow the
    # single doc_id hash exchange only
    assert n_exchange == 1, plan

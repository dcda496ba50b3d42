"""jusText-style DOM-block boilerplate strip (main-content extraction).

The north rule's extraction tier includes "HTML boilerplate strip …
DOM heuristics": given one HTML string per document (newline-separated
single-tag blocks, :mod:`htmlgen` spec), recover the main content the
way jusText (Pomikálek 2011) / trafilatura do —

1. **parse**: split the markup into DOM blocks, pull anchor texts and
   ``<img>`` refs, strip tags;
2. **context-free classify** each block from *content-based* signals
   only (link density, stopword density, text length — the tag name is
   kept as metadata, never used as a feature, exactly jusText's rule);
3. **context propagation**: short / near-good blocks next to a good
   block are promoted to content (the jusText neighbour rule as a
   lag/lead window over block order);
4. **strip**: per-doc ordered concat of the surviving block texts +
   the interleaved media refs.

All thresholds are RATIONAL (integer cross-multiplication, e.g.
``anchor_chars * 10 > 3 * text_chars`` for link_density > 0.3) so the
classification never sits on a float boundary — the reported densities
are single int/int divisions, IEEE-identical cross-engine.

Scale shape: parse + classify are narrow projections; the only
exchange is the per-doc window (blocks-per-doc is page-bounded, no
skew), and the main-content groupBy reuses the same doc_id
partitioning, so the whole strip is one shuffle end to end.

Reference parity: the reference tool normalizes engine output by
stripping markers/noise lines per page (deepseek_ocr2_engine.py:
300-341); this operator is the same normalize-then-keep decision
lifted to DOM blocks, per SURVEY §2.7's transform family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---- classification thresholds (rational: NUM/DEN) ----
LD_BAD_NUM, LD_BAD_DEN = 3, 10       # link_density > 0.30  -> bad
LD_GOOD_NUM, LD_GOOD_DEN = 3, 20     # link_density < 0.15 for good
SD_GOOD_NUM, SD_GOOD_DEN = 1, 25     # stop_density >= 0.04 for good
LEN_SHORT = 25                       # text_chars < 25      -> short
LEN_GOOD = 70                        # text_chars >= 70 for good
STOP_TOKENS = ("the", "a")           # closed synthetic-corpus stop set

# ---- parse regexes (shared verbatim with the oracle via oracles.py) ----
TAG_RE = r"^<([a-z0-9]+)>"
INNER_RE = r"^<[a-z0-9]+>(.*)</[a-z0-9]+>$"
ANCHOR_RE = r'<a [^>]*>([^<]*)</a>'
IMG_RE = r'<img src="([^"]*)"'
TAG_STRIP_RE = r"<[^>]+>"
WORD_SPLIT_RE = r"[^a-z0-9]+"


def parse_blocks(html: DataFrame) -> DataFrame:
    """(doc_id, html) → one row per DOM block with parse features.

    Narrow-only: split on newline + posexplode, then regex projections.
    Output: (doc_id, b, tag, media_ref, text, text_chars, n_links,
    anchor_chars, n_words, n_stop).
    """
    blocks = html.select(
        "doc_id", F.posexplode(F.split("html", "\n")).alias("b", "block")
    )
    parsed = blocks.select(
        "doc_id",
        F.col("b").cast("long").alias("b"),
        F.regexp_extract("block", TAG_RE, 1).alias("tag"),
        F.regexp_extract("block", IMG_RE, 1).alias("media_ref"),
        F.regexp_extract("block", INNER_RE, 1).alias("inner"),
    )
    anchors = F.regexp_extract_all("inner", F.lit(ANCHOR_RE), 1)
    stripped = F.trim(F.regexp_replace("inner", TAG_STRIP_RE, ""))
    feat = parsed.select(
        "doc_id",
        "b",
        "tag",
        "media_ref",
        stripped.alias("text"),
        anchors.alias("anchors"),
    )
    words = F.filter(
        F.split("text", WORD_SPLIT_RE), lambda t: t != F.lit("")
    )
    return feat.select(
        "doc_id",
        "b",
        "tag",
        "media_ref",
        "text",
        F.length("text").cast("long").alias("text_chars"),
        F.size("anchors").cast("long").alias("n_links"),
        F.length(F.array_join("anchors", "")).cast("long").alias("anchor_chars"),
        F.size(words).cast("long").alias("n_words"),
        F.size(
            F.filter(words, lambda t: t.isin(*STOP_TOKENS))
        ).cast("long").alias("n_stop"),
    )


def classify_blocks(blocks: DataFrame) -> DataFrame:
    """Context-free class + neighbour-propagated final class.

    cf_class ∈ {bad, short, good, near_good} (evaluated in that order);
    final_class ∈ {content, boilerplate}: good → content, short /
    near_good → content iff an adjacent block is context-free good.
    """
    gtc = F.greatest("text_chars", F.lit(1))
    gnw = F.greatest("n_words", F.lit(1))
    bad = F.col("anchor_chars") * LD_BAD_DEN > F.lit(LD_BAD_NUM) * gtc
    good = (
        (F.col("text_chars") >= LEN_GOOD)
        & (F.col("anchor_chars") * LD_GOOD_DEN < F.lit(LD_GOOD_NUM) * gtc)
        & (F.col("n_stop") * SD_GOOD_DEN >= F.lit(SD_GOOD_NUM) * gnw)
    )
    cf = (
        F.when(bad, "bad")
        .when(F.col("text_chars") < LEN_SHORT, "short")
        .when(good, "good")
        .otherwise("near_good")
    )
    w = Window.partitionBy("doc_id").orderBy("b")
    with_cf = blocks.select(
        "*",
        (F.col("anchor_chars").cast("double") / gtc.cast("double")).alias(
            "link_density"
        ),
        (F.col("n_stop").cast("double") / gnw.cast("double")).alias(
            "stop_density"
        ),
        cf.alias("cf_class"),
    )
    neighbour_good = (F.lag("cf_class").over(w) == "good") | (
        F.lead("cf_class").over(w) == "good"
    )
    final = (
        F.when(F.col("cf_class") == "good", "content")
        .when(
            F.col("cf_class").isin("short", "near_good") & neighbour_good,
            "content",
        )
        .otherwise("boilerplate")
    )
    return with_cf.withColumn("final_class", final)


def main_content(classified: DataFrame) -> DataFrame:
    """Per-doc boilerplate strip: ordered concat of content-block texts
    + comma-joined media refs of surviving blocks (arrays never cross
    the oracle boundary) + kept/dropped char accounting.

    Reuses the classify window's doc_id partitioning — the groupBy adds
    no second corpus shuffle."""
    is_content = F.col("final_class") == "content"
    kept_txt = F.when(is_content, F.struct("b", "text"))
    kept_ref = F.when(
        is_content & (F.col("media_ref") != ""), F.struct("b", "media_ref")
    )
    joined = lambda col, field, sep: F.array_join(  # noqa: E731
        F.transform(F.array_sort(F.collect_list(col)), lambda s: s[field]),
        sep,
    )
    return classified.groupBy("doc_id").agg(
        joined(kept_txt, "text", "\n").alias("main_text"),
        joined(kept_ref, "media_ref", ",").alias("media_refs"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(is_content.cast("long")).alias("n_content"),
        F.sum(
            F.when(is_content, F.col("text_chars")).otherwise(F.lit(0))
        ).alias("content_chars"),
        F.sum(
            F.when(~is_content, F.col("text_chars")).otherwise(F.lit(0))
        ).alias("boiler_chars"),
    )


def strip_confusion(classified: DataFrame) -> DataFrame:
    """Confusion table of the strip vs synthesis ground truth: the
    htmlgen spec marks chrome blocks by TAG (nav/footer/aside) but the
    classifier never reads the tag, so (truth_chrome × final_class)
    counts/char masses measure real leakage both ways — the jusText
    evaluation shape. Tiny aggregate: groupBy over 4 cells + a 1-row
    totals broadcast."""
    from ..htmlgen import HB_CHROME_TAGS

    lab = classified.select(
        F.col("tag").isin(*HB_CHROME_TAGS).alias("truth_chrome"),
        "final_class",
        "text_chars",
    )
    cells = lab.groupBy("truth_chrome", "final_class").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("text_chars").cast("long").alias("sum_chars"),
    )
    tot = lab.agg(
        F.count(F.lit(1)).alias("all_blocks"),
        F.sum("text_chars").cast("long").alias("all_chars"),
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "truth_chrome",
        "final_class",
        "n_blocks",
        "sum_chars",
        (F.col("n_blocks").cast("double") / F.col("all_blocks").cast("double")
         ).alias("block_share"),
        (F.col("sum_chars").cast("double") / F.col("all_chars").cast("double")
         ).alias("char_share"),
    )

"""Project detection (SURVEY §2.3 J9/J10; reference
project_detector.py:49-170).

The reference cascades: path-based match (folder components vs
per-project folder lists, with wildcards) → content-based keyword
scoring (count × len(keyword), argmax, normalized) → '未分类' fallback.

Driver documents have no file paths; the ``source`` column plays the
path role (J9 = dimension join on source pattern), and content scoring
(J10) runs on ``text`` exactly like the reference: score =
occurrence_count × keyword length, best project by score, confidence =
score / max_possible, cascade via coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

UNCLASSIFIED = "未分类"

# (project, source_pattern) — J9 path-dimension analogue. Patterns may
# contain '*' wildcards (reference project_detector.py:70-76 translates
# them with folder.replace('*', '.*') and re.match, i.e. anchored at the
# start, open at the end); rules are checked IN ORDER and the first
# match wins (the reference iterates its project dict in order). src1
# docs therefore go to proj_alpha (rule 1) even though src1* (rule 5)
# also covers them; src10..src19 go to proj_delta.
PROJECT_SOURCES: list[tuple[str, str]] = [
    ("proj_alpha", "src0"),
    ("proj_alpha", "src1"),
    ("proj_beta", "src2"),
    ("proj_beta", "src3"),
    ("proj_gamma", "src4"),
    ("proj_delta", "src1*"),
]


def _source_rules() -> list[tuple[int, str, str, bool, str]]:
    """(rule_id, project, source_pat, is_wild, pat_re) rows; pat_re is
    the reference's '*'→'.*' translation anchored at the start."""
    return [
        (
            i,
            p,
            s,
            "*" in s,
            "^" + s.lower().replace("*", ".*") if "*" in s else "",
        )
        for i, (p, s) in enumerate(PROJECT_SOURCES)
    ]

# (project, keyword) — J10 content keywords
PROJECT_KEYWORDS: list[tuple[str, str]] = [
    ("proj_alpha", "spark"), ("proj_alpha", "stream"),
    ("proj_beta", "customer"), ("proj_beta", "lineitem"),
    ("proj_gamma", "window"), ("proj_gamma", "vector"),
]


def source_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _source_rules(),
        "rule_id int, project string, source_pat string,"
        " is_wild boolean, pat_re string",
    )


def keyword_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PROJECT_KEYWORDS, "project string, keyword string")


def detect_projects(
    docs: DataFrame, src_dim: DataFrame, kw_dim: DataFrame
) -> DataFrame:
    """docs(doc_id, source, text) → doc_id, project, match_type,
    score — J9 ∘ J10 ∘ fallback cascade."""
    # exact rules equi-match; wildcard rules theta-match via RLIKE with
    # the rule's column pattern (tiny broadcast dim → a bounded
    # BroadcastNestedLoopJoin, the right plan for an OR-of-predicates
    # rule join); first matching rule wins (rule_id order)
    cond = (~src_dim.is_wild & (docs.source == src_dim.source_pat)) | (
        src_dim.is_wild & F.expr("source RLIKE pat_re")
    )
    # first matching rule via map-side-combinable min_by on rule_id —
    # the previous (rule_id asc) window's first row, no per-doc sort
    by_path = (
        docs.join(F.broadcast(src_dim), cond)
        .groupBy("doc_id")
        .agg(F.min_by(F.col("project"), F.col("rule_id")).alias("p_path"))
    )

    occ = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.col("keyword"))))
        / F.length("keyword")
    ).cast("long")
    hits = (
        docs.join(F.broadcast(kw_dim), F.instr(F.col("text"), F.col("keyword")) > 0)
        .withColumn("occ", occ)
        .groupBy("doc_id", "project")
        .agg(F.sum(F.col("occ") * F.length("keyword")).alias("score"))
    )
    # argmax via min_by on (−score, project) — the (score desc,
    # project asc) window's first row, no per-doc sort
    by_content = (
        hits.groupBy("doc_id")
        .agg(
            F.min_by(
                F.struct(F.col("project"), F.col("score")),
                F.struct((-F.col("score")).alias("ns"), F.col("project")),
            ).alias("b")
        )
        .select(
            "doc_id",
            F.col("b.project").alias("p_content"),
            F.col("b.score").alias("score"),
        )
    )

    return (
        docs.select("doc_id")
        .join(by_path, "doc_id", "left")
        .join(by_content, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("p_path", "p_content", F.lit(UNCLASSIFIED)).alias("project"),
            F.when(F.col("p_path").isNotNull(), "path")
            .when(F.col("p_content").isNotNull(), "content")
            .otherwise("none")
            .alias("match_type"),
            F.coalesce("score", F.lit(0)).cast("long").alias("content_score"),
        )
    )

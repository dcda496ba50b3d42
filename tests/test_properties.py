"""Property-based tests (hypothesis) for the operator invariants the
fixture tests can't sweep: arbitrary span multisets, arbitrary match
sequences, arbitrary token texts.

Hypothesis drives the INPUT GENERATION; each property materializes one
small Spark job per example, so example counts are kept low (Spark
round-trips are ~100 ms each).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_FAST = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_span = st.tuples(
    st.sampled_from(["text", "media"]),
    st.text(
        alphabet="ab 记账\n<|ref|>[[12, 3]]",  # marker/bbox/CJK fragments
        max_size=24,
    ),
    st.integers(min_value=0, max_value=9),  # offset — duplicates likely
)


@_FAST
@given(st.lists(_span, max_size=12), st.randoms(use_true_random=False))
def test_extraction_permutation_invariant(spark, spans, rnd):
    """The extraction output is a pure function of the span MULTISET —
    any stored order of the same spans yields byte-identical output
    (the north-rule invariant, on arbitrary generated spans)."""
    from pdf_ocr_comparison_tool_spark.operators import extraction

    def df_for(order):
        rows = [
            (
                0,
                [
                    {
                        "kind": k,
                        "text": t if k == "text" else "",
                        "media_ref": f"m://0/{i}" if k == "media" else "",
                        "offset": off,
                    }
                    for i, (k, t, off) in order
                ],
            )
        ]
        from pdf_ocr_comparison_tool_spark.synth import DOCUMENTS_SCHEMA

        return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)

    base = list(enumerate(spans))
    shuffled = base[:]
    rnd.shuffle(shuffled)
    out_a = extraction.extract_ordered_spans(df_for(base)).collect()
    out_b = extraction.extract_ordered_spans(df_for(shuffled)).collect()
    assert out_a == out_b


@_FAST
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=2)),  # t_doc
            st.integers(min_value=1, max_value=6),  # t_page
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_merge_islands_invariants(spark, seq):
    """For ANY best-match sequence: islands partition the pages (sum of
    n_pages = input rows), every island's avg_sim lies within the
    min/max of its members' sims, and page ranges are well-formed."""
    from pdf_ocr_comparison_tool_spark.operators import merge

    rows = [
        (
            0,
            i + 1,
            td,
            (tp if td is not None else None),
            round(sim, 6),
            "未找到" if td is None else ("完全匹配" if sim >= 0.95 else "部分匹配"),
        )
        for i, (td, tp, sim) in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, page_num int, t_doc long, t_page int,"
        " sim double, status string",
    )
    out = merge.merge_page_matches(df).collect()
    assert sum(r["n_pages"] for r in out) == len(rows)
    sims = [r[4] for r in rows]
    for isl in out:
        assert min(sims) - 1e-9 <= isl["avg_sim"] <= max(sims) + 1e-9
        assert isl["page_range"].startswith("P")


@_FAST
@given(st.text(alphabet="abc 01记账凭证,.\n", max_size=60))
def test_keywords_and_quality_bounded(spark, text):
    """Per-page keyword/tokenizer operators never crash on arbitrary
    text and respect their contracts: ≤10 keywords, each of length ≥ 2,
    non-digit; relational TF rows have positive counts whose total
    equals an independent (HOF-expression) tokenization of the text."""
    from pdf_ocr_comparison_tool_spark import sqlgen as G
    from pdf_ocr_comparison_tool_spark.operators import features, matching

    df = spark.createDataFrame([(1, 1, text)], "doc_id long, page_num int, text string")
    row = df.select(features.page_keywords_expr(F.col("text")).alias("kw")).collect()[0]
    assert len(row["kw"]) <= 10
    for k in row["kw"]:
        assert len(k) >= 2 and not k.isdigit()
    tf_rows = matching.cosine_token_rows(df, ["doc_id", "page_num"]).collect()
    assert all(r["cnt"] > 0 for r in tf_rows)
    assert len({r["tok"] for r in tf_rows}) == len(tf_rows)
    folded = F.lower(F.translate(F.col("text"), G.CJK_FOLD_SRC, G.CJK_FOLD_DST))
    n_toks = df.select(
        F.size(
            F.filter(F.split(folded, r"[^a-z0-9@#$%&*]+"), lambda x: x != "")
        ).alias("n")
    ).collect()[0]["n"]
    assert sum(r["cnt"] for r in tf_rows) == n_toks

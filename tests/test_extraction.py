"""Extraction core: byte-equality vs pandas oracle, DuckDB-oracle parity
for the synth derivation, and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_comparison_tool_spark import sqlgen as G
from pdf_ocr_comparison_tool_spark import synth
from pdf_ocr_comparison_tool_spark.operators import extraction
from tests.conftest import SF_DIR


def _collect_contract(df):
    """(doc_id, spans) → {doc_id: [(kind,text,media_ref,order), ...]}"""
    out = {}
    for row in df.collect():
        out[row["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]
        ]
    return out


def test_byte_equality_vs_pandas_oracle(spark):
    pdf = synth.fixture_docs_pandas(n_docs=150, seed=42)
    docs = spark.createDataFrame(pdf, schema=synth.FIXTURE_SCHEMA)
    got = _collect_contract(extraction.extract_ordered_spans(docs))
    expected = dict(extraction.pandas_oracle(pdf))
    assert set(got) == set(expected)
    for doc_id in expected:
        assert got[doc_id] == expected[doc_id], f"mismatch for {doc_id}"


def test_empty_and_skew_docs(spark):
    pdf = synth.fixture_docs_pandas(n_docs=80, seed=7)
    docs = spark.createDataFrame(pdf, schema=synth.FIXTURE_SCHEMA)
    res = extraction.extract_ordered_spans(docs)
    # empty docs survive with empty span arrays
    empties = res.filter(F.size("spans") == 0).count()
    assert empties >= 1
    # order column is always 0..n-1
    bad = res.select(
        F.exists(
            F.zip_with(
                "spans",
                F.sequence(F.lit(0), F.greatest(F.size("spans") - 1, F.lit(0))),
                lambda s, i: s["order"] != i,
            ),
            lambda x: x,
        ).alias("bad")
    ).filter(F.col("bad")).count()
    assert bad == 0


def test_partition_invariance(spark):
    pdf = synth.fixture_docs_pandas(n_docs=120, seed=11)
    docs = spark.createDataFrame(pdf, schema=synth.FIXTURE_SCHEMA)
    a = _collect_contract(extraction.extract_ordered_spans(docs.repartition(2)))
    b = _collect_contract(extraction.extract_ordered_spans(docs.repartition(17, "doc_id")))
    assert a == b


def test_synth_spans_matches_duckdb_oracle(spark, duck):
    """The Spark-native derivation + extraction must equal the generated
    DuckDB SQL end-to-end (this is what the driver's gate runs)."""
    docs = synth.spans_df(spark, SF_DIR)
    got = (
        extraction.exploded_spans(docs)
        .orderBy("doc_id", "ord")
        .collect()
    )
    exp = duck.execute(
        G.extraction_sql(G.DUCK) + " ORDER BY doc_id, ord"
    ).fetchall()
    assert len(got) == len(exp), (len(got), len(exp))
    for g, e in zip(got, exp):
        assert (g["doc_id"], g["ord"], g["kind"], g["text"], g["media_ref"]) == tuple(e)


def test_normalize_strips_noise(spark):
    df = spark.createDataFrame(
        [("d1", [("text", "<|ref|>hello world<|/ref|>[[1, 2, 3, 4]]\ntorch.Size([1, 3])\nok line\nx", "", 5)])],
        schema=synth.FIXTURE_SCHEMA,
    )
    rows = extraction.extract_ordered_spans(df).collect()
    spans = rows[0]["spans"]
    assert len(spans) == 1
    assert spans[0]["text"] == "hello world\nok line"


def test_null_and_edge_spans(spark):
    """Null text/media_ref, whitespace-only text, zero/duplicate offsets
    — the normalizer must coalesce and the sort stay total."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField(
                "spans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("kind", T.StringType()),
                            T.StructField("text", T.StringType(), True),
                            T.StructField("media_ref", T.StringType(), True),
                            T.StructField("offset", T.IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )
    rows = [
        (
            "edge",
            [
                ("text", None, None, 0),          # null text -> dropped
                ("text", "   \n  ", "", 0),       # whitespace-only -> dropped
                ("media", None, None, 0),          # null media_ref -> ''
                ("text", "keep me", "", 0),       # same offset as media
                ("text", "keep me", "", 0),       # exact duplicate span
            ],
        )
    ]
    df = spark.createDataFrame(rows, schema)
    got = extraction.extract_ordered_spans(df).collect()[0]["spans"]
    assert [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in got] == [
        ("media", "", "", 0),
        ("text", "keep me", "", 1),
        ("text", "keep me", "", 2),
    ]


def test_full_text_hash(spark):
    pdf = synth.fixture_docs_pandas(n_docs=30, seed=3)
    docs = spark.createDataFrame(pdf, schema=synth.FIXTURE_SCHEMA)
    ft = extraction.full_text(docs).collect()
    import hashlib, re

    oracle = dict(extraction.pandas_oracle(pdf))
    for row in ft:
        texts = [t for (k, t, m, o) in oracle[row["doc_id"]] if k == "text"]
        joined = "\n".join(texts)
        assert row["full_text"] == joined
        norm = re.sub(r"\s+", "", joined).lower()
        assert row["text_hash"] == hashlib.md5(norm.encode("utf-8")).hexdigest()


def test_column_layout_order_invariants(spark):
    """Column-major reindex: within a doc, ord_col enumerates 0..n-1
    and is sorted by (col_id, y1, x1); all flat spans survive."""
    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators import extraction

    g = extraction.parse_grounded(synth.grounded_df(spark, SF_DIR))
    out = extraction.column_layout(g)
    assert out.count() == g.count()
    rows = out.collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r.ord_col)
        assert [r.ord_col for r in rs] == list(range(len(rs)))
        keys = [(r.col_id, r.y1, r.x1) for r in rs]
        assert keys == sorted(keys), doc
        # flat order preserved as a column (permutation of 0..n-1)
        assert sorted(r.ord_flat for r in rs) == list(range(len(rs)))


def test_media_captions_semantics(spark):
    """Hand-built interleaved layout: nearer side wins, tie goes to
    the preceding text, edge media fall back to the only side, and a
    media-only document yields ('none', '')."""
    rows = [
        # doc 1 (ords 0..3): t(0) m(1) m(2) t(3) — m(1) prev dist 1 vs
        # next dist 2 -> prev; m(2) prev dist 2 vs next dist 1 -> next.
        (1, [("text", "alpha", "", 0), ("media", "", "m://1/a", 1),
             ("media", "", "m://1/b", 2), ("text", "gamma", "", 3)]),
        # doc 2: media first (no prev -> next), media last (no next -> prev)
        (2, [("media", "", "m://2/a", 0), ("text", "mid", "", 1),
             ("media", "", "m://2/b", 2)]),
        # doc 3: media only -> none
        (3, [("media", "", "m://3/a", 0)]),
    ]
    exploded = spark.createDataFrame(
        [
            (d, i, k, t, m)
            for d, spans in rows
            for i, (k, t, m, o) in enumerate(sorted(spans, key=lambda s: s[3]))
        ],
        "doc_id long, ord long, kind string, text string, media_ref string",
    )
    out = {
        (r.doc_id, r.media_ref): r
        for r in extraction.media_captions(exploded).collect()
    }
    assert len(out) == 5
    r = out[(1, "m://1/a")]
    assert (r.caption_side, r.caption) == ("prev", "alpha")
    r = out[(1, "m://1/b")]
    assert (r.caption_side, r.caption) == ("next", "gamma")
    assert (r.prev_ord, r.next_ord) == (0, 3)
    # tie case: t(0) m(1) t(2) -> equidistant -> prev
    tie = spark.createDataFrame(
        [(9, 0, "text", "left", ""), (9, 1, "media", "", "m://9/a"),
         (9, 2, "text", "right", "")],
        "doc_id long, ord long, kind string, text string, media_ref string",
    )
    t = extraction.media_captions(tie).collect()[0]
    assert (t.caption_side, t.caption) == ("prev", "left")
    r = out[(2, "m://2/a")]
    assert (r.caption_side, r.caption) == ("next", "mid")
    assert r.prev_ord is None
    r = out[(2, "m://2/b")]
    assert (r.caption_side, r.caption) == ("prev", "mid")
    assert r.next_ord is None
    r = out[(3, "m://3/a")]
    assert (r.caption_side, r.caption) == ("none", "")


def test_media_captions_partition_invariance(spark):
    """Caption alignment is a pure function of the document content:
    byte-identical under any input partitioning (the north-rule
    invariance, extended to the alignment table)."""
    from pdf_ocr_comparison_tool_spark.operators.extraction import (
        exploded_spans,
        media_captions,
    )

    ex = exploded_spans(synth.spans_df(spark, SF_DIR))
    key = lambda r: (r.doc_id, r.ord)  # noqa: E731
    a = sorted(media_captions(ex.repartition(1)).collect(), key=key)
    b = sorted(media_captions(ex.repartition(32)).collect(), key=key)
    assert a == b
    assert len(a) > 0

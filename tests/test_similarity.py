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


def test_ann_search_recall_vs_brute(spark):
    """The LSH / IVF end-to-end searches must agree with the brute-force
    baseline on a reasonable fraction of true top-k neighbors (they are
    approximate by design; the floor pins against silent degradation)."""
    from pdf_ocr_comparison_tool_spark.operators import similarity_search as SS
    from tests.conftest import SF_DIR_001

    emb = spark.read.parquet(f"{SF_DIR_001}/embeddings.parquet")
    k = 10

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["q_id"], set()).add(r["c_id"])
        return out

    brute = topk_sets(SS.ann_brute_topk(emb, n_queries=8, k=k))

    def recall(df):
        approx = topk_sets(df)
        hits = sum(len(brute[q] & approx.get(q, set())) for q in brute)
        return hits / sum(len(brute[q]) for q in brute)

    r_ivf = recall(SS.ivf_search(emb, n_queries=8, k=k))
    r_lsh = recall(SS.lsh_search(emb, n_queries=8, k=k))
    # nprobe=4/16 centroids scans ~25% of the corpus; random-ish
    # embeddings make these floors loose but non-trivial
    assert r_ivf >= 0.2, f"IVF recall@{k} collapsed: {r_ivf}"
    assert r_lsh >= 0.05, f"LSH recall@{k} collapsed: {r_lsh}"

    # trained quantizer: recall is NOT the objective Lloyd optimizes —
    # balanced fitted cells can scan fewer candidates at fixed nprobe
    # and trade an individual neighbor (measured 0.85 vs first-N's 0.90
    # on this fixture, where unbalanced first-N cells make nprobe=4
    # cover more of the corpus). Floor: within 80% of the stand-in,
    # and never collapsed; the companion objective test asserts the
    # fit strictly improves what k-means actually optimizes.
    fitted = SS.kmeans_fit(emb)
    r_fit = recall(SS.ivf_search(emb, n_queries=8, k=k, centroids=fitted))
    assert r_fit >= 0.8 * r_ivf, f"fitted recall {r_fit} vs first-N {r_ivf}"
    assert r_fit >= 0.2, f"fitted-IVF recall@{k} collapsed: {r_fit}"


def test_kmeans_fit_tightens_objective(spark):
    """Each Lloyd iteration must not increase the k-means objective
    (sum of min squared distances) — 2 fitted iterations score no worse
    than the first-N init, and the fitted centroids still number k."""
    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark.operators import similarity_search as SS
    from tests.conftest import SF_DIR_001

    emb = spark.read.parquet(f"{SF_DIR_001}/embeddings.parquet")

    def objective(centroids):
        return (
            SS.ivf_assign(emb, centroids=centroids)
            .agg(F.sum("dist"))
            .collect()[0][0]
        )

    init = SS.kmeans_fit(emb, iters=0)
    fit1 = SS.kmeans_fit(emb, iters=1)
    fit2 = SS.kmeans_fit(emb, iters=2)
    assert fit2.count() == SS.IVF_N_CENTROIDS
    o0, o1, o2 = objective(init), objective(fit1), objective(fit2)
    assert o1 <= o0 + 1e-9, f"iteration 1 worsened the objective: {o0} -> {o1}"
    assert o2 <= o1 + 1e-9, f"iteration 2 worsened the objective: {o1} -> {o2}"


def test_cosine_scalar_equals_relational(spark):
    """Triangle check: the direct scalar TF-cosine expression (the spec
    form, matching.cosine_sim_expr) and the relational sparse-dot
    scorer (matching.cosine_scorer, the production shape) must be
    bit-identical on the staged match's candidate pairs."""
    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark.operators import matching
    from pdf_ocr_comparison_tool_spark.queries import _featured_roles
    from tests.conftest import SF_DIR_001

    v, r = _featured_roles(spark, SF_DIR_001)
    vtr = matching.cosine_token_rows(
        v, ["doc_id", "page_num"], cnt_alias="cnt_v"
    )
    rtr = matching.cosine_token_rows(
        r.select(
            F.col("doc_id").alias("t_doc"),
            F.col("page_num").alias("t_page"),
            "text",
        ),
        ["t_doc", "t_page"],
        cnt_alias="cnt_r",
    )
    ranked = matching.match_pages(
        v, r, pair_scorer=matching.cosine_scorer(vtr, rtr),
    )
    # exclude the exact-hash short-circuit rows (sim := 1.0 by J1)
    rel = {
        (x["doc_id"], x["page_num"], x["t_doc"], x["t_page"]): x["sim"]
        for x in ranked.filter(F.col("sim") < 1.0).collect()
    }
    assert rel, "fixture produced no fuzzy cosine pairs"
    keys = list(rel)[:50]
    vt = v.select("doc_id", "page_num", F.col("text").alias("v_text"))
    rt = r.select(
        F.col("doc_id").alias("t_doc"),
        F.col("page_num").alias("t_page"),
        F.col("text").alias("r_text"),
    )
    pairs = spark.createDataFrame(
        keys, "doc_id long, page_num int, t_doc long, t_page int"
    )
    scalar = (
        pairs.join(vt, ["doc_id", "page_num"])
        .join(rt, ["t_doc", "t_page"])
        .select(
            "doc_id", "page_num", "t_doc", "t_page",
            matching.cosine_sim_expr(F.col("v_text"), F.col("r_text")).alias("s"),
        )
        .collect()
    )
    assert len(scalar) == len(keys)
    for row in scalar:
        k = (row["doc_id"], row["page_num"], row["t_doc"], row["t_page"])
        assert rel[k] == row["s"], k


def test_pq_search_recall_vs_exact_l2(spark):
    """ADC product-quantization ranks by approximate squared L2; pin a
    recall floor against the EXACT L2 top-k (computed in-test) so the
    codebook/encode/ADC chain can't silently degrade. 0.31 measured
    with the deterministic stand-in codebook; floor well under that."""
    import numpy as np

    from pdf_ocr_comparison_tool_spark.operators import similarity_search as SS
    from tests.conftest import SF_DIR_001

    emb = spark.read.parquet(f"{SF_DIR_001}/embeddings.parquet")
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    ids = sorted(rows)
    V = np.stack([rows[i] for i in ids])
    k = 10
    exact = {}
    for q in range(SS.PQ_N_QUERIES):
        d = ((V - V[q]) ** 2).sum(axis=1)
        order = sorted((dd, i) for i, dd in zip(ids, d) if i != q)
        exact[q] = {i for _, i in order[:k]}
    approx = {}
    for r in SS.pq_search(emb).collect():
        approx.setdefault(r["q_id"], set()).add(r["c_id"])
    assert all(len(v) == k for v in approx.values())
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    assert hits / (SS.PQ_N_QUERIES * k) >= 0.15


def test_pq_fit_reduces_quantization_error(spark):
    """Per-subspace Lloyd: iters=0 reproduces the first-K codebook
    stand-in exactly (same init), and the fitted codebook's total
    encode distortion can only descend from it; fitted ADC search still
    emits complete rankings."""
    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark.operators import similarity_search as SS
    from tests.conftest import SF_DIR_001

    emb = spark.read.parquet(f"{SF_DIR_001}/embeddings.parquet")

    def distortion(cb):
        return SS.pq_encode(emb, codebook=cb).agg(F.sum("dist")).collect()[0][0]

    d_standin = distortion(SS.pq_codebook(emb))
    d_init = distortion(SS.pq_fit_codebook(emb, iters=0))
    d_fit = distortion(SS.pq_fit_codebook(emb))
    assert d_init == d_standin  # double-cast of float32 is exact
    assert d_fit <= d_init + 1e-9, f"Lloyd worsened distortion: {d_init} -> {d_fit}"
    fitted = SS.pq_fit_codebook(emb)
    out = SS.pq_search(emb, codebook=fitted)
    per_q = {r["q_id"]: r["rank"] for r in out.collect()}
    assert len(per_q) == SS.PQ_N_QUERIES


def test_embed_suite_injection_matches_standalone(spark):
    """The --job embed CLI's caller-owned cache hooks (pairs= / knn=)
    must be pure plumbing: every suite member returns row-identical
    results whether it builds the graph itself or consumes the shared
    cached build."""
    from pdf_ocr_comparison_tool_spark.operators import similarity_search as SS
    from pdf_ocr_comparison_tool_spark import synth
    from tests.conftest import SF_DIR_001

    emb = synth.load_table(spark, SF_DIR_001, "embeddings")
    pairs = SS._knn_pairs(emb, SS.LSH_SEARCH_BITS, 256).cache()
    knn = SS.knn_join(emb, pairs=pairs).cache()
    try:
        def key(df):
            return sorted(map(tuple, df.collect()))

        assert key(knn) == key(SS.knn_join(emb))
        assert key(SS.hard_negatives(emb, pairs=pairs)) == key(
            SS.hard_negatives(emb)
        )
        assert key(SS.knn_label_noise(emb, knn=knn)) == key(
            SS.knn_label_noise(emb)
        )
        assert key(SS.pagerank_centrality(emb, knn=knn)) == key(
            SS.pagerank_centrality(emb)
        )
        assert key(SS.triangle_count(emb, knn=knn)) == key(
            SS.triangle_count(emb)
        )
    finally:
        knn.unpersist()
        pairs.unpersist()


def test_knn_join_shape_and_ordering(spark):
    """All-corpus kNN self-join: no self-neighbors, ranks contiguous
    from 1 with sims non-increasing per vector, at most k rows per
    vector, and broad coverage (most vectors have in-bucket company)."""
    from pdf_ocr_comparison_tool_spark.operators import similarity_search as SS
    from tests.conftest import SF_DIR_001

    emb = spark.read.parquet(f"{SF_DIR_001}/embeddings.parquet")
    n = emb.count()
    rows = SS.knn_join(emb).collect()
    per = {}
    for r in rows:
        assert r["vec_id"] != r["nbr_id"]
        per.setdefault(r["vec_id"], []).append((r["rank"], r["sim"]))
    assert len(per) > 0.8 * n
    for vec, rs in per.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= SS.KNN_K
        sims = [x[1] for x in rs]
        assert all(a >= b for a, b in zip(sims, sims[1:]))

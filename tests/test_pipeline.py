"""corpus_filter: every drop_reason branch fires, precedence holds."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_comparison_tool_spark.operators import pipeline


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog sleeps "
    "while many other animals of the forest watch it is a calm day"
)


def test_all_reasons_fire_and_precedence(spark):
    near_a = "alpha beta gamma delta epsilon zeta eta theta " * 6 + "iota"
    near_b = "alpha beta gamma delta epsilon zeta eta theta " * 6 + "kappa"
    rows = [
        (1, GOOD),                         # keep
        (2, GOOD),                         # exact dup of 1 -> exact_dup
        (3, "it is"),                      # 2 tokens -> too_short
        (4, "tiny"),                       # 1 token -> too_short
        (5, "spam " * 40),                 # top-2gram share -> repetitive_2gram
        (6, near_a),                       # cluster min -> keep (repetitive caught first?)
        (7, near_b),                       # near-dup of 6 -> near_dup
    ]
    out = {
        r["doc_id"]: r
        for r in pipeline.corpus_filter(_docs(spark, rows)).collect()
    }
    assert out[1]["keep"] and out[1]["drop_reason"] is None
    assert out[2]["drop_reason"] == "exact_dup"
    assert out[3]["drop_reason"] == "too_short"
    # precedence: too_short (stage 3) fires before low_quality (stage 4)
    assert out[4]["drop_reason"] == "too_short"
    assert out[5]["drop_reason"] == "repetitive_2gram"
    # 6 is its cluster's min doc_id: survives dedup; 7 is dropped as its dup
    assert out[7]["drop_reason"] == "near_dup"
    assert not out[7]["keep"]
    # the kept representative's verdict must not depend on its dup's text
    assert out[6]["neardup_keep"]


def test_low_quality_branch(spark):
    # 3-4 tokens: past too_short (MIN_TOKENS=3) but inside the 'low'
    # quality band (< 5 tokens) — the branch MIN_TOKENS=3 keeps live
    assert pipeline.MIN_TOKENS < 5
    out = pipeline.corpus_filter(
        _docs(spark, [(1, "aa bb cc dd")])
    ).collect()[0]
    assert out["quality"] == "low" and out["drop_reason"] == "low_quality"


def _tape_h(doc_id) -> int:
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)


def test_seq_packing_invariants(spark):
    """Offsets are the exclusive prefix sum in tape order
    (hash(doc_id), doc_id); pack ids are consistent derivations."""
    from pdf_ocr_comparison_tool_spark import synth
    from tests.conftest import SF_DIR

    out = pipeline.seq_packing(
        synth.load_table(spark, SF_DIR, "documents")
    ).collect()
    assert out
    run = 0
    for r in sorted(out, key=lambda r: (_tape_h(r["doc_id"]), r["doc_id"])):
        assert r["tok_offset"] == run
        assert r["pack_id"] == r["tok_offset"] // pipeline.CTX_TOKENS
        assert r["pack_offset"] == r["tok_offset"] % pipeline.CTX_TOKENS
        run += r["n_tokens"]


def test_seq_packing_string_ids_spread_buckets(spark):
    """The round-3 hazard: string doc_ids (the engine's own documents
    contract) must NOT collapse the prefix sum into one bucket — the
    tape hash is computed over the STRING form of the id, so the
    bucketing spreads regardless of id type, and offsets still form an
    exact exclusive prefix sum."""
    rows = [(f"doc-{i:04d}", f"tok{i} " * ((i % 7) + 1)) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    n_buckets = (
        docs.select(
            F.shiftright(
                pipeline.pack_tape_hash(F.col("doc_id")),
                pipeline.pack_shift(len(rows)),
            ).alias("bkt")
        )
        .distinct()
        .count()
    )
    assert n_buckets > 1, "string ids collapsed into a single bucket"
    out = pipeline.seq_packing(docs).collect()
    assert len(out) == len(rows)
    run = 0
    for r in sorted(out, key=lambda r: (_tape_h(r["doc_id"]), r["doc_id"])):
        assert r["tok_offset"] == run
        run += r["n_tokens"]


def test_bucketed_cumsum_recursion_bounds_window_size(spark):
    """The third-level guarantee: with a totals table far above the
    threshold, _bucketed_cumsum must recurse (multiple levels), every
    level's cardinality must shrink by the fan-in, only the final
    level (≤ threshold rows) takes an unpartitioned window, and the
    values must equal the naive single-window prefix sum."""
    n = 5000
    totals = spark.createDataFrame(
        [(i, (i * 37) % 11 + 1) for i in range(n)], "bkt long, v long"
    )
    levels: list[int] = []
    got = {
        r["bkt"]: r["off"]
        for r in pipeline._bucketed_cumsum(
            totals, "bkt", "v", "off",
            threshold=64, fanin_bits=4, _levels=levels,
        ).collect()
    }
    # recursion depth: 5000 -> ~313 -> ~20 (3 levels)
    assert len(levels) >= 3
    assert levels[0] == n
    for prev, cur in zip(levels, levels[1:]):
        assert cur <= (prev >> 4) + 1  # each level folds 2^4 buckets
    assert levels[-1] <= 64  # only this level ran unpartitioned
    run = 0
    expect = {}
    for i in range(n):
        expect[i] = run
        run += (i * 37) % 11 + 1
    assert got == expect


def test_mixture_sample_deterministic_and_temperature_shaped(spark):
    """The sampler is a pure function of (doc_id, source counts):
    identical under input reordering; rates are capped at 1, MONOTONE
    down in source size (the 1/√p temperature shape: rarer sources keep
    a larger fraction), and the realized sample lands near the target."""
    from pdf_ocr_comparison_tool_spark import synth
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    a = {r["doc_id"]: (r["keep_rate"], r["sampled"])
         for r in pipeline.mixture_sample(docs).collect()}
    b = {r["doc_id"]: (r["keep_rate"], r["sampled"])
         for r in pipeline.mixture_sample(docs.orderBy(F.desc("doc_id"))).collect()}
    assert a == b
    rows = pipeline.mixture_sample(docs).collect()
    rates = {}
    for r in rows:
        assert 0.0 < r["keep_rate"] <= 1.0
        rates[r["source"]] = (r["n_src"], r["keep_rate"])
    by_size = sorted(rates.values())
    for (n1, p1), (n2, p2) in zip(by_size, by_size[1:]):
        if n1 < n2 and p1 < 1.0:
            assert p1 >= p2, "smaller source must keep a larger fraction"
    n_sampled = sum(1 for r in rows if r["sampled"])
    assert abs(n_sampled - pipeline.SAMPLE_TARGET) < 0.25 * pipeline.SAMPLE_TARGET


def test_data_split_fractions_and_stability(spark):
    """Buckets in range; split fractions near the configured shares;
    assignment is a pure function of doc_id (stable across calls and
    under input reordering)."""
    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark import synth
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    a = {r["doc_id"]: (r["bucket"], r["split"])
         for r in pipeline.data_split(docs).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"])
         for r in pipeline.data_split(docs.orderBy(F.desc("doc_id"))).collect()}
    assert a == b
    n = len(a)
    assert all(0 <= v[0] < pipeline.SPLIT_BUCKETS for v in a.values())
    train = sum(1 for v in a.values() if v[1] == "train") / n
    assert abs(train - pipeline.SPLIT_TRAIN / pipeline.SPLIT_BUCKETS) < 0.03


def test_pack_manifest_partitions_all_docs(spark):
    """Every doc starts in exactly one pack; manifest token mass equals
    the corpus token mass; fills_window matches its own sum."""
    from pdf_ocr_comparison_tool_spark import synth
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    packing = pipeline.seq_packing(docs).collect()
    man = pipeline.pack_manifest(docs).collect()
    assert sum(r["n_docs"] for r in man) == len(packing)
    assert sum(r["sum_tokens"] for r in man) == sum(r["n_tokens"] for r in packing)
    for r in man:
        assert r["fills_window"] == (r["sum_tokens"] >= pipeline.CTX_TOKENS)


def test_corpus_diff_statuses(spark):
    """added/removed/changed/unchanged from a full-outer id join with
    content-hash compare; whitespace-only edits are NOT changes (the
    hash normalizes whitespace)."""
    old = _docs(spark, [(1, "alpha beta"), (2, "gamma delta"), (3, "kept text")])
    new = _docs(spark, [(2, "gamma REVISED"), (3, "kept   text"), (4, "brand new")])
    out = {r["doc_id"]: r["status"]
           for r in pipeline.corpus_diff(old, new).collect()}
    assert out == {1: "removed", 2: "changed", 3: "unchanged", 4: "added"}


def test_bpe_fit_matches_python_reference(spark):
    """Distributed BPE == the sequential reference algorithm on the
    same word-frequency table, including the overlapping-pair run case
    ('aaaa' merges greedily left) and weighted frequency ties."""
    from pdf_ocr_comparison_tool_spark.operators import bpe

    rows = [
        (1, "low lower lowest low low newer new newest wider wide"),
        (2, "aaaa aaa aa low new wide wider banana bandana"),
        (3, "low low low newer newer wide"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_freq"])
        for r in bpe.bpe_fit(docs).orderBy("merge_rank").collect()
    ]
    wf: dict = {}
    for _, t in rows:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    assert got == bpe.bpe_fit_py(wf)
    assert got[0][:4] == (1, "l", "o", "lo")  # 'lo' dominates this fixture


def test_bpe_fit_zero_merges_is_empty(spark):
    """n_merges=0 returns an empty merge table with the standard
    schema (the Python reference's degenerate case), not an error."""
    from pdf_ocr_comparison_tool_spark.operators import bpe

    docs = spark.createDataFrame([(1, "low lower")], "doc_id long, text string")
    out = bpe.bpe_fit(docs, n_merges=0)
    assert out.count() == 0
    assert out.columns == ["merge_rank", "lhs", "rhs", "merged", "pair_freq"]


def test_bpe_encode_reconstructs_words(spark):
    """Encode is lossless: per word occurrence, concatenating subwords
    in ``sub`` order rebuilds the original word, and the subword
    segmentation equals applying the trained merges sequentially
    (checked via bpe_fit_py greedy re-application on a sample word)."""
    from pdf_ocr_comparison_tool_spark.operators import bpe

    rows = [
        (1, "low lower lowest low low newer new newest wider wide"),
        (2, "aaaa aaa aa low new wide wider banana bandana"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    enc = bpe.bpe_encode(docs)
    rebuilt = {
        (r["doc_id"], r["ord"]): r["word"]
        for r in enc.groupBy("doc_id", "ord")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("sub", "subword")))
                .getField("subword")
            ).alias("word")
        )
        .collect()
    }
    for doc_id, text in rows:
        for i, w in enumerate(text.split()):
            assert rebuilt[(doc_id, i)] == w
    # segmentation check: replay the merges over a chosen word
    wf: dict = {}
    for _, t in rows:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    merges = [(lhs, rhs) for _, lhs, rhs, _, _ in bpe.bpe_fit_py(wf)]
    syms = list("lowest")
    for lhs, rhs in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    got = [
        r["subword"]
        for r in enc.filter("doc_id = 1 AND ord = 2").orderBy("sub").collect()
    ]
    assert got == syms


def test_corpus_filter_quality_model_flag(spark):
    """quality_model opt-in: default verdict unchanged; with the model
    dim, docs the scorer labels 'drop' gain the model_low_quality
    reason ranked after the heuristic low_quality stage, and every
    model-dropped doc is exactly one whose label is 'drop' among docs
    that survive the earlier stages."""
    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators import textstats
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    dim = textstats.quality_model_dim(spark)
    base = {r["doc_id"]: r["drop_reason"]
            for r in pipeline.corpus_filter(docs).collect()}
    flagged = {r["doc_id"]: r["drop_reason"]
               for r in pipeline.corpus_filter(docs, quality_model=dim).collect()}
    labels = {r["doc_id"]: r["label"]
              for r in textstats.quality_score(docs, dim).collect()}
    assert set(base) == set(flagged)
    pre_model = {None, "repetitive_2gram", "repetitive_3gram"}
    for d, r in flagged.items():
        if r == "model_low_quality":
            # only reachable for docs passing every earlier stage
            assert base[d] in pre_model
            assert labels[d] == "drop"
        elif base[d] in pre_model and labels[d] == "drop":
            # model drop outranks the repetition stages
            assert r == "model_low_quality", (d, base[d], r)
        else:
            assert r == base[d]


def test_substring_dup_interval_union(spark):
    """The lead-window closed form equals the exact union of [pos,
    pos+k) intervals: overlapping duplicated windows share tokens, a
    unique doc reports zero, and a verbatim within-doc repeat counts."""
    from pdf_ocr_comparison_tool_spark.operators import dedup

    k = dedup.SUBSTR_GRAM_K  # 10
    shared = " ".join(f"tok{i}" for i in range(k + 2))  # 12 tokens
    rows = [
        (1, shared + " tailone uniquest wordsa"),
        (2, "leadin wordsb " + shared),
        (3, "entirely different tokens " + " ".join(f"zz{i}" for i in range(k))),
        (4, shared + " middle filler " + shared),  # within-doc repeat
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.substring_dup_stats(docs).collect()}
    # docs 1 and 2 share a 12-token run -> 3 window starts, union = 12
    assert out[1]["n_dup_grams"] == 3 and out[1]["dup_tokens"] == k + 2
    assert out[2]["n_dup_grams"] == 3 and out[2]["dup_tokens"] == k + 2
    assert out[3]["dup_tokens"] == 0 and out[3]["dup_token_frac"] == 0.0
    assert out[4]["dup_tokens"] >= 2 * (k + 2)  # both copies covered
    assert abs(out[1]["dup_token_frac"] - (k + 2) / out[1]["n_tokens"]) < 1e-12


def test_interleaved_packing_costs_and_tape(spark):
    """Tape cost = extracted text-span tokens + MEDIA_TOKENS per media
    span; every input doc keeps a tape slot; offsets form the exact
    exclusive prefix sum in tape order (shared _pack_tape machinery)."""
    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators import dedup, extraction
    from tests.conftest import SF_DIR

    spans_docs = synth.spans_df(spark, SF_DIR)
    n_docs = spans_docs.count()
    out = pipeline.interleaved_packing(spans_docs).collect()
    assert len(out) == n_docs
    run = 0
    for r in sorted(out, key=lambda r: (_tape_h(r["doc_id"]), r["doc_id"])):
        assert r["n_tokens"] == (
            r["n_text_tokens"] + pipeline.MEDIA_TOKENS * r["n_media"]
        )
        assert r["tok_offset"] == run
        assert r["pack_id"] == r["tok_offset"] // pipeline.CTX_TOKENS
        assert r["pack_offset"] == r["tok_offset"] % pipeline.CTX_TOKENS
        run += r["n_tokens"]
    # independent cost derivation via the exploded extraction output
    ref = {
        r["doc_id"]: r
        for r in extraction.exploded_spans(spans_docs)
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("kind") == "media", F.lit(0)).otherwise(
                    F.size(dedup.tokens_col(F.col("text")))
                )
            ).alias("t"),
            F.sum((F.col("kind") == "media").cast("int")).alias("m"),
        )
        .collect()
    }
    for r in out:
        exp = ref.get(r["doc_id"])
        exp_t, exp_m = (exp["t"], exp["m"]) if exp else (0, 0)
        assert (r["n_text_tokens"], r["n_media"]) == (exp_t, exp_m)


def test_split_leakage_flags_cross_split_copy(spark):
    """A train doc sharing its full text with a test-split doc is
    flagged contaminated (max_overlap_frac 1.0); unique train docs get
    a clean verdict row; output spine = exactly the train split."""
    ids = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    assign = {r["doc_id"]: r["split"]
              for r in pipeline.data_split(ids, passthrough=()).collect()}
    train_ids = [i for i, s in assign.items() if s == "train"]
    test_id = next(i for i, s in assign.items() if s == "test")
    leaked, clean = train_ids[0], train_ids[1]
    shared = " ".join(f"tok{j}" for j in range(12))
    rows = [
        (leaked, f"prefix {shared} suffix"),
        (clean, "completely different words in this training document"),
        (test_id, shared),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pipeline.split_leakage(docs).collect()}
    assert set(out) == {leaked, clean}  # train docs only
    assert out[leaked]["contaminated"] is True
    assert out[leaked]["max_overlap_frac"] == 1.0
    assert out[leaked]["n_eval_docs_hit"] == 1
    assert out[clean]["contaminated"] is False
    assert out[clean]["n_eval_docs_hit"] == 0


def test_gram_novelty_semantics(spark):
    """novelty_frac: shared spans lower it symmetrically; fully unique
    docs read 1.0; sub-n-token docs keep a row with NULL fraction."""
    from pdf_ocr_comparison_tool_spark.operators import dedup

    shared = " ".join(f"s{j}" for j in range(dedup.DECON_NGRAM))
    rows = [
        (1, f"{shared} unique one tail words here to extend the doc a bit"),
        (2, f"{shared} other unique ending that differs from doc one fully"),
        (3, "entirely original text never repeated anywhere in the corpus"),
        (4, "too short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.gram_novelty(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    # docs 1 and 2 share exactly the one leading n-gram
    for i in (1, 2):
        assert out[i]["n_novel"] == out[i]["n_grams"] - 1
        assert 0 < out[i]["novelty_frac"] < 1.0
    assert out[3]["novelty_frac"] == 1.0
    assert out[4]["n_grams"] == 0 and out[4]["novelty_frac"] is None


def test_corpus_filter_decontaminate_flag(spark):
    """decontaminate opt-in: default verdict unchanged; with the flag,
    docs the eval-overlap scan flags gain the contaminated reason,
    ranked after model stages and before the repetition rules."""
    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators import dedup
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    base = {r["doc_id"]: r["drop_reason"]
            for r in pipeline.corpus_filter(docs).collect()}
    flagged = {r["doc_id"]: r["drop_reason"]
               for r in pipeline.corpus_filter(docs, decontaminate=True).collect()}
    hits = {r["doc_id"]: r["contaminated"]
            for r in dedup.decontaminate(docs).collect()}
    assert set(base) == set(flagged)
    pre_decon = {None, "repetitive_2gram", "repetitive_3gram"}
    for d, r in flagged.items():
        if r == "contaminated":
            assert base[d] in pre_decon
            assert hits[d]
        elif base[d] in pre_decon and hits[d]:
            assert r == "contaminated", (d, base[d], r)
        else:
            assert r == base[d]


def test_incremental_dedup_semantics(spark):
    """A verbatim copy of an old doc → exact_dup naming the old holder;
    a near-copy → near_dup; novel text → new. The old corpus never
    pairs against itself."""
    from pdf_ocr_comparison_tool_spark.operators import dedup

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm stone wall near the garden")
    old = spark.createDataFrame(
        [(1, base), (2, "completely different ancient text about rivers "
                        "and mountains flowing under the old bridge")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),                                   # exact copy
            (11, base.replace("lazy dog", "sleepy dog")), # near copy
            (12, "totally novel content nothing shares any shingle "
                 "with the existing corpus at all today"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.incremental_dedup(old, new).collect()}
    assert out[10]["status"] == "exact_dup" and out[10]["exact_dup_of"] == 1
    assert out[11]["status"] == "near_dup" and out[11]["near_dup_of"] == 1
    assert 0.5 <= out[11]["near_jaccard"] < 1.0
    assert out[12]["status"] == "new"
    assert out[12]["exact_dup_of"] is None and out[12]["near_dup_of"] is None


def test_readability_fixture(spark):
    """Hand-computed Flesch fixture + structural invariants: every word
    carries >= 1 syllable (vowel groups + zero-vowel floor), sentences
    floor at 1, band agrees with the score."""
    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        [(1, "the data table. big row!"), (2, "xy9 zz7"), (3, "a")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ts.readability(docs).collect()}
    r1 = out[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (5, 2, 7)
    exp = 206.835 - 1.015 * (5 / 2) - 84.6 * (7 / 5)
    assert r1.flesch == exp  # fixed-chain IEEE ops, bit-exact
    assert out[2].n_syllables == 2  # zero-vowel words floor at 1 each
    assert out[3].n_sentences == 1
    big = ts.readability(
        spark.createDataFrame([(9, "go. go. go. go. go. go?")],
                              "doc_id long, text string")
    ).collect()[0]
    assert big.band == "very_easy" and big.flesch >= 90.0


def test_corpus_upsert_semantics(spark):
    """MERGE resolution table: tombstones for removed ids, new hash
    wins for changed, ingest history preserved, last_changed_ver bumps
    only on real change."""
    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark.operators import pipeline as pl

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in pl.corpus_upsert(old, new).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].status == "unchanged" and out[1].last_changed_ver == 1
    assert out[2].status == "changed" and out[2].last_changed_ver == 2
    assert out[2].first_seen_ver == 1
    assert out[3].is_tombstone and out[3].text_hash is not None
    assert out[4].status == "added" and out[4].first_seen_ver == 2
    assert not out[1].is_tombstone and not out[4].is_tombstone


def test_url_canonical_idempotent(spark):
    """Canonicalization is a FIXPOINT: re-normalizing a canonical URL
    changes nothing (host already folded, mess already stripped), and
    every canonical URL is fragment-, utm-, amp- and trailing-slash-
    free."""
    from pyspark.sql import functions as F

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators import features as fe
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    c1 = fe.url_canonical(docs).select("doc_id", "canon_url")
    # feed the canonical form back through the same parse/normalize
    # projections by treating it as the raw url
    host = F.lower(F.regexp_extract("canon_url", r"^https://([^/?#]*)", 1))
    path0 = F.regexp_extract("canon_url", r"^https://[^/?#]*([^?#]*)", 1)
    path1 = F.regexp_replace(path0, r"/amp(/|$)", "$1")
    q0 = F.regexp_extract("canon_url", r"\?([^#]*)", 1)
    q2 = F.regexp_replace(F.regexp_replace(q0, r"utm_[^&]*", ""), r"^&+|&+$", "")
    path = F.when(
        (F.length(path1) > 1) & path1.endswith("/"),
        F.expr("substring(p1, 1, length(p1) - 1)"),
    ).otherwise(path1)
    again = c1.withColumn("p1", path1).select(
        "doc_id",
        "canon_url",
        F.concat(
            F.lit("https://"), host,
            F.when(
                (F.length("p1") > 1) & F.col("p1").endswith("/"),
                F.expr("substring(p1, 1, length(p1) - 1)"),
            ).otherwise(F.col("p1")),
            F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
        ).alias("canon2"),
    )
    assert again.filter(F.col("canon2") != F.col("canon_url")).count() == 0
    bad = c1.filter(
        F.col("canon_url").rlike(r"#|utm_|/amp(/|$)|/$|WWW")
    ).count()
    assert bad == 0


def test_filter_funnel_waterfall(spark):
    """The funnel is an exact decomposition of corpus_filter: stage
    rows in precedence order, survivors strictly reconcile with the
    verdict's keep count, and the waterfall never goes up."""
    from pdf_ocr_comparison_tool_spark import synth
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    funnel = pipeline.filter_funnel(docs).orderBy("stage_no").collect()
    assert [r.stage for r in funnel] == list(pipeline.FUNNEL_STAGES)
    verdict = pipeline.corpus_filter(docs)
    n_corpus = verdict.count()
    n_keep = verdict.filter("keep").count()
    assert all(r.n_corpus == n_corpus for r in funnel)
    # survivors monotone non-increasing, ending at the admitted count
    surv = [r.survivors for r in funnel]
    assert surv == sorted(surv, reverse=True)
    assert surv[-1] == n_keep
    assert sum(r.n_dropped for r in funnel) + n_keep == n_corpus


def test_epochs_per_source_budget_math(spark):
    """Planner invariants: shares form a distribution, epochs are the
    allocation over unique tokens, the cap flag matches EPOCH_CAP and
    the capped effective allocation never exceeds either bound."""
    import math

    from pdf_ocr_comparison_tool_spark import synth
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    rows = pipeline.epochs_per_source(docs).collect()
    assert rows, "at least one source"
    assert math.isclose(sum(r.share for r in rows), 1.0, rel_tol=1e-9)
    for r in rows:
        assert math.isclose(r.alloc_tokens, r.share * pipeline.TOKEN_BUDGET)
        assert math.isclose(r.epochs, r.alloc_tokens / r.src_tokens)
        assert r.over_cap == (r.epochs > pipeline.EPOCH_CAP)
        assert r.eff_tokens <= r.alloc_tokens + 1e-9
        assert r.eff_tokens <= pipeline.EPOCH_CAP * r.src_tokens + 1e-9
        if not r.over_cap:
            assert math.isclose(r.eff_tokens, r.alloc_tokens)
    # rare sources get up-weighted: smaller source => more epochs
    by_tok = sorted(rows, key=lambda r: r.src_tokens)
    ep = [r.epochs for r in by_tok]
    assert ep == sorted(ep, reverse=True)


def test_shard_assign_hrw_minimal_movement(spark):
    """HRW guarantees: moved docs land ONLY on the newly added shard,
    unmoved docs keep their shard exactly, movement is ~1/S', and the
    assignment is a pure function of doc_id (reorder-stable)."""
    import hashlib

    from pdf_ocr_comparison_tool_spark import synth
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    rows = pipeline.shard_assign(docs).collect()
    n = len(rows)
    moved = [r for r in rows if r.moved]
    for r in rows:
        assert 0 <= r.shard_before < pipeline.SHARDS_BEFORE
        assert 0 <= r.shard_after < pipeline.SHARDS_AFTER
        if r.moved:
            # only the new shard can steal a doc from the old fleet
            assert r.shard_after == pipeline.SHARDS_AFTER - 1
        else:
            assert r.shard_before == r.shard_after
    # expected movement 1/9 ~ 11%; generous band for n=500
    assert 0.02 < len(moved) / n < 0.25
    # python-reference HRW on a sample row
    r0 = rows[0]
    hs = [
        hashlib.md5(f"{r0.doc_id}:{s}".encode()).hexdigest()
        for s in range(pipeline.SHARDS_AFTER)
    ]
    assert r0.shard_before == max(range(pipeline.SHARDS_BEFORE), key=lambda s: hs[s])
    assert r0.shard_after == max(range(pipeline.SHARDS_AFTER), key=lambda s: hs[s])


def test_funnel_by_source_reconciles(spark):
    """Per-source attribution sums back to the corpus-level funnel:
    stage shares form a distribution per source, and the admitted
    counts match corpus_filter's keep verdicts."""
    import math

    from pdf_ocr_comparison_tool_spark import synth
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    rows = pipeline.funnel_by_source(docs).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert math.isclose(sum(r.stage_share for r in rs), 1.0, rel_tol=1e-9)
        assert all(r.src_total == sum(x.n_docs for x in rs) for r in rs)
    admitted = sum(r.n_docs for r in rows if r.stage == "admitted")
    assert admitted == pipeline.corpus_filter(docs).filter("keep").count()


def test_length_quantiles_match_python_reference(spark):
    """Histogram-route quantiles equal the direct python rule
    (smallest length with cum count >= ceil(p*n/100)) per source."""
    import math

    from pdf_ocr_comparison_tool_spark import synth
    from pdf_ocr_comparison_tool_spark.operators import textstats
    from tests.conftest import SF_DIR

    docs = synth.load_table(spark, SF_DIR, "documents")
    got = {
        (r.source, r.pct): (r.q_len, r.n_docs)
        for r in textstats.length_quantiles(docs).collect()
    }
    by_src: dict = {}
    for r in docs.select("source", "text").collect():
        by_src.setdefault(r.source, []).append(len(r.text))
    for src, lens in by_src.items():
        lens.sort()
        for p in textstats.QUANTILE_PCTS:
            rank = math.ceil(p * len(lens) / 100)
            assert got[(src, p)] == (lens[rank - 1], len(lens)), (src, p)
    assert len(got) == len(by_src) * len(textstats.QUANTILE_PCTS)

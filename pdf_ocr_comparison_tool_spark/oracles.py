"""Dialect-parametric SQL for the pages pipeline.

Each builder renders the SAME logical spec to Spark SQL or DuckDB SQL.
The DuckDB rendering is the driver's oracle; the Spark rendering is used
by tests to triangle-check the DataFrame-API operators against the SQL
spec inside Spark itself.
"""

from __future__ import annotations

from . import config as C
from . import pagesgen as P
from . import sqlgen as G
from .operators.matching import REF_PER_KEY_CAP
from .sqlgen import DUCK, SPARK


def explode(arr: str, alias: str, d: str) -> str:
    return (
        f"explode({arr}) AS {alias}" if d == SPARK else f"unnest({arr}) AS {alias}"
    )


def nullsafe_eq(a: str, b: str, d: str) -> str:
    return f"{a} <=> {b}" if d == SPARK else f"{a} IS NOT DISTINCT FROM {b}"


def _dates_arr(col: str, d: str) -> str:
    parts = [G.extract_all(col, p, d) for p in G.DATE_RES]
    return P._arr_sort(P._arr_distinct(P._arr_concat(parts, d), d), d)


def _amounts_norm_arr(col: str, d: str) -> str:
    parts = [G.extract_all(col, p, d) for p in G.AMOUNT_RES]
    arr = P._arr_concat(parts, d)
    pat = r"[,， \t\n\x0B\f\r]"  # T5: strip comma/fullwidth-comma/whitespace
    lam = f"x -> {G.replace_all('x', pat, '', d)}"
    return P._arr_sort(P._arr_distinct(G.ltransform(arr, lam, d), d), d)


def _numbers_arr(col: str, d: str) -> str:
    parts = [G.extract_all(col, p, d) for p in G.NUMBER_RES]
    return P._arr_sort(P._arr_distinct(P._arr_concat(parts, d), d), d)


def feat_cte(d: str, docs: str = "documents") -> str:
    ws = G.replace_all("text", r"[ \t\n\x0B\f\r]+", "", d)
    return f"""{P.pages_cte(d, docs)},
feat AS (
  SELECT doc_id, role, page_num, text,
         md5(lower({ws})) AS text_hash,
         {_dates_arr('text', d)} AS dates,
         {_amounts_norm_arr('text', d)} AS amounts_n,
         {_numbers_arr('text', d)} AS numbers
  FROM pages
)"""


def pages_sql(d: str, docs: str = "documents") -> str:
    return P.pages_sql(d, docs)


def page_features_sql(d: str, docs: str = "documents") -> str:
    j = lambda arr: G.array_join(arr, "'|'", d)  # noqa: E731
    return f"""WITH {feat_cte(d, docs)}
SELECT doc_id, role, page_num, text_hash,
       {j('dates')} AS dates_s,
       {j('amounts_n')} AS amounts_s,
       {j('numbers')} AS numbers_s
FROM feat"""


def classify_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.classify.classify_pages: per-type findall
    counts via sentinel-replace (leftmost-first alternation — identical
    semantics in Python re, Java regex and RE2)."""
    entries = []
    for t, p, pat in C.doc_type_patterns():
        # pre-strip literal chr(1) — mirror of classify.findall_count
        txt = "replace(p.text, chr(1), '')"
        if d == SPARK:
            r = f"regexp_replace({txt}, {G.rx(pat, d)}, chr(1))"
        else:
            r = f"regexp_replace({txt}, {G.rx(pat, d)}, chr(1), 'g')"
        m = f"CAST(length({r}) - length(replace({r}, chr(1), '')) AS BIGINT)"
        if d == SPARK:
            entries.append(
                f"named_struct('doc_type', '{t}', 'priority', {p}, 'matches', {m})"
            )
        else:
            entries.append(f"{{'doc_type': '{t}', 'priority': {p}, 'matches': {m}}}")
    if d == SPARK:
        unn = f"explode(array({', '.join(entries)})) AS h"
    else:
        unn = f"unnest([{', '.join(entries)}]) AS h"
    return f"""WITH {P.pages_cte(d, docs)},
clf_all AS (
  SELECT p.doc_id, p.role, p.page_num, {unn} FROM pages p
),
clf_sc AS (
  SELECT doc_id, role, page_num,
         h.doc_type AS doc_type, h.priority AS priority, h.matches AS matches,
         h.matches * (100 - h.priority) AS score
  FROM clf_all WHERE h.matches > 0
),
clf_ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY doc_id, role, page_num
                            ORDER BY score DESC, priority ASC, doc_type ASC) AS rn,
         sum(score) OVER (PARTITION BY doc_id, role, page_num) AS total_score
  FROM clf_sc
),
clf_best AS (SELECT * FROM clf_ranked WHERE rn = 1)
SELECT p.doc_id, p.role, p.page_num,
       coalesce(b.doc_type, '{C.DEFAULT_DOC_TYPE}') AS doc_type,
       CAST(coalesce(b.score, 0) AS BIGINT) AS score,
       coalesce(CAST(b.score AS DOUBLE) / b.total_score, {C.DEFAULT_CONFIDENCE}) AS confidence,
       CAST(coalesce(b.matches, 0) AS BIGINT) AS n_matched
FROM pages p LEFT JOIN clf_best b
  ON p.doc_id = b.doc_id AND p.role = b.role AND p.page_num = b.page_num"""


def majority_type_sql(d: str, docs: str = "documents") -> str:
    return f"""WITH clf AS ({classify_sql(d, docs)}),
mt_counts AS (
  SELECT doc_id, role, doc_type, count(*) AS n_pages
  FROM clf GROUP BY doc_id, role, doc_type
),
mt_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, role
                               ORDER BY n_pages DESC, doc_type ASC) AS rn
  FROM mt_counts
)
SELECT doc_id, role, doc_type, CAST(n_pages AS BIGINT) AS n_pages
FROM mt_ranked WHERE rn = 1"""


def _sim_sql(t1: str, t2: str, d: str = DUCK) -> str:
    n = C.LEVENSHTEIN_MAX_CHARS
    t1, t2 = G.fold_cjk(t1, d), G.fold_cjk(t2, d)
    a, b = f"substr({t1}, 1, {n})", f"substr({t2}, 1, {n})"
    return f"""CASE
  WHEN length({a}) = 0 AND length({b}) = 0 THEN CAST(1.0 AS DOUBLE)
  WHEN length({a}) = 0 OR length({b}) = 0 THEN CAST(0.0 AS DOUBLE)
  ELSE 1.0 - CAST(levenshtein({a}, {b}) AS DOUBLE)
             / CAST(greatest(length({a}), length({b})) AS DOUBLE)
END"""


def _jaccard_arrays_sql(a: str, b: str, d: str) -> str:
    """Jaccard over two pre-built DISTINCT token-array expressions —
    the single home of the empty-set conventions (both empty → 1.0,
    one empty → 0.0) and the intersect/union dialect scaffolding;
    parametrized so every jaccard oracle surface (match_best_jaccard's
    native tokenizer, similarity_dispatch's UDF tokenizer) shares it."""
    na, nb = _arr_size(a, d), _arr_size(b, d)
    if d == SPARK:
        inter = f"size(array_intersect({a}, {b}))"
        uni = f"size(array_union({a}, {b}))"
    else:
        inter = f"len(list_intersect({a}, {b}))"
        uni = f"len(list_distinct(list_concat({a}, {b})))"
    return f"""CASE
  WHEN {na} = 0 AND {nb} = 0 THEN CAST(1.0 AS DOUBLE)
  WHEN {na} = 0 OR {nb} = 0 THEN CAST(0.0 AS DOUBLE)
  ELSE CAST({inter} AS DOUBLE) / CAST({uni} AS DOUBLE)
END"""


def _jaccard_sim_sql(t1: str, t2: str, d: str) -> str:
    def toks(t):
        folded = f"lower({G.fold_cjk(t, d)})"
        arr = split_rx(folded, "[^a-z0-9@#$%&*]+", d)
        return P._arr_distinct(_lfilter(arr, "x -> x <> ''", d), d)

    return _jaccard_arrays_sql(toks(t1), toks(t2), d)


def _tf_toks(t: str, d: str) -> str:
    """Term-frequency token array (duplicates kept) of the CJK-folded
    lowercase text — the cosine tokenizer."""
    folded = f"lower({G.fold_cjk(t, d)})"
    return _lfilter(split_rx(folded, "[^a-z0-9@#$%&*]+", d), "x -> x <> ''", d)


def _cosine_sim_sql(a: str, b: str, d: str) -> str:
    """TF-cosine over pre-tokenized arrays *a*, *b* — mirror of
    operators.matching.cosine_sim_expr (integer dot/norms, one double
    division, zero-norm → 0.0)."""
    if d == SPARK:
        u = f"array_union({a}, {b})"
        cnt = lambda arr, w: f"CAST(size(filter({arr}, x -> x = {w})) AS BIGINT)"  # noqa: E731
        isum = lambda arr: f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"  # noqa: E731
    else:
        u = f"list_distinct(list_concat({a}, {b}))"
        cnt = lambda arr, w: f"CAST(len(list_filter({arr}, x -> x = {w})) AS BIGINT)"  # noqa: E731
        isum = lambda arr: f"coalesce(list_sum({arr}), 0)"  # noqa: E731
    dot = isum(G.ltransform(u, f"w -> {cnt(a, 'w')} * {cnt(b, 'w')}", d))
    n1 = isum(G.ltransform(u, f"w -> {cnt(a, 'w')} * {cnt(a, 'w')}", d))
    n2 = isum(G.ltransform(u, f"w -> {cnt(b, 'w')} * {cnt(b, 'w')}", d))
    return f"""CASE
  WHEN {n1} = 0 OR {n2} = 0 THEN CAST(0.0 AS DOUBLE)
  ELSE CAST({dot} AS DOUBLE)
       / (sqrt(CAST({n1} AS DOUBLE)) * sqrt(CAST({n2} AS DOUBLE)))
END"""


def ranked_matches_cte(
    d: str, docs: str = "documents", algorithm: str = "levenshtein",
    partial_threshold: float | None = None,
) -> str:
    """CTE chain ending in ranked(doc_id, page_num, t_doc, t_page, sim, rn)."""
    # cosine scores over pre-tokenized TF arrays (computed once per
    # page, not once per candidate pair — the build-once index shape)
    tf_cols = f", {_tf_toks('text', d)} AS tf" if algorithm == "cosine" else ""
    tf_ref = ", tf AS t_tf" if algorithm == "cosine" else ""
    if algorithm == "levenshtein":
        sim_expr = _sim_sql("t.text", "r2.t_text", d)
    elif algorithm == "jaccard":
        sim_expr = _jaccard_sim_sql("t.text", "r2.t_text", d)
    else:
        sim_expr = _cosine_sim_sql("t.tf", "r2.t_tf", d)
    return f"""{feat_cte(d, docs)},
mfeat AS (SELECT *{tf_cols} FROM feat),
mv AS (SELECT * FROM mfeat WHERE role = 'voucher'),
mr AS (SELECT doc_id AS t_doc, page_num AS t_page, text AS t_text,
              text_hash AS t_hash, dates AS t_dates, amounts_n AS t_amounts{tf_ref}
       FROM mfeat WHERE role = 'reference'),
m_exact AS (
  SELECT mv.doc_id, mv.page_num, mr.t_doc, mr.t_page, CAST(1.0 AS DOUBLE) AS sim
  FROM mv JOIN mr ON mv.text_hash = mr.t_hash
),
m_rest AS (
  SELECT * FROM mv t WHERE NOT EXISTS (
    SELECT 1 FROM m_exact e WHERE e.doc_id = t.doc_id AND e.page_num = t.page_num)
),
m_vk AS (
  SELECT doc_id, page_num, {explode('dates', 'bk', d)} FROM m_rest
  UNION ALL
  SELECT doc_id, page_num, {explode('amounts_n', 'bk', d)} FROM m_rest
),
m_rk_d AS (
  SELECT t_doc, t_page, bk FROM (
    SELECT t_doc, t_page, bk,
           row_number() OVER (PARTITION BY bk ORDER BY t_doc, t_page) AS krn
    FROM (SELECT t_doc, t_page, {explode('t_dates', 'bk', d)} FROM mr) rd
  ) rdc WHERE krn <= {REF_PER_KEY_CAP}
),
m_rk_a AS (
  SELECT t_doc, t_page, bk FROM (
    SELECT t_doc, t_page, bk,
           row_number() OVER (PARTITION BY bk ORDER BY t_doc, t_page) AS krn
    FROM (SELECT t_doc, t_page, {explode('t_amounts', 'bk', d)} FROM mr) ra
  ) rac WHERE krn <= {REF_PER_KEY_CAP}
),
m_rk AS (
  SELECT * FROM m_rk_d UNION ALL SELECT * FROM m_rk_a
),
m_cand AS (
  SELECT DISTINCT v.doc_id, v.page_num, rk.t_doc, rk.t_page
  FROM m_vk v JOIN m_rk rk ON v.bk = rk.bk
),
m_nocand AS (
  SELECT doc_id, page_num FROM m_rest t WHERE NOT EXISTS (
    SELECT 1 FROM m_cand c WHERE c.doc_id = t.doc_id AND c.page_num = t.page_num)
),
m_fb_refs AS (
  SELECT t_doc, t_page FROM mr ORDER BY t_doc, t_page LIMIT {C.FALLBACK_CAP}
),
m_pairs AS (
  SELECT doc_id, page_num, t_doc, t_page FROM m_cand
  UNION
  SELECT n.doc_id, n.page_num, f.t_doc, f.t_page FROM m_nocand n CROSS JOIN m_fb_refs f
),
m_scored AS (
  SELECT p.doc_id, p.page_num, p.t_doc, p.t_page,
         {sim_expr} AS sim
  FROM m_pairs p
  JOIN m_rest t ON p.doc_id = t.doc_id AND p.page_num = t.page_num
  JOIN mr r2 ON p.t_doc = r2.t_doc AND p.t_page = r2.t_page
),
m_kept AS (
  SELECT * FROM m_scored WHERE sim >= {partial_threshold if partial_threshold is not None else C.PARTIAL_THRESHOLD}
  UNION ALL
  SELECT * FROM m_exact
),
m_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, page_num
                               ORDER BY sim DESC, t_doc, t_page) AS rn
  FROM m_kept
)"""


def _page_kw_sql(t: str, d: str, top_n: int = 10) -> str:
    """Per-page top-N TF keywords — mirror of
    operators.features.page_keywords_expr (ocr_engine.py:392-412)."""
    filt = f"t -> length(t) >= 2 AND NOT ({G.rlike('t', '^[0-9]+$', d)})"
    toks = _lfilter(split_rx(f"lower({t})", "[^a-z0-9]+", d), filt, d)
    u = P._arr_distinct(toks, d)
    cntw = _arr_size(_lfilter(toks, "x -> x = w", d), d)
    enc = G.ltransform(
        u, f"w -> lpad({G.cast_str(f'10000000 - {cntw}', d)}, 8, '0') || w", d
    )
    return G.ltransform(
        _arr_slice(P._arr_sort(enc, d), 1, top_n, d), "s -> substr(s, 9)", d
    )


def _kw_intersect_sql(a: str, b: str, d: str) -> str:
    """Sorted '|'-joined intersection of two keyword arrays
    (content_matcher.py:353-356)."""
    inter = (
        f"array_intersect({a}, {b})" if d == SPARK else f"list_intersect({a}, {b})"
    )
    return G.array_join(P._arr_sort(inter, d), "'|'", d)


def match_best_sql(
    d: str, docs: str = "documents", algorithm: str = "levenshtein",
    partial_threshold: float | None = None,
) -> str:
    return f"""WITH {ranked_matches_cte(d, docs, algorithm, partial_threshold)},
m_best AS (SELECT * FROM m_ranked WHERE rn = 1),
m_kw AS (SELECT doc_id, role, page_num, {_page_kw_sql('text', d)} AS kw FROM pages)
SELECT v.doc_id, v.page_num, b.t_doc, b.t_page,
       coalesce(b.sim, 0.0) AS sim,
       CASE WHEN b.t_doc IS NULL THEN '{C.STATUS_NOT_FOUND}'
            WHEN b.sim >= {C.EXACT_THRESHOLD} THEN '{C.STATUS_EXACT}'
            WHEN b.sim >= {C.SIMILARITY_THRESHOLD} THEN '{C.STATUS_PARTIAL}'
            ELSE '{C.STATUS_LOW}' END AS status,
       CASE WHEN b.t_doc IS NULL THEN ''
            ELSE {_kw_intersect_sql('kv.kw', 'kr.kw', d)} END AS matched_kw
FROM mv v LEFT JOIN m_best b ON v.doc_id = b.doc_id AND v.page_num = b.page_num
LEFT JOIN m_kw kv ON kv.role = 'voucher'
  AND kv.doc_id = v.doc_id AND kv.page_num = v.page_num
LEFT JOIN m_kw kr ON kr.role = 'reference'
  AND kr.doc_id = b.t_doc AND kr.page_num = b.t_page"""


def match_topk_sql(d: str, docs: str = "documents") -> str:
    """J6 as a first-class output: the reference returns the top-5
    candidate list per probe (content_matcher.py:315-318), not only the
    best row."""
    return f"""WITH {ranked_matches_cte(d, docs)}
SELECT doc_id, page_num, CAST(rn AS BIGINT) AS rn, t_doc, t_page, sim
FROM m_ranked WHERE rn <= {C.TOP_K}"""


def _udf_toks(t: str, d: str) -> str:
    """Token array of the pandas-UDF tokenizer
    (functions/similarity.py tokenize_py, the SURVEY §7.1/M3 jieba
    stand-in): lowercase ASCII [a-z0-9]+ runs + CJK character bigrams
    (a length-1 CJK run yields the char itself). Term frequencies kept
    (duplicates NOT deduped)."""
    low = f"lower({t})"
    ascii_ = G.extract_all(low, "[a-z0-9]+", d)
    runs = G.extract_all(low, "[一-鿿]+", d)
    if d == G.SPARK:
        seq, arr1, concat = "sequence(1, length(r) - 1)", "array(r)", "concat"
    else:
        seq, arr1, concat = "range(1, length(r))", "[r]", "list_concat"
    inner = G.ltransform(seq, "i -> substr(r, CAST(i AS INT), 2)", d)
    big = G.ltransform(
        runs, f"r -> CASE WHEN length(r) = 1 THEN {arr1} ELSE {inner} END", d
    )
    return f"{concat}({ascii_}, flatten({big}))"


def match_cosine_pairs_sql(d: str, docs: str = "documents") -> str:
    """T9's pandas-UDF surface, oracled: the rn<=2 ranked candidate
    pairs scored with TF-cosine over the UDF's bigram tokenizer on the
    RAW (unfolded) page text. Bit-exact vs the UDF: dot/norms are
    integer sums; the only float ops are sqrt·sqrt then one division —
    the same operand order as cosine_py (content_matcher.py:54-93)."""
    return f"""WITH {ranked_matches_cte(d, docs)},
mcp_pairs AS (
  SELECT doc_id, page_num, t_doc, t_page FROM m_ranked WHERE rn <= 2
),
mcp_tok AS (
  SELECT doc_id, role, page_num, {_udf_toks('text', d)} AS utoks FROM pages
)
SELECT p.doc_id, p.page_num, p.t_doc, p.t_page,
       {_cosine_sim_sql('tv.utoks', 'tr.utoks', d)} AS cosine
FROM mcp_pairs p
JOIN mcp_tok tv ON tv.role = 'voucher'
  AND tv.doc_id = p.doc_id AND tv.page_num = p.page_num
JOIN mcp_tok tr ON tr.role = 'reference'
  AND tr.doc_id = p.t_doc AND tr.page_num = p.t_page"""


def match_merged_sql(d: str, docs: str = "documents") -> str:
    nse = nullsafe_eq
    w = "OVER (PARTITION BY doc_id ORDER BY page_num)"
    if d == SPARK:
        kw_arr = (
            "CASE WHEN matched_kw = '' THEN CAST(array() AS ARRAY<STRING>)"
            f" ELSE split(matched_kw, {G.rx(chr(92) + '|', d)}) END"
        )
        kw_union = "array_sort(array_distinct(flatten(collect_list(kw_arr))))"
    else:
        kw_arr = (
            "CASE WHEN matched_kw = '' THEN CAST([] AS VARCHAR[])"
            " ELSE string_split(matched_kw, '|') END"
        )
        kw_union = "list_sort(list_distinct(flatten(list(kw_arr))))"
    return f"""WITH mm_b0 AS ({match_best_sql(d, docs)}),
mm_best AS (SELECT *, {kw_arr} AS kw_arr FROM mm_b0),
mm_lag AS (
  SELECT *,
         lag(t_doc) {w} AS pv_doc,
         lag(t_page) {w} AS pv_page,
         lag(status) {w} AS pv_status,
         row_number() {w} AS seq
  FROM mm_best
),
mm_brk AS (
  SELECT *, CASE WHEN {nse('t_doc', 'pv_doc', d)}
                  AND {nse('status', 'pv_status', d)}
                  AND (t_page = pv_page + 1
                       OR (t_page IS NULL AND pv_page IS NULL AND seq > 1))
            THEN 0 ELSE 1 END AS brk
  FROM mm_lag
),
mm_isl AS (
  SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY page_num
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM mm_brk
)
SELECT doc_id, CAST(island AS BIGINT) AS island,
       CASE WHEN min(page_num) = max(page_num)
            THEN 'P' || {G.cast_str('min(page_num)', d)}
            ELSE 'P' || {G.cast_str('min(page_num)', d)} || '-P' || {G.cast_str('max(page_num)', d)} END AS page_range,
       min(t_doc) AS t_doc,
       CASE WHEN min(t_doc) IS NULL THEN {G.cast_str('NULL', d)}
            WHEN min(t_page) = max(t_page)
            THEN 'P' || {G.cast_str('min(t_page)', d)}
            ELSE 'P' || {G.cast_str('min(t_page)', d)} || '-P' || {G.cast_str('max(t_page)', d)} END AS t_range,
       min(status) AS status,
       CAST(sum(CAST(sim AS DECIMAL(28,12))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_sim,
       CAST(count(*) AS BIGINT) AS n_pages,
       {G.array_join(kw_union, "'|'", d)} AS matched_kw
FROM mm_isl
GROUP BY doc_id, island"""


def match_summary_sql(d: str, docs: str = "documents") -> str:
    return f"""WITH ms_best AS ({match_best_sql(d, docs)})
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM ms_best) AS frac
FROM ms_best GROUP BY status"""


def match_summary_wide_sql(d: str, docs: str = "documents") -> str:
    """The reference's generate_match_summary dict as ONE row
    (content_matcher.py:385-407): totals per status + match_rate =
    (exact+partial)/total."""
    return f"""WITH mw_best AS ({match_best_sql(d, docs)})
SELECT CAST(count(*) AS BIGINT) AS total_pages,
       CAST(count(*) FILTER (WHERE status = '{C.STATUS_EXACT}') AS BIGINT) AS exact_matches,
       CAST(count(*) FILTER (WHERE status = '{C.STATUS_PARTIAL}') AS BIGINT) AS partial_matches,
       CAST(count(*) FILTER (WHERE status = '{C.STATUS_NOT_FOUND}') AS BIGINT) AS not_found,
       CAST(count(*) FILTER (WHERE status = '{C.STATUS_EXACT}')
            + count(*) FILTER (WHERE status = '{C.STATUS_PARTIAL}') AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS match_rate
FROM mw_best"""


def page_keywords_sql(d: str, docs: str = "documents") -> str:
    """Direct oracle for the per-page top-10 TF keyword operator."""
    return f"""WITH {P.pages_cte(d, docs)}
SELECT doc_id, role, page_num,
       {G.array_join(_page_kw_sql('text', d), "'|'", d)} AS kw_s
FROM pages"""


# --------------------------------------------------------------- reports
def split_rx(expr: str, pat: str, d: str) -> str:
    if d == SPARK:
        return f"split({expr}, {G.rx(pat, d)})"
    return f"regexp_split_to_array({expr}, {G.rx(pat, d)})"


def page_quality_sql(d: str, docs: str = "documents") -> str:
    conf = "CAST((doc_id * 131 + page_num * 17 + 5) % 101 AS DOUBLE) / CAST(100.0 AS DOUBLE)"
    return f"""WITH {P.pages_cte(d, docs)}
SELECT doc_id, role, page_num,
       {conf} AS conf,
       CAST(length(text) AS BIGINT) AS text_len,
       CASE WHEN {conf} >= 0.9 THEN '优'
            WHEN {conf} >= 0.8 THEN '良'
            WHEN {conf} >= 0.6 THEN '中'
            ELSE '差' END AS quality
FROM pages"""


def keyword_top_sql(d: str, docs: str = "documents", n: int = 50) -> str:
    tok = split_rx("lower(text)", "[^a-z0-9]+", d)
    return f"""WITH kt_tok AS (
  SELECT doc_id, {explode(tok, 'token', d)} FROM {docs}
),
kt_f AS (
  SELECT * FROM kt_tok
  WHERE length(token) >= 2 AND NOT {G.rlike('token', '^[0-9]+$', d)}
),
kt_counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM kt_f GROUP BY token
),
kt_ranked AS (
  SELECT *, row_number() OVER (ORDER BY n DESC, token ASC) AS rank FROM kt_counts
)
SELECT CAST(rank AS BIGINT) AS rank, token, n, n_docs
FROM kt_ranked WHERE rank <= {n}"""


def timeline_sql(d: str, docs: str = "documents") -> str:
    if d == SPARK:
        samp_arr = "slice(array_sort(collect_set(doc_id)), 1, 3)"
    else:
        samp_arr = "list_slice(list_sort(list(DISTINCT doc_id)), 1, 3)"
    samp = G.array_join(
        G.ltransform(samp_arr, f"x -> {G.cast_str('x', d)}", d), "'|'", d
    )
    return f"""WITH {feat_cte(d, docs)},
tl AS (SELECT doc_id, role, {explode('dates', 'date_s', d)} FROM feat)
SELECT date_s,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE role = 'voucher') AS BIGINT) AS n_voucher,
       CAST(count(*) FILTER (WHERE role = 'reference') AS BIGINT) AS n_reference,
       {samp} AS sample_docs
FROM tl GROUP BY date_s"""


def lineitem_rollup_sql(d: str) -> str:
    return """SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


def media_manifest_sql(d: str, docs: str = "documents") -> str:
    """Multimodal fetch manifest: one row per media span with the
    deterministic storage metadata of operators.multimodal.media_manifest."""
    from .operators.multimodal import N_FETCH_BUCKETS

    href = G.hexint("media_ref", d)
    return f"""WITH ext AS ({G.extraction_sql(d, docs)})
SELECT {G.cast_str('doc_id', d)} AS doc_id, media_ref,
       CAST(ord AS BIGINT) AS ord,
       {href} % 100000 AS n_bytes_est,
       CAST({href} % {N_FETCH_BUCKETS} AS INT) AS fetch_bucket
FROM ext WHERE kind = 'media'"""


def media_decode_sql(d: str, docs: str = "documents") -> str:
    """Mirror of the multimodal decode stage's HEADER fields: the
    payloads are synthesized from md5(media_ref) (spec in
    operators/multimodal.py), so the decoded format/dimensions/sample
    counts are a pure function of the ref — the oracle states that
    function, and the Spark side genuinely goes bytes→struct-parse.
    The content features (mean_level) are pytest-verified only."""
    from .operators.multimodal import WAV_SR

    def mb(i: int) -> str:
        if d == SPARK:
            return f"CAST(conv(substr(md5(media_ref), {2 * i + 1}, 2), 16, 10) AS BIGINT)"
        return f"CAST('0x' || substr(md5(media_ref), {2 * i + 1}, 2) AS BIGINT)"

    h8 = G.hexint("media_ref", d)
    bmp = f"({h8}) % 2 = 0"
    w = f"4 * (1 + ({mb(0)}) % 8)"
    hh = f"1 + ({mb(1)}) % 8"
    ns = f"64 + 4 * ({mb(2)})"
    return f"""WITH ext AS ({G.extraction_sql(d, docs)})
SELECT {G.cast_str('doc_id', d)} AS doc_id, media_ref,
       CASE WHEN {bmp} THEN 'bmp' ELSE 'wav' END AS format,
       CAST(CASE WHEN {bmp} THEN {w} ELSE 0 END AS INT) AS width,
       CAST(CASE WHEN {bmp} THEN {hh} ELSE 0 END AS INT) AS height,
       CAST(CASE WHEN {bmp} THEN 3 ELSE 1 END AS INT) AS channels,
       CAST(CASE WHEN {bmp} THEN 0 ELSE {WAV_SR} END AS INT) AS sample_rate,
       CAST(CASE WHEN {bmp} THEN 0 ELSE {ns} END AS BIGINT) AS n_samples,
       CAST(CASE WHEN {bmp} THEN 54 + 3 * ({w}) * ({hh})
            ELSE 44 + 2 * ({ns}) END AS BIGINT) AS n_bytes
FROM ext WHERE kind = 'media'"""


def skew_report_sql(d: str, key: str = "user_id", src: str = "events") -> str:
    """Mirror of plans.skew.key_skew_report over events.user_id: top-N
    heaviest keys, share and times-over-mean."""
    from .plans.skew import SKEW_TOP

    return f"""WITH sk_p AS (
  SELECT CAST({key} AS VARCHAR) AS key_value, CAST(count(*) AS BIGINT) AS n
  FROM {src} GROUP BY {key}
),
sk_t AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM sk_p
),
sk_r AS (
  SELECT key_value, n,
         row_number() OVER (ORDER BY n DESC, key_value ASC) AS rank
  FROM sk_p
)
SELECT CAST(r.rank AS BIGINT) AS rank, r.key_value, r.n,
       t.n_total, t.n_keys,
       CAST(r.n AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
       CAST(r.n * t.n_keys AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS x_mean
FROM sk_r r CROSS JOIN sk_t t
WHERE r.rank <= {SKEW_TOP}"""


def zorder_keys_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.zorder_keys: unrolled Morton
    interleave of (source-hash, length-band), file bucket = z DIV
    (2^16 / files)."""
    from .operators.pipeline import (
        ZORDER_BITS,
        ZORDER_CHARS_PER_BAND,
        ZORDER_FILES,
    )

    dim = 1 << ZORDER_BITS
    x = f"({G.hexint(G.cast_str('source', d), d)}) % {dim}"
    y = f"least({P.idiv('n_chars', str(ZORDER_CHARS_PER_BAND), d)}, {dim - 1})"
    terms = " + ".join(
        f"({P.idiv('zx', str(1 << i), d)} % 2) * {1 << (2 * i)}"
        f" + ({P.idiv('zy', str(1 << i), d)} % 2) * {1 << (2 * i + 1)}"
        for i in range(ZORDER_BITS)
    )
    per_file = (dim * dim) // ZORDER_FILES
    return f"""WITH zo_b AS (
  SELECT doc_id, CAST({x} AS BIGINT) AS zx, CAST({y} AS BIGINT) AS zy
  FROM {docs}
),
zo_z AS (
  SELECT doc_id, zx, zy, CAST({terms} AS BIGINT) AS z FROM zo_b
)
SELECT doc_id, zx, zy, z,
       CAST({P.idiv('z', str(per_file), d)} AS BIGINT) AS file_bucket
FROM zo_z"""


def compaction_plan_sql(d: str, docs: str = "documents") -> str:
    """Mirror of sources.checkpoint.compaction_plan over the committed
    rows of the checkpoint fixture: exclusive prefix sum in part order
    DIV target → bin id, plus per-bin rollup joined back."""
    from .sources.checkpoint import COMPACT_TARGET_SPANS

    binid = P.idiv("cum", str(COMPACT_TARGET_SPANS), d)
    return f"""WITH cpp AS ({checkpoint_parts_sql(d, docs)}),
cmp_c AS (
  SELECT part, n_spans AS n FROM cpp WHERE committed
),
cmp_p AS (
  SELECT part, n,
         CAST(coalesce(sum(n) OVER (
           ORDER BY part ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum
  FROM cmp_c
),
cmp_b AS (
  SELECT part, n, CAST({binid} AS BIGINT) AS bin_id FROM cmp_p
),
cmp_s AS (
  SELECT bin_id, CAST(count(*) AS BIGINT) AS bin_parts,
         CAST(sum(n) AS BIGINT) AS bin_rows
  FROM cmp_b GROUP BY bin_id
)
SELECT b.part, b.n, b.bin_id, s.bin_parts, s.bin_rows
FROM cmp_b b JOIN cmp_s s ON b.bin_id = s.bin_id"""


def interleave_stats_sql(d: str, docs: str = "documents") -> str:
    """Mirror of extraction.interleave_stats: per-doc kind counts,
    media fraction, reading-order switch count (lag window), first/
    last kind via min_by/max_by on the unique ord."""
    return f"""WITH ext AS ({G.extraction_sql(d, docs)}),
il_l AS (
  SELECT doc_id, ord, kind,
         lag(kind) OVER (PARTITION BY doc_id ORDER BY ord) AS pk
  FROM ext
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) FILTER (WHERE kind = 'text') AS BIGINT) AS n_text,
       CAST(count(*) FILTER (WHERE kind = 'media') AS BIGINT) AS n_media,
       CAST(sum(CASE WHEN pk IS NOT NULL AND kind <> pk THEN 1 ELSE 0 END)
            AS BIGINT) AS n_switches,
       min_by(kind, ord) AS first_kind,
       max_by(kind, ord) AS last_kind,
       CAST(count(*) FILTER (WHERE kind = 'media') AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS media_frac
FROM il_l GROUP BY doc_id"""


def doc_outline_sql(d: str, docs: str = "documents") -> str:
    """Mirror of extraction.doc_outline: run-length layout signature
    per doc (gaps-and-islands on kind), grouped into template
    families. n_spans is constant within a signature by construction
    (the signature determines the run lengths)."""
    part = "concat(substr(kind, 1, 1), CAST(run_len AS VARCHAR))"
    if d == SPARK:
        part = "concat(substr(kind, 1, 1), CAST(run_len AS STRING))"
        sig = (
            f"array_join(transform(array_sort(collect_list("
            f"struct(ord0, {part} AS part))), s -> s.part), ',')"
        )
    else:
        sig = f"string_agg({part}, ',' ORDER BY ord0)"
    return f"""WITH ext AS ({G.extraction_sql(d, docs)}),
do_l AS (
  SELECT doc_id, ord, kind,
         lag(kind) OVER (PARTITION BY doc_id ORDER BY ord) AS pk
  FROM ext
),
do_b AS (
  SELECT *, CASE WHEN pk IS NULL OR kind <> pk THEN 1 ELSE 0 END AS brk
  FROM do_l
),
do_g AS (
  SELECT *, sum(brk) OVER (
    PARTITION BY doc_id ORDER BY ord
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS grp
  FROM do_b
),
do_r AS (
  SELECT doc_id, grp, min(kind) AS kind,
         CAST(count(*) AS BIGINT) AS run_len, min(ord) AS ord0
  FROM do_g GROUP BY doc_id, grp
),
do_s AS (
  SELECT doc_id, {sig} AS signature,
         CAST(sum(run_len) AS BIGINT) AS n_spans
  FROM do_r GROUP BY doc_id
)
SELECT signature, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_spans) AS BIGINT) AS n_spans,
       min(doc_id) AS example_doc
FROM do_s GROUP BY signature"""


def media_filter_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.multimodal.media_filter over the decode
    oracle: the same fixed-precedence integer policy CASE on top of
    media_decode_sql's header derivation."""
    from .operators.multimodal import (
        MEDIA_MAX_ASPECT,
        MEDIA_MIN_H,
        MEDIA_MIN_SAMPLES,
        MEDIA_MIN_W,
        WAV_SR,
    )

    img = "format = 'bmp'"
    reason = f"""CASE
    WHEN {img} AND width < {MEDIA_MIN_W} THEN 'too_narrow'
    WHEN {img} AND height < {MEDIA_MIN_H} THEN 'too_flat'
    WHEN {img} AND width > {MEDIA_MAX_ASPECT} * height THEN 'extreme_aspect'
    WHEN NOT ({img}) AND n_samples < {MEDIA_MIN_SAMPLES} THEN 'too_short_audio'
    WHEN NOT ({img}) AND sample_rate <> {WAV_SR} THEN 'bad_sample_rate'
  END"""
    return f"""WITH mf_d AS ({media_decode_sql(d, docs)}),
mf_r AS (
  SELECT doc_id, media_ref, format, {reason} AS drop_reason FROM mf_d
)
SELECT doc_id, media_ref, format,
       drop_reason IS NULL AS keep, drop_reason
FROM mf_r"""


def doc_processing_stats_sql(d: str, docs: str = "documents") -> str:
    """A6 per-file stats + 合计 rollup row over the extraction output."""
    ms = "CAST(coalesce(sum(length(text)), 0) AS BIGINT)"
    return f"""WITH ext AS ({G.extraction_sql(d, docs)})
SELECT CASE WHEN doc_id IS NULL THEN '合计' ELSE {G.cast_str('doc_id', d)} END AS doc,
       CAST(count(*) AS BIGINT) AS n_spans,
       {ms} AS ms,
       CASE WHEN {ms} > 0
            THEN CAST(count(*) AS DOUBLE) / (CAST({ms} AS DOUBLE) / 1000.0)
            ELSE CAST(0.0 AS DOUBLE) END AS spans_per_sec
FROM ext GROUP BY ROLLUP (doc_id)"""


def events_sessions_sql(d: str, gap_sec: int = 1800, src: str = "events") -> str:
    epoch = (
        "unix_timestamp(ts)" if d == SPARK else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    return f"""WITH es_e AS (
  SELECT user_id, event_id, {epoch} AS epoch,
         CAST(value AS DECIMAL(28,6)) AS value_dec
  FROM {src}
),
es_lag AS (
  SELECT *, lag(epoch) OVER (PARTITION BY user_id ORDER BY epoch, event_id) AS pv
  FROM es_e
),
es_brk AS (
  SELECT *, CASE WHEN epoch - pv <= {gap_sec} THEN 0 ELSE 1 END AS brk FROM es_lag
),
es_isl AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY epoch, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
  FROM es_brk
)
SELECT user_id, CAST(session AS BIGINT) AS session,
       CAST(count(*) AS BIGINT) AS n_events,
       min(epoch) AS t_start, max(epoch) AS t_end,
       CAST(sum(value_dec) AS DOUBLE) AS sum_value
FROM es_isl GROUP BY user_id, session"""


def events_funnel_sql(d: str) -> str:
    """Mirror of reports.events_funnel: strict-order per-user funnel —
    each stage's first completion strictly after the previous stage's
    first completion; NULL once a stage is missed."""
    from .operators.reports import FUNNEL_STAGES

    epoch = (
        "unix_timestamp(ts)" if d == SPARK else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    ctes = [
        "fu_u AS (SELECT DISTINCT user_id FROM events)",
        f"fu_e AS (SELECT user_id, event_type, {epoch} AS epoch FROM events)",
    ]
    prev = None
    for i, s in enumerate(FUNNEL_STAGES, start=1):
        if prev is None:
            body = (
                f"SELECT user_id, CAST(min(epoch) AS BIGINT) AS t_{s}\n"
                f"  FROM fu_e WHERE event_type = '{s}' GROUP BY user_id"
            )
        else:
            body = (
                f"SELECT e.user_id, CAST(min(e.epoch) AS BIGINT) AS t_{s}\n"
                f"  FROM fu_e e JOIN fu_{i - 1} p ON e.user_id = p.user_id\n"
                f"  WHERE e.event_type = '{s}' AND e.epoch > p.t_{prev}\n"
                f"  GROUP BY e.user_id"
            )
        ctes.append(f"fu_{i} AS (\n  {body}\n)")
        prev = s
    tsel = ",\n       ".join(
        f"fu_{i}.t_{s}" for i, s in enumerate(FUNNEL_STAGES, start=1)
    )
    reached = " + ".join(
        f"CASE WHEN fu_{i}.t_{s} IS NOT NULL THEN 1 ELSE 0 END"
        for i, s in enumerate(FUNNEL_STAGES, start=1)
    )
    joins = "\n".join(
        f"LEFT JOIN fu_{i} ON fu_{i}.user_id = u.user_id"
        for i in range(1, len(FUNNEL_STAGES) + 1)
    )
    last = len(FUNNEL_STAGES)
    cte_block = ",\n".join(ctes)
    return f"""WITH {cte_block}
SELECT u.user_id,
       {tsel},
       CAST({reached} AS BIGINT) AS stages_reached,
       fu_{last}.t_{FUNNEL_STAGES[-1]} IS NOT NULL AS converted
FROM fu_u u
{joins}"""


def events_retention_sql(d: str) -> str:
    """Mirror of reports.events_retention: weekly cohort retention with
    integer week indexing and one int/int division."""
    from .operators.reports import RETENTION_WEEK_SEC

    epoch = (
        "unix_timestamp(ts)" if d == SPARK else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    week = P.idiv("epoch", str(RETENTION_WEEK_SEC), d)
    return f"""WITH rt_e AS (
  SELECT user_id, {epoch} AS epoch FROM events
),
rt_w AS (
  SELECT DISTINCT user_id, CAST({week} AS BIGINT) AS week FROM rt_e
),
rt_0 AS (
  SELECT user_id, min(week) AS cohort_week FROM rt_w GROUP BY user_id
),
rt_a AS (
  SELECT z.cohort_week, CAST(w.week - z.cohort_week AS BIGINT) AS week_offset,
         w.user_id
  FROM rt_w w JOIN rt_0 z ON w.user_id = z.user_id
),
rt_s AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
  FROM rt_0 GROUP BY cohort_week
),
rt_r AS (
  SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_active
  FROM rt_a GROUP BY cohort_week, week_offset
)
SELECT r.cohort_week, r.week_offset, r.n_active, s.n_cohort,
       CAST(r.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE)
         AS retention_frac
FROM rt_r r JOIN rt_s s ON r.cohort_week = s.cohort_week"""


def events_session_window_sql(d: str, gap_sec: int = 1800) -> str:
    """Oracle for Spark's native session_window: sessions merge while
    the NEXT event starts strictly before prev_ts + gap (note: STRICT
    <, unlike events_sessions' manual islands which use <=);
    window.end = last event + gap."""
    epoch = (
        "unix_timestamp(ts)" if d == SPARK else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    return f"""WITH sw_e AS (
  SELECT user_id, event_id, {epoch} AS epoch,
         CAST(value AS DECIMAL(28,6)) AS value_dec
  FROM events
),
sw_lag AS (
  SELECT *, lag(epoch) OVER (PARTITION BY user_id ORDER BY epoch, event_id) AS pv
  FROM sw_e
),
sw_brk AS (
  SELECT *, CASE WHEN epoch - pv < {gap_sec} THEN 0 ELSE 1 END AS brk FROM sw_lag
),
sw_isl AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY epoch, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM sw_brk
)
SELECT user_id,
       min(epoch) AS w_start,
       max(epoch) + {gap_sec} AS w_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(value_dec) AS DOUBLE) AS sum_value
FROM sw_isl GROUP BY user_id, sess"""


def events_asof_sql(d: str) -> str:
    """Mirror of temporal.last_touch_attribution via DuckDB's NATIVE
    ASOF JOIN (greatest touch epoch <= probe epoch per user) — the one
    oracle where DuckDB has the operator built in and Spark composes it
    (union-merge window). DUCK-only: Spark SQL has no ASOF JOIN, which
    is the point of the operator.

    Touches pre-reduce to one row per (user, second) keeping max
    event_id (arg_max is deterministic: event_id is unique), so the
    as-of match is unambiguous under second-granular epochs."""
    if d == SPARK:
        raise ValueError("ASOF JOIN is DuckDB-only; Spark side is the operator")
    from .operators.temporal import ASOF_PROBE_TYPE, ASOF_TOUCH_TYPE

    return f"""WITH ao_e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch, value
  FROM events
),
ao_t AS (
  SELECT user_id, epoch,
         CAST(max(event_id) AS BIGINT) AS click_id,
         arg_max(value, event_id) AS click_value
  FROM ao_e WHERE event_type = '{ASOF_TOUCH_TYPE}'
  GROUP BY user_id, epoch
),
ao_p AS (
  SELECT user_id, event_id, epoch FROM ao_e
  WHERE event_type = '{ASOF_PROBE_TYPE}'
)
SELECT p.user_id, CAST(p.event_id AS BIGINT) AS event_id,
       p.epoch AS p_epoch, t.click_id,
       t.epoch AS click_epoch,
       CAST(p.epoch - t.epoch AS BIGINT) AS lag_sec,
       t.click_value
FROM ao_p p ASOF LEFT JOIN ao_t t
  ON p.user_id = t.user_id AND p.epoch >= t.epoch"""


def session_errors_sql(d: str) -> str:
    """Mirror of temporal.session_error_attribution: sessions over the
    non-error activity (nested events_sessions_sql CTE), then a closed
    point-in-interval containment join of the error events — stated
    here as the plain inequality join the bucketed Spark plan
    equi-izes."""
    ses = events_sessions_sql(
        d, src="(SELECT * FROM events WHERE event_type <> 'error')"
    )
    epoch = (
        "unix_timestamp(ts)" if d == SPARK else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    return f"""WITH se_s AS (
{ses}
),
se_err AS (
  SELECT user_id, {epoch} AS err_epoch FROM events
  WHERE event_type = 'error'
),
se_cnt AS (
  SELECT s.user_id, s.session, CAST(count(e.err_epoch) AS BIGINT) AS n_errors
  FROM se_s s LEFT JOIN se_err e
    ON e.user_id = s.user_id
   AND e.err_epoch >= s.t_start AND e.err_epoch <= s.t_end
  GROUP BY s.user_id, s.session
)
SELECT s.user_id, s.session, s.n_events, s.t_start, s.t_end, c.n_errors
FROM se_s s JOIN se_cnt c
  ON s.user_id = c.user_id AND s.session = c.session"""


def pages_exact_dups_sql(d: str, docs: str = "documents") -> str:
    """Exact dedup over the pages IR (which, unlike the driver's
    documents table, contains real duplicate content — the voucher /
    reference hash matches the J1 stage short-circuits on)."""
    ws = G.replace_all("text", r"[ \t\n\x0B\f\r]+", "", d)
    return f"""WITH {P.pages_cte(d, docs)},
pe AS (
  SELECT doc_id, role, page_num, md5(lower({ws})) AS text_hash FROM pages
)
SELECT text_hash, CAST(count(*) AS BIGINT) AS n_pages,
       min(doc_id) AS keep_doc
FROM pe GROUP BY text_hash HAVING count(*) > 1"""


def events_topk_sql(d: str, k: int = 3) -> str:
    return f"""WITH et_r AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
  FROM events
)
SELECT user_id, CAST(rn AS BIGINT) AS rn, event_id, value
FROM et_r WHERE rn <= {k}"""


# ----------------------------------------------------------------- dedup
def _lfilter(arr: str, lam: str, d: str) -> str:
    return f"filter({arr}, {lam})" if d == SPARK else f"list_filter({arr}, {lam})"


def _arr_min(e: str, d: str) -> str:
    return f"array_min({e})" if d == SPARK else f"list_min({e})"


def _arr_slice(arr: str, start1: int, length: int, d: str) -> str:
    if d == SPARK:
        return f"slice({arr}, {start1}, {length})"
    return f"list_slice({arr}, {start1}, {start1 + length - 1})"


def _seq_range(n: int, d: str) -> str:
    """Array [0, n)."""
    return f"sequence(0, {n - 1})" if d == SPARK else f"range({n})"


def _elem(arr: str, idx0: str, d: str) -> str:
    """0-based element access."""
    if d == SPARK:
        return f"element_at({arr}, ({idx0}) + 1)"
    return f"{arr}[({idx0}) + 1]"


def _arr_size(e: str, d: str) -> str:
    return f"size({e})" if d == SPARK else f"len({e})"




def _tok_cte(d: str, docs: str = "documents") -> str:
    toks = _lfilter(split_rx("lower(text)", "[^a-z0-9]+", d), "t -> length(t) >= 2", d)
    return f"""dd_tok AS (
  SELECT doc_id, {toks} AS toks FROM {docs}
)"""


def _shingles_expr(d: str) -> str:
    n = _arr_size("toks", d)
    rng = f"sequence(0, {n} - 3)" if d == SPARK else f"range(({n}) - 2)"
    e0, e1, e2 = (
        _elem("toks", "i", d),
        _elem("toks", "i + 1", d),
        _elem("toks", "i + 2", d),
    )
    tri = G.ltransform(rng, f"i -> {e0} || ' ' || {e1} || ' ' || {e2}", d)
    joined = G.array_join("toks", "' '", d)
    short = f"array({joined})" if d == SPARK else f"[{joined}]"
    return P._arr_distinct(f"CASE WHEN {n} < 3 THEN {short} ELSE {tri} END", d)


def _minhash_expr(sh: str, d: str, num: int = 16) -> str:
    from .operators.dedup import MH_A_ADD, MH_A_MULT, MH_B_ADD, MH_B_MULT, MH_P

    xs = G.ltransform(sh, f"s -> {G.hexint('s', d)}", d)
    h = (
        f"(((i * {MH_A_MULT} + {MH_A_ADD}) % {MH_P}) * x"
        f" + (i * {MH_B_MULT} + {MH_B_ADD})) % {MH_P}"
    )
    inner = G.ltransform(xs, f"x -> {h}", d)
    return G.ltransform(_seq_range(num, d), f"i -> {_arr_min(inner, d)}", d)


def dedup_cte(d: str, docs: str = "documents") -> str:
    return f"""{_tok_cte(d, docs)},
dd_sh AS (
  SELECT doc_id, {_shingles_expr(d)} AS sh FROM dd_tok
),
dd_sig AS (
  SELECT doc_id, sh, {_minhash_expr('sh', d)} AS sig FROM dd_sh
)"""


def exact_dups_sql(d: str, docs: str = "documents") -> str:
    ws = G.replace_all("text", r"[ \t\n\x0B\f\r]+", "", d)
    return f"""WITH h AS (
  SELECT doc_id, md5(lower({ws})) AS text_hash FROM {docs}
)
SELECT text_hash, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_doc
FROM h GROUP BY text_hash HAVING count(*) > 1"""


def _bands_select(d: str) -> str:
    """One (doc_id, band, bucket) row per signature band FROM dd_sig —
    the banding spec's SINGLE SQL home (mirror of dedup._band_rows),
    shared by the self-join pair chain and the incremental cross-corpus
    path."""
    from .operators.dedup import BAND_SIZE, NUM_HASHES

    n_bands = NUM_HASHES // BAND_SIZE
    cast_slice = lambda b: G.ltransform(  # noqa: E731
        _arr_slice("sig", b * BAND_SIZE + 1, BAND_SIZE, d),
        f"x -> {G.cast_str('x', d)}",
        d,
    )
    return "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band,"
        f" md5({G.array_join(cast_slice(b), chr(39) + '|' + chr(39), d)}) AS bucket"
        f" FROM dd_sig"
        for b in range(n_bands)
    )


def _lsh_pairs_cte(d: str, prefix: str = "dd") -> str:
    """The banded-LSH candidate-pair CTE chain (band buckets → cap-64
    hot-bucket guard → distinct a<b pairs) — the SINGLE home of the
    banding spec, parametrized by CTE prefix so every consumer
    (near-dup jaccard verify, containment scoring) shares it. Band
    count and cap come from the operators module constants (change
    both sides never one)."""
    from .operators.dedup import MAX_BUCKET

    return f"""{prefix}_bands AS (
{_bands_select(d)}
),
{prefix}_small AS (
  SELECT band, bucket FROM {prefix}_bands
  GROUP BY band, bucket HAVING count(*) <= {MAX_BUCKET}
),
{prefix}_bands_s AS (
  SELECT b.* FROM {prefix}_bands b JOIN {prefix}_small s
    ON b.band = s.band AND b.bucket = s.bucket
),
{prefix}_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM {prefix}_bands_s x JOIN {prefix}_bands_s y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)"""


def near_dup_pairs_sql(d: str, docs: str = "documents", threshold: float = 0.5) -> str:
    inter = (
        "size(array_intersect(sa.sh, sb.sh))"
        if d == SPARK
        else "len(list_intersect(sa.sh, sb.sh))"
    )
    uni = (
        "size(array_union(sa.sh, sb.sh))"
        if d == SPARK
        else "len(list_distinct(list_concat(sa.sh, sb.sh)))"
    )
    return f"""WITH {dedup_cte(d, docs)},
{_lsh_pairs_cte(d, "dd")}
SELECT p.a, p.b,
       CAST({inter} AS DOUBLE) / CAST({uni} AS DOUBLE) AS jaccard
FROM dd_pairs p
JOIN dd_sh sa ON sa.doc_id = p.a
JOIN dd_sh sb ON sb.doc_id = p.b
WHERE CAST({inter} AS DOUBLE) / CAST({uni} AS DOUBLE) >= {threshold}"""


def _cc_closure_sql(pairs_sql: str, id_alias: str = "doc_id") -> str:
    """Connected components over a (a, b) pair query: the recursive
    reachability closure's min-reachable id per node is the cluster id
    — the same fixpoint operators.dedup.connected_components iterates
    distributively. DuckDB's recursive UNION dedups rows, so the
    closure terminates on cyclic components."""
    return f"""WITH RECURSIVE np AS (
{pairs_sql}
),
cc_edges AS (
  SELECT a AS src, b AS dst FROM np
  UNION
  SELECT b AS src, a AS dst FROM np
),
cc_reach(node, lbl) AS (
  SELECT src, src FROM cc_edges
  UNION
  SELECT r.node, e.dst FROM cc_reach r JOIN cc_edges e ON e.src = r.lbl
)
SELECT node AS {id_alias}, min(lbl) AS cluster_id,
       (node = min(lbl)) AS keep
FROM cc_reach GROUP BY node"""


def dedup_clusters_sql(d: str, docs: str = "documents", threshold: float = 0.5) -> str:
    """Cluster formation over the verified MinHash-LSH near-dup pairs."""
    return _cc_closure_sql(near_dup_pairs_sql(d, docs, threshold))


def incremental_dedup_sql(
    d: str, docs: str = "documents", threshold: float = 0.5,
    old_max_bucket: int = 7,
) -> str:
    """Mirror of the incremental_dedup query: old corpus = md5-buckets
    0..6, new crawl = buckets 7..9; per new doc the exact-hash verdict
    (min old holder) → verified best near-dup ≥ threshold → 'new'.
    (h, shingles, sig) are computed ONCE over all docs and split by the
    bucket predicate, exactly like the operator's two with_minhash
    branches over disjoint row subsets."""
    from .operators.dedup import MAX_BUCKET

    b = f"({G.hexint(G.cast_str('doc_id', d), d)}) % 10"
    ws = G.replace_all("text", r"[ \t\n\x0B\f\r]+", "", d)
    h = f"md5(lower({ws}))"
    if d == SPARK:
        inter = "size(array_intersect(sn.sh, so.sh))"
        uni = "size(array_union(sn.sh, so.sh))"
    else:
        inter = "len(list_intersect(sn.sh, so.sh))"
        uni = "len(list_distinct(list_concat(sn.sh, so.sh)))"
    j = f"CAST({inter} AS DOUBLE) / CAST({uni} AS DOUBLE)"
    return f"""WITH {dedup_cte(d, docs)},
ii_b AS (SELECT doc_id, {b} AS b FROM {docs}),
ii_h AS (SELECT doc_id, {h} AS h FROM {docs}),
ii_oe AS (
  SELECT hh.h, min(hh.doc_id) AS exact_dup_of
  FROM ii_h hh JOIN ii_b bb ON hh.doc_id = bb.doc_id
  WHERE bb.b < {old_max_bucket} GROUP BY hh.h
),
ii_nh AS (
  SELECT hh.doc_id, hh.h
  FROM ii_h hh JOIN ii_b bb ON hh.doc_id = bb.doc_id
  WHERE bb.b >= {old_max_bucket}
),
ii_x AS (
  SELECT n.doc_id, e.exact_dup_of
  FROM ii_nh n LEFT JOIN ii_oe e ON n.h = e.h
),
ii_bands AS (
{_bands_select(d)}
),
ii_ob AS (
  SELECT x.doc_id AS o_id, x.band, x.bucket
  FROM ii_bands x JOIN ii_b bb ON x.doc_id = bb.doc_id
  WHERE bb.b < {old_max_bucket}
),
ii_nb AS (
  SELECT x.doc_id AS n_id, x.band, x.bucket
  FROM ii_bands x JOIN ii_b bb ON x.doc_id = bb.doc_id
  WHERE bb.b >= {old_max_bucket}
),
ii_small AS (
  SELECT band, bucket FROM ii_ob
  GROUP BY band, bucket HAVING count(*) <= {MAX_BUCKET}
),
ii_obs AS (
  SELECT o.* FROM ii_ob o JOIN ii_small s
    ON o.band = s.band AND o.bucket = s.bucket
),
ii_c AS (
  SELECT DISTINCT n.n_id, o.o_id
  FROM ii_nb n JOIN ii_obs o ON n.band = o.band AND n.bucket = o.bucket
),
ii_v AS (
  SELECT c.n_id, c.o_id, {j} AS jacc
  FROM ii_c c
  JOIN dd_sh sn ON sn.doc_id = c.n_id
  JOIN dd_sh so ON so.doc_id = c.o_id
  WHERE {j} >= {threshold}
),
ii_bj AS (SELECT n_id, max(jacc) AS near_jaccard FROM ii_v GROUP BY n_id),
ii_best AS (
  SELECT v.n_id AS doc_id, bj.near_jaccard, min(v.o_id) AS near_dup_of
  FROM ii_v v JOIN ii_bj bj
    ON v.n_id = bj.n_id AND v.jacc = bj.near_jaccard
  GROUP BY v.n_id, bj.near_jaccard
)
SELECT x.doc_id, x.exact_dup_of, nb.near_dup_of, nb.near_jaccard,
       CASE WHEN x.exact_dup_of IS NOT NULL THEN 'exact_dup'
            WHEN nb.near_dup_of IS NOT NULL THEN 'near_dup'
            ELSE 'new' END AS status
FROM ii_x x LEFT JOIN ii_best nb ON x.doc_id = nb.doc_id"""


def minhash_calibration_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.minhash_calibration: per LSH candidate
    pair, the signature-agreement Jaccard estimate vs the exact shingle
    Jaccard and the absolute error."""
    from .operators.dedup import NUM_HASHES

    if d == SPARK:
        agree = "size(filter(zip_with(sa.sig, sb.sig, (x, y) -> x = y), v -> v))"
        inter = "size(array_intersect(sa.sh, sb.sh))"
        uni = "size(array_union(sa.sh, sb.sh))"
    else:
        agree = "len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))"
        inter = "len(list_intersect(sa.sh, sb.sh))"
        uni = "len(list_distinct(list_concat(sa.sh, sb.sh)))"
    est = f"CAST({agree} AS DOUBLE) / CAST({NUM_HASHES} AS DOUBLE)"
    j = f"CAST({inter} AS DOUBLE) / CAST({uni} AS DOUBLE)"
    return f"""WITH {dedup_cte(d, docs)},
{_lsh_pairs_cte(d, "dd")}
SELECT p.a, p.b,
       CAST({agree} AS BIGINT) AS n_agree,
       {est} AS est_jaccard,
       {j} AS jaccard,
       abs({est} - {j}) AS abs_err
FROM dd_pairs p
JOIN dd_sig sa ON sa.doc_id = p.a
JOIN dd_sig sb ON sb.doc_id = p.b"""


def dup_cluster_stats_sql(d: str, docs: str = "documents", threshold: float = 0.5) -> str:
    """Mirror of operators.dedup.cluster_size_stats over the verified
    MinHash-LSH clusters: cluster-size distribution."""
    return f"""WITH cs_cl AS (
{_cc_closure_sql(near_dup_pairs_sql(d, docs, threshold))}
),
cs_s AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM cs_cl GROUP BY cluster_id
),
cs_c AS (
  SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
  FROM cs_s GROUP BY cluster_size
)
SELECT cluster_size, n_clusters,
       CAST(cluster_size * n_clusters AS BIGINT) AS n_docs
FROM cs_c"""


def dedup_keep_best_sql(d: str, docs: str = "documents", threshold: float = 0.5) -> str:
    """Mirror of operators.dedup.keep_best_in_cluster over the verified
    MinHash-LSH clusters + the linear quality scorer: per cluster keep
    the highest-avg_score_milli member, ties broken by smallest doc_id.
    Both component statements nest as CTE bodies (DuckDB supports WITH
    / WITH RECURSIVE inside a CTE)."""
    return f"""WITH kb_cl AS (
{_cc_closure_sql(near_dup_pairs_sql(d, docs, threshold))}
),
kb_qs AS (
{quality_score_sql(d, docs)}
),
kb_s AS (
  SELECT c.doc_id, c.cluster_id, q.avg_score_milli
  FROM kb_cl c JOIN kb_qs q ON c.doc_id = q.doc_id
),
kb_b AS (
  SELECT cluster_id, max(avg_score_milli) AS best
  FROM kb_s GROUP BY cluster_id
),
kb_k AS (
  SELECT s.cluster_id, min(s.doc_id) AS keeper
  FROM kb_s s JOIN kb_b b
    ON s.cluster_id = b.cluster_id AND s.avg_score_milli = b.best
  GROUP BY s.cluster_id
)
SELECT s.doc_id, s.cluster_id, s.avg_score_milli,
       s.doc_id = k.keeper AS keep_best
FROM kb_s s JOIN kb_k k ON s.cluster_id = k.cluster_id"""


def emb_dup_clusters_sql(d: str, threshold: float = 0.35) -> str:
    """Cluster formation over the LSH-bucketed embedding near-dup
    pairs — the same keep-policy stage on the embedding modality."""
    return _cc_closure_sql(lsh_near_dups_sql(d, threshold), id_alias="vec_id")


def semdedup_sql(
    d: str,
    threshold: float | None = None,
    n_centroids: int | None = None,
    max_cell: int | None = None,
) -> str:
    """Mirror of operators.similarity_search.semdedup: k-means-cell
    bucketed cosine pairs → CC clusters → keep the member farthest
    from its centroid (tie → min vec_id)."""
    from .operators.similarity_search import (
        IVF_N_CENTROIDS,
        SEMDEDUP_MAX_CELL,
        SEMDEDUP_THRESHOLD,
    )

    threshold = SEMDEDUP_THRESHOLD if threshold is None else threshold
    n_centroids = IVF_N_CENTROIDS if n_centroids is None else n_centroids
    max_cell = SEMDEDUP_MAX_CELL if max_cell is None else max_cell
    sim = (
        f"CAST({_dot_sql('x.av', 'y.bv', d)} AS DOUBLE)"
        f" / (sqrt(CAST(x.a_nsq AS DOUBLE)) * sqrt(CAST(y.b_nsq AS DOUBLE)))"
    )
    pairs = f"""WITH sd_a AS ({ivf_assign_sql(d, n_centroids)}),
sd_ok AS (
  SELECT centroid_id FROM sd_a GROUP BY centroid_id
  HAVING count(*) <= {max_cell}
),
sd_g AS (
  SELECT a.vec_id, a.centroid_id
  FROM sd_a a JOIN sd_ok o ON a.centroid_id = o.centroid_id
),
sd_n AS (
  SELECT vec_id, embedding, {_dot_sql('embedding', 'embedding', d)} AS nsq
  FROM embeddings
),
sd_x AS (
  SELECT g.vec_id AS a, g.centroid_id, n.embedding AS av, n.nsq AS a_nsq
  FROM sd_g g JOIN sd_n n ON g.vec_id = n.vec_id
),
sd_y AS (
  SELECT g.vec_id AS b, g.centroid_id, n.embedding AS bv, n.nsq AS b_nsq
  FROM sd_g g JOIN sd_n n ON g.vec_id = n.vec_id
),
sd_s AS (
  SELECT x.a, y.b, {sim} AS sim
  FROM sd_x x JOIN sd_y y ON x.centroid_id = y.centroid_id AND x.a < y.b
)
SELECT a, b FROM sd_s WHERE sim >= {threshold}"""
    cc = _cc_closure_sql(pairs, id_alias="vec_id")
    return f"""WITH sd_cc AS ({cc}),
sd_asg AS ({ivf_assign_sql(d, n_centroids)}),
sd_m AS (
  SELECT c.vec_id, a.centroid_id, c.cluster_id, a.dist
  FROM sd_cc c JOIN sd_asg a ON c.vec_id = a.vec_id
),
sd_mx AS (SELECT cluster_id, max(dist) AS mx FROM sd_m GROUP BY cluster_id),
sd_k AS (
  SELECT m.cluster_id, min(m.vec_id) AS keep_id
  FROM sd_m m JOIN sd_mx xx ON m.cluster_id = xx.cluster_id AND m.dist = xx.mx
  GROUP BY m.cluster_id
)
SELECT m.vec_id, m.centroid_id, m.cluster_id, m.dist,
       (m.vec_id = k.keep_id) AS keep
FROM sd_m m JOIN sd_k k ON m.cluster_id = k.cluster_id"""


def winnow_sql(d: str, docs: str = "documents", w: int = 4) -> str:
    """Mirror of operators.dedup.winnow_fingerprints (MOSS winnowing:
    positional 3-gram hashes → min per sliding window of w → dedupe)."""
    if d == SPARK:
        sh = lambda arr, by: f"slice({arr}, {by + 1}, greatest(size({arr}) - {by}, 0))"  # noqa: E731
        g2 = f"zip_with(toks, {sh('toks', 1)}, (a, b) -> CASE WHEN b IS NOT NULL THEN a || ' ' || b END)"
        g3 = (
            f"filter(zip_with({g2}, {sh('toks', 2)},"
            f" (ab, c) -> CASE WHEN ab IS NOT NULL AND c IS NOT NULL THEN ab || ' ' || c END),"
            f" x -> x IS NOT NULL)"
        )
        m1 = f"zip_with(hs, {sh('hs', 1)}, (a, b) -> least(a, b))"
        m2 = f"zip_with({m1}, {sh('hs', 2)}, (a, b) -> least(a, b))"
        m3 = (
            f"filter(zip_with({m2}, {sh('hs', 3)},"
            f" (m, dd) -> CASE WHEN dd IS NOT NULL THEN least(m, dd) END),"
            f" x -> x IS NOT NULL)"
        )
        fp_sel = "explode(fps) AS fp"
    else:
        sh = lambda arr, by: f"list_slice({arr}, {by + 1}, len({arr}))"  # noqa: E731
        g2 = (
            f"list_transform(list_zip(toks, {sh('toks', 1)}),"
            f" p -> CASE WHEN p[2] IS NOT NULL THEN p[1] || ' ' || p[2] END)"
        )
        g3 = (
            f"list_filter(list_transform(list_zip({g2}, {sh('toks', 2)}),"
            f" q -> CASE WHEN q[1] IS NOT NULL AND q[2] IS NOT NULL THEN q[1] || ' ' || q[2] END),"
            f" x -> x IS NOT NULL)"
        )
        m1 = f"list_transform(list_zip(hs, {sh('hs', 1)}), p -> least(p[1], p[2]))"
        m2 = f"list_transform(list_zip({m1}, {sh('hs', 2)}), p -> least(p[1], p[2]))"
        m3 = (
            f"list_filter(list_transform(list_zip({m2}, {sh('hs', 3)}),"
            f" p -> CASE WHEN p[2] IS NOT NULL THEN least(p[1], p[2]) END),"
            f" x -> x IS NOT NULL)"
        )
        fp_sel = "unnest(fps) AS fp"
    one = f"array({G.array_join('toks', chr(39) + ' ' + chr(39), d)})" if d == SPARK \
        else f"[{G.array_join('toks', chr(39) + ' ' + chr(39), d)}]"
    hexi = G.hexint("s", d)
    minone = _arr_min("hs", d)
    return f"""WITH {_tok_cte(d, docs)},
wn_g AS (
  SELECT doc_id,
         CASE WHEN {_arr_size('toks', d)} < 3 THEN {one} ELSE {g3} END AS tri
  FROM dd_tok
),
wn_h AS (
  SELECT doc_id, {G.ltransform('tri', f's -> {hexi}', d)} AS hs FROM wn_g
),
wn_f AS (
  SELECT doc_id,
         CASE WHEN {_arr_size('hs', d)} < {w}
              THEN {f"array({minone})" if d == SPARK else f"[{minone}]"}
              ELSE {P._arr_sort(P._arr_distinct(m3, d), d)} END AS fps
  FROM wn_h
)
SELECT doc_id, {fp_sel} FROM wn_f"""


def winnow_clusters_sql(d: str, docs: str = "documents") -> str:
    """Cluster formation over winnowing candidate pairs with the
    min-shared-fingerprint edge threshold."""
    from .operators.dedup import WINNOW_MIN_SHARED

    edges = (
        f"SELECT a, b FROM ({winnow_pairs_sql(d, docs)}) wpe"
        f" WHERE n_shared >= {WINNOW_MIN_SHARED}"
    )
    return _cc_closure_sql(edges)


def simhash_clusters_sql(d: str, docs: str = "documents") -> str:
    """Cluster formation over the hamming-verified banded SimHash
    pairs — every pair is already a verified edge."""
    return _cc_closure_sql(f"SELECT a, b FROM ({simhash_pairs_sql(d, docs)}) spe")


def winnow_pairs_sql(d: str, docs: str = "documents", max_fp_docs: int = 64) -> str:
    return f"""WITH wp_f AS ({winnow_sql(d, docs)}),
wp_small AS (
  SELECT fp FROM wp_f GROUP BY fp HAVING count(*) <= {max_fp_docs}
),
wp_fs AS (
  SELECT f.* FROM wp_f f JOIN wp_small s ON f.fp = s.fp
)
SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS n_shared
FROM wp_fs x JOIN wp_fs y ON x.fp = y.fp AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id"""


def _shr_bit(x: str, b: int, d: str) -> str:
    if d == SPARK:
        return f"(shiftright({x}, {b}) % 2)"
    return f"(({x} >> {b}) % 2)"


def simhash_sql(d: str, docs: str = "documents", bits: int = 16) -> str:
    h = G.hexint("t", d)
    hs = G.ltransform(P._arr_distinct("toks", d), f"t -> {h}", d)
    terms = []
    for b in range(bits):
        contrib = G.ltransform(
            "hs", f"x -> CASE WHEN {_shr_bit('x', b, d)} = 1 THEN 1 ELSE -1 END", d
        )
        s = f"coalesce({_list_sum_dec_int(contrib, d)}, 0)"
        terms.append(f"CASE WHEN {s} >= 0 THEN {2**b} ELSE 0 END")
    fp = " + ".join(terms)
    return f"""WITH {_tok_cte(d, docs)},
sh_h AS (SELECT doc_id, {hs} AS hs FROM dd_tok)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sh_h"""


def _list_sum_dec_int(arr: str, d: str) -> str:
    if d == SPARK:
        return f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    return f"list_sum({arr})"


def simhash_pairs_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.simhash_candidate_pairs: banded SimHash
    equi-join (4 bands × 4 bits) + hot-band guard + hamming verify."""
    from .operators.dedup import (
        MAX_BUCKET,
        SIMHASH_BAND_BITS,
        SIMHASH_BITS,
        SIMHASH_HAM_MAX,
    )

    nb = SIMHASH_BITS // SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1

    def band_val(b: int) -> str:
        sh = SIMHASH_BAND_BITS * b
        if d == SPARK:
            return f"shiftright(simhash, {sh}) % {mask + 1}"
        return f"(simhash >> {sh}) % {mask + 1}"

    bands = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {b} AS band, {band_val(b)} AS val FROM sp_f"
        for b in range(nb)
    )
    xor = "xor(fa, fb)" if d == DUCK else "fa ^ fb"
    ham = f"bit_count({xor})"
    return f"""WITH sp_f AS ({simhash_sql(d, docs)}),
sp_bands AS (
{bands}
),
sp_small AS (
  SELECT band, val FROM sp_bands GROUP BY band, val HAVING count(*) <= {MAX_BUCKET}
),
sp_bs AS (
  SELECT x.* FROM sp_bands x JOIN sp_small s ON x.band = s.band AND x.val = s.val
),
sp_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         x.simhash AS fa, y.simhash AS fb
  FROM sp_bs x JOIN sp_bs y ON x.band = y.band AND x.val = y.val
    AND x.doc_id < y.doc_id
)
SELECT a, b, CAST({ham} AS BIGINT) AS hamming
FROM sp_pairs WHERE {ham} <= {SIMHASH_HAM_MAX}"""


def decontaminate_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.decontaminate: distinct word n-gram
    hashes per doc, eval slice = md5-bucket-0 of doc_id, per-(doc,eval)
    shared-gram counts (self-pairs excluded), per-doc max eval-gram
    overlap fraction + contamination flag; LEFT JOIN keeps every doc."""
    from .operators.dedup import DECON_EVAL_BUCKETS, DECON_FRAC, DECON_NGRAM

    n = DECON_NGRAM
    if d == SPARK:
        # sequence(0, -k) would DESCEND in Spark — guard short docs
        grams = (
            f"CASE WHEN size(toks) < {n} THEN array()"
            f" ELSE transform(sequence(0, size(toks) - {n}),"
            f" i -> array_join(slice(toks, i + 1, {n}), ' ')) END"
        )
    else:
        grams = (
            f"list_transform(range(greatest({_arr_size('toks', d)} - {n - 1}, 0)),"
            f" i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
        )
    gh = "md5(gram)"
    bucket = f"({G.hexint(G.cast_str('doc_id', d), d)}) % {DECON_EVAL_BUCKETS}"
    if d == SPARK:
        gram_select = (
            "SELECT doc_id, explode(array_distinct(grams)) AS gram FROM dc_ga"
        )
    else:
        gram_select = (
            "SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM dc_ga"
        )
    return f"""WITH {_tok_cte(d, docs)},
dc_ga AS (
  SELECT doc_id, {grams} AS grams FROM dd_tok
),
dc_g AS (
  SELECT doc_id, {gh} AS h FROM ({gram_select})
),
dc_e AS (
  SELECT doc_id AS eval_id, h FROM dc_g
  WHERE doc_id IN (SELECT doc_id FROM {docs} WHERE {bucket} = 0)
),
dc_t AS (
  SELECT eval_id, CAST(count(*) AS BIGINT) AS n_eval_grams
  FROM dc_e GROUP BY eval_id
),
dc_s AS (
  SELECT g.doc_id, e.eval_id, CAST(count(*) AS BIGINT) AS n_shared
  FROM dc_g g JOIN dc_e e ON g.h = e.h AND g.doc_id <> e.eval_id
  GROUP BY g.doc_id, e.eval_id
),
dc_p AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_eval_docs_hit,
         max(CAST(s.n_shared AS DOUBLE) / CAST(t.n_eval_grams AS DOUBLE))
           AS max_overlap_frac
  FROM dc_s s JOIN dc_t t ON s.eval_id = t.eval_id
  GROUP BY s.doc_id
)
SELECT dd.doc_id,
       coalesce(p.n_eval_docs_hit, 0) AS n_eval_docs_hit,
       coalesce(p.max_overlap_frac, 0.0) AS max_overlap_frac,
       coalesce(p.max_overlap_frac, 0.0) >= {DECON_FRAC} AS contaminated
FROM {docs} dd LEFT JOIN dc_p p ON dd.doc_id = p.doc_id"""


def gram_novelty_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.gram_novelty: distinct n-gram hashes
    per doc, gram document frequency, per-doc novel fraction (df=1);
    short docs keep a row with n_grams=0 and NULL fraction."""
    from .operators.dedup import DECON_NGRAM

    n = DECON_NGRAM
    if d == SPARK:
        grams = (
            f"CASE WHEN size(toks) < {n} THEN array()"
            f" ELSE transform(sequence(0, size(toks) - {n}),"
            f" i -> array_join(slice(toks, i + 1, {n}), ' ')) END"
        )
        gram_select = (
            "SELECT doc_id, explode(array_distinct(grams)) AS gram FROM gn_ga"
        )
    else:
        grams = (
            f"list_transform(range(greatest({_arr_size('toks', d)} - {n - 1}, 0)),"
            f" i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
        )
        gram_select = (
            "SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM gn_ga"
        )
    return f"""WITH {_tok_cte(d, docs)},
gn_ga AS (
  SELECT doc_id, {grams} AS grams FROM dd_tok
),
gn_g AS (
  SELECT doc_id, md5(gram) AS h FROM ({gram_select})
),
gn_df AS (
  SELECT h, CAST(count(*) AS BIGINT) AS df FROM gn_g GROUP BY h
),
gn_pd AS (
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM gn_g g JOIN gn_df f ON g.h = f.h
  GROUP BY g.doc_id
)
SELECT dd.doc_id,
       coalesce(p.n_grams, 0) AS n_grams,
       coalesce(p.n_novel, 0) AS n_novel,
       CASE WHEN p.n_grams > 0
            THEN CAST(p.n_novel AS DOUBLE) / CAST(p.n_grams AS DOUBLE) END
         AS novelty_frac
FROM {docs} dd LEFT JOIN gn_pd p ON dd.doc_id = p.doc_id"""


def split_leakage_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.split_leakage: decontaminate's
    128-bit distinct-gram join run across the deterministic
    data_split boundary — probe = train buckets, eval = test buckets;
    splits are disjoint so no self-pair filter."""
    from .operators.dedup import DECON_FRAC, DECON_NGRAM
    from .operators.pipeline import SPLIT_BUCKETS, SPLIT_TRAIN, SPLIT_VALID

    n = DECON_NGRAM
    if d == SPARK:
        grams = (
            f"CASE WHEN size(toks) < {n} THEN array()"
            f" ELSE transform(sequence(0, size(toks) - {n}),"
            f" i -> array_join(slice(toks, i + 1, {n}), ' ')) END"
        )
        gram_select = (
            "SELECT doc_id, explode(array_distinct(grams)) AS gram FROM sl_ga"
        )
    else:
        grams = (
            f"list_transform(range(greatest({_arr_size('toks', d)} - {n - 1}, 0)),"
            f" i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
        )
        gram_select = (
            "SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM sl_ga"
        )
    bucket = f"({G.hexint(G.cast_str('doc_id', d), d)}) % {SPLIT_BUCKETS}"
    return f"""WITH {_tok_cte(d, docs)},
sl_ga AS (
  SELECT doc_id, {grams} AS grams FROM dd_tok
),
sl_g AS (
  SELECT doc_id, md5(gram) AS h FROM ({gram_select})
),
sl_train AS (
  SELECT doc_id FROM {docs} WHERE {bucket} < {SPLIT_TRAIN}
),
sl_p AS (
  SELECT g.doc_id, g.h FROM sl_g g JOIN sl_train t ON g.doc_id = t.doc_id
),
sl_e AS (
  SELECT doc_id AS eval_id, h FROM sl_g
  WHERE doc_id IN (SELECT doc_id FROM {docs} WHERE {bucket} >= {SPLIT_VALID})
),
sl_t AS (
  SELECT eval_id, CAST(count(*) AS BIGINT) AS n_eval_grams
  FROM sl_e GROUP BY eval_id
),
sl_s AS (
  SELECT p.doc_id, e.eval_id, CAST(count(*) AS BIGINT) AS n_shared
  FROM sl_p p JOIN sl_e e ON p.h = e.h
  GROUP BY p.doc_id, e.eval_id
),
sl_pd AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_eval_docs_hit,
         max(CAST(s.n_shared AS DOUBLE) / CAST(t.n_eval_grams AS DOUBLE))
           AS max_overlap_frac
  FROM sl_s s JOIN sl_t t ON s.eval_id = t.eval_id
  GROUP BY s.doc_id
)
SELECT tr.doc_id,
       coalesce(p.n_eval_docs_hit, 0) AS n_eval_docs_hit,
       coalesce(p.max_overlap_frac, 0.0) AS max_overlap_frac,
       coalesce(p.max_overlap_frac, 0.0) >= {DECON_FRAC} AS contaminated
FROM sl_train tr LEFT JOIN sl_pd p ON tr.doc_id = p.doc_id"""


def _bpe_cte_chain(d: str, n_merges: int) -> str:
    """The unrolled BPE fit as a CTE-chain body (appended after
    ``dd_tok``): per iteration a lead-window pair expansion, the
    weighted argmax pair (ties lexicographic), the greedy-leftmost
    merge via gaps-and-islands (odd run positions merge, successors
    drop), and the ordered rebuild. Exposes b1..bK (per-iteration
    argmax pairs) and s0..sK (vocab states; sK = the fitted
    word → syms encoding) — shared by bpe_merges_sql,
    bpe_encode_sql and bpe_vocab_sql.

    SPARK-dialect caveat: Spark SQL has no MATERIALIZED CTE, so the
    SPARK branch of this chain hits the same tree-copy blowup in
    Catalyst ANALYSIS (hangs for n_merges≈6) that the DataFrame
    operator breaks with per-iteration localCheckpoint — the SPARK
    string is generated for dialect symmetry but only the DUCK branch
    is runnable at the default merge count (and only DUCK is
    registered as an oracle)."""
    # DuckDB re-inlines every CTE reference (the same tree-copy blowup
    # Catalyst has); multi-referenced iteration CTEs must MATERIALIZE
    # or 6 unrolled merges evaluate ~5^6 subtrees
    mat = "" if d == SPARK else "MATERIALIZED "
    if d == SPARK:
        chars = "split(word, '')"
        pos_rows = (
            "SELECT word, freq, pos, sym FROM s{prev} "
            "LATERAL VIEW posexplode(syms) u AS pos, sym"
        )
        syms_agg = (
            "transform(array_sort(collect_list(named_struct("
            "'o', pos, 'x', sym))), s -> s.x)"
        )
    else:
        chars = "string_split(word, '')"
        pos_rows = (
            "SELECT word, freq, generate_subscripts(syms, 1) - 1 AS pos, "
            "unnest(syms) AS sym FROM s{prev}"
        )
        syms_agg = "list(sym ORDER BY pos ASC)"
    ctes = [
        f"""bw AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT {"explode(toks)" if d == SPARK else "unnest(toks)"} AS word
        FROM dd_tok)
  GROUP BY word
)""",
        f"s0 AS {mat}(SELECT word, freq, {chars} AS syms FROM bw)",
    ]
    for i in range(1, n_merges + 1):
        inner = pos_rows.format(prev=i - 1)
        ctes.append(f"""p{i} AS {mat}(
  SELECT word, freq, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM ({inner})
)""")
        ctes.append(f"""b{i} AS {mat}(
  SELECT sym AS bl, nxt AS br, CAST(sum(freq) AS BIGINT) AS pf
  FROM p{i} WHERE nxt IS NOT NULL GROUP BY sym, nxt
  ORDER BY pf DESC, bl ASC, br ASC LIMIT 1
)""")
        ctes.append(f"""mt{i} AS {mat}(
  SELECT p.word, p.freq, p.pos, p.sym, p.nxt,
         (p.sym = b.bl AND p.nxt = b.br) AS is_m
  FROM p{i} p CROSS JOIN b{i} b
)""")
        ctes.append(f"""ks{i} AS {mat}(
  SELECT word, pos FROM (
    SELECT word, pos,
           row_number() OVER (PARTITION BY word, pos - mrn ORDER BY pos) AS rrn
    FROM (
      SELECT word, pos,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS mrn
      FROM mt{i} WHERE is_m
    ) x
  ) y WHERE rrn % 2 = 1
)""")
        ctes.append(f"""ns{i} AS {mat}(
  SELECT m.word, m.freq, m.pos,
         CASE WHEN k.pos IS NOT NULL THEN m.sym || m.nxt ELSE m.sym END AS sym
  FROM mt{i} m
  LEFT JOIN ks{i} k ON m.word = k.word AND m.pos = k.pos
  LEFT JOIN ks{i} kc ON m.word = kc.word AND m.pos = kc.pos + 1
  WHERE kc.pos IS NULL
)""")
        ctes.append(f"""s{i} AS {mat}(
  SELECT word, freq, {syms_agg} AS syms FROM ns{i} GROUP BY word, freq
)""")
    return ",\n".join(ctes)


def bpe_merges_sql(d: str, docs: str = "documents",
                   n_merges: int | None = None) -> str:
    """Mirror of operators.bpe.bpe_fit (see _bpe_cte_chain). Output:
    the merge table (merge_rank, lhs, rhs, merged, pair_freq)."""
    from .operators.bpe import BPE_MERGES

    n_merges = BPE_MERGES if n_merges is None else n_merges
    union = "\n  UNION ALL\n".join(
        f"  SELECT CAST({i} AS BIGINT) AS merge_rank, bl AS lhs, br AS rhs,"
        f" bl || br AS merged, pf AS pair_freq FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""WITH {_tok_cte(d, docs)},
{_bpe_cte_chain(d, n_merges)}
{union}"""


def bpe_encode_sql(d: str, docs: str = "documents",
                   n_merges: int | None = None) -> str:
    """Mirror of operators.bpe.bpe_encode: the fitted vocab encoding
    (s{K} of the unrolled chain) dictionary-joined to every word
    occurrence. Output: one row per subword token
    (doc_id, ord, sub, subword)."""
    from .operators.bpe import BPE_MERGES

    n_merges = BPE_MERGES if n_merges is None else n_merges
    k = n_merges
    if d == SPARK:
        words = (
            "SELECT doc_id, pos AS ord, word FROM dd_tok "
            "LATERAL VIEW posexplode(toks) u AS pos, word"
        )
        final = (
            f"SELECT w.doc_id, CAST(w.ord AS BIGINT) AS ord,\n"
            f"       CAST(sub AS BIGINT) AS sub, subword\n"
            f"FROM be_w w JOIN s{k} s ON w.word = s.word\n"
            f"LATERAL VIEW posexplode(s.syms) v AS sub, subword"
        )
    else:
        words = (
            "SELECT doc_id, generate_subscripts(toks, 1) - 1 AS ord, "
            "unnest(toks) AS word FROM dd_tok"
        )
        final = (
            f"SELECT w.doc_id, CAST(w.ord AS BIGINT) AS ord,\n"
            f"       CAST(generate_subscripts(s.syms, 1) - 1 AS BIGINT) AS sub,\n"
            f"       unnest(s.syms) AS subword\n"
            f"FROM be_w w JOIN s{k} s ON w.word = s.word"
        )
    return f"""WITH {_tok_cte(d, docs)},
{_bpe_cte_chain(d, n_merges)},
be_w AS (
  {words}
)
{final}"""


def bpe_vocab_sql(d: str, docs: str = "documents",
                  n_merges: int | None = None) -> str:
    """Mirror of operators.bpe.bpe_vocab: lexicographically-ranked
    base chars (weight = freq-weighted occurrence count over the word
    table) then the b1..bK merges at ids C..C+K-1."""
    from .operators.bpe import BPE_MERGES

    n_merges = BPE_MERGES if n_merges is None else n_merges
    if d == SPARK:
        char_rows = "SELECT explode(split(word, '')) AS token, freq FROM bw"
    else:
        char_rows = (
            "SELECT unnest(string_split(word, '')) AS token, freq FROM bw"
        )
    merge_union = "\n  UNION ALL\n".join(
        f"  SELECT (SELECT c FROM bv_c) + CAST({i} AS BIGINT) - 1 AS token_id,"
        f" bl || br AS token, 'merge' AS kind,"
        f" CAST(pf AS BIGINT) AS weight FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""WITH {_tok_cte(d, docs)},
{_bpe_cte_chain(d, n_merges)},
bv_chars AS (
  SELECT token, CAST(sum(freq) AS BIGINT) AS weight
  FROM ({char_rows}) GROUP BY token
),
bv_ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id,
         token, 'char' AS kind, weight
  FROM bv_chars
),
bv_c AS (SELECT CAST(count(*) AS BIGINT) AS c FROM bv_chars)
SELECT token_id, token, kind, weight FROM bv_ranked
UNION ALL
{merge_union}"""


def ngram_counts_sql(d: str, docs: str = "documents", n: int = 3) -> str:
    """Mirror of textstats.ngram_counts: positional word n-grams →
    global counts + distinct-doc counts → deterministic top-N."""
    from .operators.textstats import NGRAM_TOP

    if d == SPARK:
        grams = (
            f"CASE WHEN size(toks) < {n} THEN array()"
            f" ELSE transform(sequence(0, size(toks) - {n}),"
            f" i -> array_join(slice(toks, i + 1, {n}), ' ')) END"
        )
        unnest = "explode(grams) AS gram"
        sel = f"SELECT doc_id, {unnest} FROM ng_a"
    else:
        grams = (
            f"list_transform(range(greatest({_arr_size('toks', d)} - {n - 1}, 0)),"
            f" i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
        )
        sel = "SELECT doc_id, unnest(grams) AS gram FROM ng_a"
    return f"""WITH {_tok_cte(d, docs)},
ng_a AS (
  SELECT doc_id, {grams} AS grams FROM dd_tok
),
ng_g AS (
  {sel}
),
ng_c AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS n_occ,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM ng_g GROUP BY gram
),
ng_r AS (
  SELECT *, row_number() OVER (ORDER BY n_occ DESC, gram ASC) AS rank
  FROM ng_c
)
SELECT CAST(rank AS BIGINT) AS rank, gram, n_occ, n_docs
FROM ng_r WHERE rank <= {NGRAM_TOP}"""


def _line_seg_cte(d: str, docs: str = "documents") -> str:
    """Shared segment-row CTE chain (→ ln_s): newline-split lines,
    normalized (lower, ws-collapse, trim, empties dropped), sub-chunked
    every LINE_SEG_TOKENS whitespace tokens — mirror of
    operators.dedup.line_segments."""
    from .operators.dedup import LINE_SEG_TOKENS

    norm = f"lower(trim({G.replace_all('line', chr(92) + 's+', ' ', d)}))"
    if d == SPARK:
        line_rows = r"LATERAL VIEW posexplode(split(text, '\n')) u AS line_no, line"
        tok_rows = "LATERAL VIEW posexplode(split(norm, ' ')) v AS pos, tok"
        from_raw = f"FROM {docs} {line_rows}"
        from_tok = "FROM ln_f {0}".format(tok_rows)
        agg = (
            "array_join(transform(array_sort(collect_list(struct(pos, tok))),"
            " s -> s.tok), ' ')"
        )
        sel_line = f"SELECT doc_id, line_no, {norm} AS norm"
        sel_tok = "SELECT doc_id, line_no, pos, tok"
    else:
        from_raw = (
            f"FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM {docs})"
        )
        sel_line = (
            "SELECT doc_id, generate_subscripts(ls, 1) - 1 AS line_no, "
            f"{norm.replace('line', 'unnest(ls)')} AS norm"
        )
        from_tok = (
            "FROM (SELECT doc_id, line_no, string_split(norm, ' ') AS toks FROM ln_f)"
        )
        sel_tok = (
            "SELECT doc_id, line_no, generate_subscripts(toks, 1) - 1 AS pos, "
            "unnest(toks) AS tok"
        )
        agg = "string_agg(tok, ' ' ORDER BY pos ASC)"
    seg_idx = P.idiv("pos", str(LINE_SEG_TOKENS), d)
    return f"""ln_l AS (
  {sel_line}
  {from_raw}
),
ln_f AS (SELECT * FROM ln_l WHERE norm <> ''),
ln_p AS (
  {sel_tok}
  {from_tok}
),
ln_s AS (
  SELECT doc_id, line_no, CAST({seg_idx} AS BIGINT) AS seg_idx, {agg} AS seg
  FROM ln_p
  GROUP BY doc_id, line_no, {seg_idx}
)"""


def line_dedup_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.line_dedup: per segment text the
    corpus-wide occurrence count and the kept-first-occurrence verdict
    (C4 keep-one rule). The operator's groupBy-min + join-back equals
    the window row_number stated here."""
    return f"""WITH {_line_seg_cte(d, docs)},
ln_g AS (
  SELECT *,
         count(*) OVER (PARTITION BY seg) AS n_occ,
         row_number() OVER (
           PARTITION BY seg ORDER BY doc_id, line_no, seg_idx
         ) AS rn
  FROM ln_s
)
SELECT doc_id, CAST(line_no AS BIGINT) AS line_no, seg_idx, seg,
       CAST(n_occ AS BIGINT) AS n_occ, rn = 1 AS keep
FROM ln_g"""


def doc_line_trim_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.doc_line_trim: drop every repeat of a
    normalized segment AFTER its first occurrence WITHIN the same
    document, rebuild the kept text in reading order. The operator's
    groupBy(doc,seg)-min + ordered concat equals the per-doc window
    row_number stated here (the window key carries doc_id, so the
    oracle form is hot-key-safe too)."""
    if d == SPARK:
        rebuild = (
            "array_join(transform(array_sort(collect_list("
            "struct(line_no, seg_idx, seg))), s -> s.seg), char(10))"
        )
    else:
        rebuild = "string_agg(seg, chr(10) ORDER BY line_no, seg_idx)"
    return f"""WITH {_line_seg_cte(d, docs)},
dt_g AS (
  SELECT doc_id, line_no, seg_idx, seg,
         count(*) OVER (PARTITION BY doc_id, seg) AS n_occ,
         row_number() OVER (
           PARTITION BY doc_id, seg ORDER BY line_no, seg_idx
         ) AS rn
  FROM ln_s
),
dt_k AS (SELECT * FROM dt_g WHERE rn = 1),
dt_d AS (
  SELECT doc_id,
         CAST(sum(n_occ) AS BIGINT) AS n_segs,
         CAST(count(*) AS BIGINT) AS n_kept,
         {rebuild} AS kept_text
  FROM dt_k GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(k.n_segs, 0) AS n_segs,
       coalesce(k.n_kept, 0) AS n_kept,
       coalesce(k.kept_text, '') AS kept_text
FROM {docs} d LEFT JOIN dt_d k ON d.doc_id = k.doc_id"""


# ------------------------------------------------------------------- ANN
def _fold_double(arr: str, d: str) -> str:
    """Left-to-right double sum with a 0.0 seed — the exact fold Spark's
    ``aggregate(arr, 0.0d, (acc,x) -> acc+x)`` performs, so every
    intermediate rounding matches bit-for-bit (DuckDB's ``list_reduce``
    has no init parameter; prepending 0.0 reproduces it)."""
    if d == SPARK:
        return f"aggregate({arr}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    return f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {arr}), (acc, x) -> acc + x)"


def _dot_sql(a: str, b: str, d: str, dim: int = 64) -> str:
    """Double dot product mirroring operators.similarity_search._dot:
    float32 elements → exact double products, order-fixed left fold."""
    prod = f"CAST({_elem(a, 'i', d)} AS DOUBLE) * CAST({_elem(b, 'i', d)} AS DOUBLE)"
    arr = G.ltransform(_seq_range(dim, d), f"i -> {prod}", d)
    return _fold_double(arr, d)


def ann_topk_sql(d: str, n_queries: int = 8, k: int = 10,
                 emb: str = "embeddings", dim: int = 64) -> str:
    return f"""WITH an_n AS (
  SELECT vec_id, embedding, {_dot_sql('embedding', 'embedding', d, dim)} AS nsq
  FROM {emb}
),
an_q AS (SELECT vec_id AS q_id, embedding AS qv, nsq AS q_nsq FROM an_n WHERE vec_id < {n_queries}),
an_c AS (SELECT vec_id AS c_id, embedding AS cv, nsq AS c_nsq FROM an_n),
an_s AS (
  SELECT q_id, c_id,
         CAST({_dot_sql('qv', 'cv', d, dim)} AS DOUBLE)
           / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(c_nsq AS DOUBLE))) AS sim
  FROM an_c CROSS JOIN an_q WHERE c_id <> q_id
),
an_r AS (
  SELECT q_id, c_id,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
  FROM an_s
)
SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id FROM an_r WHERE rank <= {k}"""


def lsh_bucket_sql(d: str, bits: int = 16, dim: int = 64) -> str:
    terms = []
    for j in range(bits):
        w = f"((i * 31 + {j * 17}) % 7 - 3)"
        prod = f"CAST({_elem('embedding', 'i', d)} AS DOUBLE) * CAST({w} AS DOUBLE)"
        arr = G.ltransform(_seq_range(dim, d), f"i -> {prod}", d)
        s = _fold_double(arr, d)
        terms.append(f"CASE WHEN {s} >= 0 THEN {2**j} ELSE 0 END")
    bucket = " + ".join(terms)
    return f"""SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket FROM embeddings"""


def lsh_search_sql(d: str, n_queries: int = 8, k: int = 10, bits: int = 8) -> str:
    """End-to-end LSH search: probe bucket → equi-join → rerank → top-k."""
    sim = (
        f"CAST({_dot_sql('qv', 'cv', d)} AS DOUBLE)"
        f" / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(c_nsq AS DOUBLE)))"
    )
    return f"""WITH ls_b AS ({lsh_bucket_sql(d, bits=bits)}),
ls_n AS (
  SELECT vec_id, embedding, {_dot_sql('embedding', 'embedding', d)} AS nsq
  FROM embeddings
),
ls_q AS (
  SELECT b.vec_id AS q_id, b.bucket, n.embedding AS qv, n.nsq AS q_nsq
  FROM ls_b b JOIN ls_n n ON b.vec_id = n.vec_id WHERE b.vec_id < {n_queries}
),
ls_c AS (
  SELECT b.vec_id AS c_id, b.bucket, n.embedding AS cv, n.nsq AS c_nsq
  FROM ls_b b JOIN ls_n n ON b.vec_id = n.vec_id
),
ls_s AS (
  SELECT q_id, c_id, {sim} AS sim
  FROM ls_c c JOIN ls_q q ON c.bucket = q.bucket AND c.c_id <> q.q_id
),
ls_r AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
  FROM ls_s
)
SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, sim FROM ls_r WHERE rank <= {k}"""


def ivf_search_sql(
    d: str, n_queries: int = 8, k: int = 10,
    n_centroids: int = 16, nprobe: int = 4,
    fitted: bool = False,
) -> str:
    """End-to-end IVF search: nprobe nearest centroids → inverted-list
    equi-join → rerank → top-k. ``fitted=True`` swaps the first-N
    centroid stand-in for the unrolled k-means fit (the oracle twin of
    ``ivf_search(..., centroids=kmeans_fit(...))``)."""
    probe_dist = (
        f"CAST(q.q_nsq AS DOUBLE) - 2.0 * CAST({_dot_sql('q.qv', 'c.cv', d)} AS DOUBLE)"
        f" + CAST(c.c_nsq AS DOUBLE)"
    )
    sim = (
        f"CAST({_dot_sql('p.qv', 'c.cv2', d)} AS DOUBLE)"
        f" / (sqrt(CAST(p.q_nsq AS DOUBLE)) * sqrt(CAST(c.c_nsq2 AS DOUBLE)))"
    )
    if fitted:
        from .operators.similarity_search import KMEANS_ITERS

        km_body, km_final = _kmeans_cte_chain(d, n_centroids, KMEANS_ITERS, 64)
        prefix = km_body + ",\n"
        iv_c_body = (
            f"SELECT centroid_id, cv, {_dot_sql('cv', 'cv', d)} AS c_nsq"
            f" FROM {km_final}"
        )
    else:
        prefix = ""
        iv_c_body = (
            f"SELECT vec_id AS centroid_id, embedding AS cv,\n"
            f"         {_dot_sql('embedding', 'embedding', d)} AS c_nsq\n"
            f"  FROM embeddings WHERE vec_id < {n_centroids}"
        )
    return f"""WITH {prefix}iv_c AS (
  {iv_c_body}
),
iv_v AS (
  SELECT vec_id, embedding, {_dot_sql('embedding', 'embedding', d)} AS v_nsq
  FROM embeddings
),
iv_p AS (
  SELECT vec_id, centroid_id,
         CAST(v_nsq AS DOUBLE) - 2.0 * CAST({_dot_sql('embedding', 'cv', d)} AS DOUBLE)
           + CAST(c_nsq AS DOUBLE) AS dist
  FROM iv_v CROSS JOIN iv_c
),
iv_a AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist ASC, centroid_id ASC) AS rn
    FROM iv_p
  ) x WHERE rn = 1
),
is_q AS (
  SELECT vec_id AS q_id, embedding AS qv, v_nsq AS q_nsq
  FROM iv_v WHERE vec_id < {n_queries}
),
is_pl AS (
  SELECT q_id, qv, q_nsq, centroid_id FROM (
    SELECT q.q_id, q.qv, q.q_nsq, c.centroid_id,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {probe_dist} ASC, c.centroid_id ASC) AS prn
    FROM is_q q CROSS JOIN iv_c c
  ) y WHERE prn <= {nprobe}
),
is_c AS (
  SELECT a.vec_id AS c_id, a.centroid_id, v.embedding AS cv2, v.v_nsq AS c_nsq2
  FROM iv_a a JOIN iv_v v ON a.vec_id = v.vec_id
),
is_s AS (
  SELECT p.q_id, c.c_id, {sim} AS sim
  FROM is_c c JOIN is_pl p ON c.centroid_id = p.centroid_id AND c.c_id <> p.q_id
),
is_r AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
  FROM is_s
)
SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, sim FROM is_r WHERE rank <= {k}"""


def ann_recall_sql(
    d: str, n_queries: int = 8, k: int = 10,
    n_centroids: int = 16, nprobe: int = 4,
) -> str:
    """Mirror of similarity_search.ann_recall: per-query recall@k of
    the IVF search vs the brute-force top-k ground truth. Both
    component statements nest as CTE bodies."""
    return f"""WITH ar_t AS (
{ann_topk_sql(d, n_queries, k)}
),
ar_a AS (
{ivf_search_sql(d, n_queries, k, n_centroids, nprobe)}
),
ar_h AS (
  SELECT a.q_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM ar_a a JOIN ar_t t ON a.q_id = t.q_id AND a.c_id = t.c_id
  GROUP BY a.q_id
),
ar_q AS (SELECT DISTINCT q_id FROM ar_t)
SELECT q.q_id,
       coalesce(h.n_hits, 0) AS n_hits,
       CAST({k} AS BIGINT) AS k,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST({k} AS DOUBLE) AS recall
FROM ar_q q LEFT JOIN ar_h h ON q.q_id = h.q_id"""


def pq_recall_sql(d: str) -> str:
    """Mirror of similarity_search.pq_recall: recall@k of the ADC
    search vs the exact squared-L2 top-k ground truth (the PQ path
    ranks by L2, so the truth must too)."""
    m, sub, kk, n_q, topk = _pq_consts()
    dist = (
        f"CAST(q.q_nsq AS DOUBLE) - 2.0 * CAST({_dot_sql('q.qv', 'c.cv', d)} AS DOUBLE)"
        f" + CAST(c.c_nsq AS DOUBLE)"
    )
    return f"""WITH pr_t AS (
  SELECT q_id, c_id FROM (
    SELECT q.q_id, c.c_id,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {dist} ASC, c.c_id ASC) AS rank
    FROM (SELECT vec_id AS c_id, embedding AS cv,
                 {_dot_sql('embedding', 'embedding', d)} AS c_nsq
          FROM embeddings) c
    CROSS JOIN (SELECT vec_id AS q_id, embedding AS qv,
                       {_dot_sql('embedding', 'embedding', d)} AS q_nsq
                FROM embeddings WHERE vec_id < {n_q}) q
    WHERE c.c_id <> q.q_id
  ) x WHERE rank <= {topk}
),
pr_a AS (
{pq_search_sql(d)}
),
pr_h AS (
  SELECT a.q_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM pr_a a JOIN pr_t t ON a.q_id = t.q_id AND a.c_id = t.c_id
  GROUP BY a.q_id
),
pr_q AS (SELECT DISTINCT q_id FROM pr_t)
SELECT q.q_id,
       coalesce(h.n_hits, 0) AS n_hits,
       CAST({topk} AS BIGINT) AS k,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST({topk} AS DOUBLE) AS recall
FROM pr_q q LEFT JOIN pr_h h ON q.q_id = h.q_id"""


# ----------------------------------------------------- cascade / project
_CONF_A = "CAST((doc_id * 131 + page_num * 17 + 5) % 101 AS DOUBLE) / CAST(100.0 AS DOUBLE)"
_CONF_B = "(70 + (doc_id * 37 + page_num * 11 + 3) % 31) / CAST(100.0 AS DOUBLE)"


def _pq_consts():
    from .operators.similarity_search import PQ_K, PQ_M, PQ_N_QUERIES, PQ_SUB_DIM, PQ_TOPK

    return PQ_M, PQ_SUB_DIM, PQ_K, PQ_N_QUERIES, PQ_TOPK


def _pq_sqdist(a: str, b: str, d: str, dim: int) -> str:
    diff = f"(CAST({_elem(a, 'i', d)} AS DOUBLE) - CAST({_elem(b, 'i', d)} AS DOUBLE))"
    arr = G.ltransform(_seq_range(dim, d), f"i -> {diff} * {diff}", d)
    return _fold_double(arr, d)


def _pq_base_cte(d: str, cb_src: str | None = None) -> str:
    """pq_s: one row per (vec_id, sub_id) subvector; pq_cb: the
    codebook (subvectors of the first PQ_K vectors, or ``cb_src`` — a
    CTE holding a FITTED (grp, centroid_id, cv) codebook); pq_enc:
    nearest code per subvector — mirrors similarity_search.pq_encode."""
    m, sub, k, _, _ = _pq_consts()
    subs = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {i} AS sub_id,"
        f" {_arr_slice('embedding', i * sub + 1, sub, d)} AS sv FROM embeddings"
        for i in range(m)
    )
    cb_body = (
        f"SELECT sub_id, vec_id AS code_id, sv AS code_vec FROM pq_s WHERE vec_id < {k}"
        if cb_src is None
        else f"SELECT grp AS sub_id, centroid_id AS code_id, cv AS code_vec FROM {cb_src}"
    )
    return f"""pq_s AS (
{subs}
),
pq_cb AS (
  {cb_body}
),
pq_d AS (
  SELECT s.vec_id, s.sub_id, c.code_id,
         {_pq_sqdist('s.sv', 'c.code_vec', d, sub)} AS dist
  FROM pq_s s JOIN pq_cb c ON s.sub_id = c.sub_id
),
pq_enc AS (
  SELECT vec_id, sub_id, code_id, dist FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, sub_id ORDER BY dist ASC, code_id ASC
    ) AS rn FROM pq_d
  ) WHERE rn = 1
)"""


def pq_encode_sql(d: str) -> str:
    return f"""WITH {_pq_base_cte(d)}
SELECT vec_id, sub_id, code_id, dist FROM pq_enc"""


def pq_search_sql(d: str, fitted: bool = False) -> str:
    """ADC search; ``fitted=True`` swaps the first-K codebook stand-in
    for the grouped per-subspace Lloyd fit (the oracle twin of
    ``pq_search(..., codebook=pq_fit_codebook(...))``)."""
    m, sub, kk, n_q, topk = _pq_consts()
    if fitted:
        from .operators.similarity_search import KMEANS_ITERS

        fit_body, fit_final = _pq_fit_cte_chain(d, kk, KMEANS_ITERS)
        prefix = fit_body + ",\n"
        base = _pq_base_cte(d, cb_src=fit_final)
    else:
        prefix = ""
        base = _pq_base_cte(d)
    if d == SPARK:
        adc = (
            "aggregate(transform(array_sort(collect_list(struct(sub_id, pd))),"
            " s -> s.pd), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    else:
        adc = (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            " list(pd ORDER BY sub_id ASC)), (acc, x) -> acc + x)"
        )
    return f"""WITH {prefix}{base},
pq_q AS (
  SELECT vec_id AS q_id, sub_id, sv AS qsv FROM pq_s WHERE vec_id < {n_q}
),
pq_lut AS (
  SELECT q.q_id, q.sub_id, c.code_id,
         {_pq_sqdist('q.qsv', 'c.code_vec', d, sub)} AS pd
  FROM pq_q q JOIN pq_cb c ON q.sub_id = c.sub_id
),
pq_p AS (
  SELECT l.q_id, e.vec_id AS c_id, e.sub_id, l.pd
  FROM pq_enc e JOIN pq_lut l
    ON e.sub_id = l.sub_id AND e.code_id = l.code_id
  WHERE e.vec_id <> l.q_id
),
pq_a AS (
  SELECT q_id, c_id, {adc} AS adc_dist
  FROM pq_p GROUP BY q_id, c_id HAVING count(*) = {m}
)
SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, adc_dist FROM (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY adc_dist ASC, c_id ASC
  ) AS rank FROM pq_a
) WHERE rank <= {topk}"""


def cascade_sql(d: str, docs: str = "documents", threshold: float = 0.85) -> str:
    return f"""WITH {P.pages_cte(d, docs)}
SELECT doc_id, role, page_num,
       CASE WHEN {_CONF_A} >= {threshold} THEN 'engine_a' ELSE 'engine_b' END AS engine_used,
       CASE WHEN {_CONF_A} >= {threshold} THEN {_CONF_A} ELSE {_CONF_B} END AS conf
FROM pages"""


def cascade_stats_sql(d: str, docs: str = "documents") -> str:
    return f"""WITH casc AS ({cascade_sql(d, docs)})
SELECT engine_used, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(CAST(conf AS DECIMAL(28,12))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_conf
FROM casc GROUP BY engine_used"""


def type_islands_sql(d: str, docs: str = "documents") -> str:
    w = "OVER (PARTITION BY doc_id, role ORDER BY page_num)"
    return f"""WITH clf AS ({classify_sql(d, docs)}),
ti_lag AS (
  SELECT doc_id, role, page_num, doc_type,
         lag(doc_type) {w} AS pv_type
  FROM clf
),
ti_brk AS (
  SELECT *, CASE WHEN {nullsafe_eq('doc_type', 'pv_type', d)} THEN 0 ELSE 1 END AS brk
  FROM ti_lag
),
ti_isl AS (
  SELECT *, sum(brk) OVER (PARTITION BY doc_id, role ORDER BY page_num
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM ti_brk
)
SELECT doc_id, role, CAST(island AS BIGINT) AS island,
       min(doc_type) AS doc_type,
       min(page_num) AS p_lo, max(page_num) AS p_hi,
       CAST(count(*) AS BIGINT) AS n_pages
FROM ti_isl GROUP BY doc_id, role, island"""


def page_top_keywords_sql(d: str, docs: str = "documents", k: int = 3) -> str:
    tok = split_rx("lower(text)", "[^a-z0-9]+", d)
    return f"""WITH {P.pages_cte(d, docs)},
pk_tok AS (
  SELECT doc_id, role, page_num, {explode(tok, 'token', d)} FROM pages
),
pk_f AS (
  SELECT * FROM pk_tok
  WHERE length(token) >= 2 AND NOT {G.rlike('token', '^[0-9]+$', d)}
),
pk_counts AS (
  SELECT doc_id, role, page_num, token, CAST(count(*) AS BIGINT) AS n
  FROM pk_f GROUP BY doc_id, role, page_num, token
),
pk_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, role, page_num
                               ORDER BY n DESC, token ASC) AS rank
  FROM pk_counts
)
SELECT doc_id, role, page_num, CAST(rank AS BIGINT) AS rank, token, n
FROM pk_ranked WHERE rank <= {k}"""


def _project_dims_sql() -> tuple[str, str]:
    from .operators.project import PROJECT_KEYWORDS, _source_rules

    src = ", ".join(
        f"({i}, '{p}', '{s}', {'TRUE' if w else 'FALSE'}, '{re}')"
        for i, p, s, w, re in _source_rules()
    )
    kw = ", ".join(f"('{p}', '{k}')" for p, k in PROJECT_KEYWORDS)
    return (
        f"(VALUES {src}) AS sd(rule_id, project, source_pat, is_wild, pat_re)",
        f"(VALUES {kw}) AS kd(project, keyword)",
    )


def project_detect_sql(d: str, docs: str = "documents") -> str:
    src_dim, kw_dim = _project_dims_sql()
    occ = P.idiv(
        "(length(t.text) - length(replace(t.text, kd.keyword, '')))",
        "length(kd.keyword)",
        d,
    )
    wild_match = (
        "dd.source RLIKE sd.pat_re"
        if d == SPARK
        else "regexp_matches(dd.source, sd.pat_re)"
    )
    return f"""WITH pd_pathm AS (
  SELECT dd.doc_id, sd.project,
         row_number() OVER (PARTITION BY dd.doc_id ORDER BY sd.rule_id) AS prn
  FROM {docs} dd JOIN {src_dim}
    ON (NOT sd.is_wild AND dd.source = sd.source_pat)
    OR (sd.is_wild AND {wild_match})
),
pd_path AS (
  SELECT doc_id, project AS p_path FROM pd_pathm WHERE prn = 1
),
pd_hits AS (
  SELECT t.doc_id, kd.project, sum(({occ}) * length(kd.keyword)) AS score
  FROM {docs} t JOIN {kw_dim} ON instr(t.text, kd.keyword) > 0
  GROUP BY t.doc_id, kd.project
),
pd_best AS (
  SELECT doc_id, project AS p_content, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, project ASC) AS rn
  FROM pd_hits
)
SELECT dd.doc_id,
       coalesce(pp.p_path, pb.p_content, '未分类') AS project,
       CASE WHEN pp.p_path IS NOT NULL THEN 'path'
            WHEN pb.p_content IS NOT NULL THEN 'content'
            ELSE 'none' END AS match_type,
       CAST(coalesce(pb.score, 0) AS BIGINT) AS content_score
FROM {docs} dd
LEFT JOIN pd_path pp ON dd.doc_id = pp.doc_id
LEFT JOIN (SELECT * FROM pd_best WHERE rn = 1) pb ON dd.doc_id = pb.doc_id"""


def ivf_assign_sql(d: str, n_centroids: int = 16) -> str:
    return f"""WITH iv_c AS (
  SELECT vec_id AS centroid_id, embedding AS cv,
         {_dot_sql('embedding', 'embedding', d)} AS c_nsq
  FROM embeddings WHERE vec_id < {n_centroids}
),
iv_v AS (
  SELECT vec_id, embedding, {_dot_sql('embedding', 'embedding', d)} AS v_nsq
  FROM embeddings
),
iv_p AS (
  SELECT vec_id, centroid_id,
         CAST(v_nsq AS DOUBLE) - 2.0 * CAST({_dot_sql('embedding', 'cv', d)} AS DOUBLE)
           + CAST(c_nsq AS DOUBLE) AS dist
  FROM iv_v CROSS JOIN iv_c
),
iv_r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY dist ASC, centroid_id ASC) AS rn
  FROM iv_p
)
SELECT vec_id, centroid_id, dist FROM iv_r WHERE rn = 1"""


def _ordered_fold(val: str, order: str, d: str) -> str:
    """Sum of grouped double values folded in a FIXED order (the
    kmeans/pq cross-engine exactness pattern): collect in ``order``,
    left-fold with a 0.0 seed."""
    if d == SPARK:
        arr = (
            f"transform(array_sort(collect_list(named_struct("
            f"'o', {order}, 'x', {val}))), s -> s.x)"
        )
    else:
        arr = f"list({val} ORDER BY {order} ASC)"
    return _fold_double(arr, d)


def _pos_table(dim: int, d: str) -> str:
    """A (pos) table of [0, dim) for per-dimension explosion."""
    if d == SPARK:
        return f"(SELECT explode(sequence(0, {dim - 1})) AS pos)"
    return f"(SELECT unnest(range({dim})) AS pos)"


def _kmeans_cte_chain(
    d: str, k: int, iters: int, dim: int
) -> tuple[str, str]:
    """The unrolled-Lloyd CTE chain shared by kmeans_fit_sql (flattened
    rows) and the fitted-centroid search oracles. Returns (ctes_sql,
    final_cte_name); the final CTE holds (centroid_id, cv DOUBLE[])."""
    dcast = G.ltransform("embedding", "x -> CAST(x AS DOUBLE)", d)
    mean = (
        f"{_ordered_fold(_elem('v.v', 'p.pos', d), 'v.vec_id', d)}"
        f" / CAST(count(*) AS DOUBLE)"
    )
    cv_list = (
        "transform(array_sort(collect_list(named_struct('o', pos, 'x', val))), s -> s.x)"
        if d == SPARK
        else "list(val ORDER BY pos ASC)"
    )
    ctes = [
        f"km_v AS (SELECT vec_id, {dcast} AS v FROM embeddings)",
        f"""km_c0 AS (
  SELECT vec_id AS centroid_id, {dcast} AS cv
  FROM embeddings WHERE vec_id < {k}
)""",
    ]
    for i in range(1, iters + 1):
        prev = f"km_c{i - 1}"
        sqd = _pq_sqdist("v.v", "c.cv", d, dim)
        ctes.append(f"""km_a{i} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id ORDER BY {sqd} ASC, c.centroid_id ASC
           ) AS rn
    FROM km_v v CROSS JOIN {prev} c
  ) WHERE rn = 1
)""")
        ctes.append(f"""km_m{i} AS (
  SELECT a.centroid_id, p.pos, {mean} AS val
  FROM km_a{i} a
  JOIN km_v v ON a.vec_id = v.vec_id
  CROSS JOIN {_pos_table(dim, d)} p
  GROUP BY a.centroid_id, p.pos
)""")
        ctes.append(f"""km_c{i} AS (
  SELECT c.centroid_id, coalesce(m.cv, c.cv) AS cv
  FROM {prev} c LEFT JOIN (
    SELECT centroid_id, {cv_list} AS cv FROM km_m{i} GROUP BY centroid_id
  ) m ON c.centroid_id = m.centroid_id
)""")
    return ",\n".join(ctes), f"km_c{iters}"


def kmeans_fit_sql(d: str, k: int | None = None, iters: int | None = None,
                   dim: int = 64) -> str:
    """Mirror of similarity_search.kmeans_centroid_rows: ``iters``
    unrolled Lloyd iterations, each an assign CTE (squared-L2 argmin,
    ties to the smaller centroid_id) + an update CTE (per-(centroid,
    dim) mean whose sum folds member values in vec_id order) + an
    empty-cluster coalesce; init = first-k vectors cast to double.
    Output: (centroid_id, pos, val) rows of the final centroids."""
    from .operators.similarity_search import IVF_N_CENTROIDS, KMEANS_ITERS

    k = IVF_N_CENTROIDS if k is None else k
    iters = KMEANS_ITERS if iters is None else iters
    body, final = _kmeans_cte_chain(d, k, iters, dim)
    return f"""WITH {body}
SELECT c.centroid_id, CAST(p.pos AS BIGINT) AS pos,
       {_elem('c.cv', 'p.pos', d)} AS val
FROM {final} c CROSS JOIN {_pos_table(dim, d)} p"""


def _pq_fit_cte_chain(d: str, k: int, iters: int) -> tuple[str, str]:
    """The grouped (grp = sub_id) Lloyd CTE chain shared by pq_fit_sql
    and the fitted-codebook search oracle. Returns (ctes_sql,
    final_cte_name); the final CTE holds (grp, centroid_id, cv)."""
    from .operators.similarity_search import PQ_M, PQ_SUB_DIM

    dim = PQ_SUB_DIM
    subs = "\n  UNION ALL\n".join(
        f"  SELECT {i} AS grp, vec_id,"
        f" {G.ltransform(_arr_slice('embedding', i * dim + 1, dim, d), 'x -> CAST(x AS DOUBLE)', d)} AS v"
        f" FROM embeddings"
        for i in range(PQ_M)
    )
    mean = (
        f"{_ordered_fold(_elem('v.v', 'p.pos', d), 'v.vec_id', d)}"
        f" / CAST(count(*) AS DOUBLE)"
    )
    cv_list = (
        "transform(array_sort(collect_list(named_struct('o', pos, 'x', val))), s -> s.x)"
        if d == SPARK
        else "list(val ORDER BY pos ASC)"
    )
    ctes = [
        f"km_v AS (\n{subs}\n)",
        f"""km_c0 AS (
  SELECT grp, vec_id AS centroid_id, v AS cv FROM km_v WHERE vec_id < {k}
)""",
    ]
    for i in range(1, iters + 1):
        prev = f"km_c{i - 1}"
        sqd = _pq_sqdist("v.v", "c.cv", d, dim)
        ctes.append(f"""km_a{i} AS (
  SELECT grp, vec_id, centroid_id FROM (
    SELECT v.grp, v.vec_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY v.grp, v.vec_id
             ORDER BY {sqd} ASC, c.centroid_id ASC
           ) AS rn
    FROM km_v v JOIN {prev} c ON v.grp = c.grp
  ) WHERE rn = 1
)""")
        ctes.append(f"""km_m{i} AS (
  SELECT a.grp, a.centroid_id, p.pos, {mean} AS val
  FROM km_a{i} a
  JOIN km_v v ON a.grp = v.grp AND a.vec_id = v.vec_id
  CROSS JOIN {_pos_table(dim, d)} p
  GROUP BY a.grp, a.centroid_id, p.pos
)""")
        ctes.append(f"""km_c{i} AS (
  SELECT c.grp, c.centroid_id, coalesce(m.cv, c.cv) AS cv
  FROM {prev} c LEFT JOIN (
    SELECT grp, centroid_id, {cv_list} AS cv
    FROM km_m{i} GROUP BY grp, centroid_id
  ) m ON c.grp = m.grp AND c.centroid_id = m.centroid_id
)""")
    return ",\n".join(ctes), f"km_c{iters}"


def pq_fit_sql(d: str, k: int | None = None, iters: int | None = None) -> str:
    """Mirror of similarity_search.pq_fit_rows: the GROUPED Lloyd
    unroll (grp = sub_id — every PQ subspace fits its own codewords in
    the same dataflow), same determinism contract as kmeans_fit_sql;
    init = the pq_codebook stand-in (m-th subvectors of the first k
    vectors). Output: (sub_id, code_id, pos, val)."""
    from .operators.similarity_search import KMEANS_ITERS, PQ_K, PQ_SUB_DIM

    k = PQ_K if k is None else k
    iters = KMEANS_ITERS if iters is None else iters
    body, final = _pq_fit_cte_chain(d, k, iters)
    return f"""WITH {body}
SELECT c.grp AS sub_id, c.centroid_id AS code_id,
       CAST(p.pos AS BIGINT) AS pos, {_elem('c.cv', 'p.pos', d)} AS val
FROM {final} c CROSS JOIN {_pos_table(PQ_SUB_DIM, d)} p"""


def emb_near_dups_sql(d: str, threshold: float = 0.35, n_limit: int = 500) -> str:
    return f"""WITH en_n AS (
  SELECT vec_id, embedding, {_dot_sql('embedding', 'embedding', d)} AS nsq
  FROM embeddings WHERE vec_id < {n_limit}
),
en_a AS (SELECT vec_id AS a, embedding AS av, nsq AS a_nsq FROM en_n),
en_b AS (SELECT vec_id AS b, embedding AS bv, nsq AS b_nsq FROM en_n),
en_s AS (
  SELECT a, b,
         CAST({_dot_sql('av', 'bv', d)} AS DOUBLE)
           / (sqrt(CAST(a_nsq AS DOUBLE)) * sqrt(CAST(b_nsq AS DOUBLE))) AS sim
  FROM en_a CROSS JOIN en_b WHERE a < b
)
SELECT a, b, sim FROM en_s WHERE sim >= {threshold}"""


def lsh_near_dups_sql(
    d: str, threshold: float = 0.35, bits: int = 8, max_bucket: int = 256,
) -> str:
    sim = (
        f"CAST({_dot_sql('x.av', 'y.bv', d)} AS DOUBLE)"
        f" / (sqrt(CAST(x.a_nsq AS DOUBLE)) * sqrt(CAST(y.b_nsq AS DOUBLE)))"
    )
    return f"""WITH ld_b AS ({lsh_bucket_sql(d, bits=bits)}),
ld_small AS (
  SELECT bucket FROM ld_b GROUP BY bucket HAVING count(*) <= {max_bucket}
),
ld_bs AS (
  SELECT b.* FROM ld_b b JOIN ld_small s ON b.bucket = s.bucket
),
ld_n AS (
  SELECT vec_id, embedding, {_dot_sql('embedding', 'embedding', d)} AS nsq
  FROM embeddings
),
ld_x AS (
  SELECT b.vec_id AS a, b.bucket, n.embedding AS av, n.nsq AS a_nsq
  FROM ld_bs b JOIN ld_n n ON b.vec_id = n.vec_id
),
ld_y AS (
  SELECT b.vec_id AS b, b.bucket, n.embedding AS bv, n.nsq AS b_nsq
  FROM ld_bs b JOIN ld_n n ON b.vec_id = n.vec_id
),
ld_s AS (
  SELECT x.a, y.b, {sim} AS sim
  FROM ld_x x JOIN ld_y y ON x.bucket = y.bucket AND x.a < y.b
)
SELECT a, b, sim FROM ld_s WHERE sim >= {threshold}"""


def events_window_sql(d: str, width_sec: int = 300) -> str:
    epoch = (
        "unix_timestamp(ts)" if d == SPARK else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    win = P.idiv(f"({epoch})", str(width_sec), d)
    return f"""SELECT {win} * {width_sec} AS w_start, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2"""


def source_rollup_sql(d: str, docs: str = "documents") -> str:
    return f"""WITH ext AS ({G.extraction_sql(d, docs)}),
sr_doc AS (
  SELECT doc_id, count(*) AS n_spans,
         count(*) FILTER (WHERE kind = 'media') AS n_media
  FROM ext GROUP BY doc_id
)
SELECT dd.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(sd.n_spans), 0) AS BIGINT) AS total_spans,
       CAST(coalesce(sum(sd.n_media), 0) AS BIGINT) AS total_media,
       CAST(sum(CAST(dd.n_chars AS DECIMAL(28,6))) AS DOUBLE) AS total_chars
FROM {docs} dd LEFT JOIN sr_doc sd ON dd.doc_id = sd.doc_id
GROUP BY dd.source"""


def name_conflict_sql(d: str, docs: str = "documents") -> str:
    """W7: per-name collision counter → suffixed unique names."""
    base = "lower(substr(text, 1, 12))"
    return f"""WITH nc AS (
  SELECT doc_id, {base} AS base_name,
         row_number() OVER (PARTITION BY {base} ORDER BY doc_id) AS seq
  FROM {docs}
)
SELECT doc_id, base_name,
       CASE WHEN seq = 1 THEN base_name
            ELSE base_name || '_' || {G.cast_str('seq - 1', d)} END AS unique_name,
       CAST(seq AS BIGINT) AS seq
FROM nc"""


EVENT_TYPES = ["click", "view", "purchase", "error", "signup"]


def events_pivot_sql(d: str) -> str:
    """Pivot event_type → columns, rendered as portable CASE aggregates
    (identical semantics to Spark's pivot())."""
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""SELECT user_id,
       {cols}
FROM events GROUP BY user_id"""


def _ntz_epoch_sql(col: str, d: str) -> str:
    return (
        f"unix_timestamp({col})"
        if d == SPARK
        else f"CAST(floor(epoch({col})) AS BIGINT)"
    )


_REV_DEC = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def shipping_priority_sql(d: str) -> str:
    """Mirror of reports.shipping_priority (TPC-H Q3 shape): filtered
    dims, exact-decimal revenue, top-k by (revenue desc, epoch,
    orderkey)."""
    from .operators.reports import Q3_CUTOFF_EPOCH, Q3_SEGMENT, Q3_TOPK

    return f"""WITH q3_c AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{Q3_SEGMENT}'
),
q3_o AS (
  SELECT o_orderkey, o_custkey,
         {_ntz_epoch_sql('o_orderdate', d)} AS o_epoch, o_orderpriority
  FROM orders
  WHERE {_ntz_epoch_sql('o_orderdate', d)} < {Q3_CUTOFF_EPOCH}
),
q3_l AS (
  SELECT l_orderkey, {_REV_DEC} AS rev
  FROM lineitem WHERE {_ntz_epoch_sql('l_shipdate', d)} > {Q3_CUTOFF_EPOCH}
),
q3_a AS (
  SELECT l.l_orderkey, o.o_epoch, o.o_orderpriority,
         CAST(sum(l.rev) AS DOUBLE) AS revenue,
         CAST(count(*) AS BIGINT) AS n_items
  FROM q3_l l
  JOIN q3_o o ON l.l_orderkey = o.o_orderkey
  JOIN q3_c c ON o.o_custkey = c.c_custkey
  GROUP BY l.l_orderkey, o.o_epoch, o.o_orderpriority
)
SELECT CAST(rank AS BIGINT) AS rank, l_orderkey AS order_key, revenue,
       CAST(o_epoch AS BIGINT) AS order_epoch,
       o_orderpriority AS priority, n_items
FROM (
  SELECT *, row_number() OVER (
    ORDER BY revenue DESC, o_epoch ASC, l_orderkey ASC
  ) AS rank FROM q3_a
) WHERE rank <= {Q3_TOPK}"""


def promo_revenue_sql(d: str) -> str:
    """Mirror of reports.promo_revenue (TPC-H Q14 shape): promo-part
    revenue share of one ship-year; exact-decimal sums, one double
    division."""
    from .operators.reports import Q14_PROMO_TYPE

    promo = (
        f"CAST(sum(CASE WHEN p_type = '{Q14_PROMO_TYPE}' THEN rev END)"
        f" AS DOUBLE)"
    )
    total = "CAST(sum(rev) AS DOUBLE)"
    return f"""WITH q14_l AS (
  SELECT l_partkey, {_REV_DEC} AS rev
  FROM lineitem
  WHERE {_ntz_epoch_sql('l_shipdate', d)} >= 820454400
    AND {_ntz_epoch_sql('l_shipdate', d)} < 852076800
)
SELECT {promo} AS promo_rev,
       {total} AS total_rev,
       {promo} / {total} AS promo_share,
       CAST(count(*) AS BIGINT) AS n_items
FROM q14_l l JOIN part p ON l.l_partkey = p.p_partkey"""


def region_revenue_sql(d: str) -> str:
    """Mirror of reports.region_revenue (TPC-H Q5 shape): one region,
    one order-year, supplier-nation == customer-nation locality."""
    from .operators.reports import Q5_FROM_EPOCH, Q5_REGION, Q5_TO_EPOCH

    return f"""WITH q5_n AS (
  SELECT n_nationkey, n_name FROM nation n
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{Q5_REGION}'
),
q5_s AS (
  SELECT s_suppkey, s_nationkey, n_name FROM supplier s
  JOIN q5_n n ON s.s_nationkey = n.n_nationkey
),
q5_o AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE {_ntz_epoch_sql('o_orderdate', d)} >= {Q5_FROM_EPOCH}
    AND {_ntz_epoch_sql('o_orderdate', d)} < {Q5_TO_EPOCH}
),
q5_oc AS (
  SELECT o.o_orderkey, c.c_nationkey FROM q5_o o
  JOIN customer c ON o.o_custkey = c.c_custkey
),
q5_j AS (
  SELECT s.n_name, {_REV_DEC} AS rev
  FROM lineitem l
  JOIN q5_oc oc ON l.l_orderkey = oc.o_orderkey
  JOIN q5_s s ON l.l_suppkey = s.s_suppkey
  WHERE oc.c_nationkey = s.s_nationkey
)
SELECT n_name AS nation, CAST(sum(rev) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM q5_j GROUP BY n_name"""


def active_users_sql(d: str) -> str:
    """Mirror of operators.reports.active_users: distinct (user, day)
    → constant-7 window-end explode → rolling distinct actives,
    stickiness = dau/wau."""
    from .operators.reports import WAU_DAYS

    epoch = (
        "unix_timestamp(ts)" if d == SPARK else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    day = P.idiv(f"({epoch})", "86400", d)
    if d == SPARK:
        ends = "explode(sequence(day, day + {0})) AS wday".format(WAU_DAYS - 1)
        ends_sel = f"SELECT user_id, {ends} FROM au_d"
    else:
        ends_sel = (
            f"SELECT user_id, day + unnest(range({WAU_DAYS})) AS wday FROM au_d"
        )
    return f"""WITH au_d AS (
  SELECT DISTINCT user_id, CAST({day} AS BIGINT) AS day FROM events
),
au_dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM au_d GROUP BY day
),
au_w AS (
  SELECT DISTINCT user_id, wday FROM ({ends_sel})
),
au_wau AS (
  SELECT wday AS day, CAST(count(*) AS BIGINT) AS wau
  FROM au_w GROUP BY wday
)
SELECT a.day, a.dau, w.wau,
       CAST(a.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
FROM au_dau a JOIN au_wau w ON a.day = w.day"""


def rate_outliers_sql(d: str) -> str:
    """Mirror of operators.reports.rate_outliers: per-user counts,
    population mean/std from exact DECIMAL(38,0) sums, mean + 3σ
    flag — the identical IEEE op chain on both sides."""
    from .operators.reports import RATE_SIGMA

    mean = "(s1 / CAST(n_users AS DOUBLE))"
    std = f"sqrt(s2 / CAST(n_users AS DOUBLE) - {mean} * {mean})"
    return f"""WITH ro_p AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id
),
ro_t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CAST(n AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         CAST(sum(CAST(n * n AS DECIMAL(38,0))) AS DOUBLE) AS s2
  FROM ro_p
)
SELECT p.user_id, p.n,
       {mean} AS mean_n,
       {std} AS std_n,
       CAST(p.n AS DOUBLE) > {mean} + {RATE_SIGMA} * {std} AS outlier
FROM ro_p p CROSS JOIN ro_t"""


def event_transitions_sql(d: str) -> str:
    """Mirror of operators.reports.event_transitions: per-user lead()
    (epoch, event_id order), '<end>' terminal, (from,to) counts and
    int/int transition probability."""
    from .operators.reports import TRANSITION_END

    epoch = (
        "unix_timestamp(ts)" if d == SPARK else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    end = G.lit(TRANSITION_END, d)
    return f"""WITH et_e AS (
  SELECT user_id, event_id, event_type, {epoch} AS epoch FROM events
),
et_t AS (
  SELECT event_type AS from_type,
         COALESCE(lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch, event_id
         ), {end}) AS to_type
  FROM et_e
),
et_n AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM et_t GROUP BY from_type, to_type
),
et_f AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
  FROM et_n GROUP BY from_type
)
SELECT n.from_type, n.to_type, n.n, f.n_from,
       CAST(n.n AS DOUBLE) / CAST(f.n_from AS DOUBLE) AS p
FROM et_n n JOIN et_f f ON n.from_type = f.from_type"""


def dsir_sample_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.dsir_sample: DSIR weights nested
    as a CTE, keep rate = min(1, avg_lr/SCALE), md5-bucket threshold
    verdict (the mixture_sample recipe)."""
    from .operators.pipeline import _SAMPLE_RES
    from .operators.textstats import DSIR_SAMPLE_SCALE

    h = f"({G.hexint(G.cast_str('doc_id', d), d)}) % {_SAMPLE_RES}"
    return f"""WITH dsw AS ({dsir_weights_sql(d, docs)}),
dss AS (
  SELECT doc_id, n_feat, avg_lr,
         coalesce(least(CAST(1.0 AS DOUBLE),
                        avg_lr / {DSIR_SAMPLE_SCALE}),
                  CAST(0.0 AS DOUBLE)) AS keep_rate
  FROM dsw
)
SELECT doc_id, n_feat, avg_lr, keep_rate,
       CAST(({h}) AS DOUBLE) < keep_rate * {_SAMPLE_RES} AS sampled
FROM dss"""


def props_rollup_sql(d: str, band_width: int = 10) -> str:
    """Mirror of operators.reports.props_rollup: JSON $.k extraction
    (dialect helper), fixed-width integer banding, decimal-exact value
    sums per (event_type, k_band)."""
    k = f"CAST({G.json_str('props', '$.k', d)} AS BIGINT)"
    band = P.idiv(f"({k})", str(band_width), d)
    return f"""WITH pr_e AS (
  SELECT event_type, user_id, CAST({band} AS BIGINT) AS k_band,
         CAST(value AS DECIMAL(28,6)) AS value_dec
  FROM events
)
SELECT event_type, k_band,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(value_dec) AS DOUBLE) AS sum_value,
       CAST(sum(value_dec) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_value
FROM pr_e GROUP BY event_type, k_band"""


# ------------------------------------------------------------- textstats
def _lang_dim_values(alias: str = "ld") -> str:
    from .operators.textstats import LANG_STOPWORDS

    rows = ", ".join(f"('{lang}', '{sw}')" for lang, sw in LANG_STOPWORDS)
    return f"(VALUES {rows}) AS {alias}(lang, stopword)"


def lang_id_sql(d: str, docs: str = "documents") -> str:
    return f"""WITH {_tok_cte(d, docs)},
li_tok AS (SELECT doc_id, {explode('toks', 'token', d)} FROM dd_tok),
li_hits AS (
  SELECT t.doc_id, ld.lang, count(*) AS n_hits
  FROM li_tok t JOIN {_lang_dim_values()} ON t.token = ld.stopword
  GROUP BY t.doc_id, ld.lang
),
li_best AS (
  SELECT doc_id, lang, n_hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, lang ASC) AS rn
  FROM li_hits
)
SELECT dd.doc_id,
       coalesce(b.lang, 'und') AS pred_lang,
       CAST(coalesce(b.n_hits, 0) AS BIGINT) AS n_hits
FROM {docs} dd LEFT JOIN (SELECT * FROM li_best WHERE rn = 1) b
  ON dd.doc_id = b.doc_id"""


def text_quality_sql(d: str, docs: str = "documents") -> str:
    from .operators.textstats import QUALITY_STOPWORDS

    toks = _lfilter(split_rx("lower(text)", "[^a-z0-9]+", d), "t -> length(t) >= 2", d)
    stop_in = " OR ".join(f"t = '{s}'" for s in QUALITY_STOPWORDS)
    n_alnum = f"length({G.replace_all('lower(text)', '[^a-z0-9 ]', '', d)})"
    n_digits = f"length({G.replace_all('text', '[^0-9]', '', d)})"
    return f"""WITH tq AS (
  SELECT doc_id, text, length(text) AS n_chars,
         {_arr_size(toks, d)} AS n_tokens,
         {_arr_size(_lfilter(toks, f't -> {stop_in}', d), d)} AS n_stop,
         {n_alnum} AS n_alnum, {n_digits} AS n_digits
  FROM {docs}
),
tq2 AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) AS n_chars,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(n_chars - n_alnum AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS punct_ratio,
         CAST(n_digits AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS digit_ratio,
         CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stop_ratio
  FROM tq
)
SELECT *,
       CASE WHEN n_tokens >= 20 AND punct_ratio < 0.1 AND stop_ratio >= 0.05 THEN 'high'
            WHEN n_tokens >= 5 THEN 'medium'
            ELSE 'low' END AS quality
FROM tq2"""


def text_repetition_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.text_repetition (Gopher-style
    repetition signals): positional 2/3-grams by index transform,
    top-gram selection via the lpad(10^7 − count)||gram encode (count
    desc, gram asc — the same order as the operator's struct
    array_min), int/int divisions throughout."""
    n = _arr_size("toks", d)

    def grams(k: int) -> str:
        if d == SPARK:
            rng, empty = f"sequence(0, {n} - {k})", "CAST(array() AS ARRAY<STRING>)"
        else:
            rng, empty = f"range(({n}) - {k - 1})", "CAST([] AS VARCHAR[])"
        parts = " || ' ' || ".join(_elem("toks", f"i + {j}", d) for j in range(k))
        arr = G.ltransform(rng, f"i -> {parts}", d)
        return f"CASE WHEN {n} < {k} THEN {empty} ELSE {arr} END"

    if d == SPARK:
        total = "aggregate(toks, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
    else:
        total = "coalesce(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))), 0)"

    def top_frac(col: str, nsep: int) -> str:
        u = P._arr_distinct(col, d)
        cntw = _arr_size(_lfilter(col, "x -> x = w", d), d)
        enc = G.ltransform(
            u, f"w -> lpad({G.cast_str(f'10000000 - {cntw}', d)}, 8, '0') || w", d
        )
        top = _arr_min(enc, d)
        cnt = f"(10000000 - CAST(substr({top}, 1, 8) AS BIGINT))"
        chars = f"CAST(length(substr({top}, 9)) - {nsep} AS BIGINT)"
        return (
            f"CASE WHEN {_arr_size(col, d)} = 0 THEN CAST(0.0 AS DOUBLE)\n"
            f"            ELSE CAST({cnt} * {chars} AS DOUBLE)"
            f" / CAST(total_chars AS DOUBLE) END"
        )

    n3, d3 = _arr_size("g3", d), _arr_size(P._arr_distinct("g3", d), d)
    dup3 = (
        f"CASE WHEN {n3} = 0 THEN CAST(0.0 AS DOUBLE)\n"
        f"            ELSE CAST({n3} - {d3} AS DOUBLE) / CAST({n3} AS DOUBLE) END"
    )
    return f"""WITH {_tok_cte(d, docs)},
tr_g AS (
  SELECT doc_id, toks, {grams(2)} AS g2, {grams(3)} AS g3,
         {total} AS total_chars
  FROM dd_tok
)
SELECT doc_id,
       CAST({n} AS BIGINT) AS n_tokens,
       {top_frac('toks', 0)} AS top_1gram_char_frac,
       {top_frac('g2', 1)} AS top_2gram_char_frac,
       {dup3} AS dup_3gram_frac
FROM tr_g"""


def token_counts_sql(d: str, docs: str = "documents") -> str:
    ws = _lfilter(split_rx("text", r"[ \t\n\x0B\f\r]+", d), "t -> t <> ''", d)
    bpe = P.idiv("(length(text) + 3)", "4", d)
    return f"""SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST({_arr_size(ws, d)} AS BIGINT) AS n_ws_tokens,
       CAST({bpe} AS BIGINT) AS n_bpe_est
FROM {docs}"""


def hash_embed_sql(d: str, dim: int = 16, docs: str = "documents") -> str:
    """Mirror of textstats.hash_embed: token → 48-bit hash → (bucket,
    ±1 sign) → per-doc signed bucket sums (zero buckets dropped) →
    L2-normalized weight. Norm/weight are the identical double ops on
    both sides (sqrt + one division of exact BIGINTs)."""
    h = G.hexint48("tok", d)
    sign_div = P.idiv("h", str(dim), d)
    return f"""WITH {_tok_cte(d, docs)},
he_t AS (SELECT doc_id, {explode('toks', 'tok', d)} FROM dd_tok),
he_h AS (SELECT doc_id, {h} AS h FROM he_t),
he_r AS (
  SELECT doc_id, CAST(h % {dim} AS BIGINT) AS dim,
         CASE WHEN ({sign_div}) % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM he_h
),
he_v AS (
  SELECT doc_id, dim, CAST(sum(sign) AS BIGINT) AS val
  FROM he_r GROUP BY doc_id, dim HAVING CAST(sum(sign) AS BIGINT) <> 0
),
he_n AS (
  SELECT doc_id, sqrt(CAST(sum(val * val) AS DOUBLE)) AS norm
  FROM he_v GROUP BY doc_id
)
SELECT v.doc_id, v.dim, v.val, CAST(v.val AS DOUBLE) / n.norm AS weight
FROM he_v v JOIN he_n n ON v.doc_id = n.doc_id"""


def token_coverage_sql(d: str, docs: str = "documents") -> str:
    """Mirror of textstats.token_coverage: token frequencies, rank by
    (cnt desc, token asc), coverage of the top-N vocabulary at each
    checkpoint size. The operator's TakeOrdered-limit + tiny window
    equals the full-rank window stated here (only ranks ≤ max(N)
    contribute to any checkpoint)."""
    from .operators.textstats import VOCAB_COVERAGE_SIZES

    sizes = ", ".join(f"({int(s)})" for s in sorted(VOCAB_COVERAGE_SIZES))
    return f"""WITH {_tok_cte(d, docs)},
tc_tok AS (SELECT {explode('toks', 'token', d)} FROM dd_tok),
tc_f AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tc_tok GROUP BY token
),
tc_total AS (
  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS total_tokens FROM tc_f
),
tc_rk AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rk
  FROM tc_f
),
tc_sizes(vocab_size) AS (VALUES {sizes}),
tc_cov AS (
  SELECT CAST(s.vocab_size AS BIGINT) AS vocab_size,
         CAST(coalesce(sum(r.cnt), 0) AS BIGINT) AS covered_tokens
  FROM tc_sizes s LEFT JOIN tc_rk r ON r.rk <= s.vocab_size
  GROUP BY s.vocab_size
)
SELECT c.vocab_size, c.covered_tokens, t.total_tokens,
       CASE WHEN t.total_tokens > 0
            THEN CAST(c.covered_tokens AS DOUBLE)
                 / CAST(t.total_tokens AS DOUBLE)
       END AS coverage_frac
FROM tc_cov c, tc_total t"""


def data_split_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.data_split: bucket = hexint(md5(id))
    mod SPLIT_BUCKETS (nonnegative, so % ≡ pmod in both engines)."""
    from .operators.pipeline import SPLIT_BUCKETS, SPLIT_TRAIN, SPLIT_VALID

    h = G.hexint(G.cast_str("doc_id", d), d)
    return f"""WITH ds AS (
  SELECT doc_id, source, ({h}) % {SPLIT_BUCKETS} AS bucket FROM {docs}
)
SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket,
       CASE WHEN bucket < {SPLIT_TRAIN} THEN 'train'
            WHEN bucket < {SPLIT_VALID} THEN 'valid'
            ELSE 'test' END AS split
FROM ds"""


def split_summary_sql(d: str, docs: str = "documents") -> str:
    return f"""SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
FROM ({data_split_sql(d, docs)}) GROUP BY source, split"""


def source_cap_sample_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.source_cap_sample; the operator's
    two-phase salted ranking is semantically a single per-source
    row_number by (md5(id), id) — the oracle states it directly."""
    from .operators.pipeline import SOURCE_CAP

    h = f"md5({G.cast_str('doc_id', d)})"
    return f"""WITH scs AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source ORDER BY {h} ASC, doc_id ASC
         ) AS rk
  FROM {docs}
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM scs WHERE rk <= {SOURCE_CAP}"""


def mixture_weights_sql(d: str, docs: str = "documents") -> str:
    frac = "CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)"
    return f"""WITH mw AS (SELECT source, count(*) AS n_docs FROM {docs} GROUP BY source),
mt AS (SELECT count(*) AS n_total FROM {docs})
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       {frac} AS corpus_frac,
       1.0 / sqrt({frac}) AS weight_rel
FROM mw, mt"""


def doc_chunks_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.doc_chunks: positional explode of
    the shared tokenizer, chunk_idx = pos0 // chunk, ordered per-chunk
    reassembly."""
    from .operators.pipeline import CHUNK_TOKENS

    if d == SPARK:
        pos_rows = "posexplode(toks) AS (pos, tok)"
        agg = "array_join(transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok), ' ')"
    else:
        # parallel unnests zip (Postgres semantics); subscripts are 1-based
        pos_rows = (
            "generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS tok"
        )
        agg = "string_agg(tok, ' ' ORDER BY pos ASC)"
    return f"""WITH {_tok_cte(d, docs)},
dc_p AS (
  SELECT doc_id, {pos_rows} FROM dd_tok
)
SELECT doc_id,
       CAST({P.idiv('pos', str(CHUNK_TOKENS), d)} AS BIGINT) AS chunk_idx,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {agg} AS chunk_text
FROM dc_p
GROUP BY doc_id, {P.idiv('pos', str(CHUNK_TOKENS), d)}"""


def corpus_diff_sql(d: str, docs: str = "documents") -> str:
    """Mirror of the corpus_diff query: old = buckets 1-9 unmodified,
    new = buckets 0-8 with bucket-1 texts revised — full-outer join on
    doc_id, status from hash comparison."""
    b = f"({G.hexint(G.cast_str('doc_id', d), d)}) % 10"
    cat = "concat(text, ' rev2')" if d == SPARK else "text || ' rev2'"
    h = lambda e: f"md5(lower({G.replace_all(e, chr(92) + 's+', '', d)}))"  # noqa: E731
    return f"""WITH cd_b AS (
  SELECT doc_id, text, {b} AS b FROM {docs}
),
cd_o AS (
  SELECT doc_id, {h('text')} AS old_hash FROM cd_b WHERE b <> 0
),
cd_n AS (
  SELECT doc_id,
         {h(f"CASE WHEN b = 1 THEN {cat} ELSE text END")} AS new_hash
  FROM cd_b WHERE b <> 9
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.old_hash, n.new_hash,
       CASE WHEN o.old_hash IS NULL THEN 'added'
            WHEN n.new_hash IS NULL THEN 'removed'
            WHEN o.old_hash <> n.new_hash THEN 'changed'
            ELSE 'unchanged' END AS status
FROM cd_o o FULL OUTER JOIN cd_n n ON o.doc_id = n.doc_id"""


def mixture_sample_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.mixture_sample: per-source
    keep-rate from the normalized √-share temperature mixture (Σ√n_s
    folded in source order for cross-engine exactness), applied as a
    deterministic md5-bucket threshold per doc."""
    from .operators.pipeline import _SAMPLE_RES, SAMPLE_TARGET

    fold = _ordered_fold("sqrt(CAST(n_src AS DOUBLE))", "source", d)
    h = f"({G.hexint(G.cast_str('dd.doc_id', d), d)}) % {_SAMPLE_RES}"
    rate = (
        f"least(CAST(1.0 AS DOUBLE),"
        f" sqrt(CAST(n_src AS DOUBLE)) / t.sum_sqrt"
        f" * CAST({SAMPLE_TARGET} AS DOUBLE) / CAST(n_src AS DOUBLE))"
    )
    return f"""WITH ms_p AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM {docs} GROUP BY source
),
ms_t AS (
  SELECT {fold} AS sum_sqrt FROM ms_p
),
ms_r AS (
  SELECT source, n_src, {rate} AS keep_rate
  FROM ms_p CROSS JOIN ms_t t
)
SELECT dd.doc_id, dd.source, r.n_src, r.keep_rate,
       CAST(({h}) AS DOUBLE) < r.keep_rate * {_SAMPLE_RES} AS sampled
FROM {docs} dd JOIN ms_r r ON dd.source = r.source"""


def mixture_schedule_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.mixture_schedule: annealed n^α
    shares via exact sqrt compositions, source-ordered normalizing
    fold, deterministic keep rates."""
    from .operators.pipeline import ANNEAL_ALPHAS, SAMPLE_TARGET

    alphas = ", ".join(f"({int(a)})" for a in ANNEAL_ALPHAS)
    nd = "CAST(n_src AS DOUBLE)"
    powered = f"""CASE alpha_pct
    WHEN 25 THEN sqrt(sqrt({nd}))
    WHEN 50 THEN sqrt({nd})
    WHEN 75 THEN sqrt({nd}) * sqrt(sqrt({nd}))
    ELSE {nd} END"""
    fold = _ordered_fold("p", "source", d)
    return f"""WITH msch_p AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_src
  FROM {docs} GROUP BY source
),
msch_a(alpha_pct) AS (VALUES {alphas}),
msch_r AS (
  SELECT CAST(alpha_pct AS BIGINT) AS alpha_pct, source, n_src,
         {powered} AS p
  FROM msch_p CROSS JOIN msch_a
),
msch_s AS (
  SELECT alpha_pct, {fold} AS p_sum FROM msch_r GROUP BY alpha_pct
)
SELECT r.alpha_pct, r.source, r.n_src,
       r.p / s.p_sum AS share,
       least(CAST(1.0 AS DOUBLE),
             r.p / s.p_sum * CAST({SAMPLE_TARGET} AS DOUBLE)
               / CAST(r.n_src AS DOUBLE)) AS keep_rate
FROM msch_r r JOIN msch_s s ON r.alpha_pct = s.alpha_pct"""


def corpus_stats_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.corpus_stats: the (source,
    pred_lang) dataset-card rollup over the composed admission verdict,
    language ID and whitespace token counts — each its own
    parity-green oracle, nested as CTEs."""
    return f"""WITH cs_v AS ({corpus_filter_sql(d, docs)}),
cs_l AS ({lang_id_sql(d, docs)}),
cs_t AS ({token_counts_sql(d, docs)})
SELECT dd.source, l.pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE v.keep) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN v.keep THEN t.n_ws_tokens ELSE 0 END), 0) AS BIGINT)
         AS kept_tokens
FROM {docs} dd
JOIN cs_v v ON dd.doc_id = v.doc_id
JOIN cs_l l ON dd.doc_id = l.doc_id
JOIN cs_t t ON dd.doc_id = t.doc_id
GROUP BY dd.source, l.pred_lang"""


def seq_packing_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.seq_packing; the operator's
    recursive bucketed prefix sum is semantically ONE global running
    sum over the tape order (hexint48(doc_id), doc_id) — the oracle
    states it directly. The window SUM is decimal-family in DuckDB
    (HUGEINT): cast before it leaves."""
    from .operators.pipeline import CTX_TOKENS

    off = (
        "coalesce(SUM(n_tokens) OVER (ORDER BY h, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    )
    return f"""WITH {_tok_cte(d, docs)},
sq_n AS (
  SELECT doc_id, CAST({_arr_size('toks', d)} AS BIGINT) AS n_tokens,
         {G.hexint48('doc_id', d)} AS h
  FROM dd_tok
),
sq_o AS (
  SELECT doc_id, n_tokens, CAST({off} AS BIGINT) AS tok_offset FROM sq_n
)
SELECT doc_id, n_tokens, tok_offset,
       CAST({P.idiv('tok_offset', str(CTX_TOKENS), d)} AS BIGINT) AS pack_id,
       CAST(tok_offset % {CTX_TOKENS} AS BIGINT) AS pack_offset
FROM sq_o"""


def pack_manifest_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.pack_manifest: a bounded groupBy
    over the seq_packing oracle."""
    from .operators.pipeline import CTX_TOKENS

    return f"""WITH pm AS ({seq_packing_sql(d, docs)})
SELECT pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(min(tok_offset) AS BIGINT) AS first_offset,
       sum(n_tokens) >= {CTX_TOKENS} AS fills_window
FROM pm GROUP BY pack_id"""


def _knn_pairs_ctes(d: str, bits: int, max_bucket: int) -> str:
    """Shared CTE chain of knn_join_sql / hard_negatives_sql: LSH
    bucket self-join candidate pairs (hot-bucket guarded) with exact
    cosine, ending in kj_s(vec_id, nbr_id, sim). Mirror of
    similarity_search._knn_pairs."""
    sim = (
        f"CAST({_dot_sql('x.xv', 'y.yv', d)} AS DOUBLE)"
        f" / (sqrt(CAST(x.x_nsq AS DOUBLE)) * sqrt(CAST(y.y_nsq AS DOUBLE)))"
    )
    return f"""kj_b AS ({lsh_bucket_sql(d, bits=bits)}),
kj_small AS (
  SELECT bucket FROM kj_b GROUP BY bucket HAVING count(*) <= {max_bucket}
),
kj_bs AS (
  SELECT b.* FROM kj_b b JOIN kj_small s ON b.bucket = s.bucket
),
kj_n AS (
  SELECT vec_id, embedding, {_dot_sql('embedding', 'embedding', d)} AS nsq
  FROM embeddings
),
kj_x AS (
  SELECT b.vec_id, b.bucket, n.embedding AS xv, n.nsq AS x_nsq
  FROM kj_bs b JOIN kj_n n ON b.vec_id = n.vec_id
),
kj_y AS (
  SELECT b.vec_id AS nbr_id, b.bucket, n.embedding AS yv, n.nsq AS y_nsq
  FROM kj_bs b JOIN kj_n n ON b.vec_id = n.vec_id
),
kj_s AS (
  SELECT x.vec_id, y.nbr_id, {sim} AS sim
  FROM kj_x x JOIN kj_y y ON x.bucket = y.bucket AND x.vec_id <> y.nbr_id
)"""


def knn_join_sql(
    d: str, k: int = 3, bits: int = 8, max_bucket: int = 256
) -> str:
    """Mirror of similarity_search.knn_join: LSH-bucket self-join
    candidates (hot-bucket guarded), exact cosine, per-vector top-k."""
    return f"""WITH {_knn_pairs_ctes(d, bits, max_bucket)},
kj_r AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY sim DESC, nbr_id ASC
  ) AS rank FROM kj_s
)
SELECT vec_id, CAST(rank AS BIGINT) AS rank, nbr_id, sim
FROM kj_r WHERE rank <= {k}"""


def hard_negatives_sql(
    d: str,
    k: int = 3,
    bits: int = 8,
    max_bucket: int = 256,
    max_sim: float = 0.95,
) -> str:
    """Mirror of similarity_search.hard_negatives: label-mismatched
    candidate pairs (false-negative guard sim < max_sim) ranked per
    anchor — top-k hard negatives for contrastive training."""
    return f"""WITH {_knn_pairs_ctes(d, bits, max_bucket)},
hn_f AS (
  SELECT p.vec_id, a.label, p.nbr_id AS neg_id, b.label AS neg_label, p.sim
  FROM kj_s p
  JOIN embeddings a ON p.vec_id = a.vec_id
  JOIN embeddings b ON p.nbr_id = b.vec_id
  WHERE b.label <> a.label AND p.sim < {max_sim}
),
hn_r AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY sim DESC, neg_id ASC
  ) AS neg_rank FROM hn_f
)
SELECT vec_id, label, CAST(neg_rank AS BIGINT) AS neg_rank,
       neg_id, neg_label, sim
FROM hn_r WHERE neg_rank <= {k}"""


def knn_label_noise_sql(
    d: str, k: int = 3, bits: int = 8, max_bucket: int = 256
) -> str:
    """Mirror of similarity_search.knn_label_noise: kNN neighbor-label
    votes -> majority (tie -> min label) vs own label."""
    return f"""WITH kn_nn AS ({knn_join_sql(d, k, bits, max_bucket)}),
kn_v AS (
  SELECT n.vec_id, e.label AS nbr_label, count(*) AS n
  FROM kn_nn n JOIN embeddings e ON n.nbr_id = e.vec_id
  GROUP BY n.vec_id, e.label
),
kn_t AS (
  SELECT vec_id, CAST(sum(n) AS BIGINT) AS n_nbrs, max(n) AS mx
  FROM kn_v GROUP BY vec_id
),
kn_m AS (
  SELECT v.vec_id, t.n_nbrs, min(v.nbr_label) AS nbr_majority
  FROM kn_v v JOIN kn_t t ON v.vec_id = t.vec_id AND v.n = t.mx
  GROUP BY v.vec_id, t.n_nbrs
),
kn_s AS (
  SELECT v.vec_id, CAST(v.n AS BIGINT) AS n_same
  FROM kn_v v JOIN embeddings e ON v.vec_id = e.vec_id AND v.nbr_label = e.label
)
SELECT e.vec_id, e.label, m.n_nbrs,
       COALESCE(s.n_same, CAST(0 AS BIGINT)) AS n_same,
       m.nbr_majority,
       (m.nbr_majority <> e.label) AS suspect
FROM embeddings e
JOIN kn_m m ON e.vec_id = m.vec_id
LEFT JOIN kn_s s ON e.vec_id = s.vec_id"""


def dedup_signal_agreement_sql(d: str, docs: str = "documents") -> str:
    """Mirror of similarity_search.dedup_signal_agreement: full-outer
    join of the text and embedding near-dup pair sets, signal class
    counts + union fractions."""
    return f"""WITH dsa_t AS (
  SELECT a, b, 1 AS t FROM ({near_dup_pairs_sql(d, docs)})
),
dsa_e AS (
  SELECT a, b, 1 AS e FROM ({lsh_near_dups_sql(d)})
),
dsa_j AS (
  SELECT CASE WHEN t.t IS NOT NULL AND e.e IS NOT NULL THEN 'both'
              WHEN t.t IS NOT NULL THEN 'text_only'
              ELSE 'emb_only' END AS signal
  FROM dsa_t t FULL OUTER JOIN dsa_e e ON t.a = e.a AND t.b = e.b
),
dsa_c AS (
  SELECT signal, CAST(count(*) AS BIGINT) AS n_pairs
  FROM dsa_j GROUP BY signal
),
dsa_u AS (
  SELECT CAST(sum(n_pairs) AS BIGINT) AS n_union FROM dsa_c
)
SELECT c.signal, c.n_pairs, u.n_union,
       CAST(c.n_pairs AS DOUBLE) / CAST(u.n_union AS DOUBLE)
         AS frac_of_union
FROM dsa_c c CROSS JOIN dsa_u u"""


def pagerank_sql(
    d: str,
    iters: int = 3,
    k: int = 3,
    bits: int = 8,
    max_bucket: int = 256,
) -> str:
    """Mirror of similarity_search.pagerank_centrality: GraphX-style
    PageRank (r0=1.0, r' = reset + damp*Σ r/outdeg, fixed rounds, no
    dangling redistribution) over the kNN semantic graph, unrolled as
    one CTE per round. Inbound sums are the same ordered fold as the
    operator (sorted by src id). DUCK-only registration: the shared
    CTEs are multi-referenced and need AS MATERIALIZED, which Spark
    SQL lacks (the BPE/asof precedent) — the Spark side IS the
    operator's driver loop."""
    from .operators.similarity_search import PAGERANK_DAMP, PAGERANK_RESET

    mat = "MATERIALIZED " if d == DUCK else ""
    ctes = [
        f"""pr_e AS {mat}(
  SELECT vec_id AS src, nbr_id AS dst
  FROM ({knn_join_sql(d, k, bits, max_bucket)})
)""",
        f"""pr_out AS {mat}(
  SELECT src, count(*) AS out_cnt FROM pr_e GROUP BY src
)""",
        f"""pr_n AS {mat}(
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM pr_e UNION ALL SELECT dst AS node FROM pr_e
  )
)""",
        "pr_r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS r FROM pr_n)",
    ]
    for t in range(1, iters + 1):
        ctes.append(f"""pr_c{t} AS (
  SELECT e.dst, e.src, r.r / CAST(o.out_cnt AS DOUBLE) AS contrib
  FROM pr_e e
  JOIN pr_r{t - 1} r ON e.src = r.node
  JOIN pr_out o ON e.src = o.src
)""")
        ctes.append(f"""pr_s{t} AS (
  SELECT dst, {_ordered_fold('contrib', 'src', d)} AS s
  FROM pr_c{t} GROUP BY dst
)""")
        ctes.append(f"""pr_r{t} AS (
  SELECT n.node,
         {PAGERANK_RESET} + {PAGERANK_DAMP}
           * COALESCE(s.s, CAST(0.0 AS DOUBLE)) AS r
  FROM pr_n n LEFT JOIN pr_s{t} s ON n.node = s.dst
)""")
    body = ",\n".join(ctes)
    return f"""WITH {body}
SELECT node AS vec_id, r AS rank_score FROM pr_r{iters}"""


def triangle_count_sql(
    d: str, k: int = 3, bits: int = 8, max_bucket: int = 256
) -> str:
    """Mirror of similarity_search.triangle_count: oriented a<b<c
    three-way equi-join triangle listing over the undirected kNN edge
    list, per-node counts, 2T/(deg(deg-1)) coefficient."""
    mat = "MATERIALIZED " if d == DUCK else ""
    return f"""WITH tc_u AS {mat}(
  SELECT DISTINCT least(vec_id, nbr_id) AS a, greatest(vec_id, nbr_id) AS b
  FROM ({knn_join_sql(d, k, bits, max_bucket)})
),
tc_t AS {mat}(
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM tc_u e1
  JOIN tc_u e2 ON e1.b = e2.a
  JOIN tc_u e3 ON e3.a = e1.a AND e3.b = e2.b
),
tc_n AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
    SELECT x AS node FROM tc_t
    UNION ALL SELECT y AS node FROM tc_t
    UNION ALL SELECT z AS node FROM tc_t
  ) GROUP BY node
),
tc_d AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM tc_u UNION ALL SELECT b AS node FROM tc_u
  ) GROUP BY node
)
SELECT d.node AS vec_id, d.degree,
       COALESCE(n.n_tri, CAST(0 AS BIGINT)) AS n_tri,
       CASE WHEN d.degree >= 2 THEN
         CAST(2 * COALESCE(n.n_tri, CAST(0 AS BIGINT)) AS DOUBLE)
           / CAST(d.degree * (d.degree - 1) AS DOUBLE)
       END AS clustering_coef
FROM tc_d d LEFT JOIN tc_n n ON d.node = n.node"""


def corpus_filter_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.corpus_filter: the composed C4/
    Gopher-style corpus admission verdict. Each stage's SQL is the
    already-parity-green oracle of that operator, nested as a CTE; the
    drop_reason precedence is identical on both sides."""
    from .operators.pipeline import MAX_DUP3_FRAC, MAX_TOP2_FRAC, MIN_TOKENS

    ws = G.replace_all("text", r"[ \t\n\x0B\f\r]+", "", d)
    reason = f"""CASE WHEN NOT exact_keep THEN 'exact_dup'
            WHEN NOT neardup_keep THEN 'near_dup'
            WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
            WHEN quality = 'low' THEN 'low_quality'
            WHEN top_2gram_char_frac > {MAX_TOP2_FRAC} THEN 'repetitive_2gram'
            WHEN dup_3gram_frac > {MAX_DUP3_FRAC} THEN 'repetitive_3gram'
       END"""
    return f"""WITH cf_q AS ({text_quality_sql(d, docs)}),
cf_r AS ({text_repetition_sql(d, docs)}),
cf_h AS (SELECT doc_id, md5(lower({ws})) AS h FROM {docs}),
cf_e AS (
  SELECT doc_id,
         (doc_id = min(doc_id) OVER (PARTITION BY h)) AS exact_keep
  FROM cf_h
),
cf_c AS ({dedup_clusters_sql(d, docs)}),
cf_j AS (
  SELECT r.doc_id, r.n_tokens, q.quality,
         r.top_2gram_char_frac, r.dup_3gram_frac,
         e.exact_keep,
         coalesce(c.keep, TRUE) AS neardup_keep
  FROM cf_r r
  JOIN cf_q q ON r.doc_id = q.doc_id
  JOIN cf_e e ON r.doc_id = e.doc_id
  LEFT JOIN cf_c c ON r.doc_id = c.doc_id
)
SELECT doc_id, n_tokens, quality, top_2gram_char_frac, dup_3gram_frac,
       exact_keep, neardup_keep,
       {reason} AS drop_reason,
       ({reason} IS NULL) AS keep
FROM cf_j"""


# -------------------------------------------------- round-5 oracle rows
def similarity_dispatch_sql(d: str, docs: str = "documents") -> str:
    """T12 dispatch (content_matcher.py:251-269): the rn<=2 ranked
    candidate pairs scored through every branch of
    functions.similarity.similarity() — levenshtein, jaccard (distinct
    UDF-tokenizer sets), cosine, and the unknown-algorithm→cosine
    default — over CJK-folded page text (fold is idempotent, so the
    lev branch's internal fold is a no-op and all four branches see
    identical input cross-engine)."""
    ftext = G.fold_cjk("text", d)
    ja = P._arr_distinct("tv.utoks", d)
    jb = P._arr_distinct("tr.utoks", d)
    jacc = _jaccard_arrays_sql(ja, jb, d)
    cos = _cosine_sim_sql("tv.utoks", "tr.utoks", d)
    return f"""WITH {ranked_matches_cte(d, docs)},
sd_pairs AS (
  SELECT doc_id, page_num, t_doc, t_page FROM m_ranked WHERE rn <= 2
),
sd_txt AS (
  SELECT doc_id, role, page_num, ftext,
         {_udf_toks('ftext', d)} AS utoks
  FROM (SELECT doc_id, role, page_num, {ftext} AS ftext FROM pages)
)
SELECT p.doc_id, p.page_num, p.t_doc, p.t_page,
       {_sim_sql('tv.ftext', 'tr.ftext', d)} AS sim_levenshtein,
       {jacc} AS sim_jaccard,
       {cos} AS sim_cosine,
       {cos} AS sim_default
FROM sd_pairs p
JOIN sd_txt tv ON tv.role = 'voucher'
  AND tv.doc_id = p.doc_id AND tv.page_num = p.page_num
JOIN sd_txt tr ON tr.role = 'reference'
  AND tr.doc_id = p.t_doc AND tr.page_num = p.t_page"""


def match_two_band_sql(d: str, docs: str = "documents") -> str:
    """T13 alternate banding used by the two-folder pipeline
    (run_ocr.py:258,270): '匹配' strictly above TWO_BAND_THRESHOLD,
    else '部分匹配'; voucher pages with no surviving candidate keep
    '未匹配'."""
    return f"""WITH {ranked_matches_cte(d, docs)},
tb_best AS (SELECT * FROM m_ranked WHERE rn = 1)
SELECT v.doc_id, v.page_num, b.t_doc, b.t_page,
       coalesce(b.sim, 0.0) AS sim,
       CASE WHEN b.t_doc IS NULL THEN '{C.STATUS_TB_NONE}'
            WHEN b.sim > {C.TWO_BAND_THRESHOLD} THEN '{C.STATUS_TB_MATCH}'
            ELSE '{C.STATUS_TB_PARTIAL}' END AS status2
FROM mv v LEFT JOIN tb_best b
  ON v.doc_id = b.doc_id AND v.page_num = b.page_num"""


def quality_score_sql(d: str, docs: str = "documents") -> str:
    """Mirror of textstats.quality_score: broadcast (token, w_milli)
    linear model, per-doc occurrence-weighted sum, one int/int
    division, keep/drop label at QUALITY_SCORE_KEEP_MIN."""
    from .operators.textstats import (
        QUALITY_MODEL_BIAS_MILLI,
        QUALITY_MODEL_WEIGHTS,
        QUALITY_SCORE_KEEP_MIN,
    )

    rows = ", ".join(f"('{t}', {w})" for t, w in QUALITY_MODEL_WEIGHTS)
    score = (
        f"CAST({QUALITY_MODEL_BIAS_MILLI} + coalesce(h.w_sum, 0) AS DOUBLE)"
        " / CAST(greatest(b.n_tokens, 1) AS DOUBLE)"
    )
    return f"""WITH {_tok_cte(d, docs)},
qs_tok AS (SELECT doc_id, {explode('toks', 'token', d)} FROM dd_tok),
qs_hits AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_scored,
         CAST(sum(qw.w_milli) AS BIGINT) AS w_sum
  FROM qs_tok t JOIN (VALUES {rows}) AS qw(token, w_milli)
    ON t.token = qw.token
  GROUP BY t.doc_id
),
qs_base AS (SELECT doc_id, CAST({_arr_size('toks', d)} AS BIGINT) AS n_tokens FROM dd_tok)
SELECT b.doc_id, b.n_tokens,
       coalesce(h.n_scored, 0) AS n_scored,
       coalesce(h.w_sum, 0) AS score_milli_sum,
       {score} AS avg_score_milli,
       CASE WHEN {score} >= {QUALITY_SCORE_KEEP_MIN} THEN 'keep'
            ELSE 'drop' END AS label
FROM qs_base b LEFT JOIN qs_hits h ON b.doc_id = h.doc_id"""


def checkpoint_parts_sql(d: str, docs: str = "documents") -> str:
    """S8-S10 manifest surface: the per-part committed/remaining view
    of the partially-committed fixture (sources.checkpoint
    ensure_partial_fixture — the real extraction job killed after
    CKPT_FIXTURE_COMMIT parts). Committed parts are the lowest
    CKPT_FIXTURE_COMMIT nonempty content-keyed part ids; their stats
    must equal a relational recount of the extraction output."""
    from .sources.checkpoint import CKPT_FIXTURE_COMMIT, CKPT_FIXTURE_N_PARTS

    n, k = CKPT_FIXTURE_N_PARTS, CKPT_FIXTURE_COMMIT
    part = f"({G.hexint(G.cast_str('doc_id', d), d)}) % {n}"
    if d == G.SPARK:
        allparts = f"SELECT explode(sequence(0, {n - 1})) AS part"
    else:
        allparts = f"SELECT CAST(range AS BIGINT) AS part FROM range({n})"
    return f"""WITH cp_docs AS (
  SELECT doc_id, {part} AS part FROM {docs}
),
cp_rank AS (
  SELECT part, CAST(count(*) AS BIGINT) AS n_docs,
         row_number() OVER (ORDER BY part) AS prn
  FROM cp_docs GROUP BY part
),
cp_spans AS (
  SELECT dd.part, CAST(count(*) AS BIGINT) AS n_spans
  FROM ({G.extraction_sql(d, docs)}) ex
  JOIN cp_docs dd ON ex.doc_id = dd.doc_id
  GROUP BY dd.part
),
cp_all AS ({allparts})
SELECT a.part,
       coalesce(r.prn <= {k}, FALSE) AS committed,
       CASE WHEN r.prn <= {k} THEN r.n_docs END AS n_docs,
       CASE WHEN r.prn <= {k} THEN coalesce(s.n_spans, 0) END AS n_spans
FROM cp_all a
LEFT JOIN cp_rank r ON a.part = r.part
LEFT JOIN cp_spans s ON a.part = s.part"""


def _substr_cte_chain(d: str, docs: str = "documents") -> str:
    """Shared ExactSubstr gram CTEs (appended after ``dd_tok``):
    ``ss_g`` = (doc_id, n_tokens, positional k-gram hashes) and
    ``ss_p`` = (doc_id, pos, gh) — used by substring_dup_stats_sql and
    substring_rewrite_sql."""
    from .operators.dedup import SUBSTR_GRAM_K as k

    if d == G.SPARK:
        grams = (
            f"CASE WHEN size(toks) < {k} THEN array()"
            f" ELSE transform(sequence(0, size(toks) - {k}),"
            f" i -> md5(array_join(slice(toks, i + 1, {k}), ' '))) END"
        )
        pos_rows = (
            "SELECT doc_id, pos, gh FROM ss_g "
            "LATERAL VIEW posexplode(grams) u AS pos, gh"
        )
    else:
        grams = (
            f"list_transform(range(greatest({_arr_size('toks', d)} - {k - 1}, 0)),"
            f" i -> md5(array_to_string(list_slice(toks, i + 1, i + {k}), ' ')))"
        )
        pos_rows = (
            "SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos, "
            "unnest(grams) AS gh FROM ss_g"
        )
    return f"""ss_g AS (
  SELECT doc_id, {_arr_size('toks', d)} AS n_tokens, {grams} AS grams FROM dd_tok
),
ss_p AS ({pos_rows})"""


def substring_dup_stats_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.substring_dup_stats: positional
    k-token verbatim windows, duplicated = text occurs ≥2 times in the
    corpus; exact interval-union token coverage per doc via the
    lead-window closed form (min(k, next−pos), last counts k)."""
    from .operators.dedup import SUBSTR_GRAM_K as k

    return f"""WITH {_tok_cte(d, docs)},
{_substr_cte_chain(d, docs)},
ss_dup AS (
  SELECT gh FROM ss_p GROUP BY gh HAVING count(*) >= 2
),
ss_dp AS (
  SELECT p.doc_id, p.pos,
         lead(p.pos) OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS nxt
  FROM ss_p p JOIN ss_dup u ON p.gh = u.gh
),
ss_cov AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_dup_grams,
         CAST(sum(CASE WHEN nxt IS NULL THEN {k}
                       ELSE least({k}, nxt - pos) END) AS BIGINT) AS dup_tokens
  FROM ss_dp GROUP BY doc_id
)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       coalesce(c.n_dup_grams, 0) AS n_dup_grams,
       coalesce(c.dup_tokens, 0) AS dup_tokens,
       CAST(coalesce(c.dup_tokens, 0) AS DOUBLE)
         / CAST(greatest(b.n_tokens, 1) AS DOUBLE) AS dup_token_frac
FROM ss_g b LEFT JOIN ss_cov c ON b.doc_id = c.doc_id"""


def substring_rewrite_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.substring_rewrite: keep-first
    ExactSubstr removal. The oracle uses the simple window form for
    the keeper (row_number over gh) — value-identical to the engine's
    scale-safe groupBy-min(struct); positions covered by removed
    windows expand via a series, survivors rebuild ordered."""
    from .operators.dedup import SUBSTR_GRAM_K as k

    if d == G.SPARK:
        cov = (
            f"SELECT doc_id, explode(sequence(pos, pos + {k - 1})) AS p "
            "FROM sr_rm"
        )
        tok_rows = (
            "SELECT doc_id, pos AS p, tok FROM dd_tok "
            "LATERAL VIEW posexplode(toks) u AS pos, tok"
        )
        agg_text = (
            "array_join(transform(array_sort(collect_list("
            "named_struct('o', p, 'x', tok))), s -> s.x), ' ')"
        )
    else:
        cov = (
            f"SELECT doc_id, unnest(range(pos, pos + {k})) AS p FROM sr_rm"
        )
        tok_rows = (
            "SELECT doc_id, generate_subscripts(toks, 1) - 1 AS p, "
            "unnest(toks) AS tok FROM dd_tok"
        )
        agg_text = "string_agg(tok, ' ' ORDER BY p)"
    return f"""WITH {_tok_cte(d, docs)},
{_substr_cte_chain(d, docs)},
sr_rm AS (
  SELECT doc_id, pos FROM (
    SELECT p.doc_id, p.pos,
           row_number() OVER (PARTITION BY p.gh ORDER BY p.doc_id, p.pos) AS rn,
           count(*) OVER (PARTITION BY p.gh) AS n_occ
    FROM ss_p p
  ) q WHERE n_occ >= 2 AND rn > 1
),
sr_cov AS ({cov}),
sr_tok AS ({tok_rows}),
sr_kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM sr_tok t LEFT JOIN (SELECT DISTINCT doc_id, p FROM sr_cov) c
    ON t.doc_id = c.doc_id AND t.p = c.p
  WHERE c.p IS NULL
),
sr_reb AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         {agg_text} AS kept_text
  FROM sr_kept GROUP BY doc_id
)
SELECT g.doc_id, CAST(g.n_tokens AS BIGINT) AS n_tokens,
       CAST(g.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(r.kept_text, '') AS kept_text
FROM ss_g g LEFT JOIN sr_reb r ON g.doc_id = r.doc_id"""


def engine_passthrough_sql(d: str, docs: str = "documents") -> str:
    """Mirror of cascade.recognize's passthrough modes
    (hybrid_ocr_engine.py:119-123): per page, both single-engine scores
    side by side plus the smart-cascade verdict for the same key —
    one row per (mode, page)."""
    from .operators.cascade import CONF_THRESHOLD

    return f"""WITH {P.pages_cte(d, docs)},
ep_base AS (SELECT doc_id, role, page_num FROM pages)
SELECT doc_id, role, page_num, 'paddle_only' AS mode,
       'engine_a' AS engine_used, {_CONF_A} AS conf FROM ep_base
UNION ALL
SELECT doc_id, role, page_num, 'deepseek_only' AS mode,
       'engine_b' AS engine_used, {_CONF_B} AS conf FROM ep_base
UNION ALL
SELECT doc_id, role, page_num, 'smart' AS mode,
       CASE WHEN {_CONF_A} >= {CONF_THRESHOLD} THEN 'engine_a' ELSE 'engine_b' END AS engine_used,
       CASE WHEN {_CONF_A} >= {CONF_THRESHOLD} THEN {_CONF_A} ELSE {_CONF_B} END AS conf FROM ep_base"""


def redact_pages_sql(d: str, docs: str = "documents") -> str:
    """Mirror of features.redact_pages: sequential global regex
    replaces (dates → <DATE>, amounts → <AMT>, ids → <ID>) + pattern
    occurrence counts on the original text."""
    from .operators.features import REDACT_AMT, REDACT_DATE, REDACT_ID

    red = "text"
    for pats, tok in (
        (G.DATE_RES, REDACT_DATE),
        (G.AMOUNT_RES, REDACT_AMT),
        (G.NUMBER_RES, REDACT_ID),
    ):
        for p in pats:
            red = G.replace_all(red, p, tok, d)

    def n_hits(pats):
        return "CAST(" + " + ".join(
            _arr_size(G.extract_all("text", p, d), d) for p in pats
        ) + " AS BIGINT)"

    return f"""WITH {P.pages_cte(d, docs)}
SELECT doc_id, role, page_num,
       {n_hits(G.DATE_RES)} AS n_dates,
       {n_hits(G.AMOUNT_RES)} AS n_amounts,
       {n_hits(G.NUMBER_RES)} AS n_numbers,
       {red} AS redacted,
       md5({red}) AS redacted_hash
FROM pages"""


def vocab_growth_sql(d: str, docs: str = "documents") -> str:
    """Mirror of textstats.vocab_growth: nested hash-bucket corpus
    checkpoints, distinct vocabulary via per-token min-bucket."""
    from .operators.textstats import (
        VOCAB_GROWTH_BUCKETS,
        VOCAB_GROWTH_CKPTS,
    )

    cks = ", ".join(f"({int(c)})" for c in VOCAB_GROWTH_CKPTS)
    bucket = f"({G.hexint(G.cast_str('doc_id', d), d)}) % {VOCAB_GROWTH_BUCKETS}"
    toks = _lfilter(
        split_rx("lower(text)", "[^a-z0-9]+", d), "t -> length(t) >= 2", d
    )
    return f"""WITH vg_ck(ck) AS (VALUES {cks}),
vg_t AS (
  SELECT CAST({bucket} AS BIGINT) AS b, {explode(toks, 'token', d)}
  FROM {docs}
),
vg_pb AS (
  SELECT b, CAST(count(*) AS BIGINT) AS occ FROM vg_t GROUP BY b
),
vg_db AS (
  SELECT CAST({bucket} AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS nd
  FROM {docs} GROUP BY 1
),
vg_m AS (
  SELECT min(b) AS mb FROM vg_t GROUP BY token
),
vg_mc AS (
  SELECT mb, CAST(count(*) AS BIGINT) AS nv FROM vg_m GROUP BY mb
),
vg_nd AS (
  SELECT ck, CAST(sum(nd) AS BIGINT) AS n_docs
  FROM vg_ck JOIN vg_db ON b < ck GROUP BY ck
),
vg_occ AS (
  SELECT ck, CAST(sum(occ) AS BIGINT) AS n_tokens
  FROM vg_ck JOIN vg_pb ON b < ck GROUP BY ck
),
vg_nv AS (
  SELECT ck, CAST(sum(nv) AS BIGINT) AS n_distinct
  FROM vg_ck JOIN vg_mc ON mb < ck GROUP BY ck
)
SELECT CAST(d1.ck AS BIGINT) AS buckets, d1.n_docs, o.n_tokens, v.n_distinct
FROM vg_nd d1 JOIN vg_occ o ON d1.ck = o.ck JOIN vg_nv v ON d1.ck = v.ck"""


def bm25_search_sql(d: str, docs: str = "documents", n: int = 3) -> str:
    """Mirror of textstats.bm25_search: TF-saturated, length-normalized
    BM25 over the banded query set. Every float literal round-trips
    through one Python computation (repr) so both engines parse the
    identical double; the per-(doc,gram) term is a fixed chain of IEEE
    ops and the per-doc sum folds in gram order."""
    from .operators.textstats import (
        BM25_B,
        BM25_K1,
        INDEX_DF_CAP,
        INDEX_DF_MIN,
        INDEX_QUERY_GRAMS,
        INDEX_SEARCH_TOPK,
    )

    k1p1 = BM25_K1 + 1.0
    omb = 1.0 - BM25_B
    fold = _ordered_fold("term", "token", d)
    term = (
        f"(CAST(n_total AS DOUBLE) / CAST(q.df AS DOUBLE))"
        f" * ((CAST(t.tf AS DOUBLE) * {k1p1!r})"
        f" / (CAST(t.tf AS DOUBLE) + {BM25_K1!r} * ({omb!r} + {BM25_B!r}"
        f" * (CAST(l.dl AS DOUBLE)"
        f" / (CAST(sum_dl AS DOUBLE) / CAST(n_total AS DOUBLE))))))"
    )
    return f"""WITH {_gram_rows_ctes(d, docs, n, distinct=False)},
bm_tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM ii_td GROUP BY doc_id, token
),
bm_df AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df
  FROM bm_tf GROUP BY token
  HAVING count(*) >= {INDEX_DF_MIN} AND count(*) <= {INDEX_DF_CAP}
),
bm_q AS (
  SELECT token, df FROM (
    SELECT token, df,
           row_number() OVER (ORDER BY df DESC, token ASC) AS qr
    FROM bm_df
  ) WHERE qr <= {INDEX_QUERY_GRAMS}
),
bm_dl AS (
  SELECT doc_id, CAST({_arr_size('toks', d)} AS BIGINT) AS dl FROM dd_tok
),
bm_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(dl) AS BIGINT) AS sum_dl
  FROM bm_dl
),
bm_h AS (
  SELECT t.doc_id, t.token, {term} AS term
  FROM bm_tf t
  JOIN bm_q q ON t.token = q.token
  JOIN bm_dl l ON t.doc_id = l.doc_id
  CROSS JOIN bm_tot
),
bm_s AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits, {fold} AS score
  FROM bm_h GROUP BY doc_id
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_hits, score FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM bm_s
) WHERE rank <= {INDEX_SEARCH_TOPK}"""


def quality_agreement_sql(d: str, docs: str = "documents") -> str:
    """Mirror of textstats.quality_agreement: text_quality band ×
    quality_score verdict confusion cells + within-band fraction."""
    return f"""WITH qa_q AS ({text_quality_sql(d, docs)}),
qa_s AS ({quality_score_sql(d, docs)}),
qa_c AS (
  SELECT q.quality, s.label, CAST(count(*) AS BIGINT) AS n
  FROM qa_q q JOIN qa_s s ON q.doc_id = s.doc_id
  GROUP BY q.quality, s.label
),
qa_b AS (
  SELECT quality, CAST(sum(n) AS BIGINT) AS band_total
  FROM qa_c GROUP BY quality
)
SELECT c.quality, c.label, c.n, b.band_total,
       CAST(c.n AS DOUBLE) / CAST(b.band_total AS DOUBLE) AS frac
FROM qa_c c JOIN qa_b b ON c.quality = b.quality"""


def pii_stats_sql(d: str, docs: str = "documents") -> str:
    """Mirror of features.pii_stats: per-source pattern-hit totals,
    docs-with-any-hit, redaction size delta, hits per 1000 chars."""
    from .operators.features import REDACT_AMT, REDACT_DATE, REDACT_ID

    red = "text"
    for pats, tok in (
        (G.DATE_RES, REDACT_DATE),
        (G.AMOUNT_RES, REDACT_AMT),
        (G.NUMBER_RES, REDACT_ID),
    ):
        for p in pats:
            red = G.replace_all(red, p, tok, d)

    def n_hits(pats):
        return "CAST(" + " + ".join(
            _arr_size(G.extract_all("text", p, d), d) for p in pats
        ) + " AS BIGINT)"

    return f"""WITH pii_p AS (
  SELECT source,
         {n_hits(G.DATE_RES)} AS nd,
         {n_hits(G.AMOUNT_RES)} AS na,
         {n_hits(G.NUMBER_RES)} AS nn,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(length(text) - length({red}) AS BIGINT) AS delta
  FROM {docs}
),
pii_a AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nd) AS BIGINT) AS n_dates,
         CAST(sum(na) AS BIGINT) AS n_amounts,
         CAST(sum(nn) AS BIGINT) AS n_numbers,
         CAST(sum(CASE WHEN nd + na + nn > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_pii,
         CAST(sum(chars) AS BIGINT) AS n_chars,
         CAST(sum(delta) AS BIGINT) AS redact_delta
  FROM pii_p GROUP BY source
)
SELECT source, n_docs, n_dates, n_amounts, n_numbers, docs_with_pii,
       n_chars, redact_delta,
       CASE WHEN n_chars > 0 THEN
         CAST((n_dates + n_amounts + n_numbers) * 1000 AS DOUBLE)
           / CAST(n_chars AS DOUBLE)
       END AS pii_per_kchar
FROM pii_a"""


def cluster_cap_sample_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.cluster_cap_sample: nearest-centroid
    assignment (ivf_assign spec) + per-cluster (md5(id), id) rank cap;
    the two-phase salted operator equals this single window statement."""
    from .operators.pipeline import CLUSTER_CAP

    h = f"md5({G.cast_str('d.doc_id', d)})"
    return f"""WITH ccs_a AS ({ivf_assign_sql(d)}),
ccs_r AS (
  SELECT d.doc_id, a.centroid_id,
         row_number() OVER (
           PARTITION BY a.centroid_id ORDER BY {h} ASC, d.doc_id ASC
         ) AS rk
  FROM {docs} d JOIN ccs_a a ON d.doc_id = a.vec_id
)
SELECT doc_id, CAST(centroid_id AS BIGINT) AS centroid_id,
       CAST(rk AS BIGINT) AS rk
FROM ccs_r WHERE rk <= {CLUSTER_CAP}"""


def tfidf_keywords_sql(d: str, docs: str = "documents") -> str:
    """Mirror of textstats.tfidf_keywords (rational idf N/df — one
    division of identical integers, bit-exact; see operator docstring
    for why not ln)."""
    from .operators.textstats import TFIDF_TOP

    return f"""WITH {_tok_cte(d, docs)},
ti_t AS (SELECT doc_id, {explode('toks', 'token', d)} FROM dd_tok),
ti_tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM ti_t GROUP BY doc_id, token
),
ti_df AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM ti_tf GROUP BY token
),
ti_n AS (SELECT count(*) AS n_docs FROM {docs}),
ti_s AS (
  SELECT f.doc_id, f.token, f.tf, g.df,
         CAST(f.tf * n.n_docs AS DOUBLE) / CAST(g.df AS DOUBLE) AS tfidf
  FROM ti_tf f JOIN ti_df g ON f.token = g.token CROSS JOIN ti_n n
),
ti_r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token ASC
  ) AS rank
  FROM ti_s
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df, tfidf
FROM ti_r WHERE rank <= {TFIDF_TOP}"""


def length_histogram_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.length_histogram."""
    from .operators.pipeline import HIST_BUCKET_CHARS as B

    return f"""WITH lh_g AS (
  SELECT source,
         CAST(floor(n_chars / {B}) * {B} AS BIGINT) AS bucket_lo,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM {docs} GROUP BY source, floor(n_chars / {B}) * {B}
),
lh_s AS (SELECT source, count(*) AS n_src FROM {docs} GROUP BY source)
SELECT g.source, g.bucket_lo, g.n_docs,
       CAST(g.n_docs AS DOUBLE) / CAST(s.n_src AS DOUBLE) AS share
FROM lh_g g JOIN lh_s s ON g.source = s.source"""


def containment_pairs_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.containment_pairs over the same banded
    LSH candidate generation as near_dup_pairs_sql."""
    from .operators.dedup import CONTAIN_DUP_J, CONTAIN_MIN, CONTAIN_STRONG

    if d == SPARK:
        inter = "CAST(size(array_intersect(sa.sh, sb.sh)) AS DOUBLE)"
        uni = "CAST(size(array_union(sa.sh, sb.sh)) AS DOUBLE)"
        na, nb = "CAST(size(sa.sh) AS DOUBLE)", "CAST(size(sb.sh) AS DOUBLE)"
    else:
        inter = "CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)"
        uni = "CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)"
        na, nb = "CAST(len(sa.sh) AS DOUBLE)", "CAST(len(sb.sh) AS DOUBLE)"
    c_ab, c_ba, jacc = f"({inter} / {na})", f"({inter} / {nb})", f"({inter} / {uni})"
    return f"""WITH {dedup_cte(d, docs)},
{_lsh_pairs_cte(d, "cn")}
SELECT p.a, p.b,
       {c_ab} AS contain_ab,
       {c_ba} AS contain_ba,
       {jacc} AS jaccard,
       CASE WHEN {jacc} >= {CONTAIN_DUP_J} THEN 'duplicate'
            WHEN {c_ab} >= {CONTAIN_STRONG} AND {c_ab} >= {c_ba} THEN 'a_in_b'
            WHEN {c_ba} >= {CONTAIN_STRONG} THEN 'b_in_a'
            ELSE 'overlap' END AS relation
FROM cn_pairs p
JOIN dd_sh sa ON sa.doc_id = p.a
JOIN dd_sh sb ON sb.doc_id = p.b
WHERE greatest({c_ab}, {c_ba}) >= {CONTAIN_MIN}"""


def gopher_quality_sql(d: str, docs: str = "documents") -> str:
    """Mirror of textstats.gopher_quality (Rae et al. 2021 §A1.1
    bounds; int/int ratio divisions)."""
    from .operators.textstats import (
        GOPHER_MAX_BULLET_FRAC,
        GOPHER_MAX_ELLIPSIS_FRAC,
        GOPHER_MAX_MEAN_WORD,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_WORD,
        GOPHER_MIN_WORDS,
    )

    ws = _lfilter(split_rx("text", r"[ \t\n\x0B\f\r]+", d), "t -> t <> ''", d)
    lines = _lfilter(split_rx("text", r"\n", d), "l -> l <> ''", d)
    n_words = "CAST(" + _arr_size("ws", d) + " AS BIGINT)"
    sum_chars = f"length({G.array_join('ws', chr(39) + chr(39), d)})"
    bullet = (
        "l -> substr(l, 1, 2) = '- ' OR substr(l, 1, 2) = '* ' "
        "OR substr(l, 1, 2) = '• '"
    )
    ell = "l -> length(l) >= 3 AND substr(l, length(l) - 2, 3) = '...'"
    alpha = f"w -> {G.rlike('w', '[A-Za-z]', d)}"
    n_hash = "length(text) - length(replace(text, '#', ''))"
    n_ellipsis = _arr_size(G.extract_all("text", r"\.\.\.", d), d)
    gw = "greatest(n_words, 1)"
    gl = "greatest(n_lines, 1)"
    mean_word = f"(CAST(sum_chars AS DOUBLE) / CAST({gw} AS DOUBLE))"
    symbol = f"(CAST(n_sym AS DOUBLE) / CAST({gw} AS DOUBLE))"
    bfrac = f"(CAST(n_bullet AS DOUBLE) / CAST({gl} AS DOUBLE))"
    efrac = f"(CAST(n_ell AS DOUBLE) / CAST({gl} AS DOUBLE))"
    afrac = f"(CAST(n_alpha AS DOUBLE) / CAST({gw} AS DOUBLE))"
    return f"""WITH gq_a AS (
  SELECT doc_id, text, {ws} AS ws, {lines} AS lines FROM {docs}
),
gq_b AS (
  SELECT doc_id,
         {n_words} AS n_words,
         CAST({sum_chars} AS BIGINT) AS sum_chars,
         CAST({n_hash} + {n_ellipsis} AS BIGINT) AS n_sym,
         CAST({_arr_size('lines', d)} AS BIGINT) AS n_lines,
         CAST({_arr_size(_lfilter('lines', bullet, d), d)} AS BIGINT) AS n_bullet,
         CAST({_arr_size(_lfilter('lines', ell, d), d)} AS BIGINT) AS n_ell,
         CAST({_arr_size(_lfilter('ws', alpha, d), d)} AS BIGINT) AS n_alpha
  FROM gq_a
)
SELECT doc_id, n_words,
       {mean_word} AS mean_word_chars,
       {symbol} AS symbol_ratio,
       {bfrac} AS bullet_frac,
       {efrac} AS ellipsis_frac,
       {afrac} AS alpha_word_frac,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
        AND {mean_word} >= {GOPHER_MIN_MEAN_WORD}
        AND {mean_word} <= {GOPHER_MAX_MEAN_WORD}
        AND {symbol} <= {GOPHER_MAX_SYMBOL_RATIO}
        AND {bfrac} <= {GOPHER_MAX_BULLET_FRAC}
        AND {efrac} <= {GOPHER_MAX_ELLIPSIS_FRAC}
        AND {afrac} >= {GOPHER_MIN_ALPHA_FRAC}) AS gopher_keep
FROM gq_b"""


# ------------------------------------------------- interleaved packing
def interleaved_packing_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.interleaved_packing: tape cost per
    doc = token count of EXTRACTED text spans + MEDIA_TOKENS per media
    span, then the seq_packing prefix sum over (hexint48(doc_id),
    doc_id). LEFT JOIN from *docs* keeps docs whose spans all
    normalized away (zero-width tape slot, mirroring the operator)."""
    from .operators.pipeline import CTX_TOKENS, MEDIA_TOKENS

    tokcount = _arr_size(
        _lfilter(
            split_rx("lower(text)", "[^a-z0-9]+", d), "t -> length(t) >= 2", d
        ),
        d,
    )
    off = (
        "coalesce(SUM(n_tokens) OVER (ORDER BY h, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    )
    return f"""WITH ext AS ({G.extraction_sql(d, docs)}),
ip_c AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN kind = 'media' THEN 0 ELSE {tokcount} END) AS BIGINT) AS n_text_tokens,
         CAST(SUM(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT) AS n_media
  FROM ext GROUP BY doc_id
),
ip_all AS (
  SELECT dd.doc_id,
         CAST(coalesce(n_text_tokens, 0) AS BIGINT) AS n_text_tokens,
         CAST(coalesce(n_media, 0) AS BIGINT) AS n_media,
         CAST(coalesce(n_text_tokens, 0) + {MEDIA_TOKENS} * coalesce(n_media, 0) AS BIGINT) AS n_tokens,
         {G.hexint48('dd.doc_id', d)} AS h
  FROM {docs} dd LEFT JOIN ip_c ON dd.doc_id = ip_c.doc_id
),
ip_o AS (
  SELECT doc_id, n_text_tokens, n_media, n_tokens,
         CAST({off} AS BIGINT) AS tok_offset
  FROM ip_all
)
SELECT doc_id, n_text_tokens, n_media, n_tokens, tok_offset,
       CAST({P.idiv('tok_offset', str(CTX_TOKENS), d)} AS BIGINT) AS pack_id,
       CAST(tok_offset % {CTX_TOKENS} AS BIGINT) AS pack_offset
FROM ip_o"""


# --------------------------------------------------- bigram-LM scoring
def _bigram_rows_cte(d: str) -> str:
    """``lm_pl`` + ``lm_rows`` CTEs: (doc_id, ord, prev, cur) token
    transitions from ``dd_tok`` — the bigram feature source shared by
    the LM scorer and the DSIR importance weights."""
    if d == SPARK:
        # sequence(0, -1) would generate DESCENDING [0, -1]; guard the
        # <2-token case with a typed empty array instead
        pairs = (
            "CASE WHEN size(toks) < 2 THEN "
            "CAST(array() AS array<struct<ord:int,prev:string,cur:string>>) "
            "ELSE transform(sequence(0, size(toks) - 2), i -> named_struct("
            "'ord', i, 'prev', element_at(toks, i + 1), "
            "'cur', element_at(toks, i + 2))) END"
        )
        unnest_pairs = "SELECT doc_id, explode(pairs) AS bg FROM lm_pl"
    else:
        pairs = (
            "list_transform(range(greatest(len(toks) - 1, 0)), "
            "i -> {'ord': i, 'prev': toks[i + 1], 'cur': toks[i + 2]})"
        )
        unnest_pairs = "SELECT doc_id, unnest(pairs) AS bg FROM lm_pl"
    return f"""lm_pl AS (
  SELECT doc_id, {pairs} AS pairs FROM dd_tok
),
lm_rows AS (
  SELECT doc_id, CAST(bg.ord AS BIGINT) AS ord, bg.prev AS prev, bg.cur AS cur
  FROM ({unnest_pairs})
)"""


def _lm_cte_chain(d: str, docs: str = "documents") -> str:
    """The lm_score computation as a CTE-chain body (appended after
    ``dd_tok``), exposing ``lm_out`` = (doc_id, n_bigrams, lm_score) —
    shared by lm_score_sql and lm_buckets_sql. Every p is ONE
    int/int→double division; the per-doc mean is the ordered left fold
    + one double division (bit-exact recipe)."""
    from .operators.textstats import LM_SMOOTH

    if d == SPARK:
        unnest_toks = "SELECT explode(toks) AS tok FROM dd_tok"
    else:
        unnest_toks = "SELECT unnest(toks) AS tok FROM dd_tok"
    return f"""{_bigram_rows_cte(d)},
lm_unic AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c_uni
  FROM ({unnest_toks}) GROUP BY tok
),
lm_v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM lm_unic),
lm_big AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_big
  FROM lm_rows GROUP BY prev, cur
),
lm_sc AS (
  SELECT r.doc_id, r.ord,
         CAST(b.c_big + {LM_SMOOTH} AS DOUBLE) / CAST(u.c_uni + lv.v AS DOUBLE) AS p
  FROM lm_rows r
  JOIN lm_big b ON r.prev = b.prev AND r.cur = b.cur
  JOIN lm_unic u ON r.prev = u.tok
  CROSS JOIN lm_v lv
),
lm_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         {_ordered_fold("p", "ord", d)} AS s
  FROM lm_sc GROUP BY doc_id
),
lm_out AS (
  SELECT dd.doc_id,
         CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         CASE WHEN n_bigrams > 0 THEN s / CAST(n_bigrams AS DOUBLE) END AS lm_score
  FROM {docs} dd LEFT JOIN lm_doc ON dd.doc_id = lm_doc.doc_id
)"""


def lm_score_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.lm_score (see _lm_cte_chain)."""
    return f"""WITH {_tok_cte(d, docs)},
{_lm_cte_chain(d, docs)}
SELECT doc_id, n_bigrams, lm_score FROM lm_out"""


def lm_buckets_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.lm_buckets: fixed-width score
    bins (floor(score·BINS), one IEEE multiply + floor — bit-exact),
    per-source tercile boundaries on the bin-count frame via BIGINT
    rational compares (3·cum_before < total), label joined back;
    unscored docs keep a row."""
    from .operators.textstats import LM_BUCKET_BINS

    return f"""WITH {_tok_cte(d, docs)},
{_lm_cte_chain(d, docs)},
lb_s AS (
  SELECT o.doc_id, dd.source, o.lm_score,
         CASE WHEN o.lm_score IS NOT NULL
              THEN CAST(floor(o.lm_score * {LM_BUCKET_BINS}) AS BIGINT) END AS bin
  FROM lm_out o JOIN {docs} dd ON o.doc_id = dd.doc_id
),
lb_binc AS (
  SELECT source, bin, CAST(count(*) AS BIGINT) AS n
  FROM lb_s WHERE bin IS NOT NULL GROUP BY source, bin
),
lb_ranked AS (
  SELECT source, bin,
         CAST(SUM(n) OVER (PARTITION BY source ORDER BY bin DESC) - n
              AS BIGINT) AS cum_before
  FROM lb_binc
),
lb_tot AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS total FROM lb_binc GROUP BY source
),
lb_lab AS (
  SELECT r.source, r.bin,
         CASE WHEN 3 * r.cum_before < t.total THEN 'head'
              WHEN 3 * r.cum_before < 2 * t.total THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM lb_ranked r JOIN lb_tot t ON r.source = t.source
)
SELECT s.doc_id, s.source, s.lm_score,
       coalesce(l.bucket, 'unscored') AS bucket
FROM lb_s s LEFT JOIN lb_lab l
  ON s.source = l.source AND s.bin = l.bin"""


def dsir_weights_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.dsir_weights: hashed-bigram
    importance weights for data selection. Per-feature ratio stays a
    RATIO of exact BIGINT products (one IEEE division) — never a log —
    and the per-doc mean is the ordered fold + one double division."""
    from .operators.textstats import (
        DSIR_BUCKETS,
        DSIR_TARGET_SOURCES,
        DSIR_TAU,
    )

    B = DSIR_BUCKETS
    tgt = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)
    bucket = f"({G.hexint('prev || chr(31) || cur', d)}) % {B}"
    return f"""WITH {_tok_cte(d, docs)},
{_bigram_rows_cte(d)},
ds_feat AS (
  SELECT DISTINCT doc_id, CAST({bucket} AS BIGINT) AS bucket FROM lm_rows
),
ds_dim AS (
  SELECT doc_id, (source IN ({tgt})) AS is_t FROM {docs}
),
ds_tag AS (
  SELECT f.doc_id, f.bucket, dd.is_t
  FROM ds_feat f JOIN ds_dim dd ON f.doc_id = dd.doc_id
),
ds_cnt AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tc,
         CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS rc
  FROM ds_tag GROUP BY bucket
),
ds_tot AS (
  SELECT CAST(SUM(tc) AS BIGINT) AS t_tot,
         CAST(SUM(rc) AS BIGINT) AS r_tot
  FROM ds_cnt
),
ds_term AS (
  SELECT g.doc_id, g.bucket,
         CAST((c.tc + 1) * (t.r_tot + {B}) AS DOUBLE)
           / CAST((c.rc + 1) * (t.t_tot + {B}) AS DOUBLE) AS term
  FROM ds_tag g JOIN ds_cnt c ON g.bucket = c.bucket
  CROSS JOIN ds_tot t
  WHERE NOT g.is_t
),
ds_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
         {_ordered_fold("term", "bucket", d)} AS s
  FROM ds_term GROUP BY doc_id
)
SELECT r.doc_id,
       CAST(coalesce(d2.n_feat, 0) AS BIGINT) AS n_feat,
       CASE WHEN d2.n_feat > 0
            THEN d2.s / CAST(d2.n_feat AS DOUBLE) END AS avg_lr,
       coalesce(
         CASE WHEN d2.n_feat > 0
              THEN d2.s / CAST(d2.n_feat AS DOUBLE) >= {DSIR_TAU!r} END,
         false) AS selected
FROM (SELECT doc_id FROM ds_dim WHERE NOT is_t) r
LEFT JOIN ds_doc d2 ON r.doc_id = d2.doc_id"""


def tokenizer_fertility_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.bpe.tokenizer_fertility: the trained-BPE
    encode (nested bpe_encode_sql — DUCK-runnable only, like the BPE
    chain itself), per-doc subword counts, word counts from the shared
    tokenization, rolled up per language with one int/int fertility
    division."""
    nw = "size(toks)" if d == SPARK else "len(toks)"
    return f"""WITH tf_enc AS (
{bpe_encode_sql(d, docs)}
),
tf_sub AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sub FROM tf_enc GROUP BY doc_id
),
{_tok_cte(d, docs)},
tf_w AS (
  SELECT t.doc_id, dd.lang, CAST({nw} AS BIGINT) AS n_words
  FROM dd_tok t JOIN {docs} dd ON t.doc_id = dd.doc_id
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(coalesce(n_sub, 0)) AS BIGINT) AS n_subwords,
       CASE WHEN SUM(n_words) > 0
            THEN CAST(SUM(coalesce(n_sub, 0)) AS DOUBLE)
                   / CAST(SUM(n_words) AS DOUBLE) END AS fertility
FROM tf_w w LEFT JOIN tf_sub s ON w.doc_id = s.doc_id
GROUP BY lang"""


def contamination_report_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.contamination_report: the per-source
    dataset-card rollup of the decontamination scan (nested
    decontaminate_sql CTE)."""
    return f"""WITH cr_d AS (
{decontaminate_sql(d, docs)}
)
SELECT dd.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c.contaminated THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       CAST(SUM(CASE WHEN c.contaminated THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS contamination_rate,
       max(c.max_overlap_frac) AS worst_overlap,
       CAST(SUM(c.n_eval_docs_hit) AS BIGINT) AS total_eval_hits
FROM cr_d c JOIN {docs} dd ON c.doc_id = dd.doc_id
GROUP BY dd.source"""


def mixture_drift_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.mixture_drift over the corpus_diff
    snapshot pair (old = buckets 1-9, new = buckets 0-8 with bucket-1
    texts revised): per-source doc/token mass, token shares and the
    share delta. Token estimate = (len+3) DIV 4, the token_counts
    heuristic."""
    b = f"({G.hexint(G.cast_str('doc_id', d), d)}) % 10"
    cat = "concat(text, ' rev2')" if d == SPARK else "text || ' rev2'"
    est = lambda t: f"CAST({P.idiv(f'(length({t}) + 3)', '4', d)} AS BIGINT)"  # noqa: E731
    return f"""WITH md_b AS (
  SELECT source, text, {b} AS b FROM {docs}
),
md_o AS (
  SELECT source, CAST(count(*) AS BIGINT) AS docs_old,
         CAST(SUM({est('text')}) AS BIGINT) AS tokens_old
  FROM md_b WHERE b <> 0 GROUP BY source
),
md_n AS (
  SELECT source, CAST(count(*) AS BIGINT) AS docs_new,
         CAST(SUM({est(f"CASE WHEN b = 1 THEN {cat} ELSE text END")}) AS BIGINT)
           AS tokens_new
  FROM md_b WHERE b <> 9 GROUP BY source
),
md_to AS (SELECT CAST(SUM(tokens_old) AS BIGINT) AS tot_old FROM md_o),
md_tn AS (SELECT CAST(SUM(tokens_new) AS BIGINT) AS tot_new FROM md_n)
SELECT coalesce(o.source, n.source) AS source,
       CAST(coalesce(o.docs_old, 0) AS BIGINT) AS docs_old,
       CAST(coalesce(n.docs_new, 0) AS BIGINT) AS docs_new,
       CAST(coalesce(o.tokens_old, 0) AS BIGINT) AS tokens_old,
       CAST(coalesce(n.tokens_new, 0) AS BIGINT) AS tokens_new,
       CAST(coalesce(o.tokens_old, 0) AS DOUBLE) / CAST(t1.tot_old AS DOUBLE)
         AS share_old,
       CAST(coalesce(n.tokens_new, 0) AS DOUBLE) / CAST(t2.tot_new AS DOUBLE)
         AS share_new,
       CAST(coalesce(n.tokens_new, 0) AS DOUBLE) / CAST(t2.tot_new AS DOUBLE)
         - CAST(coalesce(o.tokens_old, 0) AS DOUBLE) / CAST(t1.tot_old AS DOUBLE)
         AS drift
FROM md_o o FULL OUTER JOIN md_n n ON o.source = n.source
CROSS JOIN md_to t1 CROSS JOIN md_tn t2"""


def collocations_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.collocations: lift as the SAME
    fixed chain of IEEE double ops — ((c_xy/c_x)/c_y)*N — on exact
    BIGINT counts; deterministic tie-broken top-N."""
    from .operators.textstats import COLLOC_MIN_COUNT, COLLOC_TOP

    unnest_toks = (
        "SELECT explode(toks) AS tok FROM dd_tok"
        if d == SPARK
        else "SELECT unnest(toks) AS tok FROM dd_tok"
    )
    return f"""WITH {_tok_cte(d, docs)},
{_bigram_rows_cte(d)},
cl_big AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_big
  FROM lm_rows GROUP BY prev, cur
),
cl_uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c_uni
  FROM ({unnest_toks}) GROUP BY tok
),
cl_n AS (SELECT CAST(SUM(c_big) AS BIGINT) AS n_big FROM cl_big)
SELECT b.prev, b.cur, b.c_big,
       p.c_uni AS c_prev, c.c_uni AS c_cur,
       CAST(b.c_big AS DOUBLE) / CAST(p.c_uni AS DOUBLE)
         / CAST(c.c_uni AS DOUBLE) * CAST(n.n_big AS DOUBLE) AS lift
FROM cl_big b
JOIN cl_uni p ON b.prev = p.tok
JOIN cl_uni c ON b.cur = c.tok
CROSS JOIN cl_n n
WHERE b.c_big >= {COLLOC_MIN_COUNT}
ORDER BY lift DESC, b.prev ASC, b.cur ASC
LIMIT {COLLOC_TOP}"""


def _gram_rows_ctes(d: str, docs: str, n: int, distinct: bool = True) -> str:
    """CTE chain ending in ii_td(token=word-n-gram, doc_id) — shared by
    inverted_index_sql / index_search_sql (per-doc distinct, mirror of
    textstats._gram_doc_rows) and bm25_search_sql (distinct=False:
    positional multiplicity kept for TF)."""
    if d == SPARK:
        grams = (
            f"CASE WHEN size(toks) < {n} THEN array()"
            f" ELSE transform(sequence(0, size(toks) - {n}),"
            f" i -> array_join(slice(toks, i + 1, {n}), ' ')) END"
        )
        unnest = "SELECT doc_id, explode(grams) AS token FROM ii_g"
    else:
        grams = (
            f"list_transform(range(greatest({_arr_size('toks', d)} - {n - 1}, 0)),"
            f" i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
        )
        unnest = "SELECT doc_id, unnest(grams) AS token FROM ii_g"
    return f"""{_tok_cte(d, docs)},
ii_g AS (
  SELECT doc_id, {grams} AS grams FROM dd_tok
),
ii_td AS (
  SELECT {'DISTINCT ' if distinct else ''}token, doc_id FROM ({unnest})
)"""


def inverted_index_sql(d: str, docs: str = "documents", n: int = 3) -> str:
    """Mirror of operators.textstats.inverted_index: per-doc-distinct
    word n-grams, mid-document-frequency-band posting lists, sorted and
    comma-joined."""
    from .operators.textstats import INDEX_DF_CAP, INDEX_DF_MIN

    if d == SPARK:
        plist = (
            "array_join(transform(array_sort(collect_list(doc_id)),"
            " x -> CAST(x AS STRING)), ',')"
        )
    else:
        plist = (
            "array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id),"
            " ',')"
        )
    return f"""WITH {_gram_rows_ctes(d, docs, n)},
ii_df AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df
  FROM ii_td GROUP BY token
  HAVING count(*) >= {INDEX_DF_MIN} AND count(*) <= {INDEX_DF_CAP}
)
SELECT t.token, f.df, {plist} AS postings
FROM ii_td t JOIN ii_df f ON t.token = f.token
GROUP BY t.token, f.df"""


def index_search_sql(d: str, docs: str = "documents", n: int = 3) -> str:
    """Mirror of operators.textstats.index_search: top-q banded grams
    as the query set, rational-idf scoring (N/df, gram-ordered fold),
    top-k docs by (score desc, doc_id asc)."""
    from .operators.textstats import (
        INDEX_DF_CAP,
        INDEX_DF_MIN,
        INDEX_QUERY_GRAMS,
        INDEX_SEARCH_TOPK,
    )

    fold = _ordered_fold("idf", "token", d)
    return f"""WITH {_gram_rows_ctes(d, docs, n)},
is_df AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df
  FROM ii_td GROUP BY token
  HAVING count(*) >= {INDEX_DF_MIN} AND count(*) <= {INDEX_DF_CAP}
),
is_q AS (
  SELECT token, df FROM (
    SELECT token, df,
           row_number() OVER (ORDER BY df DESC, token ASC) AS qr
    FROM is_df
  ) WHERE qr <= {INDEX_QUERY_GRAMS}
),
is_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM {docs}
),
is_h AS (
  SELECT t.doc_id, t.token,
         CAST(n_total AS DOUBLE) / CAST(q.df AS DOUBLE) AS idf
  FROM ii_td t JOIN is_q q ON t.token = q.token CROSS JOIN is_tot
),
is_s AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits, {fold} AS score
  FROM is_h GROUP BY doc_id
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_hits, score FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM is_s
) WHERE rank <= {INDEX_SEARCH_TOPK}"""


# ------------------------------------------------ boilerplate strip
def _html_blocks_ctes(d: str, docs: str = "documents") -> str:
    """CTE chain: htmlgen synthesis → DOM-block parse → jusText
    classification (mirror of operators.boilerplate; rational
    thresholds so no float boundary decides a class). Final CTE
    ``mb_fin`` has one row per block with features + cf/final class."""
    from . import htmlgen as H
    from .operators.boilerplate import (
        ANCHOR_RE,
        IMG_RE,
        INNER_RE,
        LD_BAD_DEN,
        LD_BAD_NUM,
        LD_GOOD_DEN,
        LD_GOOD_NUM,
        LEN_GOOD,
        LEN_SHORT,
        SD_GOOD_DEN,
        SD_GOOD_NUM,
        STOP_TOKENS,
        TAG_RE,
        TAG_STRIP_RE,
        WORD_SPLIT_RE,
    )

    if d == SPARK:
        lines = (
            "SELECT doc_id, CAST(b AS BIGINT) AS b, block FROM ("
            "SELECT doc_id, posexplode(split(html, chr(10))) AS (b, block) "
            "FROM html_docs)"
        )
    else:
        lines = (
            "SELECT doc_id, b, bs[b + 1] AS block FROM ("
            "SELECT doc_id, bs, unnest(range(len(bs))) AS b FROM ("
            "SELECT doc_id, string_split(html, chr(10)) AS bs "
            "FROM html_docs) q1) q2"
        )
    anchors = f"regexp_extract_all(inr, {G.rx(ANCHOR_RE, d)}, 1)"
    stripped = f"trim({G.replace_all('inr', TAG_STRIP_RE, '', d)})"
    ws = _lfilter(split_rx("text", WORD_SPLIT_RE, d), "t -> t <> ''", d)
    stop_lam = "t -> " + " OR ".join(f"t = '{s}'" for s in STOP_TOKENS)
    gtc = "greatest(text_chars, 1)"
    gnw = "greatest(n_words, 1)"
    cf = f"""CASE
      WHEN anchor_chars * {LD_BAD_DEN} > {LD_BAD_NUM} * {gtc} THEN 'bad'
      WHEN text_chars < {LEN_SHORT} THEN 'short'
      WHEN text_chars >= {LEN_GOOD}
           AND anchor_chars * {LD_GOOD_DEN} < {LD_GOOD_NUM} * {gtc}
           AND n_stop * {SD_GOOD_DEN} >= {SD_GOOD_NUM} * {gnw} THEN 'good'
      ELSE 'near_good' END"""
    nb = "(PARTITION BY doc_id ORDER BY b)"
    return f"""{H.html_cte(d, docs)},
mb_lines AS ({lines}),
mb_parse AS (
  SELECT doc_id, b,
         regexp_extract(block, {G.rx(TAG_RE, d)}, 1) AS tag,
         regexp_extract(block, {G.rx(IMG_RE, d)}, 1) AS media_ref,
         regexp_extract(block, {G.rx(INNER_RE, d)}, 1) AS inr
  FROM mb_lines
),
mb_txt AS (
  SELECT doc_id, b, tag, media_ref,
         {stripped} AS text, {anchors} AS anchors
  FROM mb_parse
),
mb_feat AS (
  SELECT doc_id, b, tag, media_ref, text,
         CAST(length(text) AS BIGINT) AS text_chars,
         CAST({_arr_size('anchors', d)} AS BIGINT) AS n_links,
         CAST(length({G.array_join('anchors', "''", d)}) AS BIGINT) AS anchor_chars,
         CAST({_arr_size(ws, d)} AS BIGINT) AS n_words,
         CAST({_arr_size(_lfilter(ws, stop_lam, d), d)} AS BIGINT) AS n_stop
  FROM mb_txt
),
mb_cls AS (
  SELECT *,
         CAST(anchor_chars AS DOUBLE) / CAST({gtc} AS DOUBLE) AS link_density,
         CAST(n_stop AS DOUBLE) / CAST({gnw} AS DOUBLE) AS stop_density,
         {cf} AS cf_class
  FROM mb_feat
),
mb_fin AS (
  SELECT *,
         CASE WHEN cf_class = 'good' THEN 'content'
              WHEN cf_class IN ('short', 'near_good')
                   AND (lag(cf_class) OVER {nb} = 'good'
                        OR lead(cf_class) OVER {nb} = 'good') THEN 'content'
              ELSE 'boilerplate' END AS final_class
  FROM mb_cls
)"""


def boilerplate_blocks_sql(d: str, docs: str = "documents") -> str:
    """Per-block classification report (operators.boilerplate.parse_
    blocks + classify_blocks)."""
    return f"""WITH {_html_blocks_ctes(d, docs)}
SELECT doc_id, b, tag, text_chars, n_links, link_density, stop_density,
       cf_class, final_class
FROM mb_fin"""


def main_content_sql(d: str, docs: str = "documents") -> str:
    """Per-doc boilerplate strip (operators.boilerplate.main_content):
    ordered concat of surviving block texts + media refs."""
    if d == SPARK:
        keep = "array_join(transform(array_sort(collect_list(CASE WHEN {c} THEN named_struct('o', b, 'x', {v}) END)), s -> s.x), {sep})"
        txt = keep.format(c="final_class = 'content'", v="text", sep="chr(10)")
        refs = keep.format(
            c="final_class = 'content' AND media_ref <> ''",
            v="media_ref",
            sep="','",
        )
    else:
        txt = (
            "coalesce(string_agg(text, chr(10) ORDER BY b) "
            "FILTER (WHERE final_class = 'content'), '')"
        )
        refs = (
            "coalesce(string_agg(media_ref, ',' ORDER BY b) "
            "FILTER (WHERE final_class = 'content' AND media_ref <> ''), '')"
        )
    return f"""WITH {_html_blocks_ctes(d, docs)}
SELECT doc_id,
       {txt} AS main_text,
       {refs} AS media_refs,
       count(*) AS n_blocks,
       CAST(count(*) FILTER (WHERE final_class = 'content') AS BIGINT) AS n_content,
       CAST(coalesce(sum(text_chars) FILTER (WHERE final_class = 'content'), 0) AS BIGINT) AS content_chars,
       CAST(coalesce(sum(text_chars) FILTER (WHERE final_class <> 'content'), 0) AS BIGINT) AS boiler_chars
FROM mb_fin
GROUP BY doc_id"""


def bloom_decontaminate_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.bloom_decontaminate: eval-slice grams
    → k md5-slice positions → distinct set-bit table; corpus grams LEFT
    JOIN the bit table once per position (all k set = Bloom hit) +
    exact membership on the full 128-bit hash; per-doc audit rollup."""
    from .operators.dedup import (
        BLOOM_K,
        BLOOM_M_BITS,
        BLOOM_SCREEN_DEN,
        DECON_EVAL_BUCKETS,
        DECON_NGRAM,
    )

    n = DECON_NGRAM
    if d == SPARK:
        grams = (
            f"CASE WHEN size(toks) < {n} THEN array()"
            f" ELSE transform(sequence(0, size(toks) - {n}),"
            f" i -> array_join(slice(toks, i + 1, {n}), ' ')) END"
        )
        gram_select = (
            "SELECT doc_id, explode(array_distinct(grams)) AS gram FROM bd_ga"
        )
    else:
        grams = (
            f"list_transform(range(greatest({_arr_size('toks', d)} - {n - 1}, 0)),"
            f" i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
        )
        gram_select = (
            "SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM bd_ga"
        )
    bucket = f"({G.hexint(G.cast_str('doc_id', d), d)}) % {DECON_EVAL_BUCKETS}"
    ps = [
        f"({G.hexint_slice('h', 1 + 8 * j, d)}) % {BLOOM_M_BITS}"
        for j in range(BLOOM_K)
    ]
    pos_cols = ", ".join(f"{p} AS pos{j}" for j, p in enumerate(ps))
    bit_union = "\n  UNION ALL\n".join(
        f"  SELECT {p} AS pos FROM bd_e" for p in ps
    )
    bit_joins = "\n".join(
        f"  LEFT JOIN bd_bits b{j} ON g.pos{j} = b{j}.pos" for j in range(BLOOM_K)
    )
    hit_all = " AND ".join(f"b{j}.pos IS NOT NULL" for j in range(BLOOM_K))
    return f"""WITH {_tok_cte(d, docs)},
bd_ga AS (
  SELECT doc_id, {grams} AS grams FROM dd_tok
),
bd_g AS (
  SELECT doc_id, md5(gram) AS h FROM ({gram_select})
),
bd_e AS (
  SELECT DISTINCT h FROM bd_g
  WHERE doc_id IN (SELECT doc_id FROM {docs} WHERE {bucket} = 0)
),
bd_bits AS (
  SELECT DISTINCT pos FROM (
{bit_union}
  )
),
bd_p AS (
  SELECT doc_id, h, {pos_cols} FROM bd_g
),
bd_hit AS (
  SELECT g.doc_id,
         CASE WHEN {hit_all} THEN 1 ELSE 0 END AS bloom_hit,
         CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END AS exact_hit
  FROM bd_p g
{bit_joins}
  LEFT JOIN bd_e e ON g.h = e.h
),
bd_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hit,
         CAST(sum(exact_hit) AS BIGINT) AS n_exact_hit
  FROM bd_hit GROUP BY doc_id
)
SELECT dd.doc_id,
       coalesce(p.n_grams, 0) AS n_grams,
       coalesce(p.n_bloom_hit, 0) AS n_bloom_hit,
       coalesce(p.n_exact_hit, 0) AS n_exact_hit,
       coalesce(p.n_bloom_hit, 0) - coalesce(p.n_exact_hit, 0) AS n_false_pos,
       (coalesce(p.n_bloom_hit, 0) * {BLOOM_SCREEN_DEN} >= coalesce(p.n_grams, 0)
        AND coalesce(p.n_grams, 0) > 0) AS screened
FROM {docs} dd LEFT JOIN bd_doc p ON dd.doc_id = p.doc_id"""


def main_content_quality_sql(d: str, docs: str = "documents") -> str:
    """Composed strip→admission shift: Gopher quality verdicts on the
    RAW document text vs the boilerplate-STRIPPED main content
    (main_content_sql nested as the stripped source) — the measurement
    that justifies running the strip before quality filtering."""
    mc = main_content_sql(d, docs)
    stripped_src = f"(SELECT doc_id, main_text AS text FROM ({mc}) mcq) mtb"
    return f"""WITH mq_raw AS ({gopher_quality_sql(d, docs)}),
mq_st AS ({gopher_quality_sql(d, stripped_src)})
SELECT r.doc_id,
       r.n_words AS raw_words,
       s.n_words AS stripped_words,
       r.gopher_keep AS raw_keep,
       s.gopher_keep AS stripped_keep,
       r.gopher_keep <> s.gopher_keep AS verdict_changed
FROM mq_raw r JOIN mq_st s ON r.doc_id = s.doc_id"""


def readability_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.readability: vowel-group syllable
    heuristic (floor 1 per word), fixed-chain IEEE double scores,
    identical-literal band thresholds."""
    from .operators.textstats import (
        FK_BASE,
        FK_SPW,
        FK_WPS,
        FLESCH_BASE,
        FLESCH_SPW,
        FLESCH_WPS,
        READ_BAND_DEFAULT,
        READ_BANDS,
        READ_SENT_RE,
        READ_VOWEL_RE,
        READ_WORD_RE,
    )

    dbl = lambda x: f"CAST({x!r} AS DOUBLE)"  # noqa: E731
    low = "lower(text)"
    words = _lfilter(split_rx(low, READ_WORD_RE, d), "t -> t <> ''", d)
    sents = _lfilter(split_rx(low, READ_SENT_RE, d), "s -> trim(s) <> ''", d)
    vg = _arr_size(G.extract_all(low, READ_VOWEL_RE, d), d)
    nv = _arr_size(
        _lfilter("words", f"w -> NOT ({G.rlike('w', READ_VOWEL_RE, d)})", d), d
    )
    flesch = (
        f"{dbl(FLESCH_BASE)} - {dbl(FLESCH_WPS)} * words_per_sentence"
        f" - {dbl(FLESCH_SPW)} * syllables_per_word"
    )
    grade = (
        f"{dbl(FK_WPS)} * words_per_sentence"
        f" + {dbl(FK_SPW)} * syllables_per_word - {dbl(FK_BASE)}"
    )
    band = "CASE " + " ".join(
        f"WHEN flesch >= {dbl(cut)} THEN '{name}'" for cut, name in READ_BANDS
    ) + f" ELSE '{READ_BAND_DEFAULT}' END"
    return f"""WITH rd_w AS (
  SELECT doc_id, {words} AS words,
         {_arr_size(sents, d)} AS n_sent, {vg} AS vg
  FROM {docs}
),
rd_c AS (
  SELECT doc_id,
         CAST({_arr_size('words', d)} AS BIGINT) AS n_words,
         CAST(greatest(n_sent, 1) AS BIGINT) AS n_sentences,
         CAST(vg + {nv} AS BIGINT) AS n_syllables
  FROM rd_w
),
rd_s AS (
  SELECT *,
         CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
           AS words_per_sentence,
         CAST(n_syllables AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE)
           AS syllables_per_word
  FROM rd_c
),
rd_f AS (
  SELECT *, {flesch} AS flesch, {grade} AS fk_grade FROM rd_s
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       words_per_sentence, syllables_per_word, flesch, fk_grade,
       {band} AS band
FROM rd_f"""


def strip_confusion_sql(d: str, docs: str = "documents") -> str:
    """Strip evaluation vs synthesis ground truth: htmlgen KNOWS which
    blocks are chrome (nav/footer/aside) — the classifier never reads
    the tag, so grouping its final verdict by the truth label yields a
    real confusion table (the jusText-evaluation shape) with char
    masses and per-cell block/char shares."""
    from . import htmlgen as H

    chrome = "('" + "', '".join(H.HB_CHROME_TAGS) + "')"
    return f"""WITH {_html_blocks_ctes(d, docs)},
sc_lab AS (
  SELECT tag IN {chrome} AS truth_chrome, final_class, text_chars
  FROM mb_fin
),
sc_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS all_blocks,
         CAST(sum(text_chars) AS BIGINT) AS all_chars
  FROM sc_lab
)
SELECT truth_chrome, final_class,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(text_chars) AS BIGINT) AS sum_chars,
       CAST(count(*) AS DOUBLE) / CAST(all_blocks AS DOUBLE) AS block_share,
       CAST(sum(text_chars) AS DOUBLE) / CAST(all_chars AS DOUBLE) AS char_share
FROM sc_lab CROSS JOIN sc_tot
GROUP BY truth_chrome, final_class, all_blocks, all_chars"""


def layout_columns_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.extraction.column_layout: fixed column grid
    over the grounded-parse output, column-major reindex, moved flag."""
    from .operators.extraction import COL_WIDTH

    cdiv = f"x1 DIV {COL_WIDTH}" if d == SPARK else f"x1 // {COL_WIDTH}"
    return f"""WITH lc_gp AS ({G.grounded_parse_sql(d, docs)}),
lc_o AS (
  SELECT doc_id,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY ({cdiv}), y1, x1, ord
         ) - 1 AS BIGINT) AS ord_col,
         CAST({cdiv} AS BIGINT) AS col_id,
         ord AS ord_flat, x1, y1, txt
  FROM lc_gp
)
SELECT *, ord_col <> ord_flat AS moved FROM lc_o"""


def doc_chunks_overlap_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.doc_chunks_overlap: enumerated
    chunk ownership (j in [0, K)) with non-negative arithmetic only —
    Spark's truncating DIV and DuckDB's flooring // diverge on
    negative numerators, so ownership is never derived by division on
    (pos - chunk)."""
    from .operators.pipeline import CHUNK_STRIDE_DEN, CHUNK_TOKENS

    chunk = CHUNK_TOKENS
    stride = chunk // CHUNK_STRIDE_DEN
    k = (chunk + stride - 1) // stride
    if d == SPARK:
        pos_rows = "posexplode(toks) AS (pos, tok)"
        js = f"explode(sequence(0, {k - 1})) AS j"
        agg = (
            "array_join(transform(array_sort(collect_list(struct(pos, tok)))"
            ", s -> s.tok), ' ')"
        )
        j_select = "SELECT doc_id, pos, tok, " + js + " FROM co_p"
    else:
        pos_rows = (
            "generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS tok"
        )
        agg = "string_agg(tok, ' ' ORDER BY pos ASC)"
        j_select = (
            f"SELECT doc_id, pos, tok, unnest(range({k})) AS j FROM co_p"
        )
    idx = f"({P.idiv('pos', str(stride), d)} - j)"
    return f"""WITH {_tok_cte(d, docs)},
co_p AS (
  SELECT doc_id, {pos_rows} FROM dd_tok
),
co_j AS ({j_select}),
co_o AS (
  SELECT doc_id, pos, tok, CAST({idx} AS BIGINT) AS chunk_idx
  FROM co_j
  WHERE {idx} >= 0 AND pos < {idx} * {stride} + {chunk}
)
SELECT doc_id, chunk_idx,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {agg} AS chunk_text
FROM co_o
GROUP BY doc_id, chunk_idx"""


def gram_spectrum_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.gram_spectrum: word n-grams via
    the shared gram builders, power-of-two frequency buckets via
    length(bin(count)) - 1 (identical binary string in both engines;
    no log crosses the oracle)."""
    from .operators.textstats import SPECTRUM_N

    n = SPECTRUM_N
    if d == SPARK:
        grams = (
            f"CASE WHEN size(toks) < {n} THEN array()"
            f" ELSE transform(sequence(0, size(toks) - {n}),"
            f" i -> array_join(slice(toks, i + 1, {n}), ' ')) END"
        )
        gram_rows = "SELECT explode(grams) AS gram FROM zs_g"
    else:
        grams = (
            f"list_transform(range(greatest({_arr_size('toks', d)} - {n - 1}, 0)),"
            f" i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))"
        )
        gram_rows = "SELECT unnest(grams) AS gram FROM zs_g"
    return f"""WITH {_tok_cte(d, docs)},
zs_g AS (
  SELECT {grams} AS grams FROM dd_tok
),
zs_t AS ({gram_rows}),
zs_c AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS c FROM zs_t GROUP BY gram
)
SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS freq_bucket,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(c) AS BIGINT) AS n_occurrences,
       CAST(min(c) AS BIGINT) AS min_count,
       CAST(max(c) AS BIGINT) AS max_count
FROM zs_c
GROUP BY length(bin(c)) - 1"""


def media_thumbnail_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.multimodal.thumbnail_media: the payload
    bytes are md5-spec-synthesized (data byte k = digest(ref||'#px')
    [k % 16]), so every SAMPLED value — not just the header — is a
    pure function of the ref; the oracle states that function while
    the Spark side genuinely downsamples the real container bytes."""
    from .operators.multimodal import THUMB_GRID

    t = THUMB_GRID
    t2 = t * t

    def mb(i: int) -> str:
        if d == SPARK:
            return f"CAST(conv(substr(md5(media_ref), {2 * i + 1}, 2), 16, 10) AS BIGINT)"
        return f"CAST('0x' || substr(md5(media_ref), {2 * i + 1}, 2) AS BIGINT)"

    def pb(k: str) -> str:
        sub = f"substr(px, 2 * (({k}) % 16) + 1, 2)"
        if d == SPARK:
            return f"CAST(conv({sub}, 16, 10) AS BIGINT)"
        return f"CAST('0x' || {sub} AS BIGINT)"

    h8 = G.hexint("media_ref", d)
    px = (
        "md5(media_ref || '#px')" if d == DUCK
        else "md5(concat(media_ref, '#px'))"
    )
    ty = P.idiv("i", str(t), d)
    sy = P.idiv(f"(({ty}) * hh)", str(t), d)
    sx = P.idiv("((i % " + str(t) + ") * w)", str(t), d)
    base = f"(3 * (({sy}) * w + {sx}))"
    bval = f"({pb(base)} + {pb(base + ' + 1')} + {pb(base + ' + 2')})"
    idx = P.idiv("(i * ns)", str(t2), d)
    k0 = f"(2 * ({idx}))"
    raw = f"({pb(k0)} + 256 * {pb(k0 + ' + 1')})"
    wval = f"({raw} - CASE WHEN {raw} >= 32768 THEN 65536 ELSE 0 END)"
    if d == SPARK:
        sig = (
            "array_join(transform(array_sort(collect_list(named_struct("
            "'o', i, 'x', CAST(val AS STRING)))), s -> s.x), ',')"
        )
    else:
        sig = "string_agg(CAST(val AS VARCHAR), ',' ORDER BY i)"
    return f"""WITH ext AS ({G.extraction_sql(d, docs)}),
mt_h AS (
  SELECT {G.cast_str('doc_id', d)} AS doc_id, media_ref,
         ({h8}) % 2 = 0 AS is_bmp,
         4 * (1 + ({mb(0)}) % 8) AS w,
         1 + ({mb(1)}) % 8 AS hh,
         64 + 4 * ({mb(2)}) AS ns,
         {px} AS px
  FROM ext WHERE kind = 'media'
),
mt_i AS (
  SELECT h.*, p.pos AS i FROM mt_h h CROSS JOIN {_pos_table(t2, d)} p
),
mt_v AS (
  SELECT doc_id, media_ref, is_bmp, i,
         CASE WHEN is_bmp THEN {bval} ELSE {wval} END AS val
  FROM mt_i
)
SELECT doc_id, media_ref,
       CASE WHEN is_bmp THEN 'bmp' ELSE 'wav' END AS format,
       {sig} AS thumb_sig,
       CAST(sum(val) AS DOUBLE) / {t2} AS thumb_mean
FROM mt_v
GROUP BY doc_id, media_ref, is_bmp"""


def corpus_upsert_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.corpus_upsert over the corpus_diff
    version-pair spec: MERGE resolution + lineage columns."""
    return f"""WITH cu_d AS ({corpus_diff_sql(d, docs)})
SELECT doc_id,
       coalesce(new_hash, old_hash) AS text_hash,
       status = 'removed' AS is_tombstone,
       CAST(CASE WHEN status = 'added' THEN 2 ELSE 1 END AS BIGINT)
         AS first_seen_ver,
       CAST(CASE WHEN status = 'unchanged' THEN 1 ELSE 2 END AS BIGINT)
         AS last_changed_ver,
       status
FROM cu_d"""


def mrl_truncation_recall_sql(d: str) -> str:
    """Mirror of similarity_search.mrl_truncation_recall: brute top-k
    over the first TRUNC_DIM dims vs the full-dim brute truth."""
    from .operators.similarity_search import TRUNC_DIM

    trunc = (
        f"(SELECT vec_id, {_arr_slice('embedding', 1, TRUNC_DIM, d)}"
        f" AS embedding FROM embeddings)"
    )
    if d == DUCK:
        trunc += " te"
    return f"""WITH mr_t AS (
{ann_topk_sql(d)}
),
mr_a AS (
{ann_topk_sql(d, emb=trunc, dim=TRUNC_DIM)}
),
mr_h AS (
  SELECT a.q_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM mr_a a JOIN mr_t t ON a.q_id = t.q_id AND a.c_id = t.c_id
  GROUP BY a.q_id
),
mr_q AS (SELECT DISTINCT q_id FROM mr_t)
SELECT q.q_id,
       coalesce(h.n_hits, 0) AS n_hits,
       CAST(10 AS BIGINT) AS k,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(10 AS DOUBLE) AS recall
FROM mr_q q LEFT JOIN mr_h h ON q.q_id = h.q_id"""


def url_canonical_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.features.url_canonical: synthesize the messy
    URL from the shared spec, then case-fold host / drop fragment /
    strip utm_* params / strip the /amp segment / strip the trailing
    slash + the blocklist verdict. Backreference syntax differs by
    engine ($1 in Java regex, \\1 in RE2) — dialect-branched here."""
    from .operators.features import (
        URL_AMP_MOD,
        URL_BLOCK_MOD,
        URL_CASED_MOD,
        URL_FRAG_MOD,
        URL_ID_MOD,
        URL_PAGE_DIV,
        URL_SLASH_MOD,
        URL_UTM_MOD,
    )

    ds = G.cast_str(P.idiv("doc_id", str(URL_PAGE_DIV), d), d)
    idmod = G.cast_str("doc_id % 100", d)
    url = f"""'https://'
    || CASE WHEN doc_id % {URL_CASED_MOD} = 0 THEN 'WWW.' ELSE 'www.' END
    || source || '.example.com'
    || '/p/' || {ds}
    || CASE WHEN doc_id % {URL_AMP_MOD} = 0 THEN '/amp' ELSE '' END
    || CASE WHEN doc_id % {URL_SLASH_MOD} = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % {URL_UTM_MOD} = 0 AND doc_id % {URL_ID_MOD} = 0
            THEN '?utm_source=feed&id=' || {idmod}
            WHEN doc_id % {URL_UTM_MOD} = 0 THEN '?utm_source=feed'
            WHEN doc_id % {URL_ID_MOD} = 0 THEN '?id=' || {idmod}
            ELSE '' END
    || CASE WHEN doc_id % {URL_FRAG_MOD} = 0 THEN '#section2' ELSE '' END"""
    backref = "'$1'" if d == SPARK else "'\\1'"
    amp_re = G.rx(r"/amp(/|$)", d)
    host = f"lower(regexp_extract(url, {G.rx('^https://([^/?#]*)', d)}, 1))"
    path0 = f"regexp_extract(url, {G.rx('^https://[^/?#]*([^?#]*)', d)}, 1)"
    if d == SPARK:
        path1 = f"regexp_replace({path0}, {amp_re}, {backref})"
    else:
        path1 = f"regexp_replace({path0}, {amp_re}, {backref}, 'g')"
    q0 = f"regexp_extract(url, {G.rx(chr(92) + '?([^#]*)', d)}, 1)"
    q2 = G.replace_all(G.replace_all(q0, r"utm_[^&]*", "", d), r"^&+|&+$", "", d)
    bucket = f"({G.hexint('source', d)}) % {URL_BLOCK_MOD}"
    return f"""WITH uc_b AS (
  SELECT doc_id, source, {url} AS url FROM {docs}
),
uc_p AS (
  SELECT doc_id, source, url,
         {host} AS host, {path1} AS path1, {q2} AS query2
  FROM uc_b
),
uc_c AS (
  SELECT doc_id, url, host,
         'https://' || host
         || CASE WHEN length(path1) > 1 AND path1 LIKE '%/'
                 THEN substring(path1, 1, length(path1) - 1)
                 ELSE path1 END
         || CASE WHEN query2 <> '' THEN '?' || query2 ELSE '' END AS canon_url,
         {bucket} = 0 AS blocked
  FROM uc_p
)
SELECT doc_id, url, host, canon_url,
       canon_url <> url AS changed,
       CASE WHEN blocked THEN 'blocked_host' ELSE 'ok' END AS policy
FROM uc_c"""


def url_dup_groups_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.features.url_dup_groups over the
    url_canonical spec."""
    return f"""WITH ud_c AS ({url_canonical_sql(d, docs)})
SELECT canon_url,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
       min(doc_id) AS keep_doc
FROM ud_c
GROUP BY canon_url
HAVING count(*) > 1"""


def lang_agreement_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.lang_agreement: lang_id nested as
    a CTE crossed with the declared label column."""
    return f"""WITH la_p AS ({lang_id_sql(d, docs)}),
la_c AS (
  SELECT dd.lang AS label_lang, p.pred_lang,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM {docs} dd JOIN la_p p ON dd.doc_id = p.doc_id
  GROUP BY dd.lang, p.pred_lang
),
la_t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM la_c)
SELECT label_lang, pred_lang, n_docs,
       label_lang = pred_lang AS agree,
       CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
FROM la_c CROSS JOIN la_t"""


def host_stats_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.features.host_stats: canonical-key groupBy
    under a per-host rollup + 1-row totals broadcast."""
    return f"""WITH hs_c AS ({url_canonical_sql(d, docs)}),
hs_p AS (
  SELECT host, policy, canon_url, CAST(count(*) AS BIGINT) AS n_docs
  FROM hs_c GROUP BY host, policy, canon_url
),
hs_a AS (
  SELECT host, policy,
         CAST(sum(n_docs) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_pages,
         CAST(sum(n_docs - 1) AS BIGINT) AS n_dup_docs
  FROM hs_p GROUP BY host, policy
),
hs_t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM hs_a)
SELECT host, policy, n_docs, n_pages, n_dup_docs,
       CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_frac,
       CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
FROM hs_a CROSS JOIN hs_t"""


def quality_calibration_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.textstats.quality_calibration: integer
    score bins, top-down cumulative keep rule on the tiny
    (source × bins) frame."""
    from .operators.textstats import QCAL_DEN, QCAL_NUM

    return f"""WITH qc_s AS ({quality_score_sql(d, docs)}),
qc_b AS (
  SELECT dd.source, CAST(floor(q.avg_score_milli) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM qc_s q JOIN {docs} dd ON q.doc_id = dd.doc_id
  GROUP BY dd.source, floor(q.avg_score_milli)
),
qc_t AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_total FROM qc_b GROUP BY source
),
qc_r AS (
  SELECT b.source, b.bin, b.n, t.n_total,
         CAST(sum(b.n) OVER (PARTITION BY b.source ORDER BY b.bin DESC)
              - b.n AS BIGINT) AS cum_before
  FROM qc_b b JOIN qc_t t ON b.source = t.source
),
qc_k AS (
  SELECT * FROM qc_r WHERE {QCAL_DEN} * cum_before < {QCAL_NUM} * n_total
)
SELECT source,
       min(bin) AS threshold_milli,
       CAST(sum(n) AS BIGINT) AS n_keep,
       min(n_total) AS n_total,
       CAST(sum(n) AS DOUBLE) / CAST(min(n_total) AS DOUBLE) AS keep_rate
FROM qc_k
GROUP BY source"""


def dedup_threshold_sweep_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.dedup.dedup_threshold_sweep: integer
    cross-multiplied classifications per (pair × ladder threshold)."""
    from .operators.dedup import NUM_HASHES, SWEEP_THRESHOLDS_10

    if d == SPARK:
        agree = "size(filter(zip_with(sa.sig, sb.sig, (x, y) -> x = y), v -> v))"
        inter = "size(array_intersect(sa.sh, sb.sh))"
        uni = "size(array_union(sa.sh, sb.sh))"
        lad = "explode(array(" + ", ".join(
            str(t) for t in SWEEP_THRESHOLDS_10
        ) + ")) AS t10"
        lad_sel = f"SELECT *, {lad} FROM ts_b"
    else:
        agree = "len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))"
        inter = "len(list_intersect(sa.sh, sb.sh))"
        uni = "len(list_distinct(list_concat(sa.sh, sb.sh)))"
        lad_sel = (
            "SELECT *, unnest([" + ", ".join(
                str(t) for t in SWEEP_THRESHOLDS_10
            ) + "]) AS t10 FROM ts_b"
        )
    return f"""WITH {dedup_cte(d, docs)},
{_lsh_pairs_cte(d, "dd")},
ts_b AS (
  SELECT CAST({agree} AS BIGINT) AS n_agree,
         CAST({inter} AS BIGINT) AS ni,
         CAST({uni} AS BIGINT) AS nu
  FROM dd_pairs p
  JOIN dd_sig sa ON sa.doc_id = p.a
  JOIN dd_sig sb ON sb.doc_id = p.b
),
ts_l AS ({lad_sel}),
ts_a AS (
  SELECT t10,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN n_agree * 10 >= t10 * {NUM_HASHES} THEN 1 ELSE 0 END) AS BIGINT) AS n_est_pos,
         CAST(sum(CASE WHEN ni * 10 >= t10 * nu THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_pos,
         CAST(sum(CASE WHEN n_agree * 10 >= t10 * {NUM_HASHES}
                        AND ni * 10 >= t10 * nu THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pos
  FROM ts_l GROUP BY t10
)
SELECT CAST(t10 AS DOUBLE) / 10.0 AS threshold,
       n_pairs, n_est_pos, n_exact_pos, n_true_pos,
       CAST(n_true_pos AS DOUBLE) / CAST(greatest(n_est_pos, 1) AS DOUBLE) AS precision,
       CAST(n_true_pos AS DOUBLE) / CAST(greatest(n_exact_pos, 1) AS DOUBLE) AS recall
FROM ts_a"""


def media_captions_sql(d: str, docs: str = "documents") -> str:
    """Mirror of extraction.media_captions: per media span the nearest
    text span on each side of the reading order (frame-bounded
    last/first_value IGNORE NULLS over the per-doc window) and the
    nearer-side caption pick with prev-on-tie."""
    prev_t = (
        "last_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS) "
        "OVER (PARTITION BY doc_id ORDER BY ord "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    prev_o = (
        "last_value(CASE WHEN kind = 'text' THEN ord END IGNORE NULLS) "
        "OVER (PARTITION BY doc_id ORDER BY ord "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    next_t = (
        "first_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS) "
        "OVER (PARTITION BY doc_id ORDER BY ord "
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)"
    )
    next_o = (
        "first_value(CASE WHEN kind = 'text' THEN ord END IGNORE NULLS) "
        "OVER (PARTITION BY doc_id ORDER BY ord "
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)"
    )
    side = """CASE
        WHEN prev_ord IS NULL AND next_ord IS NULL THEN 'none'
        WHEN prev_ord IS NULL
             OR (next_ord IS NOT NULL
                 AND (next_ord - ord) < (ord - prev_ord)) THEN 'next'
        ELSE 'prev' END"""
    return f"""WITH ext AS ({G.extraction_sql(d, docs)}),
mc_w AS (
  SELECT doc_id, CAST(ord AS BIGINT) AS ord, kind, media_ref,
         {prev_t} AS prev_text,
         CAST({prev_o} AS BIGINT) AS prev_ord,
         {next_t} AS next_text,
         CAST({next_o} AS BIGINT) AS next_ord
  FROM ext
),
mc_m AS (
  SELECT doc_id, ord, media_ref, prev_text, prev_ord, next_text,
         next_ord, {side} AS caption_side
  FROM mc_w WHERE kind = 'media'
)
SELECT doc_id, ord, media_ref, prev_text, prev_ord, next_text, next_ord,
       caption_side,
       CASE caption_side WHEN 'prev' THEN prev_text
                         WHEN 'next' THEN next_text
                         ELSE '' END AS caption
FROM mc_m"""


def filter_funnel_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.filter_funnel: the corpus_filter
    verdict aggregated into the fixed-precedence drop waterfall.
    Integer-only; the window sum is re-cast to BIGINT (DuckDB window
    SUM widens to HUGEINT — the round-2 match_merged lesson)."""
    from .operators.pipeline import FUNNEL_STAGES

    dim = ", ".join(
        f"({i + 1}, '{s}')" for i, s in enumerate(FUNNEL_STAGES)
    )
    return f"""WITH ff_v AS ({corpus_filter_sql(d, docs)}),
ff_c AS (
  SELECT drop_reason, CAST(count(*) AS BIGINT) AS n
  FROM ff_v GROUP BY drop_reason
),
ff_t AS (SELECT CAST(sum(n) AS BIGINT) AS n_corpus FROM ff_c),
ff_s AS (SELECT * FROM (VALUES {dim}) AS t(stage_no, stage)),
ff_j AS (
  SELECT CAST(s.stage_no AS BIGINT) AS stage_no, s.stage,
         CAST(coalesce(c.n, 0) AS BIGINT) AS n_dropped, t.n_corpus
  FROM ff_s s LEFT JOIN ff_c c ON s.stage = c.drop_reason
  CROSS JOIN ff_t t
)
SELECT stage_no, stage, n_dropped, n_corpus,
       CAST(n_corpus - sum(n_dropped) OVER (
         ORDER BY stage_no
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS survivors
FROM ff_j"""


def epochs_per_source_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.epochs_per_source: integer token
    sums, source-ordered Σ√ fold, then the identical single-op double
    chain (divide → multiply → divide → compare/least) via stacked
    CTEs so evaluation order matches Spark's expression tree."""
    from .operators.pipeline import EPOCH_CAP, TOKEN_BUDGET

    ws = _lfilter(split_rx("text", r"[ \t\n\x0B\f\r]+", d), "t -> t <> ''", d)
    fold = _ordered_fold("sqrt(CAST(src_tokens AS DOUBLE))", "source", d)
    b = f"CAST({TOKEN_BUDGET} AS DOUBLE)"
    cap = f"CAST({EPOCH_CAP} AS DOUBLE)"
    toks = "CAST(src_tokens AS DOUBLE)"
    return f"""WITH ep_d AS (
  SELECT source, CAST({_arr_size(ws, d)} AS BIGINT) AS n_ws FROM {docs}
),
ep_p AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_ws) AS BIGINT) AS src_tokens
  FROM ep_d GROUP BY source
),
ep_t AS (SELECT {fold} AS sum_sqrt FROM ep_p),
ep_s AS (
  SELECT source, n_docs, src_tokens,
         sqrt({toks}) / t.sum_sqrt AS share
  FROM ep_p CROSS JOIN ep_t t
),
ep_a AS (SELECT *, share * {b} AS alloc_tokens FROM ep_s),
ep_e AS (SELECT *, alloc_tokens / {toks} AS epochs FROM ep_a)
SELECT source, n_docs, src_tokens, share, alloc_tokens, epochs,
       epochs > {cap} AS over_cap,
       least(alloc_tokens, {cap} * {toks}) AS eff_tokens
FROM ep_e"""


def shard_assign_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.shard_assign: per-doc HRW argmax
    via max_by over a VALUES shard dim (md5 hex compares
    lexicographically in both engines; ties impossible)."""
    from .operators.pipeline import SHARDS_AFTER, SHARDS_BEFORE

    dim = ", ".join(f"({s})" for s in range(SHARDS_AFTER))
    h = (
        f"md5({G.cast_str('d.doc_id', d)} || ':' || "
        f"{G.cast_str('s.shard', d)})"
    )
    return f"""WITH sa_s AS (SELECT * FROM (VALUES {dim}) AS t(shard)),
sa_h AS (
  SELECT d.doc_id, CAST(s.shard AS BIGINT) AS shard, {h} AS h
  FROM {docs} d CROSS JOIN sa_s s
),
sa_a AS (
  SELECT doc_id,
         max_by(shard, h) FILTER (WHERE shard < {SHARDS_BEFORE})
           AS shard_before,
         max_by(shard, h) AS shard_after
  FROM sa_h GROUP BY doc_id
)
SELECT doc_id, CAST(shard_before AS BIGINT) AS shard_before,
       CAST(shard_after AS BIGINT) AS shard_after,
       shard_before <> shard_after AS moved
FROM sa_a"""


def token_cardinality_sql(d: str, docs: str = "documents") -> str:
    """Mirror of textstats.token_cardinality: exact distinct tokens
    per source + linear-counting bucket occupancy (hexint % M, the
    hash_bucket twin). Integer-only."""
    from .operators.textstats import CARD_BUCKETS

    toks = _lfilter(split_rx("lower(text)", "[^a-z0-9]+", d), "t -> length(t) >= 2", d)
    bkt = f"({G.hexint('tok', d)}) % {CARD_BUCKETS}"
    return f"""WITH tc_d AS (SELECT source, {toks} AS toks FROM {docs}),
tc_t AS (SELECT source, {explode('toks', 'tok', d)} FROM tc_d),
tc_p AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS n_occ
  FROM tc_t GROUP BY source, tok
)
SELECT source,
       CAST(sum(n_occ) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(count(DISTINCT {bkt}) AS BIGINT) AS n_buckets_occupied
FROM tc_p GROUP BY source"""


def funnel_by_source_sql(d: str, docs: str = "documents") -> str:
    """Mirror of operators.pipeline.funnel_by_source: corpus_filter's
    verdict joined back to source, grouped by (source, stage), with
    the per-source window total re-cast to BIGINT."""
    return f"""WITH fs_v AS ({corpus_filter_sql(d, docs)}),
fs_j AS (
  SELECT dd.source, coalesce(v.drop_reason, 'admitted') AS stage
  FROM fs_v v JOIN {docs} dd ON v.doc_id = dd.doc_id
),
fs_p AS (
  SELECT source, stage, CAST(count(*) AS BIGINT) AS n_docs
  FROM fs_j GROUP BY source, stage
),
fs_t AS (
  SELECT source, stage, n_docs,
         CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
           AS src_total
  FROM fs_p
)
SELECT source, stage, n_docs, src_total,
       CAST(n_docs AS DOUBLE) / CAST(src_total AS DOUBLE) AS stage_share
FROM fs_t"""


def media_phash_sql(d: str, docs: str = "documents") -> str:
    """Mirror of multimodal.media_phash_groups: aHash bits from the
    cell-by-cell oracled thumbnail signature, grouped per (format,
    hash) with a ≥2 dup-group filter."""
    if d == SPARK:
        bits = (
            "concat_ws('', transform(split(thumb_sig, ','), "
            "x -> CASE WHEN CAST(x AS DOUBLE) > thumb_mean "
            "THEN '1' ELSE '0' END))"
        )
    else:
        bits = (
            "array_to_string(list_transform(string_split(thumb_sig, ','), "
            "x -> CASE WHEN CAST(x AS DOUBLE) > thumb_mean "
            "THEN '1' ELSE '0' END), '')"
        )
    return f"""WITH ph_t AS ({media_thumbnail_sql(d, docs)}),
ph_h AS (
  SELECT doc_id, media_ref, format, {bits} AS ahash FROM ph_t
)
SELECT format, ahash,
       CAST(count(*) AS BIGINT) AS n_media,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       min(media_ref) AS example_ref
FROM ph_h GROUP BY format, ahash HAVING count(*) >= 2"""


def length_quantiles_sql(d: str, docs: str = "documents") -> str:
    """Mirror of textstats.length_quantiles: (source, length)
    histogram, per-source cumulative window (re-cast to BIGINT), pct
    VALUES dim, integer ceil-rank rule, min length at-or-past rank."""
    from .operators.textstats import QUANTILE_PCTS

    dim = ", ".join(f"({int(p)})" for p in QUANTILE_PCTS)
    thr = P.idiv("(p.pct * t.n_docs + 99)", "100", d)
    return f"""WITH lq_h AS (
  SELECT source, CAST(length(text) AS BIGINT) AS len,
         CAST(count(*) AS BIGINT) AS n
  FROM {docs} GROUP BY source, CAST(length(text) AS BIGINT)
),
lq_c AS (
  SELECT source, len, n,
         CAST(sum(n) OVER (PARTITION BY source ORDER BY len
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum
  FROM lq_h
),
lq_t AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs FROM lq_h GROUP BY source),
lq_p AS (SELECT CAST(pct AS BIGINT) AS pct FROM (VALUES {dim}) AS v(pct))
SELECT c.source, p.pct,
       CAST(min(c.len) AS BIGINT) AS q_len,
       CAST(min(t.n_docs) AS BIGINT) AS n_docs
FROM lq_c c
JOIN lq_t t ON c.source = t.source
CROSS JOIN lq_p p
WHERE c.cum >= CAST({thr} AS BIGINT)
GROUP BY c.source, p.pct"""


def media_phash_pairs_sql(d: str, docs: str = "documents") -> str:
    """Mirror of multimodal.media_phash_pairs: thumbnail bits → 16-bit
    integer fingerprint (order-fixed integer fold), then the exact
    simhash_pairs machinery (banded equi-join, hot-band guard,
    popcount verify) with media_refs as ids."""
    from .operators.dedup import (
        MAX_BUCKET,
        SIMHASH_BAND_BITS,
        SIMHASH_BITS,
        SIMHASH_HAM_MAX,
    )

    nb = SIMHASH_BITS // SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bit = (
        "CASE WHEN CAST(x AS DOUBLE) > thumb_mean "
        "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    if d == SPARK:
        fold = (
            "aggregate(transform(split(thumb_sig, ','), "
            f"x -> {bit}), CAST(0 AS BIGINT), (acc, b) -> acc * 2 + b)"
        )
    else:
        fold = (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(string_split(thumb_sig, ','), x -> {bit})), "
            "(acc, b) -> acc * 2 + b)"
        )

    def band_val(b: int) -> str:
        sh = SIMHASH_BAND_BITS * b
        if d == SPARK:
            return f"shiftright(simhash, {sh}) % {mask + 1}"
        return f"(simhash >> {sh}) % {mask + 1}"

    bands = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {b} AS band, {band_val(b)} AS val"
        f" FROM mp_f"
        for b in range(nb)
    )
    xor = "xor(fa, fb)" if d == DUCK else "fa ^ fb"
    ham = f"bit_count({xor})"
    return f"""WITH mp_t AS ({media_thumbnail_sql(d, docs)}),
mp_f AS (SELECT media_ref AS doc_id, {fold} AS simhash FROM mp_t),
mp_bands AS (
{bands}
),
mp_small AS (
  SELECT band, val FROM mp_bands GROUP BY band, val HAVING count(*) <= {MAX_BUCKET}
),
mp_bs AS (
  SELECT x.* FROM mp_bands x JOIN mp_small s ON x.band = s.band AND x.val = s.val
),
mp_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         x.simhash AS fa, y.simhash AS fb
  FROM mp_bs x JOIN mp_bs y ON x.band = y.band AND x.val = y.val
    AND x.doc_id < y.doc_id
)
SELECT a, b, CAST({ham} AS BIGINT) AS hamming
FROM mp_pairs WHERE {ham} <= {SIMHASH_HAM_MAX}"""

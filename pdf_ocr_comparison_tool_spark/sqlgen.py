"""Cross-dialect SQL generation (Spark SQL + DuckDB).

The driver's correctness gate runs each Spark query side-by-side with
an ANSI-SQL oracle on DuckDB (same parquet tables). Most relational
SQL is shared verbatim; the handful of function-name / literal-escaping
differences are centralized here so every oracle is generated from the
same single spec as the Spark implementation.

Also hosts the **synthetic spans derivation**: the driver testdata has a
flat ``documents(doc_id, text, ...)`` table, while the engine's input
contract (BASELINE.json input_hint) is
``(doc_id, spans:array<struct<kind,text,media_ref,offset>>)``. We derive
the spans table *deterministically* from ``documents`` with pure integer
arithmetic + string ops expressible identically in Spark and DuckDB, so
the whole extraction pipeline is oracle-checkable end to end. The
derivation injects exactly the adversarial shapes of FIXTURES.md §1:
shuffled non-contiguous offsets with duplicates, ~30% media spans, OCR
noise lines (cf. reference deepseek_ocr2_engine.py:304-341), grounding
markers ``<|...|>`` / ``[[x,y,x,y]]`` (cf. :300-302), and CJK
date/amount/id tokens so the feature regexes (ocr_engine.py:325-345)
fire.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"

# ---- deterministic-hash spec (shared by synth.py DataFrame impl) ----
H_MULT = 2654435761
H_KMULT = 40503
H_ADD = 13
H_MOD = 1000003
NSPAN_MOD = 8          # n_spans = 1 + doc_id % 8
MEDIA_FRAC_MOD = 10    # h % 10 < 3  -> media span
MEDIA_FRAC_LT = 3
OFFSET_MOD = 97        # offsets collide across spans -> exercises tiebreak
SEG_STRIDE = 37
SEG_LEN = 60
ENRICH_MOD = 11        # h % 11 == 0 -> append CJK date/amount/id tokens
MARKER_MOD = 7         # h % 7 == 0  -> wrap in <|ref|>...<|/ref|>[[...]]
NOISE_MOD = 5          # h % 5 in (0,1) -> append a debug noise line

ENRICH_TEXT = (
    " 合同号: HT20030001 2003年5月31日 记账凭证 金额: ¥300,000.00 300000元 2003-05-31"
)
NOISE_LINE_0 = "torch.Size([1, 3, 224, 224])"
NOISE_LINE_1 = "Setting pad_token_id to eos_token_id"

# ---- grounded-output spec (reference deepseek_ocr2_engine.py:270-283) --
# The engine's raw grounded output format is
#   <|ref|>text<|/ref|><|det|>[[x1, y1, x2, y2]]<|/det|>\n<body>
# repeated per span. The synthetic blob derives spans + bboxes from
# doc_id/k with pure arithmetic; the parse operator splits the blob
# back into (bbox, text) spans and linearizes reading order y-then-x.
GR_NSPAN_MOD = 5       # n_spans = 1 + doc_id % 5
GR_KMULT = 7919
GR_ADD = 31
GR_MOD = 100003
GR_STRIDE = 23
GR_LEN = 40
GR_HDR = "<|ref|>text<|/ref|><|det|>[["
GR_REF_SPLIT_RE = r"<\|ref\|>"
GR_HDR_RE = (
    r"^text<\|/ref\|><\|det\|>\[\[(\d+),[ \t\n\x0B\f\r]*(\d+),[ \t\n\x0B\f\r]*(\d+),[ \t\n\x0B\f\r]*(\d+)\]\]<\|/det\|>"
)
GR_BODY_RE = r"(?s)<\|/det\|>[ \t\n\x0B\f\r]*\n?(.*)$"


# ---- normalization spec (reference deepseek_ocr2_engine.py:300-341) ----
MARKER_RE = r"<\|[^|]*\|>"
BBOX_RE = r"\[\[[0-9, ]*\]\]"
DEBUG_RE = (
    r"torch\.size|attention|token|cache|setting|compile|warning"
    r"|deprecat|tensor|cuda|device|dtype"
)

# Feature-extraction regexes — the reference's FULL pattern lists
# (ocr_engine.py:324-344: DATE_PATTERNS, AMOUNT_PATTERNS,
# NUMBER_PATTERNS verbatim; results are set-deduped there, array_
# distinct here).
DATE_RES = [
    r"\d{4}[-/年]\d{1,2}[-/月]\d{1,2}[日]?",
    r"\d{4}\.\d{1,2}\.\d{1,2}",
    r"\d{4}年\d{1,2}月\d{1,2}日",
]
AMOUNT_RES = [
    r"[¥￥][ \t\n\x0B\f\r]*[\d,]+\.?\d*",
    r"[\d,]+\.?\d*[ \t\n\x0B\f\r]*[元万]",
    r"金额[：:][ \t\n\x0B\f\r]*[\d,]+\.?\d*",
    r"合计[：:][ \t\n\x0B\f\r]*[\d,]+\.?\d*",
]
NUMBER_RES = [
    r"[A-Za-z]*\d{4,}",
    r"编号[：:][ \t\n\x0B\f\r]*[^ \t\n\x0B\f\r]+",
    r"合同号[：:][ \t\n\x0B\f\r]*[^ \t\n\x0B\f\r]+",
    r"发票号[：:][ \t\n\x0B\f\r]*[^ \t\n\x0B\f\r]+",
]


# CJK→ASCII fold for cross-engine levenshtein parity: DuckDB's
# levenshtein is byte-based on UTF-8 (CJK edit = 3) while Spark's is
# character-based (CJK edit = 1). The synthetic pages' non-ASCII
# alphabet is closed (the constants above), so an injective 1:1
# translate to ASCII makes both engines compute the same char-level
# distance. Engine operators keep true char-level semantics; the fold is
# applied symmetrically in oracle-facing queries only.
CJK_FOLD_SRC = "日期金额元记账凭证收款摘要发票税号价合计同甲方乙首（）"
CJK_FOLD_DST = "ABCDEGIJKLMNOQRSUVWYZ@#$%&*"
assert len(CJK_FOLD_SRC) == len(CJK_FOLD_DST)


# ---------------------------------------------------------------- dialect
def rx(pat: str, d: str) -> str:
    """Render a regex as a SQL string literal for dialect *d*.

    Spark SQL string literals process backslash escapes; DuckDB's do not.
    """
    body = pat.replace("\\", "\\\\") if d == SPARK else pat
    return "'" + body.replace("'", "''") + "'"


def lit(s: str, d: str) -> str:
    body = s.replace("'", "''")
    if d == SPARK:
        body = body.replace("\\", "\\\\")
    return "'" + body + "'"


def cast_str(expr: str, d: str) -> str:
    return f"CAST({expr} AS STRING)" if d == SPARK else f"CAST({expr} AS VARCHAR)"


def hexint(expr: str, d: str) -> str:
    """First-8-hex-chars of an md5 → BIGINT, identical in both dialects."""
    if d == SPARK:
        return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def hexint48(expr: str, d: str) -> str:
    """48-bit content-free id hash: first 12 hex chars of
    md5(CAST(expr AS STRING)) → BIGINT. The tape-order hash shared by
    pipeline.seq_packing (Spark twin: pipeline.pack_tape_hash) and its
    oracle — works for string AND numeric ids (the string cast is what
    makes it id-type safe)."""
    s = cast_str(expr, d)
    if d == SPARK:
        return f"CAST(conv(substr(md5({s}), 1, 12), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr(md5({s}), 1, 12) AS BIGINT)"


def hexint_slice(expr: str, start1: int, d: str) -> str:
    """One 32-bit slice of an ALREADY-COMPUTED md5 hex string → BIGINT
    (8 hex chars at 1-based *start1*). Gives k independent hash
    functions from a single md5 — the Bloom-filter position family."""
    if d == SPARK:
        return f"CAST(conv(substr({expr}, {start1}, 8), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr({expr}, {start1}, 8) AS BIGINT)"


def array_join(arr: str, sep: str, d: str) -> str:
    if d == SPARK:
        return f"array_join({arr}, {sep})"
    # DuckDB's array_to_string returns NULL for an empty list; Spark's
    # array_join returns '' — align on ''.
    return f"coalesce(array_to_string({arr}, {sep}), '')"


def ltransform(arr: str, lam: str, d: str) -> str:
    fn = "transform" if d == SPARK else "list_transform"
    return f"{fn}({arr}, {lam})"


def rlike(expr: str, pat: str, d: str) -> str:
    if d == SPARK:
        return f"{expr} RLIKE {rx(pat, d)}"
    return f"regexp_matches({expr}, {rx(pat, d)})"


def replace_all(expr: str, pat: str, repl: str, d: str) -> str:
    """Global regex replace (DuckDB needs the 'g' flag; Spark is global)."""
    if d == SPARK:
        return f"regexp_replace({expr}, {rx(pat, d)}, {lit(repl, d)})"
    return f"regexp_replace({expr}, {rx(pat, d)}, {lit(repl, d)}, 'g')"


def extract_all(expr: str, pat: str, d: str) -> str:
    if d == SPARK:
        return f"regexp_extract_all({expr}, {rx(pat, d)}, 0)"
    return f"regexp_extract_all({expr}, {rx(pat, d)})"


def json_str(expr: str, path: str, d: str) -> str:
    """Extract a JSON field as VARCHAR — the dialect-portable entry
    point for semi-structured payload columns (Spark: Jackson-backed
    get_json_object, codegen'd; DuckDB: json_extract_string). NULL on
    missing key / malformed JSON in both engines."""
    if d == SPARK:
        return f"get_json_object({expr}, '{path}')"
    return f"json_extract_string({expr}, '{path}')"


def fold_cjk(expr: str, d: str) -> str:
    return f"translate({expr}, {lit(CJK_FOLD_SRC, d)}, {lit(CJK_FOLD_DST, d)})"


def explode_range(n_expr: str, alias: str, d: str) -> str:
    """SELECT-list fragment producing one row per k in [0, n)."""
    if d == SPARK:
        return f"explode(sequence(0, CAST({n_expr} AS INT) - 1)) AS {alias}"
    return f"unnest(range(CAST({n_expr} AS BIGINT))) AS {alias}"


# --------------------------------------------------- grounded derivation
def gr_coords(h: str) -> tuple[str, str, str, str]:
    """Bbox coordinate expressions from the span hash (shared spec)."""
    return (
        f"({h}) % 900",
        f"(({h}) * 7) % 1200",
        f"({h}) % 900 + 40 + ({h}) % 100",
        f"(({h}) * 7) % 1200 + 20 + ({h}) % 50",
    )


def grounded_cte(d: str, docs: str = "documents") -> str:
    """CTE chain deriving one grounded raw-output blob per document."""
    nl = "chr(10)"
    x1, y1, x2, y2 = gr_coords("h")
    seg = (
        f"{lit(GR_HDR, d)} || {cast_str(x1, d)} || ', ' || {cast_str(y1, d)}"
        f" || ', ' || {cast_str(x2, d)} || ', ' || {cast_str(y2, d)}"
        f" || ']]<|/det|>' || {nl}"
        f" || substr(text, 1 + k * {GR_STRIDE}, {GR_LEN})"
    )
    return f"""
gr_base AS (
  SELECT doc_id, text, 1 + doc_id % {GR_NSPAN_MOD} AS n_spans FROM {docs}
),
gr_ks AS (
  SELECT doc_id, text, {explode_range('n_spans', 'k', d)} FROM gr_base
),
gr_h AS (
  SELECT doc_id, k, text,
         (doc_id * {H_MULT} + k * {GR_KMULT} + {GR_ADD}) % {GR_MOD} AS h
  FROM gr_ks
),
gr_blob AS (
  SELECT doc_id, string_agg({seg}, {nl} ORDER BY k) AS grounded
  FROM gr_h GROUP BY doc_id
)"""


def grounded_parse_sql(d: str, docs: str = "documents") -> str:
    """Synthesize the grounded blob, then parse it back: split on the
    ref marker, extract bbox + body per piece, drop non-matching /
    empty pieces, reading order = (y1, x1) linearization (W2; reference
    deepseek_ocr2_engine.py:270-283 parses, this adds the ordering)."""
    if d == SPARK:
        pieces = f"split(grounded, {rx(GR_REF_SPLIT_RE, d)})"
    else:
        pieces = f"regexp_split_to_array(grounded, {rx(GR_REF_SPLIT_RE, d)})"
    grp = lambda g: f"regexp_extract(piece, {rx(GR_HDR_RE, d)}, {g})"  # noqa: E731
    # full whitespace strip, mirroring the operator (reference strip())
    body = replace_all(
        f"regexp_extract(piece, {rx(GR_BODY_RE, d)}, 1)", r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", "", d
    )
    if d == SPARK:
        k_piece = f"posexplode({pieces}) AS (k, piece)"
        unn = f"SELECT doc_id, {k_piece} FROM gr_blob"
    else:
        unn = (
            f"SELECT doc_id, k, ps[k + 1] AS piece FROM ("
            f"SELECT doc_id, ps, unnest(range(len(ps))) AS k FROM "
            f"(SELECT doc_id, {pieces} AS ps FROM gr_blob) q1) q2"
        )
    return f"""WITH {grounded_cte(d, docs)},
gp_pieces AS ({unn}),
gp_x AS (
  SELECT doc_id, k,
         {grp(1)} AS x1s, {grp(2)} AS y1s, {grp(3)} AS x2s, {grp(4)} AS y2s,
         {body} AS txt
  FROM gp_pieces
),
gp_kept AS (
  SELECT doc_id, k,
         CAST(x1s AS INT) AS x1, CAST(y1s AS INT) AS y1,
         CAST(x2s AS INT) AS x2, CAST(y2s AS INT) AS y2, txt
  FROM gp_x WHERE x1s <> '' AND txt <> ''
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY y1, x1, k) - 1 AS BIGINT) AS ord,
       x1, y1, x2, y2, txt
FROM gp_kept"""


# ------------------------------------------------------- spans derivation
def spans_cte(d: str, docs: str = "documents") -> str:
    """CTE chain deriving the interleaved-spans rows from *docs*.

    Produces relation ``spans(doc_id, k, kind, text, media_ref, off)``
    where ``k`` is the stored (shuffled) array position and ``off`` the
    geometric reading-order key. Pure arithmetic/string ops — identical
    results in Spark and DuckDB.
    """
    nl = "chr(10)"
    enrich = lit(ENRICH_TEXT, d)
    noise0 = lit(NOISE_LINE_0, d)
    noise1 = lit(NOISE_LINE_1, d)
    return f"""
span_base AS (
  SELECT doc_id, text, 1 + doc_id % {NSPAN_MOD} AS n_spans FROM {docs}
),
span_ks AS (
  SELECT doc_id, text, {explode_range('n_spans', 'k', d)} FROM span_base
),
span_h AS (
  SELECT doc_id, k, text,
         (doc_id * {H_MULT} + k * {H_KMULT} + {H_ADD}) % {H_MOD} AS h
  FROM span_ks
),
span_raw AS (
  SELECT doc_id, k, h,
    CASE WHEN h % {MEDIA_FRAC_MOD} < {MEDIA_FRAC_LT} THEN 'media' ELSE 'text' END AS kind,
    h % {OFFSET_MOD} AS off,
    CASE WHEN h % {MEDIA_FRAC_MOD} < {MEDIA_FRAC_LT}
         THEN 'm://' || {cast_str('doc_id', d)} || '/' || {cast_str('k', d)}
         ELSE '' END AS media_ref,
    substr(text, 1 + k * {SEG_STRIDE}, {SEG_LEN}) AS seg
  FROM span_h
),
spans AS (
  SELECT doc_id, k, kind, media_ref, off,
    CASE WHEN kind = 'media' THEN ''
    ELSE
      CASE WHEN h % {MARKER_MOD} = 0 THEN '<|ref|>' ELSE '' END
      || seg
      || CASE WHEN h % {ENRICH_MOD} = 0 THEN {enrich} ELSE '' END
      || CASE WHEN h % {MARKER_MOD} = 0 THEN '<|/ref|>[[12, 34, 56, 78]]' ELSE '' END
      || CASE WHEN h % {NOISE_MOD} = 0 THEN {nl} || {noise0}
              WHEN h % {NOISE_MOD} = 1 THEN {nl} || {noise1}
              ELSE '' END
    END AS text
  FROM span_raw
)"""


def norm_text_expr(col: str, d: str) -> str:
    """Span-text normalization (T6+T7+F2 of SURVEY §2.7/§2.2).

    Strip grounding markers and bbox literals, split lines, drop debug /
    too-short lines, trim survivors, re-join with newline.
    """
    nl = "chr(10)"
    stripped = replace_all(replace_all(col, MARKER_RE, "", d), BBOX_RE, "", d)
    kept = (
        f"filter(split({stripped}, {nl}),"
        f" ln -> length(trim(ln)) >= 2 AND NOT ({rlike('lower(trim(ln))', DEBUG_RE, d)}))"
    )
    return array_join(ltransform(kept, "ln -> trim(ln)", d), nl, d)


def extraction_sql(d: str, docs: str = "documents") -> str:
    """Full extraction pipeline over the derived spans: normalize, drop
    empty text spans, order by (off, kind, media_ref, text), reindex.

    Output: (doc_id, ord, kind, text, media_ref) — the per-row form of
    the byte-equality invariant (kind, text, media_ref, order).
    """
    return f"""
WITH {spans_cte(d, docs)},
span_norm AS (
  SELECT doc_id, kind, media_ref, off,
         CASE WHEN kind = 'media' THEN '' ELSE {norm_text_expr('text', d)} END AS text
  FROM spans
),
span_kept AS (
  SELECT * FROM span_norm WHERE kind = 'media' OR text <> ''
)
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY off, kind, media_ref, text) - 1 AS ord,
       kind, text, media_ref
FROM span_kept
"""

"""Mimic the driver's correctness gate: run every registered query on
Spark and its DuckDB oracle side-by-side, compare row count + values
(order-insensitive, column-name sorted) — so mismatches surface here
before CORRECTNESS_r{N}.json does."""

from __future__ import annotations

import math

import pytest

from pdf_ocr_comparison_tool_spark import queries as Q
from tests.conftest import SF_DIR


def _norm_cell(v):
    import decimal
    import datetime

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def _cmp_cell(a, b):
    # EXACT equality, floats included — the external driver hashes raw
    # bytes, so any last-ulp divergence it would flag must fail here too
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is None and b is None
        return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
    return a == b


@pytest.mark.parametrize("name", sorted(Q.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = Q.queries()[name]
    sdf = fn(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(Q.oracle_sql()[name])
    d_cols = [c.lower() for c in [d[0] for d in res.description]]
    d_rows = res.fetchall()

    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert len(a) == len(b) and all(
            _cmp_cell(x, y) for x, y in zip(a, b)
        ), f"{name}: row {i} mismatch\n spark={a}\n duck ={b}"

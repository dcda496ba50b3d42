"""Mimic the driver's correctness gate: run every registered query on
Spark and its DuckDB oracle side-by-side at the DRIVER's scale (sf0.01)
and compare row count + values (order-insensitive, column-name sorted)
— so mismatches surface here before CORRECTNESS_r{N}.json does.

TYPE-STRICT: the DuckDB result is fetched through Arrow and its schema
is compared family-by-family against the Spark schema (int vs float vs
decimal vs string vs list<...> ...). The driver hashes serialized
values, so a decimal128 oracle column vs an int64 Spark column is a
hash mismatch even when every value is numerically equal — round 2's
`match_merged` failed exactly this way (uncast DuckDB window SUM).
A Decimal must never cross the oracle boundary uncast.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pytest

from pdf_ocr_comparison_tool_spark import queries as Q
from tests.conftest import PARITY_SF_DIR


def _spark_family(dt: str):
    """Canonical type family of a Spark simpleString dtype."""
    if dt.startswith("array<"):
        return ("list", _spark_family(dt[6:-1]))
    if dt.startswith("map<"):
        return "map"
    if dt.startswith("decimal"):
        return "decimal"
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("timestamp"):
        return "timestamp"
    return dt  # string, boolean, date, binary


def _arrow_family(t: "pa.DataType"):
    """Canonical type family of an Arrow type (DuckDB result side)."""
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", _arrow_family(t.value_type))
    if pa.types.is_map(t):
        return "map"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def _norm_cell(v):
    import datetime

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
def test_query_matches_oracle(spark, duck_parity, name):
    fn = Q.queries()[name]
    sdf = fn(spark, PARITY_SF_DIR)
    s_fams = {
        f.name.lower(): _spark_family(f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    tbl = duck_parity.execute(Q.oracle_sql()[name]).arrow()
    d_fams = {
        f.name.lower(): _arrow_family(f.type) for f in tbl.schema
    }
    d_cols = [n.lower() for n in tbl.schema.names]
    d_rows = list(zip(*[col.to_pylist() for col in tbl.columns])) if tbl.num_columns else []
    if tbl.num_rows and not d_rows:
        d_rows = [()] * tbl.num_rows

    # type gate FIRST: a family mismatch is a driver hash-fail even
    # when every value compares equal (r2's match_merged decimal bug)
    assert s_fams == d_fams, f"{name}: type-family mismatch {s_fams} vs {d_fams}"

    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert len(a) == len(b) and all(
            _cmp_cell(x, y) for x, y in zip(a, b)
        ), f"{name}: row {i} mismatch\n spark={a}\n duck ={b}"

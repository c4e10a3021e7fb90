"""Oracle-differential suite: every registered query runs in BOTH engines
(Spark builder vs DuckDB oracle SQL) and must agree on row count, column
names, and order-insensitive values — floats compared bit-exactly, which
is stricter than the driver's hash (a green run here implies a green
driver run).

Queries with ``oracle=None`` get a rows-executable smoke check instead.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pytest

from etl_template_spark.queries import REGISTRY


def _norm_cell(v):
    if v is None:
        return ("_null",)
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("_nan",)
        return ("f", v)
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, date):
        return ("d", v.isoformat())
    return ("s", str(v))


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


_SPARK_INT = {"tinyint", "smallint", "int", "bigint", "long"}
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _kind_spark(dt: str) -> str:
    dt = dt.lower()
    if dt in _SPARK_INT:
        return "int"
    if dt in ("float", "double") or dt.startswith("decimal"):
        return "float"
    if dt == "boolean":
        return "bool"
    if dt == "string":
        return "str"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "ts"
    if dt == "binary":
        return "bin"
    return "nested"


def _kind_duck(t) -> str:
    s = str(t).upper()
    if s in _DUCK_INT:
        return "int"
    # HUGEINT (int128, e.g. DuckDB SUM over BIGINT) has no 64-bit integer
    # representation: the driver's pandas/arrow canonicalization turns it
    # into float64, which hash-mismatches a Spark bigint even when every
    # value is identical.  Classifying it as float here makes that a test
    # failure at build time instead of a burned correctness round.
    if s in ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "REAL") or s.startswith(
        "DECIMAL"
    ):
        return "float"
    if s == "BOOLEAN":
        return "bool"
    if s == "VARCHAR":
        return "str"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s == "BLOB":
        return "bin"
    return "nested"


def compare(spark_df, duck_con, sql):
    spark_rows = spark_df.collect()
    spark_cols = list(spark_df.columns)
    rel = duck_con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    spark_kinds = {n.lower(): _kind_spark(t) for n, t in spark_df.dtypes}
    duck_kinds = {
        n.lower(): _kind_duck(t) for n, t in zip(duck_cols, rel.types)
    }
    kind_diff = {
        c: (spark_kinds[c], duck_kinds[c])
        for c in spark_kinds
        if spark_kinds[c] != duck_kinds[c]
    }
    assert not kind_diff, (
        f"type-kind mismatch (spark, duck) — the driver canonicalizes "
        f"HUGEINT/DECIMAL to float64, so these columns would hash-mismatch "
        f"even with identical values; CAST in the oracle: {kind_diff}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = _normalize([tuple(r) for r in spark_rows], [c.lower() for c in spark_cols])
    b = _normalize(duck_rows, [c.lower() for c in duck_cols])
    mismatches = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatches, (
        f"value mismatch at {len(mismatches)} sorted rows; first: "
        f"spark={a[mismatches[0]]} duck={b[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    df = q.build(spark, sf_dir)
    if q.oracle is None:
        # rows-only contract: runs and yields a stable, materializable result
        assert df.count() >= 0
        return
    compare(df, duck, q.oracle)

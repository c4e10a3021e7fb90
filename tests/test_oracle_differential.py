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


def compare(spark_df, duck_con, sql):
    spark_rows = spark_df.collect()
    spark_cols = list(spark_df.columns)
    rel = duck_con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
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

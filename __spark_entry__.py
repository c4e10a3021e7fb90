"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

This file is a thin bridge to ``etl_template_spark.registry.REGISTRY``:
importing ``etl_template_spark.queries`` populates the registry (one
``@register`` per operator from SURVEY.md §2B), and the three functions
below expose it verbatim.  The queries package imports WITHOUT a live
SparkSession (no module-level pandas_udf/DDL parsing), so importing this
module is always safe.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_template_spark.queries import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped q_agg_group) on sf0.001."""
    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", SMOKE_SF_DIR)
    return REGISTRY["q_agg_group"].build(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Column names are aliased identically in builder and oracle.
    """
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; queries with ``oracle=None``
    (approximate / sink round-trip / ANN ops) are omitted so the driver
    records its weaker rows-only check for them."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

"""Exact per-group percentiles with bounded memory.

Spark's built-in ``percentile`` aggregate collects every group's values
into an in-memory ObjectHashAggregate buffer that cannot spill: one
giant group = one un-splittable OOM-prone task.  This operator computes
the identical interpolated result through spillable primitives:

1. ``row_number`` over a per-group value sort — the sort is a
   spillable sort-merge and WindowExec's partition buffer spills;
2. group counts as a tiny pre-aggregate broadcast back onto the ranked
   rows;
3. rows pruned to the <=2 ranks each target percentile can touch;
4. a tiny final aggregate interpolates ``lo + frac * (hi - lo)`` with
   0-based position ``(n-1) * p`` — exactly DuckDB ``quantile_cont`` /
   numpy ``linear`` arithmetic.

Cost: one full sort per distinct measure column (targets sharing a
column share its sort).  ``q_agg_percentile``
(queries/advanced_sql.py) is the oracle-checked instantiation; the
t-digest ``approx_percentile`` remains the estimate-tolerant fast path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_percentiles(
    df: DataFrame,
    key: str | Sequence[str],
    targets: Sequence[tuple[str, str, float]],
) -> DataFrame:
    """One row per group with a column per target.

    ``targets``: (output_alias, measure_column, fraction in [0, 1]).
    Output columns are doubles, un-rounded (callers round at their
    comparison boundary).

    NULL semantics (matching DuckDB ``quantile_cont`` / numpy over
    dropped NaNs): NULL measure values are EXCLUDED — filtered before
    ranking and absent from each column's count — so they neither shift
    interpolated positions nor sort first; a group whose measure is
    entirely NULL yields NULL for that column's targets.  Rows with a
    NULL group key are excluded entirely (SQL GROUP BY would keep a
    NULL group; callers needing that should coalesce keys to a
    sentinel first).
    """
    keys = [key] if isinstance(key, str) else list(key)
    df = df.na.drop(subset=keys)
    by_col: dict[str, list[tuple[str, float]]] = {}
    for alias, col, p in targets:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile fraction out of range: {p}")
        by_col.setdefault(col, []).append((alias, p))

    out = df.select(*keys).distinct()
    for col, col_targets in by_col.items():
        vals = df.select(*keys, col).where(F.col(col).isNotNull())
        w = Window.partitionBy(*keys).orderBy(F.col(col))
        # Group size as a COUNT WINDOW over the same partitioning, not a
        # separate aggregate joined back (r10 review): the old
        # ``join(F.broadcast(counts), keys)`` collected ONE ROW PER
        # GROUP to the driver — unbounded in group cardinality
        # (per-user percentiles over 10⁸ users = driver OOM) — and with
        # a constant key (q_anomaly_mad's global median) the folded
        # equi-join degenerated to a cartesian without the hint.  The
        # count window rides the row_number's existing shuffle
        # partitioning (no join, no second aggregate, no driver
        # collection at ANY cardinality) and A/B-measured faster at
        # sf0.1 (~1.9 s vs ~2.4 s median for q_agg_percentile).
        ranked = (
            vals
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
        )
        pos = {
            a: (F.col("__n") - F.lit(1)).cast("double") * F.lit(p)
            for a, p in col_targets
        }
        keep = F.lit(False)
        for a, _ in col_targets:
            lo_rn = F.floor(pos[a]).cast("bigint") + F.lit(1)
            hi_rn = F.ceil(pos[a]).cast("bigint") + F.lit(1)
            keep = keep | (F.col("__rn") == lo_rn) | (F.col("__rn") == hi_rn)
        aggs = []
        for a, _ in col_targets:
            lo_rn = F.floor(pos[a]).cast("bigint") + F.lit(1)
            hi_rn = F.ceil(pos[a]).cast("bigint") + F.lit(1)
            v = F.col(col).cast("double")
            aggs += [
                F.max(F.when(F.col("__rn") == lo_rn, v)).alias(f"__{a}_lo"),
                F.max(F.when(F.col("__rn") == hi_rn, v)).alias(f"__{a}_hi"),
                F.max(pos[a] - F.floor(pos[a])).alias(f"__{a}_frac"),
            ]
        interp = ranked.where(keep).groupBy(*keys).agg(*aggs)
        # left join: a group whose measure is entirely NULL has no
        # ranked rows — it stays in the output with NULL targets,
        # matching quantile_cont over an all-NULL group
        out = out.join(
            interp.select(
                *keys,
                *[
                    (
                        F.col(f"__{a}_lo")
                        + F.col(f"__{a}_frac")
                        * (F.col(f"__{a}_hi") - F.col(f"__{a}_lo"))
                    ).alias(a)
                    for a, _ in col_targets
                ],
            ),
            keys,
            "left",
        )
    return out.select(*keys, *[a for a, _, _ in targets])

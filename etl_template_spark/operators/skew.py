"""Key-salting helpers for pathological skew.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime by splitting oversized shuffle partitions.  Salting is
the explicit fallback for the cases AQE can't fix:

- a grouped aggregation whose single hot key overwhelms one reducer
  (AQE cannot split an aggregation group), and
- a shuffle join where one key's rows exceed executor memory on BOTH
  sides (AQE splits one side; the other must be replicated).

``salted_agg`` runs the classic two-phase trick: aggregate on
(key, salt) first — the hot key fans out over ``n_salts`` reducers —
then re-aggregate on the key.  Works for any algebraic aggregate
(sum/count/min/max; avg via sum+count).

``replicate_join`` salts the LEFT side's key and replicates each RIGHT
row ``n_salts`` times so every (key, salt) partition can still join —
the standard replicated (broadcast-fragment) skew join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Uniform deterministic-per-row salt in [0, n_salts): derived from a
    hash of the whole row rather than rand() so retried tasks produce
    identical output (rand() breaks task-retry idempotence)."""
    return df.withColumn(
        salt_col, F.pmod(F.hash(F.struct(*[F.col(c) for c in df.columns])), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: name → (partial_agg_expr, final_agg_expr_over_partial);
    e.g. ``{"total": (F.sum("x"), F.sum("total"))}``.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def replicate_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew join: salt the (large, skewed) left side; replicate the
    right side across all salts via an explode — each of the hot key's
    ``n_salts`` fragments joins a full copy of its right rows."""
    salted_left = with_salt(left, n_salts)
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_left.join(replicated_right, [on, "__salt"], how)
    return out.drop("__salt")

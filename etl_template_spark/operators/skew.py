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
    hash of (whole row, input partition id) rather than rand() so
    retried tasks produce identical output (rand() breaks task-retry
    idempotence; ``spark_partition_id`` is stable under retry because
    the retried task recomputes the same partition).

    The partition id must be part of the hash (r10 review): the
    canonical hot-key case is 10⁹ BYTE-IDENTICAL rows of one key
    (e.g. a bare ``user_id`` column feeding a count), and a pure
    row-content hash maps all of them to ONE salt — the single
    overwhelmed reducer survives salting entirely.  Mixing in the
    partition id fans identical rows across salts (one input partition
    per salt), bounding any residual per-salt hot mass by one input
    split (``maxPartitionBytes``) rather than by the key's full mass."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.hash(
                F.struct(*[F.col(c) for c in df.columns]),
                F.spark_partition_id(),
            ),
            F.lit(n_salts),
        ),
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
    ``n_salts`` fragments joins a full copy of its right rows.

    ``how`` is restricted to LEFT-side-preserving joins (r10 review):
    under ``right``/``full`` the replicated right side would surface an
    UNMATCHED right row once per salt — ``n_salts`` duplicates — so
    those (and ``cross``) are rejected rather than silently wrong.
    ``inner``/``left``/``left_semi``/``left_anti`` are exact: every
    left row carries exactly one salt, and each right row's replicas
    meet it at most once (on its salt)."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "left_semi", "leftsemi",
               "anti", "left_anti", "leftanti"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"replicate_join: how={how!r} is not left-side-preserving — "
            "an unmatched right row would be duplicated once per salt; "
            "use inner/left/left_semi/left_anti, or swap the sides"
        )
    salted_left = with_salt(left, n_salts)
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_left.join(replicated_right, [on, "__salt"], how)
    return out.drop("__salt")

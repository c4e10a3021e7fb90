"""Heavy hitters: items with frequency >= theta * N, exactly, in two
passes — a Misra-Gries candidate sketch pass and an exact verify pass.

Why not a plain ``groupBy(key).count()``?  At 100 TB the key space of a
token / URL / user column can be billions of distinct values; a full
hash aggregate shuffles *every* distinct key only to discard all but a
handful above the threshold.  The classic two-pass scheme bounds the
shuffle by the sketch capacity instead:

- **Pass 1 (candidates).**  Each input partition runs a Misra-Gries
  summary with capacity ``k = ceil(1/theta)`` inside one
  ``mapInPandas`` task — O(k) state, no shuffle.  Guarantee (pigeonhole
  over partitions + the MG retention bound): every item with global
  count >= theta*N appears in at least one partition with local count
  >= theta*localN > localN/(k+1), and MG with capacity k never evicts
  an item whose true local count exceeds localN/(k+1).  The union of
  per-partition candidate keys is therefore a SUPERSET of the true
  heavy hitters — at most k * numPartitions keys, tiny.
- **Pass 2 (verify).**  Exact counts restricted to the candidate set
  via a broadcast semi-join, then filter ``count >= theta * N`` with N
  delivered by a broadcast 1-row total — no driver-side ``collect``.

The result is EXACT (the sketch only prunes, never decides), which is
what makes the query SQL-oracle-checkable rather than rows-only.

Mergeable-summaries background: Agarwal et al., "Mergeable Summaries"
(PODS'12) — the batch-merge rule used in ``_mg_partition`` (add counts,
subtract the (k+1)-th largest, keep positives) is their MG merge.

Reference parity: the reference has no aggregation surface at all
(SURVEY.md §2A "Notable absences"); this is part of the declared-engine
extension for corpus statistics (vocabulary pruning, hot-key detection
ahead of salting — see operators/skew.py).
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(key_col: str, k: int):
    """Build the mapInPandas function: one Misra-Gries summary per
    partition, merged batch-at-a-time (vectorized, no per-row Python).

    Runs in the Python worker; must not capture a SparkSession.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        for batch in batches:
            # dropna default: null keys are intentionally excluded from
            # the sketch (NaN index labels break pandas alignment);
            # heavy_hitters adds the null key as an always-candidate, so
            # exactness is preserved.
            vc = batch[key_col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                # MG merge (Agarwal et al.): subtract the (k+1)-th
                # largest count from all, drop non-positives -> <= k
                # survivors, each undercounted by <= localN/(k+1).
                thresh = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > thresh] - thresh
        yield pd.DataFrame({key_col: counters.index})

    return fn


def mg_candidates(
    df: DataFrame, key_col: str, theta_num: int, theta_den: int
) -> DataFrame:
    """Distinct NON-NULL candidate keys: superset of all non-null keys
    with global frequency >= theta_num/theta_den, at most
    ceil(theta_den/theta_num) keys per input partition.  Null keys are
    not sketched (see ``_mg_partition``) — callers that admit null as a
    key must treat it as an unconditional candidate, as
    ``heavy_hitters`` does."""
    if not (0 < theta_num <= theta_den):
        raise ValueError(f"need 0 < theta_num <= theta_den, got {theta_num}/{theta_den}")
    k = math.ceil(theta_den / theta_num)
    keyed = df.select(F.col(key_col).cast("string").alias(key_col))
    return keyed.mapInPandas(
        _mg_partition(key_col, k), schema=f"{key_col} string"
    ).distinct()


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    theta_num: int,
    theta_den: int,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact heavy hitters of ``key_col``: rows (key, cnt, share) for
    every key with count >= (theta_num/theta_den) * N, N = total count.

    theta is a RATIONAL, and the threshold test is the integer
    cross-multiplication ``cnt * theta_den >= N * theta_num`` — no
    float threshold, so the predicate is bit-identical in any engine
    (a double ``theta*N`` flips keys whose count lands exactly on an
    integer threshold; see the repo's decimal/ordering determinism
    discipline in compat.py).

    ``extra_cols`` are carried through the candidate restriction and
    grouped with the key (for per-(key, stratum) accounting).

    A null key COUNTS: nulls are excluded from the MG sketch (pandas
    alignment can't carry NaN index labels), so the null key — a single
    extra candidate, no capacity cost — is unioned in unconditionally
    and the candidate restriction is a null-safe (``<=>``) semi-join;
    a null value exceeding the threshold therefore surfaces as a
    ``NULL`` heavy-hitter row rather than being silently dropped.
    """
    cands = mg_candidates(df, key_col, theta_num, theta_den)
    null_cand = df.sparkSession.range(1).select(
        F.lit(None).cast("string").alias(key_col)
    )
    probe = cands.unionAll(null_cand).select(F.col(key_col).alias("__cand"))
    keyed = df.withColumn(key_col, F.col(key_col).cast("string"))
    restricted = keyed.join(
        F.broadcast(probe), F.col(key_col).eqNullSafe(F.col("__cand")), "left_semi"
    )
    counts = restricted.groupBy(key_col, *extra_cols).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        counts.join(F.broadcast(total))
        .where(F.col("cnt") * F.lit(theta_den) >= F.col("__n") * F.lit(theta_num))
        .select(
            key_col,
            *extra_cols,
            "cnt",
            (F.col("cnt") / F.col("__n")).alias("share"),
        )
    )

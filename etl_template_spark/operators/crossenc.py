"""Document-pair cross-encoder scoring plumbing (SURVEY.md §7).

A cross-encoder scores a TEXT PAIR jointly (one forward pass over both
texts) — more accurate than bi-encoder cosine, and far more expensive,
so the pipeline shape matters more than anywhere else:

1. candidate generation blocks the pair space (never all-pairs) and is
   salted against hot blocks (operators/topk.py::salted_block_join);
2. a cheap JVM-side gate (length delta, metadata) prunes pairs BEFORE
   anything crosses into Python;
3. survivors stream through ONE Arrow-batched ``mapInPandas`` boundary
   where the model scores each batch.

The model itself is injectable (no ML runtime ships in this container —
same seam as multimodal.py's codec injection): production passes a
callable wrapping the real encoder; the default is a deterministic
length-overlap stub, chosen to be exactly reproducible in SQL so the
full plumbing stays oracle-checkable end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def stub_scorer(a: Any, b: Any) -> Any:
    """Deterministic stand-in score: len-ratio min/max in [0, 1].
    Pure int64 arithmetic + one IEEE division — bit-identical to the
    SQL `CAST(least(la, lb) AS DOUBLE) / greatest(la, lb, 1)`."""
    import numpy as np

    la = a.str.len().to_numpy()
    lb = b.str.len().to_numpy()
    return np.minimum(la, lb) / np.maximum(np.maximum(la, lb), 1)


def score_pairs(
    pairs: DataFrame,
    text_a: str = "text_a",
    text_b: str = "text_b",
    scorer: Callable[..., Any] | None = None,
    out_col: str = "score",
) -> DataFrame:
    """Score (text_a, text_b) pairs through one Arrow-batched
    ``mapInPandas`` pass: every non-text column is carried through
    untouched, the two text columns are consumed by ``scorer``
    (pd.Series, pd.Series) → array-like of float, and ``out_col``
    (double) is appended.  Batch size follows
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — the knob that
    bounds per-batch model memory at scale."""
    import pandas as pd  # noqa: F401 — Arrow path dependency, fail early

    fn = scorer or stub_scorer
    carry = [f for f in pairs.schema.fields if f.name not in (text_a, text_b)]
    out_schema = T.StructType(
        list(carry) + [T.StructField(out_col, T.DoubleType(), True)]
    )
    carry_names = [f.name for f in carry]

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[carry_names].copy()
            out[out_col] = fn(pdf[text_a], pdf[text_b])
            yield out

    return pairs.mapInPandas(gen, out_schema)

"""Query inventory — importing this package populates the registry.

One module per operator family from SURVEY.md §2B.
"""

from ..registry import REGISTRY, Query, queries_by_tag  # noqa: F401

from . import (  # noqa: F401,E402
    scans,
    projection,
    joins,
    aggregates,
    advanced_sql,
    tpch_shapes,
    tpch_full,
    windows,
    setops,
    functions_scalar,
    udfs,
    etl_ops,
    events_analytics,
    llm_text,
    similarity,
    streaming_batch,
    multimodal_q,
    # curation MUST stay the last import: its queries register behind the
    # pinned round-3 correctness window (tests/test_entry_contract.py)
    curation,
)

__all__ = ["REGISTRY", "Query", "queries_by_tag"]

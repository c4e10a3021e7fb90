"""CI-tested worked examples, shipped inside the package so they run
anywhere the engine is importable — from a source checkout via
``python -m etl_template_spark example <name>`` and from an installed
wheel via the ``etl-template-spark`` console script (no sys.path
shims — the round-6 verdict's cleanup).

- ``etl_template``      — the reference's 3-step ETL run (etl.go:146-159)
- ``streaming_ingest``  — checkpointed streaming ingest + versioned sink
- ``curation_pipeline`` — the 4-step LLM-curation composition
                          (Scrub → Sample → Budget → Pack)
- ``quality_gate``      — the monitoring composition: profile →
                          expectations gate (fail-fast) → MAD anomaly
- ``dataset_release``   — the release composition: constraint gate →
                          mixture → split → composition audit
- ``link_graph_refresh`` — nightly incremental PageRank: delta-sized
                          edge-log ingest → warm-started weighted
                          refresh → log compaction → authority audit
- ``incremental_dedup``  — nightly incremental dedup clustering:
                          delta-indexed shingles/signatures → LSH
                          probe vs the standing index → exact verify →
                          incremental connected components

Each module keeps a ``run(...)`` entry point and stays runnable directly
(``python -m etl_template_spark.examples.<name>``); the CLI subcommand
is sugar over the same functions.
"""

EXAMPLE_NAMES = (
    "etl_template",
    "streaming_ingest",
    "curation_pipeline",
    "quality_gate",
    "dataset_release",
    "link_graph_refresh",
    "incremental_dedup",
)

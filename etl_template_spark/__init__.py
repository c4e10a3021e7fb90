"""etl_template_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the ``arbirk/ETL-template`` reference (a Go
Extract→Transform→Load pipeline template, see /root/reference/etl.go and
/root/reference/tools/tools.go), generalized to the full relational
operator surface Spark provides plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) —
designed for 100 TB scale, verified against a DuckDB oracle at small
scale factors.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC, sane shuffle)
    io.py         schema-d readers, versioned dataset read/write
    pipeline.py   PipelineRun/Step orchestration (reference parity)
    compat.py     cross-engine deterministic aggregation helpers
    registry.py   Query registry binding Spark builders to DuckDB oracles
    queries/      one module per operator family (SURVEY.md §2B)
    operators/    reusable composite operators (as-of join, sessionize, …)
    functions/    column-expression libraries (text, vectors)
    streaming/    Structured Streaming flavors of the batch operators
    multimodal.py binary-column (image/audio) plumbing with stubbed codecs
"""

__version__ = "0.1.0"

#!/usr/bin/env python
"""Checkpointed streaming ingest — the reference's record loop, incremental.

The reference's core mechanism is a resumable per-record loop: stream a
JSONL file, transform each record, persist a cursor after every record
so a crashed run resumes where it stopped
(/root/reference/tools/tools.go:676-806, LoopState tools.go:59-62).

Structured Streaming is that mechanism at scale, and this example wires
the engine's pieces end-to-end:

    reference                                engine
    ---------------------------------        --------------------------
    StreamJSONLRecords scan loop             readStream.schema(...).json
    per-record transformer callback          Column projection
    LoopState cursor + resume                checkpointLocation WAL
    retry loop per record                    task retries + idempotent
                                             micro-batch replay
    versioned N.jsonl output                 foreachBatch versioned sink
                                             (exactly-once: a replayed
                                             batch claims a FRESH v=N)

Duplicate deliveries — the reality the reference's retry loop guards
against — are collapsed by watermarked dedup BEFORE the sink.

Run:  python -m etl_template_spark example streaming_ingest [data_root]
      (or `etl-template-spark example streaming_ingest` once installed)
CI:   tests/test_pipeline.py::test_streaming_ingest_example_runs
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

from .. import get_spark, read_versioned
from ..io import latest_version
from ..streaming import (
    dedup_stream,
    read_events_stream,
    versioned_stream_sink,
)

SAMPLE_EVENTS = [
    '{"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "view", "value": 1.0, "props": "{}"}',
    '{"event_id": 2, "ts": "2024-01-01 10:05:00", "user_id": 2, "event_type": "click", "value": 2.0, "props": "{}"}',
    '{"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 1, "event_type": "view", "value": 1.0, "props": "{}"}',  # redelivery
]


def run(data_root: str) -> None:
    spark = get_spark(app_name="streaming-ingest-example")
    inbox = os.path.join(data_root, "inbox")
    os.makedirs(inbox, exist_ok=True)
    with open(os.path.join(inbox, "events-0.jsonl"), "w") as f:
        f.write("\n".join(SAMPLE_EVENTS) + "\n")

    stream = read_events_stream(spark, inbox)  # declared schema, R1 discipline
    deduped = dedup_stream(stream, keys=["event_id"], watermark="1 hour")
    enriched = deduped.withColumn(
        "processed_flag", F.concat(F.lit("Processed_"), F.col("event_type"))
    )
    ckpt = os.path.join(data_root, "checkpoints", "ingest")
    q = versioned_stream_sink(enriched, data_root, "events_ingest", ckpt)
    q.awaitTermination()  # availableNow: drain the backlog, then stop

    version = latest_version(data_root, "events_ingest")
    out = read_versioned(spark, data_root, "events_ingest")
    print(f"committed v={version}: {out.count()} rows (duplicate collapsed)")
    out.show(truncate=False)

    # resume semantics: re-running against the same checkpoint with no
    # new data commits nothing — the WAL already covers the inbox
    q2 = versioned_stream_sink(
        dedup_stream(
            read_events_stream(spark, inbox), keys=["event_id"], watermark="1 hour"
        ).withColumn(
            "processed_flag", F.concat(F.lit("Processed_"), F.col("event_type"))
        ),
        data_root,
        "events_ingest",
        ckpt,
    )
    q2.awaitTermination()
    print(f"after no-op resume, latest version is still v={latest_version(data_root, 'events_ingest')}")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ingest_example_"))

"""Incremental reverse-geocoding via Structured Streaming.

The reference is batch-only with resume-by-key checkpoints (SURVEY.md §2.10);
the Spark-native equivalent for a continuously-growing pages table is a file
(or Iceberg) streaming source + ``foreachBatch``: Spark's streaming commit log
provides exactly-once *file-level progress tracking*, and inside each micro
batch the full batch engine (extract → PIP → kNN — a single action-free plan)
runs unchanged.  End-to-end output semantics are exactly-once because the
sink write is **idempotent**: each micro-batch overwrites its own
deterministic ``batch_id``-derived subdirectory, so a batch retried after a
mid-write failure replaces its partial output instead of duplicating rows
(a plain append-mode write would be at-least-once — ADVICE.md round-1
item 5).  ``Trigger.AvailableNow`` turns the same pipeline into a resumable
incremental batch job — the streaming counterpart of the manifest runner in
sources/manifest.py.

**Output is checkpoint-lineage-scoped** (round-2 VERDICT item 10): the
``batch_id``-keyed subdirectories are meaningful only for the checkpoint
that produced them, so starting with a FRESH checkpoint (no committed
offsets yet) clears any pre-existing output directory — otherwise stale
``batch_id=N`` dirs from a prior lineage would mix into reads.  Deleting
the checkpoint therefore restates the whole output, exactly like deleting
the manifest restarts a manifest run.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType,
                               TimestampType)

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def incremental_reverse_geocode(spark: SparkSession, *, input_path: str,
                                output_path: str, checkpoint_path: str,
                                polys_pdf: pd.DataFrame, cities_pdf: pd.DataFrame,
                                available_now: bool = True):
    """Stream new pages files into reverse-geocoded parquet output.

    Returns the StreamingQuery; with ``available_now`` the query drains all
    unprocessed files and stops (call ``awaitTermination()``).
    """
    from ..plans.reverse_geocode import reverse_geocode_pages

    # fresh checkpoint (no committed offsets) ⇒ no prior output of THIS
    # lineage can exist — clear orphans from any earlier lineage so reads
    # never mix runs (module docstring; round-2 VERDICT item 10)
    if not (Path(checkpoint_path) / "offsets").exists():
        shutil.rmtree(output_path, ignore_errors=True)

    stream = (spark.readStream
              .schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_path))

    def process_batch(batch_df, batch_id: int) -> None:
        out = reverse_geocode_pages(spark, batch_df, polys_pdf, cities_pdf)
        # idempotent per-batch sink: retried batches overwrite, never append
        out.write.mode("overwrite").parquet(f"{output_path}/batch_id={batch_id}")

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


NEARDUP_DOCS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("text", StringType()),
])


def incremental_neardup(spark: SparkSession, *, input_path: str,
                        output_path: str, checkpoint_path: str,
                        available_now: bool = True,
                        **neardup_kw):
    """Deployable end-to-end incremental near-dedup: file stream →
    :func:`~.stateful.streaming_neardup_flags` (per-band-signature LSH
    state, event-time-TTL evicted) → per-doc ``neardup_verdicts`` rollup +
    idempotent ``batch_id``-scoped parquet sink inside ``foreachBatch``.

    Composition notes: the stateful flags stage lives in the streaming
    query (its state rides this checkpoint); the rollup is a PLAIN batch
    aggregation inside ``foreachBatch``, exact per micro-batch because all
    of a doc's band rows share its batch.  Sink idempotency, output
    lineage scoping and ``Trigger.AvailableNow`` resumability are the same
    contract as :func:`incremental_reverse_geocode` (module docstring).

    Returns the StreamingQuery.  Extra kwargs (``horizon``, ``watermark``,
    ``n_bands``, ``shingle``…) pass through to the flags operator.
    """
    from .stateful import neardup_verdicts, streaming_neardup_flags

    if not (Path(checkpoint_path) / "offsets").exists():
        shutil.rmtree(output_path, ignore_errors=True)

    stream = (spark.readStream
              .schema(NEARDUP_DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_path))
    flags = streaming_neardup_flags(stream, **neardup_kw)

    def process_batch(batch_df, batch_id: int) -> None:
        out = neardup_verdicts(batch_df)
        out.write.mode("overwrite").parquet(
            f"{output_path}/batch_id={batch_id}")

    writer = (flags.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

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


def _run_incremental(spark: SparkSession, *, schema: StructType,
                     input_path: str, output_path: str, checkpoint_path: str,
                     batch_transform, available_now: bool,
                     stream_transform=None):
    """ONE copy of the incremental-pipeline contract shared by every
    composed pipeline in this module — fresh-checkpoint output-lineage
    scoping (module docstring; round-2 VERDICT item 10), the file-stream
    reader, the idempotent ``batch_id``-scoped overwrite sink, and the
    ``Trigger.AvailableNow`` wiring — so a fix to any part of the contract
    cannot drift between pipelines.

    ``stream_transform`` (optional) maps the raw stream DataFrame to the
    streaming query to run (e.g. a stateful stage whose state rides this
    checkpoint); ``batch_transform(batch_df)`` maps each micro-batch to
    the rows written under ``output_path/batch_id=N``.
    """
    # fresh checkpoint (no committed offsets) ⇒ no prior output of THIS
    # lineage can exist — clear orphans from any earlier lineage so reads
    # never mix runs
    if not (Path(checkpoint_path) / "offsets").exists():
        shutil.rmtree(output_path, ignore_errors=True)

    stream = (spark.readStream
              .schema(schema)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_path))
    if stream_transform is not None:
        stream = stream_transform(stream)

    def process_batch(batch_df, batch_id: int) -> None:
        out = batch_transform(batch_df)
        # idempotent per-batch sink: retried batches overwrite, never append
        out.write.mode("overwrite").parquet(f"{output_path}/batch_id={batch_id}")

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_reverse_geocode(spark: SparkSession, *, input_path: str,
                                output_path: str, checkpoint_path: str,
                                polys_pdf: pd.DataFrame, cities_pdf: pd.DataFrame,
                                available_now: bool = True):
    """Stream new pages files into reverse-geocoded parquet output.

    Returns the StreamingQuery; with ``available_now`` the query drains all
    unprocessed files and stops (call ``awaitTermination()``).
    """
    from ..plans.reverse_geocode import reverse_geocode_pages

    return _run_incremental(
        spark, schema=PAGES_SCHEMA, input_path=input_path,
        output_path=output_path, checkpoint_path=checkpoint_path,
        batch_transform=lambda bdf: reverse_geocode_pages(
            spark, bdf, polys_pdf, cities_pdf),
        available_now=available_now)


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

    Every input doc appears in the output exactly once per arrival —
    null-text docs ride the flags operator's stateless pass-through branch
    and come out ``kept=true`` (never silently dropped).

    Returns the StreamingQuery.  Extra kwargs (``horizon``, ``watermark``,
    ``n_bands``, ``shingle``…) pass through to the flags operator.
    """
    from .stateful import neardup_verdicts, streaming_neardup_flags

    return _run_incremental(
        spark, schema=NEARDUP_DOCS_SCHEMA, input_path=input_path,
        output_path=output_path, checkpoint_path=checkpoint_path,
        stream_transform=lambda s: streaming_neardup_flags(s, **neardup_kw),
        batch_transform=neardup_verdicts,
        available_now=available_now)

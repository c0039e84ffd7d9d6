"""Checkpoint manifests: per-partition lineage + metrics, resumable runs.

North-rule mapping of the reference's resumability features (SURVEY.md §2.10):

* R1 resume-by-key (generate_geodata_locationiq.py:164-202) → anti-join the
  pending split list against the manifest;
* R2 batched checkpoint writes (:264-278) → per-split dynamic-partition
  overwrite, manifest row appended only after the split's data is committed
  (a split without a manifest row is retried — idempotent because the re-run
  overwrites exactly that partition);
* R4 versioned cache schema (wikidata_translator.py:623-668) → explicit
  ``schema_version`` column in every manifest row.

At 10^12 rows the unit of work is a *split* (a coarse partition of the input,
e.g. a date or an id range), not a Spark task: task retries are Spark-native
(R5); the manifest makes whole-job restarts cheap.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA_VERSION = 1


def _manifest_exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).limit(1).collect()
        return True
    except Exception:
        return False


def completed_splits(spark: SparkSession, manifest_path: str) -> DataFrame | None:
    """Distinct split ids already committed (status='ok'), or None."""
    if not _manifest_exists(spark, manifest_path):
        return None
    m = spark.read.parquet(manifest_path)
    return (m.filter(F.col("status") == "ok")
            .select("split_id").distinct())


def checkpointed_run(spark: SparkSession, df: DataFrame, *, split_col: str,
                     process, output_path: str, manifest_path: str,
                     run_id: str | None = None,
                     batch_size: int | None = None) -> dict:
    """Process only not-yet-committed splits of ``df``; fully resumable.

    ``process(sub_df) -> DataFrame`` must keep ``split_col`` in its output.
    Committed output lands under ``output_path`` partitioned by ``split_col``
    (dynamic overwrite → re-runs are idempotent); one manifest row per split:
    ``(run_id, split_id, status, row_count, wall_ms, schema_version, input_fingerprint)``.

    ``batch_size`` = R3 checkpoint cadence (reference flushes every
    ``batch_size`` rows / 20 cache writes): pending splits are processed in
    batches of that many splits, the manifest appended after EACH batch, so a
    mid-run failure loses at most one batch of work instead of the whole run.
    Default None = single batch.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    all_splits = df.select(F.col(split_col).alias("split_id")).distinct()
    done = completed_splits(spark, manifest_path)
    pending = (all_splits.join(done, "split_id", "left_anti")
               if done is not None else all_splits)
    pending_ids = sorted([r.split_id for r in pending.collect()])
    if not pending_ids:
        return {"run_id": run_id, "processed_splits": 0, "rows": 0}

    step = batch_size or len(pending_ids)
    total_rows = 0
    for i in range(0, len(pending_ids), step):
        total_rows += _run_batch(spark, df, split_col=split_col,
                                 process=process, output_path=output_path,
                                 manifest_path=manifest_path, run_id=run_id,
                                 pending_ids=pending_ids[i:i + step])
    return {"run_id": run_id, "processed_splits": len(pending_ids),
            "rows": total_rows}


def _run_batch(spark: SparkSession, df: DataFrame, *, split_col: str,
               process, output_path: str, manifest_path: str,
               run_id: str, pending_ids: list) -> int:
    """One checkpoint batch: process → commit partitions → append manifest."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    sub = df.filter(F.col(split_col).isin(pending_ids))
    # input fingerprint per split: order-insensitive xor-ish hash of row hashes
    t0 = time.time()
    out = process(sub)
    out.write.mode("overwrite").partitionBy(split_col).parquet(output_path)
    wall_ms = int((time.time() - t0) * 1000)

    committed = spark.read.parquet(output_path).filter(
        F.col(split_col).isin(pending_ids))
    counts = (committed.groupBy(F.col(split_col).alias("split_id"))
              .agg(F.count(F.lit(1)).alias("row_count")))
    # order-insensitive, overflow-free lineage fingerprint of the input split
    fingerprints = (sub.groupBy(F.col(split_col).alias("split_id"))
                    .agg(F.expr(f"bit_xor(xxhash64({', '.join(sub.columns)}))")
                         .alias("input_fingerprint")))
    manifest_rows = (counts.join(fingerprints, "split_id", "left")
                     .withColumn("run_id", F.lit(run_id))
                     .withColumn("status", F.lit("ok"))
                     .withColumn("wall_ms", F.lit(wall_ms))
                     .withColumn("schema_version", F.lit(MANIFEST_SCHEMA_VERSION))
                     .withColumn("committed_at", F.current_timestamp()))
    manifest_rows.write.mode("append").parquet(manifest_path)
    return committed.count()

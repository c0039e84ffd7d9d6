"""Deterministic identifier assignment (SURVEY.md §2.5 W1/W2).

The reference allocates new geoname_ids as ``base + row_index`` after a
deterministic sort (core/geodata/base.py:137-143, core/utils/geoname_ids.py)
and admin1 codes as zero-padded alphabetical dense ranks (base.py:627-671).
``monotonically_increasing_id`` is partition-dependent and would break
byte-stable output, so:

* ``sequential_ids`` — exact ``row_number() over (orderBy …) + base``.  A
  global window is a single-partition sort; fine for dimension-sized tables.
* ``sequential_ids_scalable`` — the 10^12-row variant: sort, then two-pass
  per-partition counts → cumulative offsets → per-partition zipWithIndex
  (no single-partition stage; the sort is a range-partitioned shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def sequential_ids(df: DataFrame, sort_cols: list[str], *, base: int,
                   out_col: str = "seq_id") -> DataFrame:
    w = Window.orderBy(*sort_cols)
    return df.withColumn(
        out_col, (F.row_number().over(w) + F.lit(base - 1)).cast("long"))


def sequential_ids_scalable(df: DataFrame, sort_cols: list[str], *, base: int,
                            out_col: str = "seq_id") -> DataFrame:
    """Same result as ``sequential_ids`` without a single-partition window.

    repartitionByRange + sortWithinPartitions gives a total order across
    partition boundaries; a tiny driver-side pass over per-partition counts
    turns local indexes into global ones.

    Two correctness rules (each empirically breaks ids when violated):

    * the range-partition id is materialized as a **column** (``__pid``)
      immediately after the range shuffle — evaluating
      ``spark_partition_id()`` inside the window expression would read the
      *post-window-exchange* pid, which is a hash partition, not the range
      partition the offsets were computed for;
    * the ranged DataFrame is persisted so the counts job and the final job
      read the identical materialization (range-boundary sampling must not
      re-run between the two jobs).

    The per-partition offset is applied via a ``create_map`` literal — pure
    JVM, no Python UDF on the path (the plan stays in WholeStageCodegen,
    asserted by tests/test_plan_quality.py).
    """
    sdf = (df.repartitionByRange(*sort_cols)
           .sortWithinPartitions(*sort_cols)
           .withColumn("__pid", F.spark_partition_id())
           .persist(StorageLevel.MEMORY_AND_DISK))

    counts = sdf.groupBy("__pid").count().orderBy("__pid").collect()
    entries: list = []
    acc = 0
    for r in counts:
        entries += [F.lit(int(r["__pid"])).cast("int"),
                    F.lit(acc).cast("long")]
        acc += int(r["count"])
    if entries:
        off = F.coalesce(F.element_at(F.create_map(*entries), F.col("__pid")),
                         F.lit(0).cast("long"))
    else:  # empty input — any expression typed long will do
        off = F.lit(0).cast("long")

    local = Window.partitionBy("__pid").orderBy(*sort_cols)
    return (sdf
            .withColumn(out_col,
                        (F.row_number().over(local).cast("long")
                         + off + F.lit(base - 1)).cast("long"))
            .drop("__pid"))


def dense_rank_codes(df: DataFrame, name_col: str, *, prefix: str,
                     out_col: str = "code", width: int | None = None,
                     partition_cols: list[str] | None = None) -> DataFrame:
    """Zero-padded alphabetical dense-rank codes, e.g. ``TW.01``
    (reference base.py:655-660: digits = len(str(count)))."""
    w = (Window.partitionBy(*partition_cols) if partition_cols else Window.partitionBy()
         ).orderBy(name_col)
    rank = F.dense_rank().over(w)
    if width is None:
        total = df.select(name_col).distinct().count()
        width = len(str(total))
    return df.withColumn(
        out_col, F.concat(F.lit(prefix), F.lit("."),
                          F.lpad(rank.cast("string"), width, "0")))

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
    """
    sdf = df.repartitionByRange(*sort_cols).sortWithinPartitions(*sort_cols)
    spark = sdf.sparkSession

    counts_pdf = (
        sdf.groupBy(F.spark_partition_id().alias("pid"))
        .count().orderBy("pid").toPandas()
    )
    offsets = {int(r.pid): int(c) for r, c in zip(
        counts_pdf.itertuples(), counts_pdf["count"].cumsum() - counts_pdf["count"])}
    bc = spark.sparkContext.broadcast(offsets)

    local = Window.partitionBy(F.spark_partition_id()).orderBy(*sort_cols)
    off_udf = F.udf(lambda pid: bc.value.get(pid, 0), "long")
    return (sdf
            .withColumn(out_col,
                        F.row_number().over(local).cast("long")
                        + off_udf(F.spark_partition_id()) + F.lit(base - 1)))


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

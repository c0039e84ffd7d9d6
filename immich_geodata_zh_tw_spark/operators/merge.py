"""Set/merge operators (SURVEY.md §2.7 U1-U3, §2.2 P5/J6).

Reference semantics: replace-by-key delete+insert (base.py:694-722,
enhance_data.py:137-142), schema-aligned vertical union (base.py:718),
anti-join merge of new rows above a population floor (enhance_data.py:262-265
— an ``is_in`` that must be a left_anti join at scale).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def replace_by_key(old: DataFrame, new: DataFrame, predicate: Column) -> DataFrame:
    """Delete rows matching ``predicate`` from ``old``, insert ``new``.

    On an Iceberg/Delta sink this is MERGE / overwritePartitions; as a plan
    it is filter + unionByName (both narrow — no shuffle).
    """
    return old.filter(~predicate).unionByName(new)


def union_all(dfs: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), dfs)


def anti_join_merge(existing: DataFrame, extra: DataFrame, *, key: str,
                    min_population: int | None = None,
                    population_col: str = "population") -> DataFrame:
    """Add rows of ``extra`` whose key is absent from ``existing``
    (and above the population floor), reference enhance_data.py:247-268."""
    new_rows = extra.join(existing.select(key), key, "left_anti")
    if min_population is not None:
        new_rows = new_rows.filter(F.col(population_col) >= F.lit(min_population))
    return existing.unionByName(new_rows)


def marker_join(df: DataFrame, dup_keys: list[str], *,
                flag_col: str = "has_dup") -> DataFrame:
    """Flag rows whose key combination occurs more than once
    (reference japan.py:281-307: group-count → left join lit(True) →
    fill_null(False))."""
    dups = (df.groupBy(*dup_keys).agg(F.count(F.lit(1)).alias("__cnt"))
            .filter(F.col("__cnt") > 1)
            .select(*dup_keys, F.lit(True).alias(flag_col)))
    return (df.join(F.broadcast(dups), dup_keys, "left")
            .withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False))))

"""Release data-quality gate (the reference's update workflow ships releases
sight-unseen from `update_data.sh` — this is the validation pass a production
pipeline runs before `pack_release`, reference core/pack_release.py:1).

ALL checks fold into ONE global aggregate (partial map-side combine, a
single scalar row crosses the wire), then explode to one row per check —
at 100 TB the gate costs one scan regardless of how many checks ride it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_geodata(df: DataFrame, *,
                     min_rows: int = 1,
                     key_cols: list[str] | None = None,
                     required_non_null: list[str] | None = None,
                     lat_col: str | None = None,
                     lon_col: str | None = None,
                     bbox: tuple[float, float, float, float] | None = None,
                     ) -> DataFrame:
    """One row per check: ``(check, passed, observed, threshold)``.

    Checks (each optional by argument):
    * ``row_count``       — at least ``min_rows`` rows;
    * ``unique_<cols>``   — no duplicate key tuple (count == distinct);
    * ``non_null_<col>``  — zero NULLs in each required column;
    * ``coords_in_bbox``  — zero points outside (lat0, lat1, lon0, lon1);
    * ``coords_parseable``— zero non-finite coordinates.

    Everything is a count-if inside one aggregate; key uniqueness uses
    ``count_distinct`` in the same pass.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    checks: list[tuple[str, str, int]] = [("row_count", "__n", min_rows)]
    if key_cols:
        name = "unique_" + "_".join(key_cols)
        # count_distinct(cols...) drops rows where ANY column is NULL,
        # which would misreport null-keyed rows as duplicates; a struct
        # retains NULL fields, so distinct is null-safe over key tuples
        aggs.append((F.count(F.lit(1)) - F.count_distinct(
            F.struct(*[F.col(c) for c in key_cols]))).alias("__dups"))
        checks.append((name, "__dups", 0))
    for c in required_non_null or []:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"__null_{c}"))
        checks.append((f"non_null_{c}", f"__null_{c}", 0))
    if lat_col and lon_col:
        la, lo = F.col(lat_col), F.col(lon_col)
        bad_parse = (la.isNull() | lo.isNull() | F.isnan(la) | F.isnan(lo))
        aggs.append(F.count_if(bad_parse).alias("__badcoord"))
        checks.append(("coords_parseable", "__badcoord", 0))
        if bbox is not None:
            lat0, lat1, lon0, lon1 = bbox
            outside = (~bad_parse & ((la < lat0) | (la > lat1)
                                     | (lo < lon0) | (lo > lon1)))
            aggs.append(F.count_if(outside).alias("__outside"))
            checks.append(("coords_in_bbox", "__outside", 0))
    agg = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(name).alias("check"),
                 ((F.col(col) >= F.lit(thr)) if name == "row_count"
                  else (F.col(col) <= F.lit(thr))).alias("passed"),
                 F.col(col).cast("long").alias("observed"),
                 F.lit(thr).cast("long").alias("threshold"))
        for name, col, thr in checks])
    return (agg.select(F.explode(rows).alias("r"))
            .select("r.check", "r.passed", "r.observed", "r.threshold"))


def assert_valid(df: DataFrame, **kwargs) -> None:
    """Raise ``ValueError`` listing every failed check (driver-side, for
    pipeline gating before a release sink)."""
    failed = [r for r in validate_geodata(df, **kwargs).collect()
              if not r["passed"]]
    if failed:
        raise ValueError("release validation failed: " + "; ".join(
            f"{r['check']} (observed {r['observed']}, "
            f"threshold {r['threshold']})" for r in failed))

"""Name-translation operators (SURVEY.md §2.2 P6/P10, §2.3 J3/J5, §2.4 A3).

Reference semantics:
* per-row metadata coordinate lookup (translate.py:187-215) — an O(N·M) scan
  that is really an equi-join on (country_code, lat, lon) → broadcast join J5;
* alternate-name priority pick: score languages by a priority list, keep the
  top row per geoname_id (alternate_names.py:61-85);
* coalesce fallback chains (translate.py:277-286,323-326);
* null-token normalization: '', 'None', 'nan', '""' → NULL (base.py:389-398).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_TOKENS = ["", '""', "None", "nan"]

#: reference core/constants.py:8 CHINESE_PRIORITY
CHINESE_PRIORITY = ["zh-Hant", "zh-TW", "zh-HK", "zh", "zh-Hans", "zh-CN", "zh-SG"]


def normalize_null_tokens(col: Column) -> Column:
    return F.when(col.isin(NULL_TOKENS), F.lit(None)).otherwise(col)


def coalesce_chain(*cols: Column) -> Column:
    return F.coalesce(*cols)


def metadata_coordinate_join(cities: DataFrame, metadata: DataFrame, *,
                             keys: list[str], attrs: list[str]) -> DataFrame:
    """The J5 win: per-row lookup → broadcast left equi-join on rounded
    coordinates (join-key stability via 8-dp rounding, SURVEY.md §1.3)."""
    meta = metadata.select(*keys, *attrs)
    return cities.join(F.broadcast(meta), keys, "left")


def priority_pick(df: DataFrame, *, key: str, lang_col: str,
                  priority: list[str] | None = None,
                  preferred_col: str | None = None,
                  tiebreak: list[Column] | None = None) -> DataFrame:
    """Top-1 per key by language priority (lower = better), preferred flag
    wins within a language (reference alternate_names.py:61-85)."""
    if priority is None:
        priority = CHINESE_PRIORITY
    pr = F.array_position(F.array(*[F.lit(p) for p in priority]), F.col(lang_col))
    score = F.when(pr > 0, pr).otherwise(F.lit(len(priority) + 1))
    order = [score.asc()]
    if preferred_col is not None:
        order.append(F.coalesce(F.col(preferred_col), F.lit(0)).desc())
    if tiebreak:
        order.extend(tiebreak)
    from .dedup import keep_best_per_key
    return keep_best_per_key(df, [key], order)

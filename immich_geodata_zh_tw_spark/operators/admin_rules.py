"""Country-specific admin-name derivation rules (SURVEY.md §2.2 P9, §2.8 F13/F14).

Spark re-expressions of the reference's per-country when-chains:

* Japan R1-R5 admin_2 rules (japan.py:227-337): classify each municipality row
  by suffix/nullity flags, then a chained CASE builds admin_2 — including the
  gun-duplicate disambiguation prefix (japan.py:289-307).
* Korea city/district split regex ``^(.+?시)(.+?(?:구|군))$``
  (south_korea.py:31,223-295) → two regexp_extract columns + fallback.
* Korea admin_3 extraction: strip sido/sgg prefixes from adm_nm
  (south_korea.py:418-443) → nested replace + trim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .translate import normalize_null_tokens

KR_CITY_DISTRICT_RE = r"^(.+?시)(.+?(?:구|군))$"


def japan_admin2_rules(df: DataFrame, *, pref: str = "N03_001",
                       gun: str = "N03_003", muni: str = "N03_004",
                       ward: str = "N03_005",
                       out_col: str = "admin_2") -> DataFrame:
    """Japan R1-R5 when-chain (japan.py:227-337), null-token-normalized.

    R1 city (市): admin_2 = muni
    R2 direct 町/村/特別区 (no gun):   admin_2 = muni
    R3 政令市 ward:                    admin_2 = muni + ward
    R4 gun town/village:               admin_2 = muni (gun-prefixed on dup)
    R5 gun only:                       admin_2 = gun
    """
    d = df.withColumns({"__gun": normalize_null_tokens(F.col(gun)),
                        "__muni": normalize_null_tokens(F.col(muni)),
                        "__ward": normalize_null_tokens(F.col(ward))})
    is_city = F.col("__muni").isNotNull() & F.col("__muni").endswith("市")
    has_ward = F.col("__ward").isNotNull()
    has_gun = F.col("__gun").isNotNull() & F.col("__gun").endswith("郡")

    from .merge import marker_join
    flagged = marker_join(d, [pref, "__muni"], flag_col="__dup")

    admin2 = (
        F.when(has_ward & is_city, F.concat(F.col("__muni"), F.col("__ward")))  # R3
        .when(is_city, F.col("__muni"))                                          # R1
        .when(has_gun & F.col("__muni").isNotNull() & F.col("__dup"),
              F.concat(F.col("__gun"), F.col("__muni")))                         # R4 dup
        .when(has_gun & F.col("__muni").isNotNull(), F.col("__muni"))            # R4
        .when(has_gun, F.col("__gun"))                                           # R5
        .otherwise(F.col("__muni"))                                              # R2
    )
    return (flagged.withColumn(out_col, admin2)
            .drop("__gun", "__muni", "__ward", "__dup"))


def korea_split_city_district(df: DataFrame, *, col: str = "sggnm",
                              city_out: str = "city",
                              district_out: str = "district") -> DataFrame:
    """Merged ``市+區/郡`` names → (city, district); non-matching names pass
    through as city with null district (south_korea.py:247-295)."""
    city = F.regexp_extract(F.col(col), KR_CITY_DISTRICT_RE, 1)
    district = F.regexp_extract(F.col(col), KR_CITY_DISTRICT_RE, 2)
    matched = city != ""
    return df.withColumns(
        {city_out: F.when(matched, city).otherwise(F.col(col)),
         district_out: F.when(matched, district)})


def sejong_normalize(df: DataFrame, *, sido: str = "sidonm",
                     sgg: str = "sggnm", admin3: str = "admin_3",
                     sejong: str = "세종특별자치시") -> DataFrame:
    """Sejong single-tier normalization (south_korea.py:173-221).

    세종특별자치시 is Korea's only single-tier special autonomous city — no
    city/gun/gu layer.  When ``sidonm`` is Sejong and ``sggnm`` is NOT a real
    읍/면/동 unit (i.e. it's an institution name: council, city hall…),
    promote ``admin_3`` (the 읍/면/동) into ``sggnm`` (admin_2) and clear
    ``admin_3`` — so the cities500 ``name`` (admin_2 by default) has a real
    administrative value.
    """
    is_dong = (F.col(sgg).endswith("읍") | F.col(sgg).endswith("면")
               | F.col(sgg).endswith("동"))
    # one withColumns: both exprs bind to the ORIGINAL sggnm, which is what
    # the mask must see — the promoted admin_3 usually ends in 동, so a
    # sequential second withColumn re-evaluating the mask against the new
    # sggnm would skip clearing admin_3
    mask = (F.col(sido) == sejong) & ~is_dong
    return df.withColumns(
        {sgg: F.when(mask, F.col(admin3)).otherwise(F.col(sgg)),
         admin3: F.when(mask, F.lit(None).cast("string"))
                 .otherwise(F.col(admin3))})


def korea_admin3_strip(df: DataFrame, *, adm_nm: str = "adm_nm",
                       sido: str = "sidonm", sgg: str = "sggnm",
                       out_col: str = "admin_3") -> DataFrame:
    """admin_3 = adm_nm minus sido and sgg prefixes, trimmed
    (south_korea.py:418-443)."""
    stripped = F.trim(F.replace(F.replace(F.col(adm_nm), F.col(sido), F.lit("")),
                                F.col(sgg), F.lit("")))
    return df.withColumn(out_col, stripped)


def strip_disambiguation_suffix(col: Column) -> Column:
    """Remove a trailing ``(…)`` disambiguation, e.g. ``西區 (光州)`` → ``西區``
    (south_korea.py:593-600)."""
    return F.trim(F.regexp_replace(col, r"\s*\([^)]+\)$", ""))

"""The reference's `main.py release` data pipeline as Catalyst plans.

Re-expresses the enhance + translate stages (reference core/enhance_data.py,
core/translate.py, core/geodata/base.py — see SURVEY.md §3.1) on DataFrames:

* ``global_max_geoname_id``  — A4 scan over all id-bearing tables
  (core/utils/geoname_ids.py:36-75);
* ``generate_admin1_records`` — distinct admin_1 → zero-padded dense-rank
  codes + sequential geoname ids (base.py:493-592, :627-671);
* ``update_admin1``          — delete-by-prefix + insert (enhance_data.py:137-142);
* ``merge_extra_data``       — anti-join new rows ≥ population floor, then
  coordinate dedup keep-max-pop/min-id (enhance_data.py:222-297);
* ``convert_to_cities_schema`` — GEODATA rows → cities500 rows: 8-dp rounded
  coordinates, admin1-code lookup, sequential ids (base.py:71-188);
* ``translate_cities500``    — metadata coordinate join (J5) + alternate-name
  priority pick (A3) + coalesce chain (P10) + TW passthrough
  (translate.py:149-338).

Everything is built from the operator library; no step shuffles more than the
keys + payload it aggregates, and all dimension sides are broadcastable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import coordinate_dedup
from ..operators.ids import (dense_rank_codes, sequential_ids,
                             sequential_ids_scalable)
from ..operators.merge import replace_by_key
from ..operators.translate import (CHINESE_PRIORITY, coalesce_chain,
                                   extract_chinese_names, fix_li_names,
                                   metadata_coordinate_join,
                                   normalize_null_tokens, priority_pick)

COORD_DECIMAL_PLACES = 8  # reference base.py:24-25

#: the full-column sort that orders cities500 id allocation
#: (base.py:137-143) — module-level so callers that pre-collect the
#: boundary sample (``convert_to_cities_schema(presampled=...)``) name
#: the same columns the operator sorts by
CITIES_SORT_COLS = ["country", "admin_1", "admin_2", "admin_3", "admin_4",
                    "latitude", "longitude"]


def global_max_geoname_id_df(tables: list[DataFrame],
                             id_col: str = "geoname_id") -> DataFrame:
    """One-row ``(m)`` subplan: max id across all id-bearing tables —
    exposed un-collected so callers can fuse it with other one-row
    aggregates (crossJoin of 1×1 rows) into a SINGLE driver action."""
    maxes = [t.agg(F.max(F.col(id_col).cast("long")).alias("m")) for t in tables]
    merged = reduce(DataFrame.unionByName, maxes)
    return merged.agg(F.max("m").alias("m"))


def global_max_geoname_id(tables: list[DataFrame], id_col: str = "geoname_id") -> int:
    """Max id across all id-bearing tables (geoname_ids.py:36-75)."""
    row = global_max_geoname_id_df(tables, id_col).first()
    return int(row.m) if row.m is not None else 0


def generate_admin1_records(geodata: DataFrame, *, country_code: str,
                            base_geoname_id: int) -> DataFrame:
    """One ADMIN1 row per distinct admin_1: code ``CC.<rank>`` (zero-padded,
    alphabetical) + sequential geoname ids (base.py:493-592).

    admin_1 sets are dimension-sized by construction (a country has tens of
    first-level divisions), so the plain single-window ``sequential_ids`` is
    correct here and avoids the scalable variant's two driver actions +
    persist; the big cities500 allocation keeps the scalable path.
    """
    distinct = geodata.select("admin_1").distinct()
    coded = dense_rank_codes(distinct, "admin_1", prefix=country_code, out_col="id")
    with_ids = sequential_ids(coded, ["admin_1"], base=base_geoname_id,
                              out_col="geoname_id")
    return with_ids.select(
        F.col("id"),
        F.col("admin_1").alias("name"),
        F.col("admin_1").alias("asciiname"),
        F.col("geoname_id").cast("string").alias("geoname_id"))


def update_admin1(admin1: DataFrame, new_records: DataFrame, *,
                  country_code: str) -> DataFrame:
    """Replace a country's admin1 rows (delete-by-prefix + insert,
    enhance_data.py:137-142)."""
    return replace_by_key(admin1, new_records,
                          F.col("id").startswith(f"{country_code}."))


def convert_to_cities_schema(geodata: DataFrame, *, country_code: str,
                             base_geoname_id: int,
                             admin1_codes: DataFrame,
                             presampled: list[tuple] | None = None
                             ) -> DataFrame:
    """GEODATA rows → cities500-shaped rows (base.py:71-188).

    * coordinates rounded to 8 dp (join-key stability, SURVEY §1.3);
    * admin1_code via broadcast join against the admin1 table (J7 — the
      reference's dict lookup);
    * geoname ids allocated sequentially after the full-column sort (W1).

    ``presampled``: optional ``CITIES_SORT_COLS`` sample rows forwarded to
    the id allocator so it skips its boundary-probe job — callers with an
    existing bounded construction action collect the sample there (ids.py
    ``presampled`` contract: any value set is a correct boundary source).
    """
    # single withColumns calls: every withColumn re-analyzes the deepening
    # plan driver-side (~30 ms each in the release profile); these exprs all
    # bind to ORIGINAL columns so batching is semantics-preserving
    g = geodata.withColumns(
        {c: normalize_null_tokens(F.col(c))
         for c in ("admin_1", "admin_2", "admin_3", "admin_4")})
    g = (g.filter(F.col("latitude").isNotNull() & F.col("longitude").isNotNull())
         .withColumns({"latitude": F.round("latitude", COORD_DECIMAL_PLACES),
                       "longitude": F.round("longitude", COORD_DECIMAL_PLACES)}))
    g = sequential_ids_scalable(g, CITIES_SORT_COLS, base=base_geoname_id,
                                out_col="geoname_id",
                                presampled=presampled)
    a1 = admin1_codes.select(
        F.col("name").alias("admin_1"),
        F.element_at(F.split(F.col("id"), "\\."), -1).alias("admin1_code"))
    g = g.join(F.broadcast(a1), "admin_1", "left")
    name = coalesce_chain(F.col("admin_3"), F.col("admin_2"), F.col("admin_1"))
    return g.select(
        F.col("geoname_id").cast("string").alias("geoname_id"),
        name.alias("name"),
        name.alias("asciiname"),
        F.lit(None).cast("string").alias("alternatenames"),
        "latitude", "longitude",
        F.lit("A").alias("feature_class"),
        F.lit("ADM3").alias("feature_code"),
        F.lit(country_code).alias("country_code"),
        F.lit(None).cast("string").alias("cc2"),
        "admin1_code",
        F.col("admin_2").alias("admin2_code"),
        F.lit(None).cast("string").alias("admin3_code"),
        F.lit(None).cast("string").alias("admin4_code"),
        F.lit(0).alias("population"),
        F.lit(None).cast("string").alias("elevation"),
        F.lit(0).alias("dem"),
        F.lit("Asia/Taipei").alias("timezone"),
        F.current_date().alias("modification_date"),
    )


def merge_extra_data(cities: DataFrame, extra: DataFrame, *,
                     min_population: int = 100) -> DataFrame:
    """Add missing high-population rows, then coordinate-dedup
    (enhance_data.py:222-297): keep max population, tie → min geoname_id."""
    new_rows = (extra.join(cities.select("geoname_id"), "geoname_id", "left_anti")
                .filter(F.col("population") >= min_population))
    merged = cities.unionByName(new_rows)
    return coordinate_dedup(
        merged.withColumn("geoname_id", F.col("geoname_id").cast("long"))
    ).withColumn("geoname_id", F.col("geoname_id").cast("string"))


def replace_country_rows(cities: DataFrame, handler_rows: DataFrame, *,
                         country_code: str) -> DataFrame:
    """U3: drop a country's rows, insert the handler-generated ones
    (base.py:694-722)."""
    return replace_by_key(cities, handler_rows,
                          F.col("country_code") == country_code)


def pick_chinese_names(alternate_names: DataFrame) -> DataFrame:
    """Top-priority Chinese alternate name per geoname_id
    (alternate_names.py:41-90), including the 桃園縣→桃園市 rewrite."""
    zh = alternate_names.filter(F.col("lang").isin(CHINESE_PRIORITY))
    best = priority_pick(zh, key="geoname_id", lang_col="lang",
                         preferred_col="is_preferred_name",
                         tiebreak=[F.col("name").asc()])
    return best.select(
        "geoname_id",
        F.regexp_replace(F.col("name"), "桃園縣", "桃園市").alias("alternate_name"))


def translate_cities500(cities: DataFrame, metadata: DataFrame,
                        chinese_names: DataFrame, *,
                        passthrough_country: str = "TW") -> DataFrame:
    """translate.py:149-338 as one plan, all steps:

    1. metadata coordinate join (J5, on 8-dp rounded coords + country),
       gated exactly like the reference's translate_from_metadata
       (translate.py:200-207): a non-Chinese metadata name yields NULL
       (falling through to the alternate-name tiers), a simplified one is
       s2t-converted, a traditional one passes as-is (ADVICE.md round-2
       item 1 — round 2 emitted raw metadata names verbatim);
    2. alternate-name left join (J3), s2t-converted unless already
       traditional (translate.py:219-229);
    3. ``extract_chinese_names`` comma-candidate scan over ``alternatenames``
       (F11, translate.py:230-263) — pure JVM expression;
    3.5. empty-string → NULL so the coalesce skips blanks;
    4. final = coalesce(metadata, alternate, extracted) (translate.py:277-286);
    4.5. passthrough: rows of ``passthrough_country`` keep their original
       (already-localized) name;
    5/6. 裏→里 final-name fixup, first occurrence (translate.py:313-320);
    7. name = asciiname = coalesce(final, name) (translate.py:323-326).
    """
    from ..functions import zh

    meta = metadata.select(
        F.col("country_code"), F.col("latitude"), F.col("longitude"),
        F.col("admin_2").alias("meta_name"))
    joined = metadata_coordinate_join(
        cities, meta, keys=["country_code", "latitude", "longitude"],
        attrs=["meta_name"])
    joined = joined.join(F.broadcast(chinese_names), "geoname_id", "left")

    # Value-identical restatement of the reference gate (translate.py:200-207):
    #   non-Chinese            → NULL            (reference: fall through)
    #   s2t-fixpoint           → meta            (= s2t(meta) there anyway)
    #   t2s-fixpoint           → s2t(meta)       (proper simplified)
    #   mixed (neither)        → meta            (reference passes verbatim)
    # Both conversions come from ONE Arrow kernel call per row
    # (zh.s2t_t2s_udf — bit-identical to the Column folds, which remain the
    # oracle spec): the interpreted 510-replace fold and its 1000+-literal
    # packed arrays would otherwise repeat in every branch of this CASE and
    # dominate per-row cost at corpus scale.
    meta_name = F.col("meta_name")
    pair = zh.s2t_t2s_udf()(meta_name)
    meta_translated = (F.when(~zh.is_chinese(meta_name), F.lit(None))
                       .when(pair["s2t"] == meta_name, meta_name)
                       .when(pair["t2s"] == meta_name, pair["s2t"])
                       .otherwise(meta_name))

    # when alt is fully-Han traditional, s2t(alt) == alt — so the reference's
    # "keep if traditional else convert" (translate.py:219-229) is exactly
    # s2t(alt): one kernel instead of a fixpoint probe plus a fold
    alt = F.col("alternate_name")
    alt_translated = zh.s2t_udf()(alt)
    if "alternatenames" in cities.columns:
        extracted = extract_chinese_names("alternatenames")
    else:  # engine-generated cities rows carry no alternatenames
        extracted = F.lit(None).cast("string")

    def blank_to_null(c):
        return F.when(c == "", F.lit(None)).otherwise(c)

    final = coalesce_chain(blank_to_null(meta_translated),
                           blank_to_null(alt_translated),
                           blank_to_null(extracted))
    final = F.when(F.col("country_code") == passthrough_country,
                   F.col("name")).otherwise(final)
    final = fix_li_names(final)
    named = coalesce_chain(final, F.col("name"))
    # ONE select instead of withColumn×2 + drop: each of those re-analyzes
    # the deepest plan of the whole release pipeline driver-side (guide §5
    # — plan construction was ~half this query's bench time at sf0.1);
    # same columns, same order (replace-in-place when present, append when
    # absent — the withColumn contract), same values
    out = [named.alias(c) if c in ("name", "asciiname") else c
           for c in joined.columns if c not in ("meta_name", "alternate_name")]
    out += [named.alias(c) for c in ("name", "asciiname")
            if c not in joined.columns]
    return joined.select(*out)

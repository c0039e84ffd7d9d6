"""GeoNames-format sources/sinks (SURVEY.md §2.1 S2-S4, S8-S9).

The reference reads/writes the GeoNames dump formats with explicit schemas
(core/schemas.py:9-52; enhance_data.py:106-108,196-201): headerless TSV for
cities500/admin1, headered CSV for geodata, ``\\N`` null tokens for
alternateNamesV2.  These readers re-express that contract on
``spark.read.csv`` with declared StructTypes — schema inference is never used
on the big paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DateType, DoubleType, IntegerType, StringType,
                               StructField, StructType)

#: reference core/schemas.py:30-52 (19 columns, headerless TSV)
CITIES_SCHEMA = StructType([
    StructField("geoname_id", StringType()),
    StructField("name", StringType()),
    StructField("asciiname", StringType()),
    StructField("alternatenames", StringType()),
    StructField("latitude", DoubleType()),
    StructField("longitude", DoubleType()),
    StructField("feature_class", StringType()),
    StructField("feature_code", StringType()),
    StructField("country_code", StringType()),
    StructField("cc2", StringType()),
    StructField("admin1_code", StringType()),
    StructField("admin2_code", StringType()),
    StructField("admin3_code", StringType()),
    StructField("admin4_code", StringType()),
    StructField("population", IntegerType()),
    StructField("elevation", StringType()),
    StructField("dem", IntegerType()),
    StructField("timezone", StringType()),
    StructField("modification_date", DateType()),
])

#: reference core/schemas.py:9-16
ADMIN1_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("name", StringType()),
    StructField("asciiname", StringType()),
    StructField("geoname_id", StringType()),
])

#: reference core/schemas.py:18-28 (latitude/longitude lifted to double)
GEODATA_SCHEMA = StructType([
    StructField("latitude", DoubleType()),
    StructField("longitude", DoubleType()),
    StructField("country", StringType()),
    StructField("admin_1", StringType()),
    StructField("admin_2", StringType()),
    StructField("admin_3", StringType()),
    StructField("admin_4", StringType()),
])

#: reference core/utils/alternate_names.py:41-54 (cols 1-4 of alternateNamesV2)
ALTERNATE_NAMES_SCHEMA = StructType([
    StructField("alternate_name_id", StringType()),
    StructField("geoname_id", StringType()),
    StructField("lang", StringType()),
    StructField("name", StringType()),
    StructField("is_preferred_name", IntegerType()),
])


def read_cities_tsv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, sep="\t", header=False, schema=CITIES_SCHEMA)


def read_admin1_tsv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, sep="\t", header=False, schema=ADMIN1_SCHEMA)


def read_geodata_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, header=True, schema=GEODATA_SCHEMA)


def read_alternate_names(spark: SparkSession, path: str) -> DataFrame:
    """Column-pruned alternateNamesV2 scan with ``\\N`` nulls (S4)."""
    df = spark.read.csv(path, sep="\t", header=False, nullValue="\\N",
                        schema=ALTERNATE_NAMES_SCHEMA)
    return df.select("geoname_id", "lang", "name", "is_preferred_name")


def write_cities_tsv(df: DataFrame, path: str, *, single_file: bool = False) -> None:
    """Headerless GeoNames TSV sink (S9); single_file for diff-able goldens."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").csv(path, sep="\t", header=False)


def write_geodata_csv(df: DataFrame, path: str, *, sort: bool = True) -> None:
    """Headered CSV sink with the reference's stable full-column sort
    (base.py:322-335) — goldens only; never on the 10^12-row path."""
    if sort:
        df = df.orderBy(*df.columns)
    df.coalesce(1).write.mode("overwrite").csv(path, header=True)

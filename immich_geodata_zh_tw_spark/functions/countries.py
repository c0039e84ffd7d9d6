"""zh-TW country-name localization dim (reference i18n-iso-countries shape).

The reference ships ``i18n-iso-countries/langs/zh-tw.json`` (250 localized
country names) in its release pack, used by Immich's display path
(reference README.md:103).  The engine carries the mapping as a broadcast
dimension table and localizes with a plain equi-join — the idiomatic Spark
replacement for a runtime dict lookup.  Names below are public-knowledge
ISO 3166-1 zh-TW localizations (a representative subset; the full file is
data, swapped in the same join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: ISO 3166-1 alpha-2 → zh-TW localized country name
COUNTRY_ZH_TW: dict[str, str] = {
    "TW": "臺灣", "JP": "日本", "KR": "南韓", "CN": "中國", "HK": "香港",
    "MO": "澳門", "SG": "新加坡", "MY": "馬來西亞", "TH": "泰國",
    "VN": "越南", "PH": "菲律賓", "ID": "印尼", "IN": "印度",
    "US": "美國", "CA": "加拿大", "MX": "墨西哥", "BR": "巴西",
    "AR": "阿根廷", "CL": "智利", "PE": "祕魯", "CO": "哥倫比亞",
    "GB": "英國", "FR": "法國", "DE": "德國", "IT": "義大利",
    "ES": "西班牙", "PT": "葡萄牙", "NL": "荷蘭", "BE": "比利時",
    "CH": "瑞士", "AT": "奧地利", "SE": "瑞典", "NO": "挪威",
    "DK": "丹麥", "FI": "芬蘭", "IE": "愛爾蘭", "PL": "波蘭",
    "CZ": "捷克", "HU": "匈牙利", "GR": "希臘", "TR": "土耳其",
    "RU": "俄羅斯", "UA": "烏克蘭", "AU": "澳洲", "NZ": "紐西蘭",
    "ZA": "南非", "EG": "埃及", "NG": "奈及利亞", "KE": "肯亞",
    "MA": "摩洛哥", "SA": "沙烏地阿拉伯", "AE": "阿拉伯聯合大公國",
    "IL": "以色列", "IR": "伊朗", "IQ": "伊拉克", "PK": "巴基斯坦",
    "BD": "孟加拉", "LK": "斯里蘭卡", "NP": "尼泊爾", "MM": "緬甸",
    "KH": "柬埔寨", "LA": "寮國", "MN": "蒙古", "KP": "北韓",
}


def country_dim(spark: SparkSession) -> DataFrame:
    """The localization mapping as a (country_code, country_zh) DataFrame."""
    rows = sorted(COUNTRY_ZH_TW.items())
    return spark.createDataFrame(rows, "country_code string, country_zh string")


def localize_country(df: DataFrame, *, code_col: str = "country_code",
                     out_col: str = "country_zh") -> DataFrame:
    """Broadcast-join the zh-TW country name onto ``df`` (left join — codes
    outside the dim keep a null localized name)."""
    dim = country_dim(df.sparkSession).withColumnRenamed("country_code", code_col) \
                                      .withColumnRenamed("country_zh", out_col)
    return df.join(F.broadcast(dim), code_col, "left")


def country_dim_values_sql() -> str:
    """DuckDB VALUES list of the same mapping (for oracle SQL)."""
    rows = ", ".join(f"('{k}', '{v}')" for k, v in sorted(COUNTRY_ZH_TW.items()))
    return f"(VALUES {rows}) AS dim(country_code, country_zh)"

"""Simplified↔Traditional Chinese conversion, JVM-side (SURVEY.md §2.8 F8).

The reference uses OpenCC (translate.py:17-19,72-97) — a dictionary-based,
deterministic converter.  OpenCC is absent here, so the engine ships a
character-level mapping table of common simplified→traditional pairs
(public-knowledge character equivalences) applied with ``F.translate`` —
pure JVM, expressible verbatim in DuckDB (`translate(col, from, to)`), and
sufficient for the admin-name vocabulary this pipeline handles (台→臺, 湾→灣,
县→縣, …).  Word-level disambiguation (OpenCC's s2twp) is out of scope; the
reference's own cached outputs are tables, which the engine joins instead
(SURVEY.md §2.1 S7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: common simplified → traditional character pairs (1:1, same order; unique
#: source chars, no identity mappings)
SIMPLIFIED = "台湾县园区镇乡庄岛屿东龙凤桥头沟汉济宁广严冈养爱国学门马鸟云电气务书体当发后万与丑专业丛"
TRADITIONAL = "臺灣縣園區鎮鄉莊島嶼東龍鳳橋頭溝漢濟寧廣嚴岡養愛國學門馬鳥雲電氣務書體當發後萬與醜專業叢"

assert len(SIMPLIFIED) == len(TRADITIONAL)
assert len(set(SIMPLIFIED)) == len(SIMPLIFIED)


def s2t(col: Column) -> Column:
    """Simplified → Traditional (character-level)."""
    return F.translate(col, SIMPLIFIED, TRADITIONAL)


def t2s(col: Column) -> Column:
    """Traditional → Simplified (character-level)."""
    return F.translate(col, TRADITIONAL, SIMPLIFIED)


def is_traditional(col: Column) -> Column:
    """True when converting s→t changes nothing (reference is_traditional,
    translate.py:84-97 semantics at character granularity)."""
    return s2t(col) == col


def is_simplified(col: Column) -> Column:
    """True when the string contains at least one mapped simplified char."""
    return s2t(col) != col


def s2t_sql(col: str) -> str:
    """DuckDB-identical SQL text of ``s2t``."""
    return f"translate({col}, '{SIMPLIFIED}', '{TRADITIONAL}')"

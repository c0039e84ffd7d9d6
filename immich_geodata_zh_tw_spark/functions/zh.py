"""Simplified↔Traditional Chinese conversion, JVM-side (SURVEY.md §2.8 F8).

The reference uses OpenCC (translate.py:17-19,72-97) — a dictionary-based,
deterministic converter.  OpenCC is absent here, so the engine ships a
two-stage conversion built only from public-knowledge character/word
equivalences, applied entirely with JVM built-ins (``translate`` +
chained literal ``replace``) so every expression is emitted verbatim into
the DuckDB oracles:

1. **character stage** — a ~100-pair table of *unambiguous* simplified →
   traditional characters via ``F.translate`` (台→臺, 县→縣, …);
2. **word stage** — a longest-match-first list of word fixups applied AFTER
   the character pass, correcting the cases where the character default is
   wrong for a specific word (OpenCC resolves these with its word
   dictionaries): 頭[發→髮], 皇[後→后], 乾/幹 splits of 干, 麵 splits of 面…

Genuinely context-dependent single characters with no dominant default
(复→復/複, 钟→鐘/鍾, 范→範/姓范…) are deliberately unmapped — the
reference's own cached outputs for those are *tables*, which the engine
joins instead (SURVEY.md §2.1 S7).

Predicate semantics follow the reference exactly (translate.py:52-97):
``is_chinese`` = whole string is Han characters or '-'; ``is_traditional`` =
is_chinese ∧ s2t-fixpoint; ``is_simplified`` = is_chinese ∧ t2s-fixpoint.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: common simplified → traditional character pairs (1:1, same order; unique
#: source chars, no identity mappings, no ambiguous targets)
SIMPLIFIED = (
    "台湾县园区镇乡庄岛屿东龙凤桥头沟汉济宁广严冈养爱国学门马鸟云电气务书体当发后万与丑专业丛"
    "们来时说对开关见经长车话语读写饭鱼鸡线纸组红绿蓝黄风飞机场热买卖钱银铁点儿阳阴运动静声"
    "听视觉实现变转边远进过还这记忆议论证规简单杂条张陈刘杨赵吴孙罗郑谢许邓冯韩萧蒋贾叶谭邹"
    "陆顾汤岭滩庙宫号楼层"
)
TRADITIONAL = (
    "臺灣縣園區鎮鄉莊島嶼東龍鳳橋頭溝漢濟寧廣嚴岡養愛國學門馬鳥雲電氣務書體當發後萬與醜專業叢"
    "們來時說對開關見經長車話語讀寫飯魚雞線紙組紅綠藍黃風飛機場熱買賣錢銀鐵點兒陽陰運動靜聲"
    "聽視覺實現變轉邊遠進過還這記憶議論證規簡單雜條張陳劉楊趙吳孫羅鄭謝許鄧馮韓蕭蔣賈葉譚鄒"
    "陸顧湯嶺灘廟宮號樓層"
)

assert len(SIMPLIFIED) == len(TRADITIONAL)
assert len(set(SIMPLIFIED)) == len(SIMPLIFIED)
assert not set(SIMPLIFIED) & set(TRADITIONAL)

#: word-level fixups applied AFTER the character pass, longest first
#: (src = what the character pass produced, dst = the correct word).
#: Each source must be reachable (its chars are post-character-stage), and
#: each target must be a fixpoint of the character stage (no re-mapping).
S2T_WORD_FIXUPS: list[tuple[str, str]] = [
    # 發 vs 髮 (hair words)
    ("頭發", "頭髮"), ("理發", "理髮"), ("毛發", "毛髮"), ("假發", "假髮"),
    # 後 vs 后 (empress/queen words)
    ("皇後", "皇后"), ("太後", "太后"), ("影後", "影后"), ("天後", "天后"),
    # 干 → 乾 / 幹 (character stage leaves 干 unmapped)
    ("干燥", "乾燥"), ("干淨", "乾淨"), ("干杯", "乾杯"), ("餅干", "餅乾"),
    ("干部", "幹部"), ("能干", "能幹"), ("才干", "才幹"),
    # 面 → 麵 (food words; 面/face is the unmapped default)
    ("面包", "麵包"), ("面條", "麵條"), ("面粉", "麵粉"),
    # 里 → 裡 (location words; bare 里/unit stays — reference translate.py
    # even maps 裏→里 for village names, see fix_li_names)
    ("這里", "這裡"), ("那里", "那裡"), ("哪里", "哪裡"),
    # 制 → 製 (manufacture words)
    ("制造", "製造"), ("制作", "製作"),
]
# fixups run AFTER the character pass, so their sources must be written in
# post-character-stage form (a source containing a still-simplified mapped
# char could never match)
_BAD = [s for s, _ in S2T_WORD_FIXUPS for ch in s if ch in SIMPLIFIED]
assert not _BAD, f"fixup sources unreachable after character stage: {_BAD}"


def _s2t_text(col: str) -> str:
    """SQL text of the full s2t conversion (identical in Spark and DuckDB)."""
    out = f"translate({col}, '{SIMPLIFIED}', '{TRADITIONAL}')"
    for src, dst in S2T_WORD_FIXUPS:
        out = f"replace({out}, '{src}', '{dst}')"
    return out


def _t2s_text(col: str) -> str:
    """SQL text of t2s: reverse word fixups first, then reverse characters."""
    out = col
    for src, dst in S2T_WORD_FIXUPS:
        if src != dst:
            out = f"replace({out}, '{dst}', '{src}')"
    # undo the word stage back to post-character form, then reverse chars
    return f"translate({out}, '{TRADITIONAL}', '{SIMPLIFIED}')"


def s2t(col: Column | str) -> Column:
    """Simplified → Traditional (character stage + word fixups).

    Built from public Column ops (``F.translate`` + chained ``F.replace``) —
    no SQL-text round-trip through private APIs, so arbitrary Column
    expressions and Spark Connect both work (ADVICE.md round-2 item 4).
    """
    out = F.translate(F.col(col) if isinstance(col, str) else col,
                      SIMPLIFIED, TRADITIONAL)
    for src, dst in S2T_WORD_FIXUPS:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def t2s(col: Column | str) -> Column:
    """Traditional → Simplified (reverse word fixups + character stage)."""
    out = F.col(col) if isinstance(col, str) else col
    for src, dst in S2T_WORD_FIXUPS:
        if src != dst:
            out = F.replace(out, F.lit(dst), F.lit(src))
    return F.translate(out, TRADITIONAL, SIMPLIFIED)


#: Han-script membership, reference translate.py:52-69 (regex dialects:
#: Java `\p{IsHan}` / RE2 `\p{Han}`).  The *_SQL variants are for embedding
#: inside SQL string literals (Spark SQL eats single backslashes in
#: literals; DuckDB keeps them).
IS_CHINESE_RE_SPARK = r"^[\p{IsHan}-]+$"
IS_CHINESE_RE_DUCK = r"^[\p{Han}-]+$"
HAS_CHINESE_RE_SPARK = r"[\p{IsHan}]"
HAS_CHINESE_RE_DUCK = r"[\p{Han}]"
IS_CHINESE_SQL = {"spark": r"^[\\p{IsHan}-]+$", "duckdb": r"^[\p{Han}-]+$"}
HAS_CHINESE_SQL = {"spark": r"[\\p{IsHan}]", "duckdb": r"[\p{Han}]"}


def is_chinese(col: Column) -> Column:
    """Whole string is Han (or '-') — reference is_chinese (translate.py:52-55)."""
    return col.rlike(IS_CHINESE_RE_SPARK)


def include_chinese(col: Column) -> Column:
    """String contains at least one Han character (translate.py:58-69)."""
    return col.rlike(HAS_CHINESE_RE_SPARK)


def is_traditional(col: Column) -> Column:
    """Reference is_traditional_chinese (translate.py:86-97):
    is_chinese ∧ s2t-fixpoint."""
    return is_chinese(col) & (s2t(col) == col)


def is_simplified(col: Column) -> Column:
    """Reference is_simplified_chinese (translate.py:72-83):
    is_chinese ∧ t2s-fixpoint."""
    return is_chinese(col) & (t2s(col) == col)


def s2t_sql(col: str, *, dialect: str = "duckdb") -> str:
    """SQL text of ``s2t`` (identical semantics in Spark SQL and DuckDB)."""
    return _s2t_text(col)


def t2s_sql(col: str, *, dialect: str = "duckdb") -> str:
    return _t2s_text(col)

"""Bloom-filter decontamination — fixed-memory benchmark screening
(Bloom 1970; the shape Dolma's dedupe/decontamination tooling ships for
web-scale corpora).

Why next to the exact check: :func:`~.dedup.ngram_decontaminate` keys on
the gram STRING, so the eval side costs O(|distinct eval grams|) however
large the benchmark suite grows.  The Bloom form compresses the entire
eval side to ``n_bits`` bits — a few MB broadcast for a billion grams —
at the price of a tunable false-positive rate and zero false negatives.
The production discipline is two-stage: Bloom-screen the corpus cheaply,
then run the exact semi-join only over the tiny maybe-contaminated
slice (both stages exist in this engine; the driver row carries the
exact verdict, the Bloom verdict, AND the per-doc false-positive
delta, so the screen's one-sided-error contract is hash-checked).

Everything is deterministic — positions come from md5, no RNG — so
membership AND every false positive reproduce bit-identically in the
DuckDB oracle (the same property that makes the KMV sketch and the ANN
codebooks oracle-checkable).  Position ``j`` of a key is::

    ('0x' || substring(md5(key || '#' || j), 1, 15))::BIGINT  %  n_bits

(Spark spells the hex parse ``conv(..., 16, 10)``) — k independent
60-bit hash slots, the standard k-hash Bloom construction.

Spark-side representation: the SET-BIT POSITIONS as a ≤ ``n_bits``-row
frame, not a packed bitmap — positions broadcast-join against the
corpus's exploded gram positions (all JVM, no UDF), membership is
``count(matched) = n_hashes`` per gram.  (Spark's packed-bitmap
``bloom_filter_agg`` expression exists but is not SQL-registered in
this build — it backs runtime join pruning only; the positions-frame
form is also what the DuckDB oracle can restate exactly.)

No reference-repo counterpart (Polars/GeoPandas ETL) — LLM-pipeline
scope per the driver's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_CHARS = 15  # 60-bit md5 prefix, the house scheme (see sketch.py)


def bloom_pos_sql(key_sql: str, j: int, n_bits: int,
                  dialect: str = "spark") -> str:
    """Position of hash slot ``j`` for a key expression, in either SQL
    dialect (identical value by construction)."""
    h = f"substring(md5(concat({key_sql}, '#{j}')), 1, {_HASH_CHARS})"
    if dialect == "spark":
        return f"CAST(conv({h}, 16, 10) AS BIGINT) % {n_bits}"
    if dialect == "duckdb":
        return f"(('0x' || {h})::BIGINT) % {n_bits}"
    raise ValueError(f"unknown dialect {dialect!r}")


def _positions_array(key_sql: str, n_bits: int, n_hashes: int):
    return F.array(*[F.expr(bloom_pos_sql(key_sql, j, n_bits))
                     for j in range(n_hashes)])


def bloom_build(df: DataFrame, key_sql: str, *, n_bits: int,
                n_hashes: int) -> DataFrame:
    """Build the filter from the (small) reference side: the DISTINCT set
    positions as a 1-column ``(pos long)`` frame, ≤ ``n_bits`` rows no
    matter how many keys went in.  NULL keys contribute nothing."""
    return (df.select(F.explode(_positions_array(key_sql, n_bits,
                                                 n_hashes)).alias("pos"))
            .filter(F.col("pos").isNotNull())
            .distinct())


def bloom_maybe_contains(keys: DataFrame, bloom: DataFrame, key_sql: str, *,
                         n_bits: int, n_hashes: int,
                         out_col: str = "bloom_maybe") -> DataFrame:
    """Per-row Bloom membership for a frame of candidate keys: true iff
    ALL ``n_hashes`` positions are set.  The bloom frame broadcasts
    (≤ n_bits rows); the candidate side explodes to ``n_hashes`` narrow
    (row, pos) rows, inner-joins, and folds back with ``count =
    n_hashes`` — zero UDF, nothing wider than (key, pos) shuffles.
    One-sided error: every true member reports true; a non-member may
    (deterministically) report true, never the reverse.

    Shape note — no join-back: the exploded rows LEFT-join the broadcast
    (keeping misses as NULL) and fold straight back with ``count(hit) =
    count(*)`` in ONE aggregation, so the key payload never rides a
    second join (the span_dedup discipline).

    Output is one row per DISTINCT key row (the groupBy fold).  The hit
    count is compared against the group's own exploded row count, not
    the literal ``n_hashes`` (r6 ADVICE fix): duplicate key rows merge
    into one group of ``dup × n_hashes`` rows, and the literal
    comparison silently returned false for true members — a false
    NEGATIVE, the direction the screen guarantees never happens.  For
    distinct inputs the two forms are identical (in-repo callers
    ``.distinct()`` first; every driver row is unchanged)."""
    exploded = keys.select(
        "*", F.explode(_positions_array(key_sql, n_bits, n_hashes))
        .alias("__pos"))
    tagged = exploded.join(
        F.broadcast(bloom.select(F.col("pos").alias("__pos"),
                                 F.lit(1).alias("__hit"))),
        "__pos", "left")
    return (tagged.groupBy(*keys.columns)
            .agg((F.count("__hit") == F.count(F.lit(1))).alias(out_col)))


def bloom_decontaminate(train: DataFrame, eval_df: DataFrame, *,
                        id_col: str, text_col: str, ngram_words: int = 8,
                        n_bits: int = 1 << 20,
                        n_hashes: int = 3) -> DataFrame:
    """Dolma-style Bloom screening of train docs against an eval set's
    n-grams: per train doc, the count of DISTINCT grams the filter flags
    and the resulting maybe-contaminated verdict.

    Superset guarantee (no false negatives): every doc
    :func:`~.dedup.ngram_decontaminate` flags is flagged here too; the
    difference is only deterministic false positives, whose rate falls
    as ``(1 - e^(-kn/m))^k``.  Scale shape: the eval side collapses to a
    ≤ ``n_bits``-row broadcast however large the benchmark suite; the
    train side explodes grams once (same shape as the exact check) and
    each gram tests membership against the broadcast — no gram-string
    join at all, the join key is an 8-byte position."""
    from .textstats import word_ngrams_expr

    def grams(df: DataFrame) -> DataFrame:
        words = df.select(F.col(id_col),
                          F.expr(f"split(trim({text_col}), ' ')")
                          .alias("__w"))
        return (words.filter(F.expr(f"size(__w) >= {ngram_words}"))
                .select(id_col, F.explode(
                    word_ngrams_expr("__w", ngram_words)).alias("gram")))

    bloom = bloom_build(grams(eval_df).select("gram").distinct(), "gram",
                        n_bits=n_bits, n_hashes=n_hashes)
    flagged = bloom_maybe_contains(
        grams(train).select(id_col, "gram").distinct(), bloom, "gram",
        n_bits=n_bits, n_hashes=n_hashes)
    hits = (flagged.filter("bloom_maybe").groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bloom_grams")))
    return (train.select(id_col)
            .join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bloom_grams", F.lit(0)).cast("long")
                    .alias("n_bloom_grams"),
                    (F.coalesce("n_bloom_grams", F.lit(0)) > 0)
                    .alias("bloom_maybe")))


def bloom_oracle_cte(train_grams_cte: str, eval_grams_cte: str, *,
                     n_bits: int, n_hashes: int,
                     id_col: str = "doc_id",
                     cte_name: str = "bloom") -> str:
    """DuckDB restatement: expects CTEs exposing train grams
    ``(id, gram)`` and eval grams ``(gram)``; exposes
    ``{cte_name}(id, n_bloom_grams)`` (docs with zero flagged grams are
    absent — the consumer coalesces)."""
    def poss(j):
        return bloom_pos_sql("gram", j, n_bits, dialect="duckdb")

    pos_list = ", ".join(poss(j) for j in range(n_hashes))
    return f"""
{cte_name}_set AS (
  SELECT DISTINCT unnest([{pos_list}]) AS pos FROM {eval_grams_cte}),
{cte_name}_probe AS (
  SELECT DISTINCT {id_col}, gram FROM {train_grams_cte}),
{cte_name}_hits AS (
  SELECT p.{id_col}, p.gram, count(*) AS hits
  FROM (SELECT {id_col}, gram, unnest([{pos_list}]) AS pos
        FROM {cte_name}_probe) p
  JOIN {cte_name}_set s USING (pos)
  GROUP BY 1, 2),
{cte_name} AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_bloom_grams
  FROM {cte_name}_hits WHERE hits = {n_hashes} GROUP BY 1)"""

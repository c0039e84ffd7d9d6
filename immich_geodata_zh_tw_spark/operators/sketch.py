"""KMV (k-minimum-values) distinct-count sketch — mergeable cardinality
estimation over groups (Bar-Yossef et al. 2002; the bottom-k sketch).

Why a sketch at all: an EXACT per-group ``count(distinct key)`` over a
100 TB corpus shuffles every distinct (group, key) pair; the KMV sketch
answers the same question to ~``1/sqrt(k)`` relative error while only
ever moving ≤ ``k`` 15-byte hashes per group — and two sketches built on
disjoint shards MERGE into the sketch of the union (bottom-k of the
union of bottom-k sets), so shard-parallel profiling and incremental
refresh need no re-scan.

Estimator: hash every key to a uniform 60-bit integer (15-char md5
prefix — the house 60-bit scheme, e.g. ``dedup.ngram_jaccard_pairs``),
keep each group's ``k`` smallest DISTINCT hashes; with ``U_(k)`` the
k-th smallest as a fraction of the hash space, ``est = (k-1) / U_(k)``.
A group with fewer than ``k`` distinct keys keeps them all and the count
is EXACT.  Every step is deterministic (md5, no RNG), so the whole
sketch — including the estimate — is reproducible at any parallelism and
SQL-restatable for the driver's DuckDB oracle: the hex prefix ORDERS
identically as string and as integer (fixed width, lowercase in both
engines), and the single per-group k-th hash converts via Spark
``conv(h, 16, 10)`` / DuckDB ``('0x' || h)::BIGINT``.

Scale shape: one map-side-combined DISTINCT on (group, hash) — the only
corpus-sized shuffle, on a narrow 15-byte key — then the salted
two-phase bottom-k of :func:`~.sample.domain_cap` (local rank within
(group, salt) cuts provably-beyond-k rows, global rank over the
≤ k·n_salts survivors), so a zipfian mega-group never sorts in one task;
Spark's WindowGroupLimit pushes the rank ≤ k cut into the local sort as
a bounded top-k heap.

No reference-repo counterpart (Polars/GeoPandas ETL) — corpus-profiling
scope per the driver's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hash width: 15 lowercase-hex chars = 60 bits (the house md5-prefix
#: scheme); 2.0**60 is exact in a double, so the estimator's one
#: multiply+divide is the same correctly-rounded IEEE operation on both
#: engines
HASH_BITS = 60
_HASH_CHARS = HASH_BITS // 4
_HASH_SPACE = float(1 << HASH_BITS)


def kmv_hash_sql(key_sql: str) -> str:
    """Shared-dialect 60-bit hash of a key expression (valid Spark SQL
    AND DuckDB SQL — both md5() lowercase-hex, both substring 1-based)."""
    return f"substring(md5({key_sql}), 1, {_HASH_CHARS})"


def kmv_sketch_rows(df: DataFrame, *, group_col: str, key_sql: str,
                    k: int, n_salts: int = 16,
                    with_exact: bool = False) -> DataFrame:
    """The mergeable sketch itself: per group, the ``k`` smallest distinct
    key hashes as rows ``(group, h)`` (≤ k rows per group).

    ``key_sql`` is a SQL expression over ``df``'s columns (e.g. a column
    name, or a concat for composite keys).  Rows with a NULL key are
    excluded (md5(NULL) is NULL — distinct-counting NULL is undefined).

    ``with_exact=True`` additionally rides the EXACT distinct-hash count
    out of the SAME pass as a ``__exact`` column (see :func:`_bottom_k`)
    — no second corpus scan, at the price of losing the pre-shuffle
    WindowGroupLimit prune on phase 1 (the count window must see every
    row).  Exact-carrying rows do NOT compose under :func:`kmv_merge`
    (shard exacts over-count overlap; the hashes still merge fine).
    """
    distinct = (df.select(F.col(group_col).alias("grp"),
                          F.expr(kmv_hash_sql(key_sql)).alias("h"))
                .filter(F.col("h").isNotNull())
                .distinct())
    return _bottom_k(distinct, k=k, n_salts=n_salts, with_exact=with_exact)


def _bottom_k(rows: DataFrame, *, k: int, n_salts: int,
              with_exact: bool = False) -> DataFrame:
    """Exact per-group bottom-k over ``(grp, h)`` rows via the salted
    two-phase rank (``sample.domain_cap``'s shape: a local rank > k
    within (grp, salt) proves ≥ k smaller hashes in that salt alone).

    ``with_exact``: a count window over the SAME (grp, salt) partition
    stamps every row with its salt's distinct-hash count; each non-empty
    salt's ``__lrk = 1`` row always survives the phase-1 cut, so summing
    ``__sc`` over exactly those rows inside the bounded phase-2 frame
    reconstructs the group's TOTAL distinct count — the exact audit
    number and the sketch from one linear tree, no second scan."""
    salt = F.pmod(F.xxhash64(F.col("h")), F.lit(n_salts))
    w_local = Window.partitionBy(F.col("grp"), salt).orderBy("h")
    tagged = rows.withColumn("__lrk", F.row_number().over(w_local))
    if with_exact:
        tagged = tagged.withColumn(
            "__sc", F.count(F.lit(1)).over(
                Window.partitionBy(F.col("grp"), salt)))
    survivors = tagged.filter(F.col("__lrk") <= k)
    w_global = Window.partitionBy("grp").orderBy("h")
    ranked = survivors.withColumn("__rk", F.row_number().over(w_global))
    if with_exact:
        ranked = ranked.withColumn(
            "__exact", F.sum(F.when(F.col("__lrk") == 1, F.col("__sc")))
            .over(Window.partitionBy("grp")))
        return (ranked.filter(F.col("__rk") <= k)
                .select("grp", "h", "__exact"))
    return ranked.filter(F.col("__rk") <= k).select("grp", "h")


def kmv_merge(a: DataFrame, b: DataFrame, *, k: int,
              n_salts: int = 16) -> DataFrame:
    """Merge two sketches (e.g. built on disjoint shards) into the sketch
    of the union: bottom-k of the distinct union of their hash rows.
    Inputs are ``kmv_sketch_rows`` outputs; ≤ 2k rows per group enter the
    re-rank, so this costs nothing at any corpus size."""
    return _bottom_k(a.unionByName(b).distinct(), k=k, n_salts=n_salts)


def kmv_estimate(rows: DataFrame, *, k: int,
                 group_out: str = "grp") -> DataFrame:
    """Collapse sketch rows to per-group estimates:
    ``(group, n_sketch, kth_hash, est_distinct[, exact_distinct])`` —
    the last column only when the rows carry ``__exact``.

    ``n_sketch < k`` ⇒ the sketch holds every distinct hash and
    ``est_distinct`` IS the exact count; otherwise the KMV estimator
    ``round((k-1) * 2^60 / kth)`` — one exact IEEE multiply+divide+round,
    bit-identical across engines."""
    with_exact = "__exact" in rows.columns
    aggs = [F.count(F.lit(1)).alias("n_sketch"),
            F.max("h").alias("kth_hash")]
    if with_exact:
        aggs.append(F.max("__exact").alias("__exact"))
    agg = rows.groupBy("grp").agg(*aggs)
    kth_val = F.expr("cast(conv(kth_hash, 16, 10) as bigint)")
    est = F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("long")) \
        .otherwise(F.round(F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
                           / kth_val.cast("double")).cast("long"))
    out = [F.col("grp").alias(group_out), F.col("n_sketch"),
           F.col("kth_hash"), est.alias("est_distinct")]
    if with_exact:
        out.append(F.col("__exact").cast("long").alias("exact_distinct"))
    return agg.select(*out)


def kmv_sketch(df: DataFrame, *, group_col: str, key_sql: str, k: int,
               n_salts: int = 16, group_out: str | None = None,
               with_exact: bool = False) -> DataFrame:
    """One-call per-group distinct-count estimate (sketch + collapse)."""
    rows = kmv_sketch_rows(df, group_col=group_col, key_sql=key_sql,
                           k=k, n_salts=n_salts, with_exact=with_exact)
    return kmv_estimate(rows, k=k, group_out=group_out or group_col)


def kmv_oracle_cte(source_sql: str, *, group_sql: str, key_sql: str,
                   k: int, cte_name: str = "kmv") -> str:
    """DuckDB CTE restating :func:`kmv_sketch` over ``source_sql`` rows:
    exposes ``{cte_name}(grp, n_sketch, kth_hash, est_distinct)`` via a
    plain per-group window rank (the oracle may sort the full distinct
    set — it runs at toy scale)."""
    return f"""
{cte_name}_d AS (
  SELECT DISTINCT {group_sql} AS grp, {kmv_hash_sql(key_sql)} AS h
  FROM {source_sql}
  WHERE {kmv_hash_sql(key_sql)} IS NOT NULL),
{cte_name}_r AS (
  SELECT grp, h,
         row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM {cte_name}_d),
{cte_name} AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_sketch,
         max(h) AS kth_hash,
         CASE WHEN count(*) < {k} THEN CAST(count(*) AS BIGINT)
              ELSE CAST(round(CAST({k - 1} AS DOUBLE) * {_HASH_SPACE!r}
                              / CAST(('0x' || max(h)) AS BIGINT)) AS BIGINT)
         END AS est_distinct
  FROM {cte_name}_r WHERE rn <= {k} GROUP BY 1)"""


# ---------------------------------------------------------------------------
# Count-Min sketch — the frequency member of the sketch triad
# (membership: operators/bloom.py; cardinality: KMV above; frequency: CMS)
# ---------------------------------------------------------------------------


def cms_build(df: DataFrame, key_sql: str, *, n_bits: int,
              n_hashes: int) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of key
    frequencies: ``n_hashes`` rows × ``n_bits`` counters, materialized as
    a ``(j, pos, c)`` frame of ≤ ``n_hashes·n_bits`` rows however many
    occurrences went in — the fixed-memory frequency summary (heavy-
    hitter monitoring, per-shard frequency merge by simple counter
    addition).

    Positions reuse the Bloom construction (md5 of ``key#j`` — see
    :mod:`.bloom`), so the whole sketch is deterministic and the DuckDB
    oracle reproduces every counter, collision included.  Scale shape:
    one map-side-combined ``(j, pos)`` SUM — the corpus shuffles only
    ``n_hashes`` 16-byte rows per input row, and partial aggregation
    collapses them to ≤ ``n_hashes·n_bits`` on the map side."""
    from .bloom import _positions_array

    return (df.select(F.posexplode(
                _positions_array(key_sql, n_bits, n_hashes))
                .alias("j", "pos"))
            .filter(F.col("pos").isNotNull())
            .groupBy("j", "pos")
            .agg(F.count(F.lit(1)).alias("c")))


def cms_estimate(keys: DataFrame, sketch: DataFrame, key_sql: str, *,
                 n_bits: int, n_hashes: int,
                 out_col: str = "cms_est") -> DataFrame:
    """Frequency estimates for a frame of probe keys: ``est = min over j
    of counter[j][pos_j(key)]`` — the classic one-sided guarantee
    (``est ≥ true`` always; overshoot bounded by collision mass).  The
    sketch broadcasts; the probe side explodes to ``n_hashes`` narrow
    rows, LEFT-joins, and folds back with ONE ``min`` aggregation — no
    key-payload join-back (the bloom/span_dedup discipline)."""
    from .bloom import _positions_array

    exploded = keys.select(
        "*", F.posexplode(_positions_array(key_sql, n_bits, n_hashes))
        .alias("__j", "__pos"))
    tagged = exploded.join(
        F.broadcast(sketch.select(F.col("j").alias("__j"),
                                  F.col("pos").alias("__pos"), "c")),
        ["__j", "__pos"], "left")
    return (tagged.groupBy(*keys.columns)
            .agg(F.min(F.coalesce("c", F.lit(0))).cast("long")
                 .alias(out_col)))


def cms_oracle_cte(occurrences_cte: str, probes_cte: str, *, n_bits: int,
                   n_hashes: int, cte_name: str = "cms") -> str:
    """DuckDB restatement: ``occurrences_cte`` exposes one row per key
    OCCURRENCE (column ``key``), ``probes_cte`` the distinct probe keys
    (column ``key``); exposes ``{cte_name}(key, cms_est)``."""
    from .bloom import bloom_pos_sql

    def branch(src, j):
        return (f"SELECT key, {j} AS j, "
                f"{bloom_pos_sql('key', j, n_bits, dialect='duckdb')} AS pos"
                f" FROM {src}")

    occ = " UNION ALL ".join(branch(occurrences_cte, j)
                             for j in range(n_hashes))
    prb = " UNION ALL ".join(branch(probes_cte, j)
                             for j in range(n_hashes))
    return f"""
{cte_name}_t AS (
  SELECT j, pos, count(*) AS c FROM ({occ}) GROUP BY 1, 2),
{cte_name} AS (
  SELECT p.key, CAST(min(coalesce(t.c, 0)) AS BIGINT) AS cms_est
  FROM ({prb}) p
  LEFT JOIN {cte_name}_t t USING (j, pos)
  GROUP BY 1)"""

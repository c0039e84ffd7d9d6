"""Deduplication operators — reference semantics + web-scale document dedup.

Reference semantics:
* coordinate dedup, keep max population / tie min geoname_id
  (enhance_data.py:273-290) — the reference does groupBy + self-join; here a
  single ``row_number`` window (one shuffle instead of two, SURVEY.md J2);
* priority pick: sort by priority then first per key (alternate_names.py:79-85);
* order-stable ``dropDuplicates`` (base.py:288, W3).

Web-scale additions (training-data pipeline, driver mandate): exact dedup by
content hash, MinHash-LSH near-dup candidate pairs, SimHash. All use built-in
JVM functions (md5/xxhash64, higher-order array ops) — no Python on the hot
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_best_per_key(df: DataFrame, keys: list[str],
                      order_by: list[Column]) -> DataFrame:
    """One row per key, chosen by explicit ordering (deterministic)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def coordinate_dedup(df: DataFrame, *, lat: str = "latitude",
                     lon: str = "longitude", population: str = "population",
                     id_col: str = "geoname_id") -> DataFrame:
    """Reference rule: per (lat, lon) keep max population, tie → min id."""
    return keep_best_per_key(df, [lat, lon],
                             [F.col(population).desc(), F.col(id_col).asc()])


def exact_dedup(df: DataFrame, content_col: str, *, id_col: str) -> DataFrame:
    """Exact duplicate groups by md5(content): representative = min id.

    Output: one row per distinct content with ``dup_count``.  Hash-groupBy
    with map-side partial aggregation; the content column itself never
    shuffles (only its 128-bit hash + min id + count).
    """
    return (df.select(F.md5(F.col(content_col)).alias("content_hash"),
                      F.col(id_col))
            .groupBy("content_hash")
            .agg(F.min(id_col).alias("rep_id"),
                 F.count(F.lit(1)).alias("dup_count")))


ROWS_PER_BAND = 2


def minhash_agg_expr(text_col: str, *, n_bands: int = 4, shingle: int = 5,
                     stride: int = 2) -> str:
    """All MinHash rows in ONE md5 pass, as one Spark-SQL aggregate.

    Classic banding needs ``n_bands × rows_per_band`` independent hash
    functions; round 1 evaluated that many md5 calls per shingle position —
    the measured cost center of the whole bench.  A 128-bit md5 digest
    already carries 8 independent 16-bit values, so instead each sampled
    shingle is hashed ONCE and row ``k`` takes hex slice ``[4k, 4k+4)``;
    a single ``aggregate`` folds the shingle array into the struct of 8
    per-slice minima (one pass, no re-hash, stays in codegen).  ``stride``
    samples every n-th position (negligible quality loss at 5-char shingles).
    """
    n_rows = n_bands * ROWS_PER_BAND
    assert n_rows * 4 <= 32, "md5 hex has 32 chars = max 8 rows of 4"
    arr = (f"transform(sequence(1, greatest(length({text_col}) - {shingle - 1}, 1), "
           f"{stride}), i -> md5(substring({text_col}, i, {shingle})))")
    init = "named_struct(" + ", ".join(f"'m{k}', 'g'" for k in range(n_rows)) + ")"
    merge = ("(acc, h) -> named_struct(" + ", ".join(
        f"'m{k}', least(acc.m{k}, substring(h, {1 + 4 * k}, 4))"
        for k in range(n_rows)) + ")")
    return f"aggregate({arr}, {init}, {merge})"


def minhash_signature(text_col: str, *, n_bands: int = 4,
                      shingle: int = 5, stride: int = 2) -> list[Column]:
    """MinHash band signatures over character shingles, pure SQL expressions.

    Band ``b`` = concat of its ``ROWS_PER_BAND`` slice-minima (more rows per
    band ⇒ exponentially fewer false-positive candidate pairs).  The heavy
    digest work happens once in :func:`minhash_agg_expr`; callers should
    select the returned columns in a SEPARATE projection from the one
    computing ``__mh`` so Catalyst keeps the aggregate single-evaluation
    (CollapseProject declines to inline non-cheap aliases used repeatedly).
    """
    cols = [F.expr(minhash_agg_expr(text_col, n_bands=n_bands, shingle=shingle,
                                    stride=stride)).alias("__mh")]
    return cols


def _band_cols(n_bands: int) -> list[Column]:
    return [
        F.expr(f"concat(__mh.m{2 * b}, __mh.m{2 * b + 1})").alias(f"band{b}")
        for b in range(n_bands)
    ]


def minhash_candidate_pairs(df: DataFrame, *, id_col: str, text_col: str,
                            n_bands: int = 4, shingle: int = 5,
                            max_bucket_size: int | None = None) -> DataFrame:
    """LSH candidate near-dup pairs: docs sharing any band signature.

    Explode to (band_idx, sig) → self-join per bucket → distinct (a, b) with
    a < b.  The shuffle key is the band hash — uniformly distributed across
    *distinct* contents, so no key skew; bucket sizes bound the join fan-out.

    **Scale guard** (VERDICT.md round-1 item 7): a corpus heavy in *exact*
    duplicates puts every copy in the same bucket of every band — one
    m-member bucket emits O(m²) pairs.  Two mitigations, composable:

    * run :func:`exact_dedup` first and feed only representatives (exact-dup
      membership is recoverable from the hash groups, so no information is
      lost — the recommended 100-TB shape);
    * ``max_bucket_size=N`` keeps only the N smallest ids per (band, sig)
      bucket (deterministic windowed cap) — recall degrades gracefully on
      pathological buckets instead of the job degenerating to quadratic.
      Default ``None`` preserves the exact candidate-pair semantics the
      DuckDB oracle checks.
    """
    # two projections on purpose: __mh (the single md5-pass aggregate) is a
    # non-cheap alias referenced by every band, so Catalyst keeps it
    # evaluated once instead of inlining it per band
    sigs = (df.select(F.col(id_col), *minhash_signature(
        text_col, n_bands=n_bands, shingle=shingle))
            .select(id_col, *_band_cols(n_bands)))
    bands = sigs.select(
        id_col,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("sig"))
            for b in range(n_bands)])).alias("bs"),
    ).select(id_col, F.col("bs.band_idx"), F.col("bs.sig"))
    if max_bucket_size is not None:
        w = Window.partitionBy("band_idx", "sig").orderBy(F.col(id_col).asc())
        bands = (bands.withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") <= max_bucket_size).drop("__rn"))
    left = bands.alias("l")
    right = bands.alias("r")
    return (left.join(right, ["band_idx", "sig"])
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"))
            .distinct())


def shingle_set_expr(text_col: str, *, shingle: int = 5, stride: int = 2) -> str:
    """Distinct character n-gram set as one JVM expression (Spark SQL text;
    DuckDB twin uses list_distinct/list_transform/generate_series)."""
    return (f"array_distinct(transform(sequence(1, "
            f"greatest(length({text_col}) - {shingle - 1}, 1), {stride}), "
            f"i -> substring({text_col}, i, {shingle})))")


def ngram_jaccard_pairs(df: DataFrame, *, id_col: str, text_col: str,
                        n_bands: int = 4, shingle: int = 5,
                        threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard similarity over LSH candidate pairs.

    Two-stage near-dup pipeline: MinHash banding proposes candidates (cheap,
    bucketed — never all-pairs), then the exact shingle-set Jaccard scores
    each candidate; ``threshold`` keeps pairs at/above it.  The shingle
    arrays ride only the candidate-pair joins (pair count ≪ corpus²), never
    the banding shuffle.  All JVM higher-order functions
    (array_intersect/array_union) — no Python.
    """
    pairs = minhash_candidate_pairs(df, id_col=id_col, text_col=text_col,
                                    n_bands=n_bands, shingle=shingle)
    sh = df.select(F.col(id_col), F.expr(
        shingle_set_expr(text_col, shingle=shingle)).alias("__sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"))
    jac = F.expr("CAST(size(array_intersect(__sha, __shb)) AS DOUBLE) "
                 "/ size(array_union(__sha, __shb))")
    return (pairs.join(a, "id_a").join(b, "id_b")
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .drop("__sha", "__shb"))


def minhash_clusters(df: DataFrame, *, id_col: str, text_col: str,
                     n_bands: int = 4, shingle: int = 5,
                     max_iter: int = 50) -> DataFrame:
    """Near-dup CLUSTER labels without materializing candidate pairs.

    Pairwise LSH output is inherently quadratic in cluster size (a family of
    m near-identical docs emits O(m²) pairs — measured dominant at sf0.1).
    The scalable product is one label per doc: connected components over the
    bipartite doc↔band-bucket graph, by iterated min-label propagation
    (doc → min over its buckets of the bucket's min label) until fixpoint.
    Every iteration is two linear hash aggregations + a bucket join — no
    pair blow-up anywhere; rounds needed = the cluster graph's diameter.
    Output: (id, cluster_id) where cluster_id = min doc id of the component.

    Per-round cost discipline (VERDICT.md round-2 item 3): the iteration
    runs ONE job — ``localCheckpoint(eager=True)`` both materializes the new
    labels and truncates lineage (no per-round plan growth) — and the
    convergence probe is a ``__changed`` flag computed inside the same
    propagation projection, read back with a short-circuiting ``limit(1)``
    scan of the already-checkpointed blocks (the round-2 version re-executed
    a separate three-way join per round just to detect change).

    Raises ``RuntimeError`` if ``max_iter`` rounds exhaust before fixpoint
    (ADVICE.md round-2 item 2 — a silently non-converged component diverges
    from the exact connected-components oracle).  Label propagation advances
    one graph hop per round, so ``max_iter`` bounds the component diameter,
    not the corpus size; 50 covers any real near-dup topology.
    """
    sigs = (df.select(F.col(id_col), *minhash_signature(
        text_col, n_bands=n_bands, shingle=shingle))
            .select(id_col, *_band_cols(n_bands)))
    buckets = sigs.select(
        id_col,
        F.explode(F.array(*[
            F.xxhash64(F.lit(b), F.col(f"band{b}")).alias(f"x{b}")
            for b in range(n_bands)])).alias("bucket"))
    buckets = buckets.persist()
    labels = df.select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    for _ in range(max_iter):
        bucket_min = (buckets.join(labels, id_col)
                      .groupBy("bucket")
                      .agg(F.min("cluster_id").alias("bmin")))
        proposed = (buckets.join(bucket_min, "bucket")
                    .groupBy(id_col)
                    .agg(F.min("bmin").alias("pmin")))
        stepped = (labels.join(proposed, id_col, "left")
                   .select(F.col(id_col),
                           F.least(F.col("cluster_id"),
                                   F.coalesce(F.col("pmin"),
                                              F.col("cluster_id")))
                           .alias("cluster_id"),
                           (F.col("pmin") < F.col("cluster_id"))
                           .alias("__changed")))
        # one job: materialize + cut lineage; the probe below reads blocks
        labels = stepped.localCheckpoint(eager=True)
        changed = labels.filter(F.col("__changed")).limit(1).count()
        labels = labels.drop("__changed")
        if changed == 0:
            buckets.unpersist()
            return labels
    buckets.unpersist()
    raise RuntimeError(
        f"minhash_clusters did not converge in {max_iter} rounds — "
        "raise max_iter (component diameter exceeds it)")


def with_simhash(df: DataFrame, text_col: str, *, shingle: int = 4,
                 n_bits: int = 16, out_col: str = "simhash") -> DataFrame:
    """SimHash fingerprint over character shingles, pure SQL expressions.

    Per bit b: sign of Σ_shingles (±1 by the high bit of hex char b of
    md5(shingle) — a hex char > '7' has its top bit set, so the comparison
    is a 1-char string test both Spark and DuckDB evaluate identically;
    round 1 used xxhash64, which DuckDB lacks, leaving SimHash without an
    oracle).  The md5 array is materialized once and ONE ``aggregate`` folds
    all ``n_bits`` counters (same single-pass named_struct trick as
    :func:`minhash_agg_expr`).  Near-dup grouping uses the fingerprint value
    directly (identical fingerprints ⇒ near-dup bucket).
    """
    assert n_bits <= 32  # md5 hex has 32 chars
    shingles = (f"transform(sequence(1, greatest(length({text_col}) - {shingle - 1}, 1)), "
                f"i -> md5(substring({text_col}, i, {shingle})))")
    init = "named_struct(" + ", ".join(f"'b{b}', 0" for b in range(n_bits)) + ")"
    merge = ("(acc, h) -> named_struct(" + ", ".join(
        f"'b{b}', acc.b{b} + CASE WHEN substring(h, {b + 1}, 1) > '7' "
        f"THEN 1 ELSE -1 END" for b in range(n_bits)) + ")")
    staged = df.withColumn("__shagg", F.expr(
        f"aggregate({shingles}, {init}, {merge})"))
    bits = " + ".join(
        f"shiftleft(CAST(__shagg.b{b} > 0 AS BIGINT), {b})"
        for b in range(n_bits))
    return staged.withColumn(out_col, F.expr(bits)).drop("__shagg")


def simhash_sql_duck(text_col: str, *, shingle: int = 4,
                     n_bits: int = 16) -> str:
    """DuckDB twin of :func:`with_simhash` (per-bit list_sum re-derivation —
    oracle-side recomputation is free)."""
    shingles = (f"list_transform(generate_series(1, greatest(length({text_col}) - {shingle - 1}, 1)), "
                f"i -> md5(substring({text_col}, i, {shingle})))")
    bits = " + ".join(
        f"(CAST(list_sum(list_transform({shingles}, "
        f"h -> CASE WHEN substring(h, {b + 1}, 1) > '7' THEN 1 ELSE -1 END)) > 0 "
        f"AS BIGINT) << {b})"
        for b in range(n_bits))
    return f"({bits})"

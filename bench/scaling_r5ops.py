"""Two-parallelism scaling evidence for the round-5 operators.

Applies the identical N vs 4N-cores protocol (shared harness:
``bench.common.two_level_scaling``) to the three operators added this
round, so each carries its own measured scaling efficiency instead of
inheriting the flagship's:

* ``asof``  — ``operators/asof.asof_join`` (union-merge form) over a
  deterministic synthetic events stream: ~1/5 of rows are "errors"
  (left side, hash-derived flag), the rest "clicks" (right side), keyed
  on a bounded user population so window partitions are realistic
  recrawl histories.
* ``bm25``  — ``operators/retrieval.bm25_topk`` over the scaling-dedup
  corpus (``bench.scaling_dedup.materialize_docs``), with query terms
  read from doc 0's actual text (one bounded 1-row collect, outside the
  timed plan construction cost class) so every query term hits the
  synthetic vocabulary.
* ``lm``    — ``operators/ngram_lm`` train (even doc_ids) + score (all)
  over the same corpus: the heaviest of the three (three key joins over
  every token position against a ~vocab²-row bigram table).
* ``pagerank`` — ``operators/linkgraph.pagerank`` (3 integer-exact
  iterations, per-round localCheckpoint, src-persisted edges) over a
  deterministic synthetic edge corpus with a zipf-head approximation:
  10 % of edges target 100 hot nodes, exercising the map-side combine
  that keeps in-degree mega-hubs off any single reducer.
* ``kmeans`` — ``operators/kmeans.py`` (2 distributed integer-exact
  Lloyd updates, k=64 × dim=64) over a deterministic xxhash vector
  corpus: per update one Arrow int64-argmin corpus scan into a
  map-side-combined k-row aggregate — compute-bound (exact int64
  matmul), the profile closest to the flagship's extract kernel.

Corpora are pure-SQL deterministic synthesis (no external data), written
once at full width with a fixed file count (same rationale as
``bench.common.materialize_pages``).
"""

from __future__ import annotations

import os

EVENTS_CACHE = os.environ.get("SPARK_GRAFT_EVENTS_CACHE",
                              "/tmp/spark_graft_events")

_N_USERS = 200_000


def _events_sql(n_rows: int) -> str:
    """Deterministic event stream: bounded user population, xxhash-scrambled
    numeric event times (the as-of ``on`` axis), ~1/5 errors.  The error
    flag is HASH-derived, not ``id % 5``: user_id = id % 200000 and
    200000 ≡ 0 (mod 5) would make every user's events one single type —
    a zero-match as-of corpus (the bug the first recording shipped)."""
    return (f"SELECT id AS event_id, id % {_N_USERS} AS user_id, "
            f"CAST(abs(xxhash64(id)) % 1000000000 AS DOUBLE) AS ts, "
            f"CASE WHEN abs(xxhash64(id + 13)) % 5 = 0 THEN 'error' "
            f"ELSE 'click' END AS event_type, "
            f"CAST(id % 997 AS DOUBLE) AS value "
            f"FROM range({n_rows})")


def materialize_events(spark, n_rows: int) -> str:
    # v2: cache key versioned with the synthesis — the v1 corpus had the
    # zero-match error-flag aliasing bug, and a bare events_{n} key would
    # silently serve it forever (the materialize_pages _SUCCESS lesson)
    path = f"{EVENTS_CACHE}/events_v2_{n_rows}.parquet"
    if not os.path.exists(f"{path}/_SUCCESS"):
        n_files = max(64, n_rows // 500_000)
        (spark.sql(_events_sql(n_rows)).repartition(n_files)
         .write.mode("overwrite").parquet(path))
    return path


_PR_NODES = 2_000_000


def _edges_sql(n_rows: int) -> str:
    """Deterministic edge corpus: uniform src over ``_PR_NODES``; dst is
    zipf-head-skewed (10 % of edges land on 100 hot nodes — web in-degree
    reality) else uniform; self-edges filtered."""
    return (f"SELECT src, dst FROM ("
            f"SELECT abs(xxhash64(id)) % {_PR_NODES} AS src, "
            f"CASE WHEN abs(xxhash64(id + 3)) % 10 = 0 "
            f"THEN abs(xxhash64(id + 7)) % 100 "
            f"ELSE abs(xxhash64(id + 7)) % {_PR_NODES} END AS dst "
            f"FROM range({n_rows})) WHERE src <> dst")


def materialize_edges(spark, n_rows: int) -> str:
    path = f"{EVENTS_CACHE}/edges_v1_{n_rows}.parquet"
    if not os.path.exists(f"{path}/_SUCCESS"):
        n_files = max(64, n_rows // 500_000)
        (spark.sql(_edges_sql(n_rows)).repartition(n_files)
         .write.mode("overwrite").parquet(path))
    return path


_KM_DIM, _KM_K = 64, 64


def _vecs_sql(n_rows: int) -> str:
    """Deterministic embedding corpus: ``_KM_DIM`` xxhash-derived DOUBLE
    components per row, uniform in [-1, 1]."""
    return (f"SELECT id AS vec_id, transform(sequence(1, {_KM_DIM}), "
            f"j -> CAST(abs(xxhash64(id * {_KM_DIM} + j)) % 2000001 "
            f"- 1000000 AS DOUBLE) / 1000000.0) AS vec "
            f"FROM range({n_rows})")


def materialize_vecs(spark, n_rows: int) -> str:
    path = f"{EVENTS_CACHE}/vecs_v1_{n_rows}.parquet"
    if not os.path.exists(f"{path}/_SUCCESS"):
        n_files = max(64, n_rows // 250_000)
        (spark.sql(_vecs_sql(n_rows)).repartition(n_files)
         .write.mode("overwrite").parquet(path))
    return path


def _charfrac_job(spark, path: str):
    """Full Gopher Table-A1 char fractions (textstats.gopher_char_fracs)
    over the scaling-dedup corpus: one zero-shuffle mapInPandas pass —
    the Arrow-kernel-bound profile (per-doc Counter/interval work),
    closest to the flagship extract stage among the r5 additions.
    Global agg over the COMPUTED columns — see _asof_job's NOTE (the
    planted-dup corpus guarantees non-zero dup fractions)."""
    from pyspark.sql import functions as F

    from immich_geodata_zh_tw_spark.operators import textstats

    d = spark.read.parquet(path)
    out = textstats.gopher_char_fracs(d)
    return out.agg(F.sum("top2gram_char_frac").alias("t2"),
                   F.sum("dup5gram_char_frac").alias("d5"),
                   F.sum("dup10gram_char_frac").alias("d10"),
                   F.count(F.lit(1)).alias("n"))


def _kmv_job(spark, path: str):
    """KMV distinct-count sketch (operators/sketch.py, with_exact) over
    the events corpus: per-user distinct event ids — 200 k groups, every
    key distinct, so the (grp, hash) DISTINCT is the full-width shuffle
    the sketch's bottom-k then collapses.  Global agg over the COMPUTED
    columns (estimates + in-pass exact counts must both be non-trivial)."""
    from pyspark.sql import functions as F

    from immich_geodata_zh_tw_spark.operators import sketch

    d = spark.read.parquet(path)
    out = sketch.kmv_sketch(
        d, group_col="user_id", key_sql="CAST(event_id AS STRING)",
        k=32, n_salts=8, with_exact=True)
    return out.agg(F.sum("est_distinct").alias("se"),
                   F.sum("exact_distinct").alias("sx"),
                   F.sum("n_sketch").alias("sn"),
                   F.count(F.lit(1)).alias("n"))


def _kmeans_job(spark, path: str):
    """Two distributed Lloyd updates (operators/kmeans.py): iteration 1 is
    the eager collect-and-rebroadcast job (INSIDE the timed rep — the
    _pagerank_job convention for iterative operators), iteration 2 stays
    in the returned plan; the k×(d+2)-row result aggregates over its
    COMPUTED columns (see _asof_job's NOTE).  Init centroids are
    deterministic driver-side numpy (no untimed corpus action)."""
    import numpy as np
    from pyspark.sql import functions as F

    from immich_geodata_zh_tw_spark.operators import kmeans

    d = spark.read.parquet(path)
    init = np.random.default_rng(42).uniform(-1, 1, size=(_KM_K, _KM_DIM))
    c1 = kmeans.kmeans_fit(d, init, vec_col="vec", iters=1)
    out = kmeans.kmeans_result_plan(d, c1, vec_col="vec")
    return out.agg(F.sum("val").alias("sv"), F.count(F.lit(1)).alias("n"))


def _pagerank_job(spark, path: str):
    """The 3 eager per-round localCheckpoints run INSIDE build_job, which
    the harness calls inside the timed rep — the iterations are measured;
    the returned frame is the final |V|-row checkpointed ranks plus a
    global agg over the COMPUTED rank column (see _asof_job's NOTE)."""
    from pyspark.sql import functions as F

    from immich_geodata_zh_tw_spark.operators import linkgraph

    e = spark.read.parquet(path)
    pr = linkgraph.pagerank(e, n_iter=3, persist_edges=True)
    return pr.agg(F.sum("rank_u").alias("mass"),
                  F.count(F.lit(1)).alias("n_nodes"))


def _asof_job(spark, path: str):
    """NOTE every job here ends in a global aggregate over its COMPUTED
    columns.  The harness materializes through the noop sink (which
    consumes every column), but the aggregate keeps the job honest under
    ANY consumer: a bare ``.count()`` on the raw join output lets Catalyst
    prune the expensive payload (the as-of window's ``last()`` column, the
    LM's join results) right out of the plan — measured 0.69 s for 50 M
    events before this was understood, a scan-only non-measurement."""
    from pyspark.sql import functions as F

    from immich_geodata_zh_tw_spark.operators.asof import asof_join

    e = spark.read.parquet(path)
    err = e.filter(F.col("event_type") == "error")
    clk = e.filter(F.col("event_type") == "click")
    out = asof_join(err, clk, on="ts", by="user_id",
                    value_cols=["event_id", "value"], tie_col="event_id")
    # global aggregate over the COMPUTED columns: the harness materializes
    # through the noop sink (bench.common.materialize_full), which consumes
    # every column — but the agg additionally keeps the job meaningful for
    # any ad-hoc runner that collects it (cm == 0 means a broken corpus;
    # the v1 synthesis bug surfaced exactly that way)
    return out.agg(F.sum("r_value").alias("sv"),
                   F.count("r_event_id").alias("cm"),
                   F.count(F.lit(1)).alias("n"))


def _bm25_job(spark, path: str):
    from immich_geodata_zh_tw_spark.operators.retrieval import bm25_topk

    d = spark.read.parquet(path)
    words = d.filter("doc_id = 0").head().text.split(" ")
    q = spark.createDataFrame(
        [("q1", " ".join(words[:2])), ("q2", " ".join(words[2:5])),
         ("q3", " ".join(words[5:9]))],
        "query_id string, query string")
    return bm25_topk(d, q, k=10, n_salts=8)


def _lm_job(spark, path: str):
    from pyspark.sql import functions as F

    from immich_geodata_zh_tw_spark.operators import ngram_lm

    d = spark.read.parquet(path)
    model = ngram_lm.lm_train(d.filter(F.col("doc_id") % 2 == 0))
    out = ngram_lm.lm_score(d, model)
    # global agg over the computed columns — see _asof_job's NOTE
    return out.agg(F.sum("lm_logprob_micro6").alias("lp"),
                   F.sum("lm_tokens").alias("nt"))


def _substr_job(spark, path: str):
    """ExactSubstr removal over the scaling-dedup corpus: the planted
    near-dups (id % 10 ∈ {8, 9} pairs share words 1-6 and 8-40) give
    every pair one merged 33-token duplicate interval under a 12-word
    gram, so ~20 % of docs take the full mark/merge/cut path while the
    rest exercise the passthrough join.  Global agg over the COMPUTED
    columns — see _asof_job's NOTE (zero removed tokens would mean a
    broken corpus)."""
    from pyspark.sql import functions as F

    from immich_geodata_zh_tw_spark.operators.dedup import substr_dedup

    d = spark.read.parquet(path)
    # persist=True: the cluster-shaped call (one gram explode, cached
    # 28-byte occurrence rows); the harness clears the cache between reps
    out = substr_dedup(d, id_col="doc_id", text_col="text", gram_words=12,
                       persist=True)
    return out.agg(F.sum("n_removed_tokens").alias("rm"),
                   F.sum("n_dup_intervals").alias("iv"),
                   F.sum(F.length("clean_text")).alias("lc"),
                   F.count(F.lit(1)).alias("n"))


def run_scaling(job: str, cpus_4n: int, *, n_items: int | None = None,
                warmup: bool = True) -> dict:
    from .common import two_level_scaling
    from .scaling_dedup import materialize_docs

    if job == "asof":
        # 100 M: the real union+window pass runs ~2.5 M events/s at 8
        # cores, so the N leg lands ~40 s — big enough that per-job fixed
        # costs don't crush the 4N leg (the flagship's
        # SPARK_GRAFT_SCALING_PAGES sizing lesson), small enough to rep
        n = n_items or int(os.environ.get("SPARK_GRAFT_SCALING_EVENTS",
                                          "0")) or 100_000_000
        return two_level_scaling(
            cpus_4n=cpus_4n, n_items=n,
            materialize=lambda s: materialize_events(s, n),
            build_job=_asof_job, unit="events",
            metric="asof_scaling_efficiency_n_to_4n", warmup=warmup,
            extra={"job": "asof_join(errors->clicks, by=user_id)"})
    if job == "bm25":
        n = n_items or 2_000_000
        return two_level_scaling(
            cpus_4n=cpus_4n, n_items=n,
            materialize=lambda s: materialize_docs(s, n),
            build_job=_bm25_job, unit="docs",
            metric="bm25_scaling_efficiency_n_to_4n", warmup=warmup,
            extra={"job": "bm25_topk(3 queries, k=10)"})
    if job == "lm":
        n = n_items or 2_000_000
        return two_level_scaling(
            cpus_4n=cpus_4n, n_items=n,
            materialize=lambda s: materialize_docs(s, n),
            build_job=_lm_job, unit="docs",
            metric="ngram_lm_scaling_efficiency_n_to_4n", warmup=warmup,
            extra={"job": "lm_train(half) + lm_score(all)"})
    if job == "substr":
        n = n_items or 2_000_000
        return two_level_scaling(
            cpus_4n=cpus_4n, n_items=n,
            materialize=lambda s: materialize_docs(s, n),
            build_job=_substr_job, unit="docs",
            metric="substr_dedup_scaling_efficiency_n_to_4n",
            warmup=warmup,
            extra={"job": "substr_dedup(gram_words=12)"})
    if job == "pagerank":
        n = n_items or 50_000_000
        return two_level_scaling(
            cpus_4n=cpus_4n, n_items=n,
            materialize=lambda s: materialize_edges(s, n),
            build_job=_pagerank_job, unit="edges",
            metric="pagerank_scaling_efficiency_n_to_4n", warmup=warmup,
            extra={"job": "pagerank(3 iters, zipf-head dst, "
                          f"{_PR_NODES} nodes)"})
    if job == "charfrac":
        n = n_items or 2_000_000
        return two_level_scaling(
            cpus_4n=cpus_4n, n_items=n,
            materialize=lambda s: materialize_docs(s, n),
            build_job=_charfrac_job, unit="docs",
            metric="charfrac_scaling_efficiency_n_to_4n", warmup=warmup,
            extra={"job": "gopher_char_fracs(top 2-4, dup 5-10)"})
    if job == "kmv":
        n = n_items or int(os.environ.get("SPARK_GRAFT_SCALING_EVENTS",
                                          "0")) or 100_000_000
        return two_level_scaling(
            cpus_4n=cpus_4n, n_items=n,
            materialize=lambda s: materialize_events(s, n),
            build_job=_kmv_job, unit="events",
            metric="kmv_scaling_efficiency_n_to_4n", warmup=warmup,
            extra={"job": "kmv_sketch(user_id, k=32, with_exact)"})
    if job == "kmeans":
        n = n_items or 2_000_000
        return two_level_scaling(
            cpus_4n=cpus_4n, n_items=n,
            materialize=lambda s: materialize_vecs(s, n),
            build_job=_kmeans_job, unit="vectors",
            metric="kmeans_scaling_efficiency_n_to_4n", warmup=warmup,
            extra={"job": f"kmeans(2 integer-exact Lloyd updates, "
                          f"k={_KM_K}, dim={_KM_DIM})"})
    raise ValueError(f"unknown job {job!r} "
                     "(asof|bm25|lm|substr|pagerank|kmeans|charfrac|kmv)")


if __name__ == "__main__":
    import json
    import sys

    job = sys.argv[1] if len(sys.argv) > 1 else "asof"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n = int(sys.argv[3]) if len(sys.argv) > 3 else None
    print(json.dumps(run_scaling(job, cpus, n_items=n)))

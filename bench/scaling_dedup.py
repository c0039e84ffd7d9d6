"""Two-parallelism scaling evidence for the DOC-DEDUP family.

The north-rule scaling protocol (``bench/scaling.py``) covers the flagship
reverse-geocode job; this module applies the identical N vs 4N-cores
protocol (shared harness: ``bench.common.two_level_scaling``) to the
training-data side's representative heavy operator — the two-stage near-dup
pipeline (``ngram_jaccard_pairs``: fused minhash+shingle Arrow kernel →
LSH band self-join → exact-Jaccard scoring joins) — so the LLM-pipeline
operators carry their own measured scaling efficiency instead of
inheriting the flagship's.

Corpus: deterministic synthetic documents (no external data, per the
driver's input rule) — ``_N_WORDS`` pseudo-words drawn from a doc-seeded
xxhash chain over a bounded vocabulary, with every 10th doc a near-dup of
its predecessor (one word resampled) so the LSH stage does real candidate
work.  Synthesis is pure Spark SQL (sequence/transform/xxhash64/conv): no
Python in the write path, fixed file count so the low-core leg's scan
parallelism is not capped by the writer (same rationale as
``bench/common.materialize_pages``).
"""

from __future__ import annotations

import os

DOCS_CACHE = os.environ.get("SPARK_GRAFT_DOCS_CACHE", "/tmp/spark_graft_docs")

#: near-dup pair rate ~1/10; vocabulary 36^3 stems keeps shingle diversity
#: high enough that band buckets stay small (no quadratic blow-up —
#: measured max bucket 73 / p99.9 bucket 4 at 400 k docs)
_N_WORDS = 40


def _docs_sql(n_docs: int) -> str:
    """text = 40 pseudo-words; docs with id % 10 == 9 repeat doc id-1's
    words except word 7 (seeded by id instead) — a planted near-dup."""
    base_id = "CASE WHEN id % 10 = 9 THEN id - 1 ELSE id END"
    word = (f"conv(CAST(abs(xxhash64({base_id} * 64 + i)) % 46656 AS STRING),"
            f" 10, 36)")
    edit = (f"conv(CAST(abs(xxhash64(id * 64 + i + 31)) % 46656 AS STRING),"
            f" 10, 36)")
    return (f"SELECT id AS doc_id, "
            f"array_join(transform(sequence(1, {_N_WORDS}), i -> "
            f"CASE WHEN i = 7 AND id % 10 = 9 THEN {edit} "
            f"ELSE {word} END), ' ') AS text "
            f"FROM range({n_docs})")


def materialize_docs(spark, n_docs: int) -> str:
    path = f"{DOCS_CACHE}/docs_{n_docs}.parquet"
    if not os.path.exists(f"{path}/_SUCCESS"):
        n_files = max(64, n_docs // 50_000)
        (spark.sql(_docs_sql(n_docs)).repartition(n_files)
         .write.mode("overwrite").parquet(path))
    return path


def _job(spark, docs_path: str):
    from immich_geodata_zh_tw_spark.operators import dedup

    d = spark.read.parquet(docs_path)
    return dedup.ngram_jaccard_pairs(d, id_col="doc_id", text_col="text",
                                     threshold=0.5)


def run_scaling(cpus_4n: int, *, n_docs: int | None = None,
                warmup: bool = True) -> dict:
    from .common import two_level_scaling

    if n_docs is None:
        n_docs = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "0")) or 400_000

    return two_level_scaling(
        cpus_4n=cpus_4n, n_items=n_docs,
        materialize=lambda spark: materialize_docs(spark, n_docs),
        build_job=_job,
        unit="docs", metric="dedup_scaling_efficiency_n_to_4n",
        warmup=warmup,
        extra={"job": "ngram_jaccard_pairs(threshold=0.5)"})


if __name__ == "__main__":
    import json
    import sys

    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(json.dumps(run_scaling(cpus)))

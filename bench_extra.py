#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query noop timing + plan dumps.

NOT the driver contract — ``bench.py`` is frozen for measurement.  This file
exists so the optimization loop can (a) time a single query in isolation
through the same noop sink bench.py uses, (b) capture ``explain("formatted")``
for the plan-diff artifacts under ``plans/r06/``, and (c) A/B a code change
with interleaved reps inside one session (single-JVM timing on this sandbox
is bimodal — see BENCH/BASELINE.md noise notes).

Usage:
  python bench_extra.py --queries geo_knn_cells,doc_vocab --reps 3
  python bench_extra.py --explain --suffix before        # dump all plans
  python bench_extra.py --flagship --reps 3
"""

from __future__ import annotations

import argparse
import io
import json
import os
import time
from contextlib import redirect_stdout

from bench.common import cpu_sys_steal_total, materialize_full, materialize_pages

BENCH_QUERIES = [
    "geo_knn_cells", "geo_pip_villages", "geo_cell_histogram",
    "tpch_q1", "dedup_keep_best", "windows_compound",
    "doc_exact_dedup", "doc_minhash_pairs", "doc_dedup_clusters",
    "doc_jaccard_pairs", "doc_gopher_filter", "doc_span_dedup",
    "doc_text_profile", "doc_domain_cap", "doc_vocab", "doc_repetition",
    "embed_pq_adc", "embed_neardup", "extract_chinese_names",
    "release_pipeline",
]


def get_session():
    from immich_geodata_zh_tw_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(app_name="bench_extra", parallelism=cpus,
                     shuffle_partitions=max(cpus, 8)), cpus


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", action="store_true",
                    help="dump explain('formatted') per query, no timing")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--outdir", default="plans/r06")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, cpus = get_session()
    from immich_geodata_zh_tw_spark.plans import driver_queries as dq

    qs = dq.queries()
    names = [q for q in args.queries.split(",") if q] or BENCH_QUERIES
    out: dict[str, object] = {"sf_dir": sf_dir, "cpus": cpus}
    os.makedirs(args.outdir, exist_ok=True)
    try:
        if args.flagship:
            from bench.common import flagship

            n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
            pages_path = materialize_pages(spark, n_events * 20)
            df = flagship(spark, pages_path)
            if args.explain:
                with open(f"{args.outdir}/reverse_geocode_{args.suffix}.txt",
                          "w") as fh:
                    fh.write(explain_str(df))
            else:
                spark.sparkContext.setJobDescription("flagship warmup")
                materialize_full(df)
                spark.catalog.clearCache()
                reps = []
                for i in range(args.reps):
                    spark.sparkContext.setJobDescription(f"flagship rep{i}")
                    t0 = time.perf_counter()
                    materialize_full(flagship(spark, pages_path))
                    reps.append(round(time.perf_counter() - t0, 3))
                    spark.catalog.clearCache()
                out["reverse_geocode"] = {"min": min(reps), "reps": reps}
            names = []
        sys0 = cpu_sys_steal_total()
        for name in names:
            if args.explain:
                with open(f"{args.outdir}/{name}_{args.suffix}.txt", "w") as fh:
                    fh.write(explain_str(qs[name](spark, sf_dir)))
                continue
            spark.sparkContext.setJobDescription(f"{name} warmup")
            materialize_full(qs[name](spark, sf_dir))
            spark.catalog.clearCache()
            reps = []
            for i in range(args.reps):
                spark.sparkContext.setJobDescription(f"{name} rep{i}")
                t0 = time.perf_counter()
                materialize_full(qs[name](spark, sf_dir))
                reps.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            out[name] = {"min": min(reps), "reps": reps}
        sys1 = cpu_sys_steal_total()
        if sys0 and sys1:
            dt = max(sys1[2] - sys0[2], 1)
            out["host_sys_frac"] = round((sys1[0] - sys0[0]) / dt, 3)
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

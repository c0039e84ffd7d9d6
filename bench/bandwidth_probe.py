"""Single-box memory/scan bandwidth probe for the scaling analysis.

Measures a PLAN-FREE job — parquet scan of the flagship corpus, every
column materialized through the noop sink — at pinned N vs pinned 4N
cores via the shared ``two_level_scaling`` protocol.  This job has no
joins, no shuffle, no Python: its N→4N efficiency is a ceiling imposed
by the HOST (parquet decode + page-cache + memory bandwidth shared by
all cores of one box), not by any operator plan.  If the flagship's
pinned efficiency tracks this probe's, the gap below the north-rule 0.8
is machine saturation that a multi-node cluster (each node bringing its
own memory channels and disks) does not have — see BENCH/BASELINE.md's
pinned-scaling section for the recorded numbers and the argument.
"""

from __future__ import annotations

import os


def run_probe(cpus_4n: int, *, n_pages: int) -> dict:
    from pyspark.sql import functions as F

    from .common import materialize_pages, two_level_scaling

    def build_job(spark, path):
        # a filter over an aggregate of COMPUTED bytes would prune columns;
        # the noop sink in two_level_scaling already consumes every column,
        # so the job is just scan -> decode -> (tiny projection to keep the
        # row width honest: all five page columns ride through)
        return spark.read.parquet(path).withColumn(
            "__probe", F.length("url"))

    return two_level_scaling(
        cpus_4n=cpus_4n, n_items=n_pages,
        materialize=lambda spark: materialize_pages(spark, n_pages),
        build_job=build_job,
        unit="pages", metric="scan_bandwidth_scaling_n_to_4n",
        extra={"job": "parquet scan, all columns, noop sink (no shuffle, "
                      "no Python, no join)"})


if __name__ == "__main__":
    import json
    import sys

    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_pages = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "144000000"))
    print(json.dumps(run_probe(cpus, n_pages=n_pages)))

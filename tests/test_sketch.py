"""KMV distinct-count sketch (operators/sketch.py): exact Python-reference
parity, mergeability, exact-small-set path, salt invariance, plan shape."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from immich_geodata_zh_tw_spark.operators import sketch

K = 8


def _ref_sketch(keys: set[str], k: int = K) -> tuple[int, str, int]:
    """Independent in-memory KMV: (n_sketch, kth_hash, est_distinct)."""
    hs = sorted({hashlib.md5(x.encode()).hexdigest()[:15] for x in keys})[:k]
    n = len(hs)
    if n < k:
        return n, hs[-1] if hs else None, n
    kth = int(hs[-1], 16)
    return n, hs[-1], round((k - 1) * float(1 << 60) / kth)


def _corpus(spark, groups: dict[str, list[str]]):
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "grp string, key string")


class TestKmvSketch:
    def test_matches_python_reference(self, spark):
        """100 seeded groups with 1..60 distinct keys each (duplicates
        included): every (n_sketch, kth_hash, est_distinct) must equal the
        hashlib-based reference EXACTLY — the sketch is deterministic, not
        just statistically close."""
        import random

        groups = {}
        for s in range(100):
            rng = random.Random(s)
            vals = [f"v{s}_{rng.randint(0, rng.randint(1, 60))}"
                    for _ in range(rng.randint(1, 120))]
            groups[f"g{s}"] = vals
        got = (sketch.kmv_sketch(_corpus(spark, groups), group_col="grp",
                                 key_sql="key", k=K)
               .toPandas().set_index("grp").sort_index())
        assert len(got) == 100
        for g, vals in groups.items():
            n, kth, est = _ref_sketch(set(vals))
            assert got.loc[g, "n_sketch"] == n, g
            assert got.loc[g, "kth_hash"] == kth, g
            assert got.loc[g, "est_distinct"] == est, g

    def test_exact_below_k_and_estimator_above(self, spark):
        df = _corpus(spark, {
            "small": [f"x{i}" for i in range(K - 2)] * 3,   # 6 distinct
            "big": [f"y{i}" for i in range(500)],           # 500 distinct
        })
        got = (sketch.kmv_sketch(df, group_col="grp", key_sql="key", k=K)
               .toPandas().set_index("grp"))
        assert got.loc["small", "n_sketch"] == K - 2
        assert got.loc["small", "est_distinct"] == K - 2  # exact path
        assert got.loc["big", "n_sketch"] == K
        # KMV stderr ~ n/sqrt(k-2): loose 3-sigma band, deterministic seed
        assert 150 < got.loc["big", "est_distinct"] < 1700

    def test_merge_equals_sketch_of_union(self, spark):
        """Shard-parallel property: bottom-k of the union of two shards'
        sketch rows IS the sketch of the union — exact frame equality,
        including when the shards overlap."""
        a_keys = [f"k{i}" for i in range(40)]
        b_keys = [f"k{i}" for i in range(25, 70)]  # overlaps a
        a = _corpus(spark, {"g": a_keys, "only_a": ["p", "q"]})
        b = _corpus(spark, {"g": b_keys})
        merged = sketch.kmv_merge(
            sketch.kmv_sketch_rows(a, group_col="grp", key_sql="key", k=K),
            sketch.kmv_sketch_rows(b, group_col="grp", key_sql="key", k=K),
            k=K)
        union = sketch.kmv_sketch_rows(
            a.unionByName(b), group_col="grp", key_sql="key", k=K)
        m = merged.toPandas().sort_values(["grp", "h"]).reset_index(drop=True)
        u = union.toPandas().sort_values(["grp", "h"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(m, u)
        # and the estimates agree too
        em = sketch.kmv_estimate(merged, k=K).toPandas().set_index("grp")
        eu = sketch.kmv_estimate(union, k=K).toPandas().set_index("grp")
        pd.testing.assert_frame_equal(em.sort_index(), eu.sort_index())

    def test_salt_and_partitioning_invariance(self, spark):
        df = _corpus(spark, {"g": [f"k{i}" for i in range(200)]})
        outs = []
        for n_salts, parts in [(2, 1), (8, 7), (32, 16)]:
            outs.append(
                sketch.kmv_sketch(df.repartition(parts), group_col="grp",
                                  key_sql="key", k=K, n_salts=n_salts)
                .toPandas().set_index("grp").sort_index())
        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], outs[2])

    def test_with_exact_rides_the_same_pass(self, spark):
        """with_exact=True must report the TRUE distinct count (per-salt
        count window summed over the lrk==1 survivor rows) for every
        group, at any n_salts, without changing the sketch columns."""
        import random

        rng = random.Random(7)
        groups = {f"g{s}": [f"v{s}_{rng.randint(0, 40)}"
                            for _ in range(rng.randint(1, 90))]
                  for s in range(20)}
        truth = {g: len(set(v)) for g, v in groups.items()}
        for n_salts in (1, 4, 16):
            got = (sketch.kmv_sketch(_corpus(spark, groups),
                                     group_col="grp", key_sql="key", k=K,
                                     n_salts=n_salts, with_exact=True)
                   .toPandas().set_index("grp"))
            for g, t in truth.items():
                assert got.loc[g, "exact_distinct"] == t, (g, n_salts)
            base = (sketch.kmv_sketch(_corpus(spark, groups),
                                      group_col="grp", key_sql="key", k=K,
                                      n_salts=n_salts)
                    .toPandas().set_index("grp").sort_index())
            pd.testing.assert_frame_equal(
                base, got.drop(columns="exact_distinct").sort_index())

    def test_null_keys_excluded(self, spark):
        df = spark.createDataFrame(
            [("g", "a"), ("g", None), ("g", "b")], "grp string, key string")
        got = (sketch.kmv_sketch(df, group_col="grp", key_sql="key", k=K)
               .toPandas().iloc[0])
        assert got["n_sketch"] == 2 and got["est_distinct"] == 2

    def test_plan_bounded_windows(self, spark):
        """Both window phases must carry the rank-limit pushdown
        (WindowGroupLimit — a bounded top-k heap, not a full sort), and
        the only corpus-sized exchange is the (grp, h) distinct."""
        df = _corpus(spark, {"g": [f"k{i}" for i in range(50)]})
        out = sketch.kmv_sketch(df, group_col="grp", key_sql="key", k=K)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        # Spark plants a partial (pre-shuffle) AND final WindowGroupLimit
        # around each phase's exchange — 4 total; ≥2 guards the property
        # (one bounded heap per phase) without pinning the partial pairs
        assert plan.count("WindowGroupLimit (") >= 2
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


class TestCountMin:
    NB, NH = 32, 2

    @staticmethod
    def _ref(occurrences, probes, nb, nh):
        counters: dict[tuple[int, int], int] = {}
        def pos(key, j):
            return int(hashlib.md5(f"{key}#{j}".encode()).hexdigest()[:15],
                       16) % nb
        for k in occurrences:
            for j in range(nh):
                counters[(j, pos(k, j))] = counters.get((j, pos(k, j)),
                                                        0) + 1
        return {p: min(counters.get((j, pos(p, j)), 0) for j in range(nh))
                for p in probes}

    def test_matches_python_reference_and_one_sided(self, spark):
        """Zipf-ish occurrence stream at a collision-heavy width: every
        estimate equals the reference Count-Min EXACTLY, and est ≥ true
        for every probe (the one-sided guarantee)."""
        import random

        rng = random.Random(5)
        occ = [f"k{min(rng.randint(0, 50), rng.randint(0, 50))}"
               for _ in range(2000)]
        probes = sorted(set(occ))
        truth = {p: occ.count(p) for p in probes}
        ref = self._ref(occ, probes, self.NB, self.NH)
        cms = sketch.cms_build(
            spark.createDataFrame([(k,) for k in occ], "key string"),
            "key", n_bits=self.NB, n_hashes=self.NH)
        got = (sketch.cms_estimate(
                   spark.createDataFrame([(p,) for p in probes],
                                         "key string"),
                   cms, "key", n_bits=self.NB, n_hashes=self.NH)
               .toPandas().set_index("key")["cms_est"])
        assert (cms.count() <= self.NB * self.NH)
        for p in probes:
            assert got[p] == ref[p], p
            assert got[p] >= truth[p], p
        assert any(got[p] > truth[p] for p in probes)  # collisions real

    def test_exact_at_collision_free_width(self, spark):
        occ = [f"k{i % 20}" for i in range(400)]
        df = spark.createDataFrame([(k,) for k in occ], "key string")
        cms = sketch.cms_build(df, "key", n_bits=1 << 20, n_hashes=3)
        got = (sketch.cms_estimate(df.distinct(), cms, "key",
                                   n_bits=1 << 20, n_hashes=3)
               .toPandas().set_index("key")["cms_est"])
        assert all(got[f"k{i}"] == 20 for i in range(20))

    def test_merge_by_counter_addition(self, spark):
        """Shard property: summing two shards' counter frames IS the
        sketch of the concatenated stream — exact frame equality."""
        import pandas as pd

        a = spark.createDataFrame([(f"k{i % 9}",) for i in range(90)],
                                  "key string")
        b = spark.createDataFrame([(f"k{i % 13}",) for i in range(130)],
                                  "key string")
        kw = {"n_bits": self.NB, "n_hashes": self.NH}
        merged = (sketch.cms_build(a, "key", **kw)
                  .unionByName(sketch.cms_build(b, "key", **kw))
                  .groupBy("j", "pos").agg(F.sum("c").alias("c"))
                  .toPandas().sort_values(["j", "pos"])
                  .reset_index(drop=True).astype("int64"))
        whole = (sketch.cms_build(a.unionByName(b), "key", **kw)
                 .toPandas().sort_values(["j", "pos"])
                 .reset_index(drop=True).astype("int64"))
        pd.testing.assert_frame_equal(merged, whole)

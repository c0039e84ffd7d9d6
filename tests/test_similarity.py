"""LSH-ANN quality: bucket-collision candidates must recover most true
nearest neighbors (the rows-only driver check gets a real quality gate here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


class TestLshAnn:
    def test_recall_vs_bruteforce(self, spark, embeddings):
        from immich_geodata_zh_tw_spark.operators import similarity

        queries = embeddings.select(F.col("vec_id").alias("q_id"),
                                    F.col("embedding").alias("q_vec"))
        exact = similarity.brute_force_topk(
            embeddings, queries, k=1).toPandas().set_index("q_id")
        # near-isotropic synthetic embeddings need short signatures + many
        # tables (true-NN angles are large); 4×16 gives ~0.92 true-NN recall
        approx = similarity.lsh_bucket_topk(
            embeddings, id_col="vec_id", vec_col="embedding", dim=64,
            n_planes=4, n_tables=16, k=1).toPandas().set_index("q_id")

        # ANN must produce a neighbor for nearly every vector...
        coverage = len(approx) / len(exact)
        assert coverage > 0.9, f"coverage {coverage:.2f}"
        joined = exact.join(approx, how="inner", lsuffix="_x", rsuffix="_a")
        # ...and the found neighbor's similarity must be near the true best
        sim_ratio = (joined["cos_sim_a"] >= joined["cos_sim_x"] - 0.05).mean()
        assert sim_ratio > 0.8, f"quality {sim_ratio:.2f}"

    def test_bucket_join_carries_no_vectors(self, spark, embeddings):
        """The bucket self-join + pair distinct must shuffle ids/signatures
        only; embedding arrays re-attach once afterwards (VERDICT.md round-1
        item 7).  Guard: no hash-partition exchange row carries the embedding
        column."""
        from immich_geodata_zh_tw_spark.operators import similarity

        out = similarity.lsh_bucket_topk(embeddings, id_col="vec_id",
                                         vec_col="embedding", dim=64,
                                         n_planes=4, n_tables=2, k=1)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        import re
        # every shuffle (hash-partition) Exchange block's Input must be free
        # of vector columns; vectors may only appear in BroadcastExchange
        # (the single id→vector re-attach)
        blocks = re.split(r"\n\n", plan)
        shuffle_blocks = [b for b in blocks
                          if re.match(r"\(\d+\) Exchange\b", b.strip())]
        assert shuffle_blocks, "expected at least one shuffle exchange"
        for b in shuffle_blocks:
            assert not re.search(r"\b(embedding|va|vb)#", b), b

    def test_ivf_recall_vs_bruteforce(self, spark, embeddings):
        """IVF (coarse quantizer + probe + exact re-rank) must recover most
        true nearest neighbors — the second ANN scale path."""
        import numpy as np
        from immich_geodata_zh_tw_spark.operators import similarity

        sample = np.asarray(
            embeddings.filter(F.col("vec_id") % 3 == 0)
            .select("embedding").toPandas()["embedding"].tolist())
        cents = similarity.kmeans_centroids(sample, k=8)
        queries = embeddings.select(F.col("vec_id").alias("q_id"),
                                    F.col("embedding").alias("q_vec"))
        exact = similarity.brute_force_topk(
            embeddings, queries, k=1).toPandas().set_index("q_id")
        approx = similarity.ivf_topk(
            embeddings, queries, centroids=cents, nprobe=3,
            k=1).toPandas().set_index("q_id")
        assert len(approx) == len(exact)  # every query answered
        joined = exact.join(approx, how="inner", lsuffix="_x", rsuffix="_a")
        quality = (joined["cos_sim_a"] >= joined["cos_sim_x"] - 0.05).mean()
        assert quality > 0.8, f"ivf quality {quality:.2f}"

    def test_ivf_deterministic_centroids(self, spark, embeddings):
        import numpy as np
        from immich_geodata_zh_tw_spark.operators import similarity

        sample = np.asarray(
            embeddings.limit(200).select("embedding")
            .toPandas()["embedding"].tolist())
        a = similarity.kmeans_centroids(sample, k=4)
        b = similarity.kmeans_centroids(sample, k=4)
        assert np.array_equal(a, b)

    def test_deterministic(self, spark, embeddings):
        from immich_geodata_zh_tw_spark.operators import similarity

        a = similarity.lsh_bucket_topk(embeddings, id_col="vec_id",
                                       vec_col="embedding", dim=64,
                                       n_planes=10, n_tables=2, k=1).toPandas()
        b = similarity.lsh_bucket_topk(embeddings, id_col="vec_id",
                                       vec_col="embedding", dim=64,
                                       n_planes=10, n_tables=2, k=1).toPandas()
        a = a.sort_values(["q_id"]).reset_index(drop=True)
        b = b.sort_values(["q_id"]).reset_index(drop=True)
        assert a.equals(b)

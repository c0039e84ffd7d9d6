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


class TestEmbeddingNearDup:
    def test_planted_dups_found_decoys_rejected(self, spark, embeddings):
        """Corpus ∪ mildly-perturbed copies (cos ≈ 0.9998) ∪ heavily-perturbed
        decoys (cos ≈ 0.92-0.97): every dup pair must survive the 0.99
        threshold, no decoy or cross pair may."""
        from immich_geodata_zh_tw_spark.operators import similarity

        base = embeddings.select(
            "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
            .alias("v"))

        def pert(rem, off, eps):
            return (embeddings.filter(F.col("vec_id") % 5 == rem)
                    .select((F.col("vec_id") + off).alias("vec_id"),
                            F.expr(f"transform(embedding, x -> "
                                   f"CAST(x AS DOUBLE) + {eps}D * CAST(x AS "
                                   f"DOUBLE) * CAST(x AS DOUBLE))").alias("v")))

        corpus = (base.unionByName(pert(0, 10_000, 0.08))
                  .unionByName(pert(1, 20_000, 1.5)))
        n_dups = embeddings.filter(F.col("vec_id") % 5 == 0).count()
        got = similarity.embedding_neardup_pairs(
            corpus, id_col="vec_id", vec_col="v", dim=64,
            n_planes=8, n_tables=4, threshold=0.99).toPandas()
        assert (got["cos_sim"] >= 0.99).all()
        # every surviving pair is a planted (base, +10k dup) pair...
        assert ((got["id_b"] - got["id_a"]) == 10_000).all()
        # ...and LSH recall over the planted pairs is high (16 tables would
        # give 100%; 4 keeps the test aligned with the driver query params)
        assert len(got) >= 0.9 * n_dups


class TestProductQuantization:
    def test_reconstruction_exact_when_vectors_are_centroids(self, spark):
        """If the corpus subvectors ARE codebook centroids, encode must pick
        them exactly and ADC scores equal true dot products."""
        import numpy as np
        import pandas as pd

        from immich_geodata_zh_tw_spark.operators import similarity as sim

        ksub, m, ds = 4, 2, 3
        # codebooks with well-separated centroids
        cbs = [np.array([[float(10 * (j + 1) + i)] * ds for j in range(ksub)])
               for i in range(m)]
        vecs = [np.concatenate([cbs[0][a], cbs[1][b]])
                for a in range(ksub) for b in range(ksub)]
        df = spark.createDataFrame(pd.DataFrame({
            "vec_id": range(len(vecs)),
            "embedding": [v.tolist() for v in vecs]}))
        codes = sim.pq_encode(df, cbs).toPandas()
        want = [[a, b] for a in range(ksub) for b in range(ksub)]
        got = sorted(map(tuple, codes.sort_values("vec_id")["pq_code"]))
        assert got == sorted(map(tuple, want))
        q = np.stack([vecs[5]])
        top = (sim.pq_adc_topk(sim.pq_encode(df, cbs), q, cbs,
                               k=len(vecs)).toPandas()
               .sort_values("rank").reset_index(drop=True))
        # with zero quantization error the ADC estimate IS the true dot
        # product — every score exact, ranking = true dot-product ranking
        true = {i: float(q[0] @ v) for i, v in enumerate(vecs)}
        for _, r in top.iterrows():
            assert abs(r["adc_score"] - true[r["vec_id"]]) < 1e-9
        want_order = sorted(true, key=lambda i: (-true[i], i))
        assert top["vec_id"].tolist() == want_order

    def test_adc_recall_vs_bruteforce(self, spark, embeddings):
        """PQ-ADC recall@10 against exact cosine-ordered top-10 on the real
        embeddings table — the quantized scan must recover most true
        neighbors (32 subspaces x 16 codes → 16 B per vector vs 256 B
        float32: a 16x memory cut)."""
        import numpy as np

        from immich_geodata_zh_tw_spark.operators import similarity as sim

        pdf = embeddings.toPandas()
        x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        # the synthetic embeddings are near-random (no cluster structure),
        # the hard case for PQ — m=32 2-dim subspaces measured 0.605
        # recall@10 here (real embeddings cluster and fare far better; in
        # production ADC is the FILTER stage, top-N → exact re-rank)
        cbs = sim.pq_codebooks(x, m=32, ksub=16)
        codes = sim.pq_encode(embeddings, cbs)
        n_q, k = 20, 10
        q = x[:n_q]
        got = sim.pq_adc_topk(codes, q, cbs, k=k,
                              query_ids=ids[:n_q].tolist()).toPandas()
        # exact top-k by dot product (ADC estimates dot, compare like-for-like)
        recall_hits = 0
        for qi in range(n_q):
            true = set(ids[np.argsort(-(x @ q[qi]))[:k]].tolist())
            mine = set(got[got["q_id"] == ids[qi]]["vec_id"].tolist())
            recall_hits += len(true & mine)
        recall = recall_hits / (n_q * k)
        assert recall >= 0.5, recall

    def test_bad_subspace_split_raises(self):
        import numpy as np
        import pytest

        from immich_geodata_zh_tw_spark.operators import similarity as sim

        with pytest.raises(ValueError):
            sim.pq_codebooks(np.zeros((10, 10)), m=3)

    def test_ivf_pq_equals_pq_restricted_to_probed_cells(self, spark,
                                                         embeddings):
        """IVF-PQ must score exactly the rows whose cell is in each query's
        probe set — verified against a hand-filtered pq_adc_topk."""
        import numpy as np

        from immich_geodata_zh_tw_spark.operators import similarity as sim

        pdf = embeddings.toPandas()
        x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        cents = sim.kmeans_centroids(x[::3], k=8)
        cbs = sim.pq_codebooks(x, m=16, ksub=16)
        assign1 = sim._assign_udf(cents, 1)
        codes = (sim.pq_encode(embeddings, cbs)
                 .withColumn("__cid", F.element_at(
                     assign1(F.col("embedding")), 1)))
        n_q, k, nprobe = 5, 5, 3
        got = (sim.ivf_pq_topk(codes, x[:n_q], cents, cbs, nprobe=nprobe,
                               k=k, query_ids=ids[:n_q].tolist())
               .toPandas())
        # reference: per query, brute-force ADC over rows in probed cells
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cell_of = np.argmax(xn @ cn.T, axis=1)
        qn = xn[:n_q]
        probes = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]
        codes_pd = codes.toPandas().set_index("vec_id")
        ds = x.shape[1] // len(cbs)
        for qi in range(n_q):
            in_cells = np.isin(cell_of, probes[qi])
            lut = np.stack([x[qi][i * ds:(i + 1) * ds] @ cb.T
                            for i, cb in enumerate(cbs)])
            cand_ids = ids[in_cells]
            cc = np.asarray(codes_pd.loc[cand_ids]["pq_code"].tolist(),
                            dtype=np.int64)
            s = lut[np.arange(len(cbs))[None, :], cc].sum(axis=1)
            order = sorted(zip(-s, cand_ids))[:k]
            want = [int(i) for _, i in order]
            mine = (got[got["q_id"] == ids[qi]].sort_values("rank")
                    ["vec_id"].tolist())
            assert mine == want, (qi, mine, want)


class TestSemanticDedup:
    def _run(self, spark, embeddings, **kw):
        """Corpus = embeddings + planted scaled copies (cosine-identical,
        ids +10^6) — scaling preserves direction so each copy must land in
        its original's cell and be dropped in favor of the original."""
        import numpy as np

        from immich_geodata_zh_tw_spark.operators import similarity as sim

        corpus = embeddings.select("vec_id", "embedding").unionByName(
            embeddings.filter(F.col("vec_id") % 5 == 0).select(
                (F.col("vec_id") + 1_000_000).alias("vec_id"),
                F.expr("transform(embedding, x -> x * CAST(1.7 AS FLOAT))")
                .alias("embedding")))
        rows = (embeddings.orderBy("vec_id").limit(64)
                .select("embedding").collect())
        cents = sim.kmeans_centroids(
            np.asarray([list(r[0]) for r in rows], dtype=np.float64), k=8)
        return sim.semantic_dedup(corpus, cents, **kw).toPandas()

    def test_hand_computed_small_cell(self, spark):
        """Three near-identical vectors + one orthogonal in a forced single
        cell: min id survives, later copies point at it, orthogonal kept."""
        import numpy as np
        import pandas as pd

        from immich_geodata_zh_tw_spark.operators import similarity as sim

        base = np.zeros(8); base[0] = 1.0
        near = base + 0.001; near2 = base + 0.002
        orth = np.zeros(8); orth[1] = 1.0
        df = spark.createDataFrame(pd.DataFrame({
            "vec_id": [10, 20, 30, 40],
            "embedding": [base.tolist(), near.tolist(), near2.tolist(),
                          orth.tolist()],
        }))
        cents = np.ones((1, 8))  # one cell
        out = (sim.semantic_dedup(df, cents, threshold=0.99)
               .toPandas().set_index("vec_id").sort_index())
        assert out.loc[10, "kept"] and out.loc[40, "kept"]
        assert not out.loc[20, "kept"] and out.loc[20, "dup_of"] == 10
        assert not out.loc[30, "kept"] and out.loc[30, "dup_of"] == 10
        assert out.loc[30, "dup_sim"] > 0.999
        assert pd.isna(out.loc[10, "dup_of"])

    def test_negative_ids_including_minus_one(self, spark):
        """ids are arbitrary int64 (xxhash64-derived ids are ~50 %
        negative): a NEGATIVE dominator id must still mark its dups as
        dropped, and an actual id of -1 must be a normal id — the old
        kernel used -1 as the 'no dominator' sentinel, so both cases
        silently kept near-duplicates."""
        import numpy as np
        import pandas as pd

        from immich_geodata_zh_tw_spark.operators import similarity as sim

        base = np.zeros(8); base[0] = 1.0
        near = base + 0.001; near2 = base + 0.002
        orth = np.zeros(8); orth[1] = 1.0
        df = spark.createDataFrame(pd.DataFrame({
            "vec_id": [-5, -1, 2, 7],
            "embedding": [base.tolist(), near.tolist(), near2.tolist(),
                          orth.tolist()],
        }))
        out = (sim.semantic_dedup(df, np.ones((1, 8)), threshold=0.99)
               .toPandas().set_index("vec_id").sort_index())
        assert out.loc[-5, "kept"] and pd.isna(out.loc[-5, "dup_of"])
        assert not out.loc[-1, "kept"] and out.loc[-1, "dup_of"] == -5
        assert not out.loc[2, "kept"] and out.loc[2, "dup_of"] == -5
        assert out.loc[7, "kept"]

    def test_far_centroid_policy_keeps_cluster_shell(self, spark):
        """keep='far_centroid' (the SemDeDup paper's own policy) must keep
        the near-dup FARTHEST from the cell centroid — the diversity-
        preserving choice — where min_id keeps the smallest id; items below
        the threshold survive under both."""
        import numpy as np
        import pandas as pd

        from immich_geodata_zh_tw_spark.operators import similarity as sim

        # ids ascending = centroid-closeness descending, so the two
        # policies pick OPPOSITE winners: v1 (id 1) hugs the centroid,
        # v3 (id 3) sits farthest while still ≥ tau to both others
        c = np.zeros(8); c[0] = 1.0
        vs = {i: (c + 0.004 * i * np.eye(8)[1]).tolist() for i in (1, 2, 3)}
        orth = np.zeros(8); orth[1] = 1.0
        df = spark.createDataFrame(pd.DataFrame({
            "vec_id": [1, 2, 3, 9],
            "embedding": [vs[1], vs[2], vs[3], orth.tolist()],
        }))
        cents = c.reshape(1, 8)

        far = (sim.semantic_dedup(df, cents, threshold=0.99,
                                  keep="far_centroid")
               .toPandas().set_index("vec_id").sort_index())
        assert far.loc[3, "kept"] and pd.isna(far.loc[3, "dup_of"])
        assert not far.loc[1, "kept"] and far.loc[1, "dup_of"] == 3
        assert not far.loc[2, "kept"] and far.loc[2, "dup_of"] == 3
        assert far.loc[9, "kept"]  # below threshold to everything

        near = (sim.semantic_dedup(df, cents, threshold=0.99)
                .toPandas().set_index("vec_id").sort_index())
        assert near.loc[1, "kept"]
        assert near.loc[2, "dup_of"] == 1 and near.loc[3, "dup_of"] == 1

        with pytest.raises(ValueError, match="keep"):
            sim.semantic_dedup(df, cents, keep="random")

    def test_block_and_partition_invariance(self, spark, embeddings):
        """The chunked kernel must give identical results at any block size,
        and the cell shuffle at any input partitioning."""
        a = (self._run(spark, embeddings, threshold=0.9, block_size=3)
             .sort_values("vec_id").reset_index(drop=True))
        b = (self._run(spark, embeddings.repartition(13), threshold=0.9,
                       block_size=1024)
             .sort_values("vec_id").reset_index(drop=True))
        import pandas as pd
        pd.testing.assert_frame_equal(a, b)
        assert (~a["kept"]).sum() > 0  # corpus has semantic dups to find

    def test_survivor_set_is_dominance_consistent(self, spark, embeddings):
        """Every dropped row's dup_of must be a smaller SURVIVING-or-dropped
        id in the SAME cell with sim >= threshold (min-id dominance: the
        pointed-at id is the cell's first >=-threshold neighbor, so it can
        itself be dropped only by an even smaller id)."""
        out = self._run(spark, embeddings, threshold=0.9)
        by_id = out.set_index("vec_id")
        dropped = out[~out["kept"]]
        assert len(dropped) > 0
        for r in dropped.itertuples():
            assert r.dup_of < r.vec_id
            assert by_id.loc[r.dup_of, "cell_id"] == r.cell_id
            assert r.dup_sim >= 0.9
        # every planted copy is dropped against its original
        planted = out[out["vec_id"] >= 1_000_000]
        assert len(planted) > 0 and not planted["kept"].any()
        assert (planted["dup_of"] == planted["vec_id"] - 1_000_000).all()

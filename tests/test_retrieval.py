"""BM25 lexical retrieval (operators/retrieval.py).

Covers: hand-computed Lucene-idf scores on a tiny corpus, salt-count
invariance of the exact top-k, tie determinism, miss/absence semantics,
parameter validation, and the plan pins (workload-bounded broadcasts, the
single one-row crossJoin, zero Python UDFs).
"""

import math

import pytest
from pyspark.sql import functions as F

from immich_geodata_zh_tw_spark.operators.retrieval import (
    bm25_topk, query_terms)

K1, B = 1.2, 0.75


def _tiny(spark):
    rows = [
        (1, "red fox jumps over the lazy dog"),
        (2, "red red wine"),
        (3, "the quick brown fox"),
        (4, "lazy lazy lazy dog dog"),
        (5, "wine cellar inventory list"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bm25(corpus, query_terms_, k1=K1, b=B):
    """Independent float reference (Lucene idf), per (term, doc)."""
    n = len(corpus)
    toks = {d: [w for w in t.split(" ") if w] for d, t in corpus}
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in query_terms_:
        df = sum(term in v for v in toks.values())
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if tf:
                dl = len(v)
                contrib = idf * (tf * (k1 + 1)
                                 / (tf + k1 * (1 - b + b * dl / avgdl)))
                scores[d] = scores.get(d, 0) + round(contrib * 1e6)
    return scores


class TestBM25:
    def test_matches_hand_reference(self, spark):
        corpus = [(r.doc_id, r.text) for r in _tiny(spark).collect()]
        q = spark.createDataFrame([("a", "red dog"), ("b", "wine")],
                                  "query_id string, query string")
        out = {(r.query_id, r.doc_id): (r.score_micro6, r.rank, r.n_terms)
               for r in bm25_topk(_tiny(spark), q, k=10, n_salts=3)
               .collect()}
        for qid, terms in [("a", ["red", "dog"]), ("b", ["wine"])]:
            ref = _py_bm25(corpus, terms)
            ranked = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
            assert [d for d, _ in ranked] == \
                [d for (q2, d), _ in sorted(
                    out.items(), key=lambda kv: kv[1][1]) if q2 == qid]
            for rank0, (d, s) in enumerate(ranked):
                got_s, got_rank, got_nt = out[(qid, d)]
                assert got_s == s
                assert got_rank == rank0 + 1
                assert got_nt == len([t for t in terms
                                      if t in dict(corpus)[d].split(" ")])

    def test_salt_invariance_and_k_cut(self, spark):
        docs = _tiny(spark)
        q = spark.createDataFrame([("a", "red dog lazy")],
                                  "query_id string, query string")
        base = bm25_topk(docs, q, k=2, n_salts=1).collect()
        for n_salts in (3, 8):
            alt = bm25_topk(docs, q, k=2, n_salts=n_salts).collect()
            assert sorted(map(tuple, alt)) == sorted(map(tuple, base))
        assert len(base) == 2 and {r.rank for r in base} == {1, 2}

    def test_tie_breaks_by_doc_id(self, spark):
        docs = spark.createDataFrame(
            [(7, "x y"), (3, "x y"), (5, "x y")], "doc_id long, text string")
        q = spark.createDataFrame([("a", "x")],
                                  "query_id string, query string")
        out = bm25_topk(docs, q, k=3).orderBy("rank").collect()
        assert [r.doc_id for r in out] == [3, 5, 7]
        assert len({r.score_micro6 for r in out}) == 1

    def test_misses_absent(self, spark):
        q = spark.createDataFrame(
            [("hit", "wine"), ("miss", "zzz qqq")],
            "query_id string, query string")
        out = bm25_topk(_tiny(spark), q, k=5).collect()
        assert {r.query_id for r in out} == {"hit"}

    def test_rational_idf_single_term_rank_order(self, spark):
        """For a single-term query the rational idf is a positive constant
        times the same tf_norm — rank order must equal lucene's."""
        docs = _tiny(spark)
        q = spark.createDataFrame([("a", "lazy")],
                                  "query_id string, query string")
        ranks = {}
        for form in ("lucene", "rational"):
            ranks[form] = [r.doc_id for r in
                           bm25_topk(docs, q, k=5, idf=form)
                           .orderBy("rank").collect()]
        assert ranks["lucene"] == ranks["rational"]

    def test_query_terms_dedup(self, spark):
        q = spark.createDataFrame([("a", "x  x y")],
                                  "query_id string, query string")
        rows = query_terms(q).collect()
        assert sorted((r.query_id, r.term) for r in rows) == \
            [("a", "x"), ("a", "y")]

    def test_param_validation(self, spark):
        q = spark.createDataFrame([("a", "x")],
                                  "query_id string, query string")
        with pytest.raises(ValueError, match="k must be"):
            bm25_topk(_tiny(spark), q, k=0)
        with pytest.raises(ValueError, match="idf must be"):
            bm25_topk(_tiny(spark), q, k=1, idf="nope")


class TestBM25PlanShape:
    def test_plan_pins(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        q = spark.createDataFrame([("a", "hash join"), ("b", "vector")],
                                  "query_id string, query string")
        plan = (bm25_topk(docs, q, k=5, n_salts=4)
                ._jdf.queryExecution().executedPlan().toString())
        # corpus-side pruning + bounded broadcasts actually planned
        assert "BroadcastHashJoin" in plan
        # the only nested-loop join is the documented ONE-ROW stats attach
        assert plan.count("BroadcastNestedLoopJoin") <= 1
        # zero Python on the path
        assert "Python" not in plan and "Batch" not in plan.replace(
            "Batched: true", "")

    def test_salted_topk_no_global_single_partition_over_corpus(self, spark):
        """The per-query windows: local one partitions by (query, salt) —
        the global one only ever sees ≤ k × n_salts survivor rows."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        q = spark.createDataFrame([("a", "hash join")],
                                  "query_id string, query string")
        out = bm25_topk(docs, q, k=3, n_salts=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window [") == 2
        n = out.count()
        assert 0 < n <= 3


def test_doubled_whitespace_scores_identically(spark):
    """dl counts the tokens actually scored: 'a  b' (doubled space) and
    'a b' are identical content and must get identical BM25 scores."""
    docs = spark.createDataFrame(
        [(1, "red  dog runs"), (2, "red dog runs"), (3, "cat naps well")],
        "doc_id long, text string")
    q = spark.createDataFrame([("a", "red")],
                              "query_id string, query string")
    got = {r.doc_id: r.score_micro6
           for r in bm25_topk(docs, q, k=3).collect()}
    assert got[1] == got[2]


def test_substring_prefilter_equivalent_and_planned(spark):
    """The step-2 substring pre-filter changes the plan (a Contains filter
    before tokenization) but never the result — false positives are
    verified away by the equality semi-join."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = spark.createDataFrame([("a", "hash join"), ("b", "the")],
                              "query_id string, query string")
    on = bm25_topk(docs, q, k=7).collect()
    off = bm25_topk(docs, q, k=7, prefilter_max_terms=0).collect()
    assert sorted(map(tuple, on)) == sorted(map(tuple, off))
    plan = (bm25_topk(docs, q, k=7)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Contains" in plan
    plan_off = (bm25_topk(docs, q, k=7, prefilter_max_terms=0)
                ._jdf.queryExecution().executedPlan().toString())
    assert "Contains" not in plan_off

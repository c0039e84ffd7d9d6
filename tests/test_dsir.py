"""DSIR importance weighting (operators/dsir.py) vs an independent
pure-Python reference, plus the scale-shape and edge-case guarantees."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from immich_geodata_zh_tw_spark.operators import dsir

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "der hund lief durch den park und durch das tor", "de"),
    (2, "the dog ran through the park", "en"),
    (3, "", "en"),                       # no features at all
    (4, "     ", "de"),                  # whitespace-only → no features
    (5, "single", "en"),                 # one word → unigram only
    (6, "the cat sat on the mat", "de"), # same text, different flag
]
B = 64  # tiny bucket count → forced collisions exercise the mixing


def _ref_weights(docs, buckets):
    """Independent reference: dict arithmetic + math.log, no Spark/DuckDB."""
    def feats(text):
        ws = [w for w in text.strip().split(" ") if w]
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bucket(f):
        h = int(hashlib.md5(f.encode("utf-8")).hexdigest()[:15], 16)
        return h % buckets

    def ilog(x):
        v = math.log(x) * 1e6
        # round-half-up like Spark/DuckDB round() (banker's would differ)
        return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))

    nt, nr = {}, {}
    per_doc = {}
    for doc_id, text, lang in docs:
        cnt = {}
        for f in feats(text):
            cnt[bucket(f)] = cnt.get(bucket(f), 0) + 1
        per_doc[doc_id] = cnt
        for b, c in cnt.items():
            nr[b] = nr.get(b, 0) + c
            if lang == "en":
                nt[b] = nt.get(b, 0) + c
    gnt, gnr = sum(nt.values()), sum(nr.values())
    out = {}
    for doc_id, cnt in per_doc.items():
        w = 0
        for b, c in cnt.items():
            l_b = ((ilog(nt.get(b, 0) + 1) - ilog(gnt + buckets))
                   - (ilog(nr.get(b, 0) + 1) - ilog(gnr + buckets)))
            w += c * l_b
        out[doc_id] = (w, sum(cnt.values()))
    return out


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_weights_match_pure_python_reference(frame):
    got = {r["doc_id"]: (r["dsir_logratio_micro6"], r["dsir_n_feats"])
           for r in dsir.dsir_weights(
               frame, F.col("lang") == "en", buckets=B).collect()}
    assert got == _ref_weights(DOCS, B)


def test_empty_docs_get_zero_weight(frame):
    got = {r["doc_id"]: r for r in dsir.dsir_weights(
        frame, F.col("lang") == "en", buckets=B).collect()}
    for empty_id in (3, 4):
        assert got[empty_id]["dsir_logratio_micro6"] == 0
        assert got[empty_id]["dsir_n_feats"] == 0


def test_identical_text_same_weight_regardless_of_flag(frame):
    """The weight depends only on the document's own features (the flag
    shifts the *distributions*, identically for both copies)."""
    got = {r["doc_id"]: r["dsir_logratio_micro6"] for r in dsir.dsir_weights(
        frame, F.col("lang") == "en", buckets=B).collect()}
    assert got[0] == got[6]


def test_target_docs_rank_above_offtarget(frame):
    """With an en target, the de doc (off-distribution vocabulary) must
    carry the lowest weight — the selection signal points the right way."""
    got = {r["doc_id"]: r["dsir_logratio_micro6"] for r in dsir.dsir_weights(
        frame, F.col("lang") == "en", buckets=B).collect()}
    assert got[1] == min(got.values())
    assert got[0] > got[1] and got[2] > got[1]


def test_partitioning_invariance(spark, frame):
    """Weights are exact integers — any repartitioning yields the identical
    result set (no float accumulation order anywhere)."""
    base = sorted(map(tuple, dsir.dsir_weights(
        frame, F.col("lang") == "en", buckets=B).collect()))
    shuffled = sorted(map(tuple, dsir.dsir_weights(
        frame.repartition(7, "text"), F.col("lang") == "en",
        buckets=B).collect()))
    assert base == shuffled


def test_select_keeps_exactly_k_with_deterministic_tiebreak(frame):
    sel = dsir.dsir_select(frame, F.col("lang") == "en", buckets=B,
                           keep_k=3, n_salts=4)
    rows = {r["doc_id"]: r for r in sel.collect()}
    assert sum(r["dsir_keep"] for r in rows.values()) == 3
    # ties (docs 0 and 6 share a weight) break by doc_id ascending
    order = sorted(rows.values(),
                   key=lambda r: (-r["dsir_logratio_micro6"], r["doc_id"]))
    kept_expected = {r["doc_id"] for r in order[:3]}
    assert {i for i, r in rows.items() if r["dsir_keep"]} == kept_expected


def test_no_nonbroadcast_join_against_corpus(frame):
    """Scale shape: the only join the (doc, bucket) aggregate participates
    in is a broadcast of the ≤ `buckets`-row ratio table."""
    plan = dsir.dsir_weights(
        frame, F.col("lang") == "en",
        buckets=B)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

"""Bloom-filter decontamination (operators/bloom.py): Python-reference
membership parity, the one-sided-error (superset) guarantee, merge-by-
union, determinism across partitionings, broadcast plan shape."""

from __future__ import annotations

import hashlib

import pandas as pd

from immich_geodata_zh_tw_spark.operators import bloom, dedup

N_BITS, N_HASHES = 256, 3


def _ref_positions(key: str) -> set[int]:
    return {int(hashlib.md5(f"{key}#{j}".encode()).hexdigest()[:15], 16)
            % N_BITS for j in range(N_HASHES)}


class TestBloom:
    def test_membership_matches_python_reference(self, spark):
        """Build from 40 keys, probe 200 (members + non-members): every
        verdict must equal the hashlib reference Bloom EXACTLY — including
        which non-members falsely hit (deterministic, no RNG)."""
        members = [f"m{i}" for i in range(40)]
        probes = members + [f"p{i}" for i in range(160)]
        ref_set: set[int] = set()
        for m in members:
            ref_set |= _ref_positions(m)
        assert len(ref_set) <= N_BITS
        bf = bloom.bloom_build(
            spark.createDataFrame([(m,) for m in members], "key string"),
            "key", n_bits=N_BITS, n_hashes=N_HASHES)
        assert bf.count() == len(ref_set)
        got = (bloom.bloom_maybe_contains(
                   spark.createDataFrame([(p,) for p in probes],
                                         "key string"),
                   bf, "key", n_bits=N_BITS, n_hashes=N_HASHES)
               .toPandas().set_index("key")["bloom_maybe"])
        n_fp = 0
        for p in probes:
            expect = _ref_positions(p) <= ref_set
            assert got[p] == expect, p
            if expect and p not in members:
                n_fp += 1
        assert all(got[m] for m in members)  # zero false negatives
        # 256 bits / 120 set → dense enough that fps certainly occur
        assert n_fp > 0

    def test_duplicate_probe_rows_keep_no_false_negative(self, spark):
        """r6 ADVICE (medium): duplicate rows in the probe frame merge in
        the groupBy fold; the old ``count == n_hashes`` literal then read
        2×n_hashes hits as FALSE — a false negative, the one direction
        the screen guarantees never happens.  The fix compares against
        the group's own exploded row count; verdicts must equal the
        distinct-probe run row for row."""
        members = [f"m{i}" for i in range(20)]
        probes = members + [f"p{i}" for i in range(50)]
        bf = bloom.bloom_build(
            spark.createDataFrame([(m,) for m in members], "key string"),
            "key", n_bits=N_BITS, n_hashes=N_HASHES)
        dup = spark.createDataFrame(
            [(p,) for p in probes] * 3, "key string")
        got_dup = (bloom.bloom_maybe_contains(
                       dup, bf, "key", n_bits=N_BITS, n_hashes=N_HASHES)
                   .toPandas().set_index("key")["bloom_maybe"])
        got_one = (bloom.bloom_maybe_contains(
                       spark.createDataFrame([(p,) for p in probes],
                                             "key string"),
                       bf, "key", n_bits=N_BITS, n_hashes=N_HASHES)
                   .toPandas().set_index("key")["bloom_maybe"])
        assert len(got_dup) == len(probes)  # one row per distinct key
        for p in probes:
            assert got_dup[p] == got_one[p], p
        assert all(got_dup[m] for m in members)  # no false negatives

    def test_decontaminate_superset_of_exact(self, spark):
        """Every doc the exact 3-gram check flags must be bloom_maybe —
        at a deliberately tiny, fp-heavy 64-bit filter (the adversarial
        regime for the one-sided-error claim)."""
        import random

        rng = random.Random(3)
        vocab = [f"w{i}" for i in range(12)]
        rows = [(i, " ".join(rng.choice(vocab) for _ in range(12)))
                for i in range(80)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ev = df.filter("doc_id % 10 = 0")
        tr = df.filter("doc_id % 10 <> 0")
        exact = dedup.ngram_decontaminate(
            tr, ev, id_col="doc_id", text_col="text", ngram_words=3)
        screen = bloom.bloom_decontaminate(
            tr, ev, id_col="doc_id", text_col="text", ngram_words=3,
            n_bits=64, n_hashes=2)
        j = (exact.join(screen, "doc_id").toPandas())
        assert j.contaminated.sum() > 0  # tiny vocab → real overlaps
        assert not (j.contaminated & ~j.bloom_maybe).any()
        # and n_bloom_grams dominates n_shared_grams per doc
        assert (j.n_bloom_grams >= j.n_shared_grams).all()

    def test_deterministic_across_partitioning(self, spark):
        rows = [(i, f"k{i % 30}") for i in range(300)]
        outs = []
        for parts in (1, 7):
            df = spark.createDataFrame(rows, "i long, key string") \
                .repartition(parts)
            bf = bloom.bloom_build(df.filter("i % 3 = 0"), "key",
                                   n_bits=N_BITS, n_hashes=N_HASHES)
            outs.append(bloom.bloom_maybe_contains(
                df.select("key").distinct(), bf, "key",
                n_bits=N_BITS, n_hashes=N_HASHES)
                .toPandas().sort_values("key").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_build_merges_by_union(self, spark):
        a = spark.createDataFrame([(f"a{i}",) for i in range(20)],
                                  "key string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(20)],
                                  "key string")
        kw = {"n_bits": N_BITS, "n_hashes": N_HASHES}
        merged = (bloom.bloom_build(a, "key", **kw)
                  .unionByName(bloom.bloom_build(b, "key", **kw))
                  .distinct().toPandas().sort_values("pos")
                  .reset_index(drop=True))
        whole = (bloom.bloom_build(a.unionByName(b), "key", **kw)
                 .toPandas().sort_values("pos").reset_index(drop=True))
        pd.testing.assert_frame_equal(merged, whole)

    def test_plan_broadcast_no_gram_string_join(self, spark):
        """The membership join must broadcast the ≤ n_bits position frame
        keyed on the 8-byte position, and NO join anywhere may key on the
        gram string (span_dedup's no-join-back discipline — the only
        other joins are id-keyed doc rollup merges)."""
        df = spark.createDataFrame(
            [(i, "a b c d e f g h i j") for i in range(50)],
            "doc_id long, text string")
        out = bloom.bloom_decontaminate(
            df.filter("doc_id % 2 = 1"), df.filter("doc_id % 2 = 0"),
            id_col="doc_id", text_col="text", ngram_words=3,
            n_bits=N_BITS, n_hashes=N_HASHES)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        assert "BroadcastHashJoin" in plan
        # every join's key lines must be __pos or doc_id — never gram
        for block in plan.split("\n\n"):
            if "keys [" in block and "gram" in block:
                raise AssertionError(f"gram-keyed join:\n{block}")

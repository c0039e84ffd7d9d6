"""Event-time streaming: watermark late-data semantics + custom state
(streaming/stateful.py)."""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)

EVENTS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
])


def _write_batch(spark, path: str, rows: list[tuple[int, str]], name: str):
    # flat part-files appended into the source dir — the file stream source
    # does not recurse into subdirectories
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


class TestWatermarkWindow:
    def test_late_rows_beyond_watermark_dropped(self, spark, tmp_path):
        """Two micro-batches: batch 2 carries one on-time row (advances the
        watermark) and one row 3 h late — the late row must NOT appear in any
        finalized window, the on-time rows must."""
        from immich_geodata_zh_tw_spark.streaming.stateful import \
            windowed_page_counts

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        # batch 1: two rows in hour 10, one in hour 11
        _write_batch(spark, inp, [
            (1, "2026-01-01 10:05:00"), (2, "2026-01-01 10:20:00"),
            (3, "2026-01-01 11:10:00")], "b1")

        def run():
            stream = (spark.readStream.schema(EVENTS_SCHEMA)
                      .option("maxFilesPerTrigger", 1).parquet(inp)
                      .withColumnRenamed("ts", "warc_ts"))
            q = (windowed_page_counts(stream, window="1 hour",
                                      watermark="2 hours")
                 .writeStream.format("parquet")
                 .option("path", out).option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)

        run()
        # batch 2 advances the watermark to 13:00 (15:00 − 2 h)
        _write_batch(spark, inp, [(4, "2026-01-01 15:00:00")], "b2")
        run()
        # batch 3 arrives with one row whose window (09-10h) now lies wholly
        # below the 13:00 watermark — must be dropped — plus an on-time row
        _write_batch(spark, inp, [
            (5, "2026-01-01 09:00:00"), (6, "2026-01-01 18:00:00")], "b3")
        run()
        # batch 4 pushes the watermark past hour 15's window end
        _write_batch(spark, inp, [(7, "2026-01-01 22:00:00")], "b4")
        run()

        got = (spark.read.parquet(out)
               .withColumn("h", F.hour("window_start"))
               .groupBy("h").agg(F.sum("n_pages").alias("n"))
               .toPandas().set_index("h")["n"].to_dict())
        assert got.get(10) == 2 and got.get(11) == 1  # on-time rows counted
        assert got.get(15) == 1                       # finalized by batch 4
        assert 9 not in got  # the 4-h-late row was dropped by the watermark


class TestStatefulSessionize:
    def test_sessions_close_on_gap_and_timeout(self, spark, tmp_path):
        from immich_geodata_zh_tw_spark.streaming.stateful import \
            stateful_sessionize

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        # user 7: three events, then a gap > 60 s, then two more (one closed
        # session emitted on the later batch); user 8: one event, closed by
        # processing-time timeout on a later empty-ish batch
        _write_batch(spark, inp, [
            (7, "2026-01-01 10:00:00"), (7, "2026-01-01 10:00:20"),
            (7, "2026-01-01 10:00:40"), (8, "2026-01-01 10:00:00")], "b1")

        def run():
            stream = (spark.readStream.schema(EVENTS_SCHEMA)
                      .option("maxFilesPerTrigger", 1).parquet(inp))
            q = (stateful_sessionize(stream, gap_sec=60)
                 .writeStream.format("parquet")
                 .option("path", out).option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(180)

        run()
        _write_batch(spark, inp, [
            (7, "2026-01-01 10:05:00"), (7, "2026-01-01 10:05:30")], "b2")
        run()
        got = spark.read.parquet(out).toPandas()
        u7 = got[got["user_id"] == 7]
        assert len(u7) == 1  # first session closed by the gap
        assert u7.iloc[0]["n_events"] == 3
        assert u7.iloc[0]["closed_by"] == "gap"
        assert u7.iloc[0]["session_start"] == pd.Timestamp("2026-01-01 10:00:00")
        # user 8's lone session is still live state — correctly not emitted
        # (no processing-time timeout configured: the deterministic gap path)
        assert (got["user_id"] == 8).sum() == 0


PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", StringType()),
])


def _write_pages(spark, path: str, rows: list[tuple[str, str, str]]):
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


class TestStreamingExactDedup:
    def test_first_occurrence_kept_within_watermark(self, spark, tmp_path):
        """Streaming twin of doc_exact_dedup: duplicate content within the
        watermark horizon is suppressed, the first arrival survives, and
        distinct content always passes."""
        from immich_geodata_zh_tw_spark.streaming.stateful import \
            streaming_exact_dedup

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        _write_pages(spark, inp, [
            ("u1", "2026-01-01 10:00:00", "<html>A</html>"),
            ("u2", "2026-01-01 10:01:00", "<html>A</html>"),   # dup content
            ("u3", "2026-01-01 10:02:00", "<html>B</html>"),
        ])

        def run():
            stream = (spark.readStream.schema(PAGES_SCHEMA)
                      .option("maxFilesPerTrigger", 1).parquet(inp))
            q = (streaming_exact_dedup(stream, watermark="1 hour")
                 .writeStream.format("parquet")
                 .option("path", out).option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(180)

        run()
        # a recrawl of A in a later batch, still inside the horizon: dropped
        # (the dedup state is keyed on the hash and persists across batches
        # via the checkpoint)
        _write_pages(spark, inp, [
            ("u4", "2026-01-01 10:30:00", "<html>A</html>"),
            ("u5", "2026-01-01 10:31:00", "<html>C</html>"),
        ])
        run()
        got = spark.read.parquet(out).toPandas().sort_values("url")
        assert got["url"].tolist() == ["u1", "u3", "u5"]
        # state key is the md5, present on every surviving row
        assert got["content_hash"].notna().all()
        assert got["content_hash"].str.len().eq(32).all()


DOCS_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("doc_id", LongType()),
    StructField("ts", TimestampType()),
])


class TestStreamingHostBudget:
    def test_first_cap_docs_admitted_across_batches(self, spark, tmp_path):
        """cap=3 per host, two micro-batches: host a sends 2 then 3 docs
        (only 1 of the second batch admitted, state carries across
        batches), host b stays under cap, host c arrives only in batch 2."""
        from immich_geodata_zh_tw_spark.streaming.stateful import \
            streaming_host_budget

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def write(rows):
            pdf = pd.DataFrame(rows, columns=["host", "doc_id", "ts"])
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            (spark.createDataFrame(pdf).coalesce(1)
             .write.mode("append").parquet(inp))

        def run():
            stream = (spark.readStream.schema(DOCS_SCHEMA)
                      .option("maxFilesPerTrigger", 1).parquet(inp))
            q = (streaming_host_budget(stream, cap=3)
                 .writeStream.format("parquet")
                 .option("path", out).option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)

        write([("a", 1, "2026-01-01 10:00:00"),
               ("a", 2, "2026-01-01 10:01:00"),
               ("b", 10, "2026-01-01 10:00:30")])
        run()
        write([("a", 3, "2026-01-01 10:02:00"),
               ("a", 4, "2026-01-01 10:03:00"),
               ("a", 5, "2026-01-01 10:04:00"),
               ("c", 20, "2026-01-01 10:05:00")])
        run()

        got = spark.read.parquet(out).toPandas()
        by_host = {h: sorted(zip(g["admit_seq"], g["doc_id"]))
                   for h, g in got.groupby("host")}
        # host a: docs 1,2 from batch 1; only doc 3 (earliest ts) from
        # batch 2 — seq continues across batches
        assert by_host["a"] == [(1, 1), (2, 2), (3, 3)]
        assert by_host["b"] == [(1, 10)]
        assert by_host["c"] == [(1, 20)]

    def test_admission_deterministic_across_arrow_chunks(self, spark, tmp_path):
        """Review regression: a group's micro-batch arrives as several Arrow
        chunks; admission must be (ts, doc_id)-ordered across ALL chunks,
        not greedily per chunk.  maxRecordsPerBatch=2 forces chunking; the
        earliest-ts docs must win even when written last."""
        from immich_geodata_zh_tw_spark.streaming.stateful import \
            streaming_host_budget

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old = spark.conf.get(key)
        try:
            spark.conf.set(key, "2")
            # one file, one micro-batch: 8 docs for host a, LATE ts first
            rows = [("a", 100 + i, f"2026-01-01 10:{30 - i:02d}:00")
                    for i in range(8)]  # doc 107 has the earliest ts 10:23
            pdf = pd.DataFrame(rows, columns=["host", "doc_id", "ts"])
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            (spark.createDataFrame(pdf).coalesce(1)
             .write.mode("append").parquet(inp))
            stream = (spark.readStream.schema(DOCS_SCHEMA)
                      .option("maxFilesPerTrigger", 1).parquet(inp))
            q = (streaming_host_budget(stream, cap=3)
                 .writeStream.format("parquet")
                 .option("path", out).option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)
            got = (spark.read.parquet(out).toPandas()
                   .sort_values("admit_seq"))
            # earliest three timestamps are docs 107 (10:23), 106, 105
            assert got["doc_id"].tolist() == [107, 106, 105]
        finally:
            spark.conf.set(key, old)


from conftest import (NEARDUP_TXT_X as _TXT_X, NEARDUP_TXT_X2 as _TXT_X2,
                      NEARDUP_TXT_Y as _TXT_Y)
from immich_geodata_zh_tw_spark.streaming.pipeline import NEARDUP_DOCS_SCHEMA

_TXT_W = ("a third unrelated page used only to advance the event clock and "
          "let expired signature state fire its timeout")


class TestStreamingNeardup:
    def _run(self, spark, inp, out, ckpt):
        from immich_geodata_zh_tw_spark.streaming.stateful import \
            streaming_neardup_flags

        stream = (spark.readStream.schema(NEARDUP_DOCS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(inp))
        q = (streaming_neardup_flags(stream, watermark="1 hour",
                                     horizon="2 hours")
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

    @staticmethod
    def _write(spark, path, rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        (spark.createDataFrame(pdf, schema=NEARDUP_DOCS_SCHEMA).coalesce(1)
         .write.mode("append").parquet(path))

    def test_neardup_flagged_within_horizon_evicted_after(self, spark,
                                                          tmp_path):
        """Full life cycle: a one-word-edited recrawl is flagged (near-dup,
        exact hashing would miss it), state persists across micro-batches,
        and a signature silent past the horizon is EVICTED so a much later
        recrawl re-registers fresh."""
        from immich_geodata_zh_tw_spark.streaming.stateful import \
            neardup_verdicts

        inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
        # batch 1: original X, near-dup X2 (flag, dup_of=1), distinct Y,
        # null text (no signal — rides the stateless pass-through as kept)
        self._write(spark, inp, [
            (1, "2026-01-01 10:00:00", _TXT_X),
            (2, "2026-01-01 10:05:00", _TXT_X2),
            (3, "2026-01-01 10:10:00", _TXT_Y),
            (8, "2026-01-01 10:11:00", None),
        ])
        self._run(spark, inp, out, ckpt)
        # batch 2: exact recrawl of X within horizon (flag) + a doc 10 h
        # later that advances the watermark far past every X/Y signature's
        # last-seen + horizon
        self._write(spark, inp, [
            (4, "2026-01-01 10:30:00", _TXT_X),
            (5, "2026-01-01 20:00:00", _TXT_Y[::-1]),
        ])
        self._run(spark, inp, out, ckpt)
        # batch 3: signature-silent batch — expired (band, sig) groups get
        # no data here, so their event-time timeouts fire and evict
        self._write(spark, inp, [(9, "2026-01-01 20:10:00", _TXT_W)])
        self._run(spark, inp, out, ckpt)
        # batch 4: X returns AFTER eviction — registers fresh (kept), and
        # an immediate same-batch recrawl collides with doc 6, not doc 1
        self._write(spark, inp, [
            (6, "2026-01-01 20:30:00", _TXT_X),
            (7, "2026-01-01 20:35:00", _TXT_X),
        ])
        self._run(spark, inp, out, ckpt)

        flags = spark.read.parquet(out)
        got = (neardup_verdicts(flags).toPandas()
               .sort_values("doc_id").set_index("doc_id"))
        assert got.index.tolist() == [1, 2, 3, 4, 5, 6, 7, 8, 9]
        # null-text doc: no dedup signal, emitted kept via the stateless
        # pass-through branch (a pipeline must never silently drop docs)
        assert bool(got.loc[8, "kept"]) and pd.isna(got.loc[8, "dup_of"])
        assert bool(got.loc[1, "kept"]) and pd.isna(got.loc[1, "dup_of"])
        assert not bool(got.loc[2, "kept"]) and got.loc[2, "dup_of"] == 1
        assert bool(got.loc[3, "kept"])
        assert not bool(got.loc[4, "kept"]) and got.loc[4, "dup_of"] == 1
        assert bool(got.loc[5, "kept"])
        # post-eviction: X re-registered by doc 6; doc 7 collides with 6
        assert bool(got.loc[6, "kept"]) and pd.isna(got.loc[6, "dup_of"])
        assert not bool(got.loc[7, "kept"]) and got.loc[7, "dup_of"] == 6
        assert bool(got.loc[9, "kept"])

    def test_first_arrival_deterministic_across_arrow_chunks(self, spark,
                                                             tmp_path):
        """Same chunk-order hazard as the host-budget admission: the
        registering doc must be the (ts, doc_id)-earliest across ALL Arrow
        chunks of the micro-batch, not the first chunk's head."""
        from immich_geodata_zh_tw_spark.streaming.stateful import \
            neardup_verdicts

        inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old = spark.conf.get(key)
        try:
            spark.conf.set(key, "2")
            # 6 exact copies, LATEST ts first in write order; doc 105 (ts
            # 10:20) is the (ts, id)-earliest and must win every band
            rows = [(100 + i, f"2026-01-01 10:{25 - i:02d}:00", _TXT_X)
                    for i in range(6)]
            self._write(spark, inp, rows)
            self._run(spark, inp, out, ckpt)
            got = (neardup_verdicts(spark.read.parquet(out)).toPandas()
                   .sort_values("doc_id").set_index("doc_id"))
            assert bool(got.loc[105, "kept"])
            for d in (100, 101, 102, 103, 104):
                assert not bool(got.loc[d, "kept"])
                assert got.loc[d, "dup_of"] == 105
        finally:
            spark.conf.set(key, old)


def test_neardup_rejects_non_utc_session(spark, tmp_path):
    """The event-time TTL mixes kernel wall-times with the UTC watermark
    clock, so a non-UTC session must be rejected up front (a silent skew
    would mis-time eviction by the zone offset)."""
    import pytest

    from immich_geodata_zh_tw_spark.streaming.stateful import \
        streaming_neardup_flags

    inp = str(tmp_path / "in")
    pd.DataFrame({"doc_id": [1], "ts": [pd.Timestamp("2026-01-01")],
                  "text": ["x"]}).pipe(
        lambda p: spark.createDataFrame(p, schema=NEARDUP_DOCS_SCHEMA)
        .write.mode("append").parquet(inp))
    stream = spark.readStream.schema(NEARDUP_DOCS_SCHEMA).parquet(inp)
    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "America/Los_Angeles")
        with pytest.raises(ValueError, match="timeZone"):
            streaming_neardup_flags(stream)
    finally:
        spark.conf.set(key, old)
    streaming_neardup_flags(stream)  # UTC restored: constructs fine


def test_neardup_under_rocksdb_state_store(spark, tmp_path):
    """The production state story at crawl scale: RocksDB keeps stateful-op
    state on disk with bounded executor memory (the default HDFS-backed
    provider holds every live signature in memory).  The near-dup flags +
    rollup must behave identically under it — run the composed pipeline
    with the provider switched and check a same-batch duplicate verdict."""
    from immich_geodata_zh_tw_spark.streaming.pipeline import (
        NEARDUP_DOCS_SCHEMA, incremental_neardup)

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    try:
        spark.conf.set(key, "org.apache.spark.sql.execution.streaming."
                            "state.RocksDBStateStoreProvider")
        pdf = pd.DataFrame({
            "doc_id": [1, 2],
            "ts": pd.to_datetime(["2026-01-01 10:00:00",
                                  "2026-01-01 10:05:00"]),
            "text": [_TXT_X, _TXT_X],
        })
        (spark.createDataFrame(pdf, schema=NEARDUP_DOCS_SCHEMA)
         .write.mode("append").parquet(inp))
        q = incremental_neardup(spark, input_path=inp, output_path=outp,
                                checkpoint_path=ckpt)
        q.awaitTermination(120)
        got = (spark.read.parquet(outp).toPandas()
               .sort_values("doc_id").set_index("doc_id"))
        assert bool(got.loc[1, "kept"])
        assert not bool(got.loc[2, "kept"]) and got.loc[2, "dup_of"] == 1
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)

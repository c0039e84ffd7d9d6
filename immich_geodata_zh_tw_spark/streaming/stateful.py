"""Event-time streaming operators: watermarked windows + custom state.

The reference is batch-only (SURVEY.md §2.10), but a continuously-crawled
pages table is naturally a stream; these are the Structured-Streaming
counterparts of the batch operators the driver queries already verify:

* :func:`windowed_page_counts` — tumbling event-time window aggregation with
  a watermark: late pages beyond the watermark are DROPPED (bounded state),
  windows finalize exactly once in append mode — the streaming twin of the
  batch ``tumbling_window`` query;
* :func:`stateful_sessionize` — custom per-user session state via
  ``applyInPandasWithState`` (Arrow-batched, same no-row-at-a-time rule as
  everything else): sessions close after ``gap_sec`` of event-time silence
  or on processing-time timeout, emitting one row per closed session — the
  streaming twin of the batch ``sessionize`` query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StructField, StructType,
                               TimestampType, StringType)


def windowed_page_counts(stream: DataFrame, *, ts_col: str = "warc_ts",
                         window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time counts with late-data cutoff.

    Append output mode emits each window once, after the watermark passes its
    end — at 10^12-row scale the watermark bounds the state store to
    (watermark / window) live windows per key.
    """
    return (stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_pages"))
            .select(F.col("w.start").alias("window_start"), "n_pages"))


def streaming_exact_dedup(stream: DataFrame, *, content_col: str = "html",
                          ts_col: str = "warc_ts",
                          watermark: str = "24 hours",
                          key_out: str = "content_hash") -> DataFrame:
    """Streaming twin of the batch exact-dedup (``doc_exact_dedup``): keep
    the FIRST row per content hash seen within the watermark horizon — the
    recrawl-suppression shape of a continuously-ingested pages stream.

    ``dropDuplicatesWithinWatermark`` keys the state store on the 128-bit
    md5 only (never the payload) and EVICTS each key once the watermark
    passes its arrival time, so state is bounded by (ingest rate ×
    watermark), not by corpus history — the property that makes streaming
    dedup viable at 10^12-page scale where an unbounded ``dropDuplicates``
    state store would grow forever.  Exact-duplicate recrawls farther apart
    than the watermark are re-emitted (horizon dedup, not global dedup —
    global is the batch operator's job downstream).
    """
    hashed = stream.withColumn(
        key_out, F.md5(F.col(content_col).cast("binary")))
    return (hashed
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark([key_out]))


SESSION_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("n_events", IntegerType()),
    StructField("closed_by", StringType()),
])

SESSION_STATE = StructType([
    StructField("start_epoch", LongType()),
    StructField("last_epoch", LongType()),
    StructField("n_events", IntegerType()),
])


def _session_fn(gap_sec: int, timeout_sec: int | None):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, _last, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user_id],
                                "session_start": [pd.Timestamp(start, unit="s")],
                                "n_events": [n], "closed_by": ["timeout"]})
            return
        epochs = []
        for pdf in pdfs:
            epochs.extend((pdf["ts"].astype("int64") // 1_000_000_000).tolist())
        epochs.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for e in epochs:
            if start is None:
                start, last, n = e, e, 1
            elif e - last > gap_sec:
                closed.append((start, n))
                start, last, n = e, e, 1
            else:
                last, n = e, n + 1
        state.update((int(start), int(last), int(n)))
        if timeout_sec is not None:
            state.setTimeoutDuration(timeout_sec * 1000)
        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="s") for s, _ in closed],
                "n_events": [c for _, c in closed],
                "closed_by": ["gap"] * len(closed),
            })
    return fn


def stateful_sessionize(stream: DataFrame, *, gap_sec: int = 1800,
                        timeout_sec: int | None = None) -> DataFrame:
    """Custom stateful sessionization over a stream of (user_id, ts) events.

    One state row per live user (bounded); a session closes when a newer
    event arrives past ``gap_sec`` of EVENT time (emitted with
    ``closed_by='gap'``) or — when ``timeout_sec`` is set — after that much
    PROCESSING time with no events (``'timeout'``, flushing idle users'
    trailing sessions).  Tests pin the deterministic gap path;
    processing-time timeouts are inherently wall-clock-dependent.
    """
    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if timeout_sec is not None else GroupStateTimeout.NoTimeout)
    return (stream
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_fn(gap_sec, timeout_sec),
                outputStructType=SESSION_OUTPUT,
                stateStructType=SESSION_STATE,
                outputMode="append",
                timeoutConf=timeout_conf))


BUDGET_OUTPUT = StructType([
    StructField("host", StringType()),
    StructField("doc_id", LongType()),
    StructField("admit_seq", IntegerType()),
])

BUDGET_STATE = StructType([
    StructField("n_admitted", IntegerType()),
])


def _budget_fn(cap: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        (host,) = key
        n = state.get[0] if state.exists else 0
        # a group's micro-batch arrives as SEVERAL Arrow chunks (split at
        # maxRecordsPerBatch / by upstream partitions) in no guaranteed
        # order; sorting per-chunk would admit greedily by chunk and break
        # the (ts, doc_id) contract — keep only the running best ≤ remaining
        # docs across chunks, then emit once (bounded memory: ≤ cap rows
        # held, never the whole batch)
        remaining = cap - n
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if remaining <= 0:
                continue  # keep draining the Arrow batches; admit nothing
            part = pdf[["ts", "doc_id"]]
            best = part if best is None else pd.concat((best, part))
            best = (best.sort_values(["ts", "doc_id"], kind="mergesort")
                    .head(remaining))
        if best is not None and len(best):
            seqs = list(range(n + 1, n + 1 + len(best)))
            n += len(best)
            yield pd.DataFrame({
                "host": [host] * len(best),
                "doc_id": best["doc_id"].astype("int64").tolist(),
                "admit_seq": seqs,
            })
        state.update((int(n),))
    return fn


def streaming_host_budget(stream: DataFrame, *, cap: int,
                          host_col: str = "host") -> DataFrame:
    """Streaming twin of the batch per-host cap (``sample.domain_cap``):
    ADMISSION CONTROL on a continuously-crawled stream — the first ``cap``
    docs per host (arrival order across micro-batches; (ts, doc_id) order
    within a batch, deterministic) are admitted with a 1-based
    ``admit_seq``; everything after is dropped at ingest, so a crawler
    trap or mega-host can't flood the downstream pipeline.

    Semantics note: this is first-come-first-admitted — the online
    analogue; the authoritative quality-RANKED cap over the full corpus is
    the batch operator (``domain_cap``), run downstream.  State is ONE
    int per host ever seen (8-byte counter; bounded by |hosts|, not by
    pages — a state-store row count a 10^12-page crawl sustains).  The
    input must carry ``host``, ``doc_id``, ``ts`` columns.
    """
    return (stream
            .groupBy(F.col(host_col).alias("host"))
            .applyInPandasWithState(
                _budget_fn(cap),
                outputStructType=BUDGET_OUTPUT,
                stateStructType=BUDGET_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))

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
  streaming twin of the batch ``sessionize`` query;
* :func:`streaming_neardup_flags` — per-band-signature MinHash-LSH state
  with event-time TTL eviction: the streaming twin of the batch near-dup
  pipeline (horizon near-dedup of lightly-edited recrawls), rolled up per
  doc by :func:`neardup_verdicts` inside ``foreachBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StructField, StructType, TimestampType,
                               StringType)


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


NEARDUP_OUTPUT = StructType([
    StructField("doc_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("band_idx", IntegerType()),
    StructField("sig", StringType()),
    StructField("first_id", LongType()),
    StructField("collided", BooleanType()),
])

NEARDUP_STATE = StructType([
    StructField("first_id", LongType()),
    StructField("last_epoch_ms", LongType()),
])


def _neardup_fn(horizon_ms: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        band_idx, sig = key
        if state.hasTimedOut:
            # watermark passed last-seen + horizon: forget this signature —
            # the eviction that keeps state bounded by the horizon window
            state.remove()
            return
        # a group's micro-batch arrives as several Arrow chunks in no
        # guaranteed order (same hazard as _budget_fn): collect, then one
        # stable (ts, doc_id) sort fixes the first-arrival winner
        # deterministically.  Bucket populations are band-hash bucket
        # sizes — the same dimension-bounded quantity the batch LSH join
        # shuffles per (band, sig) key — so the concat is small by the
        # same argument, not corpus-sized.
        parts = [pdf[["doc_id", "ts"]] for pdf in pdfs]
        rows = (pd.concat(parts).sort_values(["ts", "doc_id"], kind="mergesort")
                if parts else None)
        if rows is None or not len(rows):
            return
        first_id, last_ms = state.get if state.exists else (None, None)
        ms = rows["ts"].astype("int64") // 1_000_000
        ids = rows["doc_id"].astype("int64")
        if first_id is None:
            # head row registers the signature; everything after it in
            # (ts, doc_id) order collides with it — vectorized: only the
            # head is non-collided
            first_id = int(ids.iloc[0])
            collided = [False] + [True] * (len(rows) - 1)
        else:
            collided = [True] * len(rows)
        last_ms = max(int(ms.max()), last_ms or 0)
        state.update((int(first_id), int(last_ms)))
        # event-time TTL: must stay ahead of the current watermark or the
        # state store rejects the timestamp (a signature last seen before
        # watermark - horizon would otherwise set a timeout in the past)
        state.setTimeoutTimestamp(max(last_ms + horizon_ms,
                                      state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame({
            "doc_id": ids.tolist(),
            "ts": rows["ts"].tolist(),
            "band_idx": [int(band_idx)] * len(rows),
            "sig": [sig] * len(rows),
            "first_id": [int(first_id)] * len(rows),
            "collided": collided,
        })
    return fn


def streaming_neardup_flags(stream: DataFrame, *, id_col: str = "doc_id",
                            text_col: str = "text", ts_col: str = "ts",
                            watermark: str = "1 hour",
                            horizon: str = "24 hours",
                            n_bands: int = 4, shingle: int = 5) -> DataFrame:
    """Streaming NEAR-dup suppression flags — the streaming twin of the
    batch MinHash-LSH pipeline (``dedup.minhash_candidate_pairs``), the way
    :func:`streaming_exact_dedup` twins ``doc_exact_dedup``: a freshly
    crawled page whose MinHash BAND signature was already seen within the
    ``horizon`` is flagged as a near-dup of the first doc that registered
    that signature (recrawl/boilerplate suppression of lightly-edited
    pages, which exact hashing misses).

    Shape: the SAME Arrow signature kernel as batch
    (``dedup.minhash_bands_udf`` — bit-identical signatures, so batch and
    streaming agree on what collides) → posexplode to (band_idx, sig) →
    per-signature ``applyInPandasWithState``.  One state row per DISTINCT
    band signature seen within the horizon, holding only (first_id,
    last_seen_ms) — 16 bytes; an event-time timeout EVICTS a signature
    once the watermark passes last-seen + ``horizon``, so state is bounded
    by (distinct-signature ingest rate × horizon), never by crawl history —
    same boundedness argument as :func:`streaming_exact_dedup`.  Eviction
    fires in the first batch after expiry in which the signature receives
    no data (flatMapGroupsWithState timeout semantics); a recrawl landing
    in that exact batch still collides — conservative in the safe
    direction (an extra flag, never a missed eviction keeping state
    unbounded, since arrivals re-arm the TTL anyway).

    Output: one row per (doc, band): ``collided`` = this band's signature
    was registered by an earlier doc (within-batch earliness = (ts, id)
    order, deterministic); ``first_id`` = the registering doc.  All of a
    doc's bands ride the same micro-batch (they derive from one input
    row), so the per-doc verdict is complete within every batch — roll up
    with :func:`neardup_verdicts` inside ``foreachBatch`` (chaining a
    second stateful/agg stage after ``applyInPandasWithState`` in one
    streaming query is unsupported; ``foreachBatch`` is the engine's
    standard composition point, streaming/pipeline.py).  Docs with NULL
    text have no dedup signal: they bypass the stateful stage on a
    stateless union branch as ``collided=false`` rows with null
    band_idx/sig, so the per-doc rollup still emits them as kept (a
    composed pipeline must never silently drop documents).  A flagged doc
    still registers its OWN fresh signatures, so each successive edit in
    a chain is flagged too — but ``first_id`` points ONE hop back (the
    registering doc of the collided signature), not to the chain root;
    the authoritative connected-component collapse is the batch
    clustering operator (``dedup.minhash_clusters``), run downstream.

    Event-time contract: the TTL compares the rows' epoch against Spark's
    UTC watermark clock, so the session timezone MUST be UTC (the session
    factory pins ``spark.sql.session.timeZone=UTC``; a non-UTC session
    would skew eviction by the zone offset) — enforced here.

    State-store sizing: the default HDFS-backed provider keeps every live
    signature in executor MEMORY; at crawl scale set
    ``spark.sql.streaming.stateStore.providerClass`` to Spark's built-in
    ``RocksDBStateStoreProvider`` (disk-backed, bounded memory) — the
    operator is provider-agnostic and is tested under both.
    """
    from ..operators.dedup import minhash_bands_udf

    tz = stream.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00"):
        raise ValueError(
            f"streaming_neardup_flags requires spark.sql.session.timeZone="
            f"UTC (got {tz!r}): applyInPandasWithState delivers session-"
            f"zone wall times while the eviction watermark is UTC epoch")
    horizon_ms = _interval_ms(horizon)
    wm = stream.withWatermark(ts_col, watermark)
    # posexplode_OUTER + null-sig filter on purpose — plain explode makes
    # Catalyst infer a size(arr) > 0 pre-Generate filter that re-evaluates
    # the Python UDF a second time per row (measured; see the batch twin
    # dedup._bands_frame).  The kernel emits None only for null TEXT,
    # never null elements, so the null-band rows the outer variant adds
    # are exactly the null-text docs, dropped here and re-emitted kept on
    # the stateless branch below.
    bands = (wm.select(F.col(id_col).alias("doc_id"),
                       F.col(ts_col).alias("ts"),
                       minhash_bands_udf(n_bands=n_bands, shingle=shingle)(
                           F.col(text_col)).alias("__bands"))
             .select("doc_id", "ts",
                     F.posexplode_outer("__bands").alias("band_idx", "sig"))
             .filter(F.col("sig").isNotNull()))
    flagged = (bands
               .groupBy("band_idx", "sig")
               .applyInPandasWithState(
                   _neardup_fn(horizon_ms),
                   outputStructType=NEARDUP_OUTPUT,
                   stateStructType=NEARDUP_STATE,
                   outputMode="append",
                   timeoutConf=GroupStateTimeout.EventTimeTimeout))
    # stateless pass-through for null-text docs (no UDF re-run: the kernel
    # returns null bands exactly when text is null)
    passthrough = (wm.filter(F.col(text_col).isNull())
                   .select(F.col(id_col).alias("doc_id"),
                           F.col(ts_col).alias("ts"),
                           F.lit(None).cast("int").alias("band_idx"),
                           F.lit(None).cast("string").alias("sig"),
                           F.lit(None).cast("long").alias("first_id"),
                           F.lit(False).alias("collided")))
    return flagged.unionByName(passthrough)


def neardup_verdicts(band_flags: DataFrame, *,
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc rollup of :func:`streaming_neardup_flags` output (a plain
    batch aggregation — run it inside ``foreachBatch``, where every doc's
    band rows are complete): ``kept`` = no band collided; ``dup_of`` = the
    smallest registering doc id over the collided bands (deterministic
    tie-break, same min-id convention as the batch dedup family)."""
    return (band_flags
            .groupBy(F.col(id_col))
            .agg(F.max("collided").alias("__dup"),
                 F.min(F.when(F.col("collided"),
                              F.col("first_id"))).alias("dup_of"))
            .select(id_col, (~F.col("__dup")).alias("kept"), "dup_of"))


def _interval_ms(interval: str) -> int:
    """'24 hours' / '90 minutes' / '10 seconds' → milliseconds (the tiny
    subset of interval syntax the ``horizon`` parameter accepts —
    compound forms like '1 day 12 hours' are rejected with a usable
    message, unlike a bare unpacking error)."""
    parts = interval.split()
    mult = {"second": 1_000, "seconds": 1_000, "minute": 60_000,
            "minutes": 60_000, "hour": 3_600_000, "hours": 3_600_000,
            "day": 86_400_000, "days": 86_400_000}
    if len(parts) != 2 or parts[1] not in mult or not parts[0].isdigit():
        raise ValueError(
            f"horizon must be '<n> <unit>' with unit in {sorted(set(mult))}"
            f" (got {interval!r}; compound intervals are not supported "
            f"here — pass a single quantity)")
    return int(parts[0]) * mult[parts[1]]

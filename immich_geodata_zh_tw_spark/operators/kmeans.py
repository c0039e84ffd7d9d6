"""Distributed Lloyd k-means over a DataFrame corpus — integer-exact.

The ANN stack's quantizers (IVF cells `operators/similarity.py:ivf_topk`,
SemDeDup cells `semantic_dedup`, PQ codebooks `pq_codebooks`) are trained
by `similarity.kmeans_centroids` on a bounded driver-side sample — the
standard practice, but at 100 TB the *refinement over the full corpus*
must itself be a Spark job: every row votes on its cell, every update is
a map-side-combined aggregate.  This module is that job.

Exactness discipline — the micro-unit trick (`operators/ngram_lm.py`
micro-nats, `operators/linkgraph.py` micro-mass) applied to vector space:

* every vector component quantizes ONCE to BIGINT micro-units
  (``floor(x·quant + 0.5)``), then shifts by a positive ``bias`` so all
  later arithmetic stays non-negative (Spark ``div`` and DuckDB ``//``
  agree only there);
* distances are exact int64 sums of squared component diffs (the bias
  cancels in differences);
* the centroid update is the half-up integer mean, computed as
  ``s div n + (1 if 2·(s mod n) ≥ n else 0)`` — the quotient/remainder
  form never doubles the component sum ``s``, so the int64 headroom is
  set by ``s`` itself, not ``2·s`` (the first-cut ``(2·s + n) div (2·n)``
  halved it).  No float ever touches the recurrence, so a
  fixed-iteration run is **bit-identical at any partitioning, core
  count, batch size, or engine**, and the whole recurrence unrolls into
  a SQL oracle (`plans/driver_queries.py` embed_ann_ivf kmeans
  branches).

Per iteration: ONE corpus scan — an Arrow argmin kernel against the k×d
broadcast centroid matrix (the corpus never shuffles; only ≤k partial-agg
rows per task do) → a (d+2)-expression hash aggregate to ≤k rows.  The
k×d update collect is the textbook bounded driver action of iterative
k-means (k quantizer rows, not |corpus|).  Empty cells keep their
previous centroid (deterministic; exercised in tests and the oracle).

Overflow headroom (int64): with ``quant=1e6`` and ``bound=8``, biased
components ≤ 1.6e7, per-row distance ≤ d·(2·1.6e7)² ≈ 6.6e16·(d/64), and
a cell's component sum stays exact below ~5.7e11 member rows (the mean
formula above never forms ``2·s``, so the sum itself is the binding
term); per-cell inertia is emitted in //1000 units for the same reason.  Raise ``bound``
(or lower ``quant``) for wider-range embeddings — the knobs trade
precision for row-count headroom, both documented at the call sites.

Reference parity: the reference trains no quantizer (single-node
GeoPandas ETL, no ANN) — this is LLM-pipeline scope (SemDeDup §3.1 /
IVF coarse-quantizer training), per the driver's training-data mandate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000
BOUND = 8  # |component| values above this would break the bias shift


def _bias(quant: int, bound: int) -> int:
    return quant * bound


def quantize_sql(vec_col: str, *, quant: int = QUANT, bound: int = BOUND,
                 dialect: str = "spark") -> str:
    """Shared quantization expression: float vector → biased BIGINT
    micro-units.  Both engines evaluate the identical double-precision
    ``x·quant + 0.5`` before ``floor``, so the int is bit-identical."""
    b = _bias(quant, bound)
    if dialect == "spark":
        return (f"transform({vec_col}, x -> floor(CAST(x AS DOUBLE) "
                f"* {quant}.0D + 0.5D) + {b}L)")
    return (f"list_transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) "
            f"* {quant}.0 + 0.5) AS BIGINT) + {b})")


def quantize_centroids(cents: np.ndarray, *, quant: int = QUANT,
                       bound: int = BOUND) -> np.ndarray:
    """Driver-side twin of `quantize_sql` for float init centroids."""
    b = _bias(quant, bound)
    return (np.floor(np.asarray(cents, dtype=np.float64) * float(quant)
                     + 0.5).astype(np.int64) + b)


def _blas_exact_ok(d: int, quant: int, bound: int) -> bool:
    """True when every x·c / |x|² / |c|² term (≤ d·(quant·bound)²) is an
    exactly-representable float64 integer, including all partial sums."""
    return d * (quant * bound) ** 2 < 2 ** 53


def _dist_batch(x_unbiased: np.ndarray, cu: np.ndarray, cc: np.ndarray,
                *, blas: bool) -> np.ndarray:
    """Exact int64 squared-L2 matrix between unbiased int64 rows and
    centroids.  ``blas=True`` (caller must have checked `_blas_exact_ok`)
    routes ONLY the matmul and row-norms through float64 BLAS — each
    result is an exact integer < 2^53, converted back losslessly — and
    assembles the (up to 4·d·m²) distance in int64."""
    if blas:
        xf, cf = x_unbiased.astype(np.float64), cu.astype(np.float64)
        xx = (xf * xf).sum(axis=1, keepdims=True).astype(np.int64)
        xc = (xf @ cf.T).astype(np.int64)
        return xx - 2 * xc + cc
    return ((x_unbiased * x_unbiased).sum(axis=1, keepdims=True)
            - 2 * (x_unbiased @ cu.T) + cc)


def _partial_kernel(cents_biased: np.ndarray, quant: int, bound: int):
    """mapInArrow kernel: one Arrow pass that quantizes, assigns (exact
    squared-L2 argmin; ties → smallest cid, matching the oracle's
    ``ORDER BY dist, cid``) AND partial-combines — emitting per batch at
    most k rows ``(cid, n, inertia_k, s: array<long>)`` of exact int64
    accumulators.  The corpus never crosses back into the JVM: the first
    update_agg shape shipped the quantized vectors to a JVM hash
    aggregate and paid the whole return trip; partial-combining inside
    the batch removes it.

    Zero-copy ingest: the vector column's flat Arrow values buffer views
    straight into a (n, d) float matrix — no ``tolist()``.  The first
    (pandas) kernel converted every batch through a Python list-of-lists:
    ~0.6 M float objects / ~20 MB of pymalloc arenas mmap'd and munmap'd
    PER 10 k-row batch, which at 32 workers burned ~1/3 of the job's CPU
    in kernel mode (sys_frac 0.33-0.38 on a MEASURED-idle host — two
    recordings had mis-attributed that to ambient storms; a calm-window
    A/B pinned it to the kernel itself).  Batches with NULL vector rows
    fall back to an object path that SKIPS those rows (a null vector has
    no cell — same rows a pre-filter would drop, without forcing callers
    to add one); a row whose list length ≠ d raises ValueError — a
    misaligned reshape would silently corrupt every centroid, so ragged
    corpora must fail loudly.  The zero-copy gate verifies uniform row
    length via ``list_value_length`` min==max==d, not just the flat
    length: lengths that merely SUM to n·d (one row short, another long)
    would otherwise pass and misalign the whole batch.

    Scratch reuse: all O(n·d) / O(n·k) intermediates live in grow-only
    buffers reused across batches (``out=`` ufuncs + unsafe ``copyto``
    casts of already-integral floats — truncation ≡ ``astype`` here, so
    values are bit-identical; every elementwise order is exact-integer
    under the same 2^53 gate as the matmul).  Rationale, measured on the
    32-worker 4N leg: the naive chain allocated ~55 MB of temporaries
    per batch through malloc, and the resulting page churn was the
    round's misdiagnosed "ambient storm" — an A/B with
    ``ARROW_DEFAULT_MEMORY_POOL=system`` made the storm *persistent*
    (sys_frac ~0.5 both reps) while the default caching pool decayed to
    ~0.2 by rep 2, proving the kernel-time storm is self-induced
    allocator traffic, not the host.  Buffer reuse removes it at the
    source, at any executor count.

    Distance fast path (the default knobs qualify): after subtracting
    the bias (which cancels in distances anyway), every unbiased
    component is ≤ quant·bound =: m, so every x·c partial sum is
    ≤ d·m² — when that stays under 2^53 the MATMUL runs in float64 BLAS
    with every intermediate an exactly-representable integer, converts
    back to int64 exactly, and the three-term assembly ``|x|² − 2x·c +
    |c|²`` happens in int64 (the assembled distance reaches 4·d·m²,
    which can exceed 2^53 even when each term does not — caught by the
    bound-extremes test).  Outside the gate: full int64 matmul.
    Accumulation is ``np.add.at`` on int64 — exact and order-free, so
    partials commute across any batching/partitioning."""
    import pyarrow as pa
    import pyarrow.compute as pc

    b = _bias(quant, bound)
    cu = np.ascontiguousarray(cents_biased, dtype=np.int64) - b
    k, d = cu.shape
    blas = _blas_exact_ok(d, quant, bound)
    cc = (cu * cu).sum(axis=1)

    cf_t = np.ascontiguousarray(cu.astype(np.float64).T)  # (d, k), once

    def part(batches):
        cap = 0
        f = xi = xc = dist = cid_b = None
        for batch in batches:
            nr = batch.num_rows
            if not nr:  # empty Arrow batch (the pq_adc_topk lesson)
                continue
            if nr > cap:  # grow-only scratch, views sliced per batch
                cap = nr
                f = np.empty((cap, d), dtype=np.float64)
                xi = np.empty((cap, d), dtype=np.int64)
                xc = np.empty((cap, k), dtype=np.float64)
                dist = np.empty((cap, k), dtype=np.int64)
                cid_b = np.empty(cap, dtype=np.intp)
            col = batch.column(0)
            flat = col.flatten()  # offset-aware: sliced batches stay correct
            lens = pc.min_max(pc.list_value_length(col))
            if col.null_count == 0 and flat.null_count == 0 \
                    and len(flat) == nr * d \
                    and lens["min"].as_py() == d == lens["max"].as_py():
                # zero-copy flat buffer → widen INTO the float64 scratch
                # FIRST (copyto, exact), THEN multiply in place: a mixed
                # multiply(float32, pyfloat, out=f64) would run the
                # float32 loop (value-based casting) and change the
                # quantization of float32 corpora — caught by the
                # result-plan reference test.  The min/max length check
                # rejects ragged batches whose lengths merely sum to n·d.
                m = nr
                vf = flat.to_numpy(zero_copy_only=False).reshape(nr, d)
                np.copyto(f[:m], vf)
            else:  # NULL rows skipped; wrong-length rows fail loudly
                vals = [v for v in col.to_pylist() if v is not None]
                ragged = sorted({len(v) for v in vals} - {d})
                if ragged:
                    raise ValueError(
                        f"kmeans vector column: expected length-{d} "
                        f"vectors, got row lengths {ragged}")
                m = len(vals)
                if not m:
                    continue
                np.copyto(f[:m], np.asarray(vals, dtype=np.float64))
            fv, xv = f[:m], xi[:m]
            fv *= float(quant)
            np.add(fv, 0.5, out=fv)
            np.floor(fv, out=fv)  # fv: exactly-integral floats (unbiased·q)
            np.copyto(xv, fv, casting="unsafe")  # trunc ≡ astype, exact
            if blas:
                # fv already holds the exact integral floats the gated
                # float64 path needs — no astype copy
                xx = np.einsum("ij,ij->i", fv, fv)  # each partial < 2^53
                np.matmul(fv, cf_t, out=xc[:m])
                dv = dist[:m]
                np.copyto(dv, xc[:m], casting="unsafe")  # exact ints
                dv *= -2
                dv += cc  # broadcasts (k,)
                dv += xx.astype(np.int64)[:, None]
            else:
                dv = _dist_batch(xv, cu, cc, blas=False)
            cid = np.argmin(dv, axis=1, out=cid_b[:m])  # first min = min cid
            dmin = np.take_along_axis(dv, cid[:, None], axis=1)[:, 0]
            n = np.bincount(cid, minlength=k)
            ik = np.zeros(k, dtype=np.int64)
            np.add.at(ik, cid, dmin // 1000)
            s = np.zeros((k, d), dtype=np.int64)
            np.add.at(s, cid, xv)
            hit = np.flatnonzero(n)
            s_hit = s[hit] + (n[hit] * b)[:, None]  # + n·bias ≡ Σ(x + b)
            offs = np.arange(len(hit) + 1, dtype=np.int32) * d
            yield pa.RecordBatch.from_arrays(
                [pa.array(hit.astype(np.int32)),
                 pa.array(n[hit].astype(np.int64)),
                 pa.array(ik[hit]),
                 pa.ListArray.from_arrays(pa.array(offs),
                                          pa.array(s_hit.ravel()))],
                names=["cid", "n", "inertia_k", "s"])

    return part


def update_agg(df: DataFrame, cents_biased: np.ndarray, *,
               vec_col: str = "embedding", quant: int = QUANT,
               bound: int = BOUND) -> DataFrame:
    """One Lloyd update as a PLAN: ONE mapInArrow corpus pass
    (quantize + assign + per-batch partial combine, `_partial_kernel`)
    emitting ≤k rows per Arrow batch, then a JVM hash-aggregate of the
    partials to ≤k rows ``(cid, n, inertia_k, s_0..s_{d-1})`` — counts,
    //1000-unit exact inertia, and exact biased component sums.  No
    corpus shuffle and no corpus return trip to the JVM; only
    k-bounded partial rows move."""
    d = cents_biased.shape[1]
    part = df.select(vec_col).mapInArrow(
        _partial_kernel(cents_biased, quant, bound),
        "cid int, n long, inertia_k long, s array<long>")
    # coalesce: mapInPandas output fields are nullable by schema, so a
    # later outer join on cid infers an isnotnull(cid) filter and pushes
    # it below this aggregate, re-planning the kernel a second time just
    # to test a field that is never null.  A non-nullable key folds that
    # inferred filter to true (pinned by test_kmeans plan-shape test).
    part = part.withColumn("cid", F.coalesce(F.col("cid"), F.lit(-1)))
    return part.groupBy("cid").agg(
        F.sum("n").alias("n"),
        F.sum("inertia_k").alias("inertia_k"),
        *[F.sum(F.element_at("s", i + 1)).alias(f"s{i}")
          for i in range(d)])


def halfup_mean_sql(s: str, n: str, *, dialect: str = "spark") -> str:
    """Half-up integer mean of non-negative ``s`` over ``n`` > 0 as SQL,
    in the overflow-free quotient/remainder form: ``2·(s mod n)`` is
    < 2·n, so the expression never exceeds ``s`` — unlike the naive
    ``(2·s + n) div (2·n)``, whose doubled sum silently wraps int64 at
    HALF the documented row-count headroom (Spark's non-ANSI ``*``
    wraps; DuckDB escapes only because its sum() is HUGEINT).  Both
    dialects produce the identical BIGINT."""
    div = "div" if dialect == "spark" else "//"
    return (f"({s} {div} {n} + (CASE WHEN 2 * ({s} % {n}) >= {n} "
            f"THEN 1 ELSE 0 END))")


def _halfup_mean(s: int, n: int) -> int:
    """Python twin of `halfup_mean_sql` (exact, arbitrary precision)."""
    q, rem = divmod(s, n)
    return q + (1 if 2 * rem >= n else 0)


def _step(prev_biased: np.ndarray, rows) -> np.ndarray:
    """Fold collected update rows into the next biased centroid matrix;
    cells with no members keep their previous centroid."""
    d = prev_biased.shape[1]
    nxt = prev_biased.copy()
    for r in rows:
        n = int(r["n"])
        nxt[int(r["cid"])] = [_halfup_mean(int(r[f"s{i}"]), n)
                              for i in range(d)]
    return nxt


def kmeans_fit(df: DataFrame, init_cents: np.ndarray, *,
               vec_col: str = "embedding", iters: int = 2,
               quant: int = QUANT, bound: int = BOUND) -> np.ndarray:
    """Run ``iters`` full distributed Lloyd updates from float init
    centroids; returns the final BIASED int64 centroid matrix (subtract
    ``quant*bound`` for micro-units, divide by ``quant`` for floats).
    One Spark job + one ≤k-row collect per iteration."""
    cents = quantize_centroids(init_cents, quant=quant, bound=bound)
    for _ in range(iters):
        rows = update_agg(df, cents, vec_col=vec_col, quant=quant,
                          bound=bound).collect()
        cents = _step(cents, rows)
    return cents


def kmeans_result_plan(df: DataFrame, cents_biased: np.ndarray, *,
                       vec_col: str = "embedding", quant: int = QUANT,
                       bound: int = BOUND) -> DataFrame:
    """One MORE Lloyd update, entirely in-plan, emitted long-form:

    ``(op, cid, comp, val)`` — ``km_centroid`` rows carry the updated
    UNBIASED micro-unit component values (one per (cid, comp), empty
    cells keep the previous centroid), ``km_size`` the member counts
    (0 for empty cells), ``km_inertia_k`` the per-cell exact //1000-unit
    inertia w.r.t. the assignment centroids (0 for empty cells).

    Shape: the `update_agg` scan/aggregate → LEFT JOIN from a k-row
    literal frame (so empty cells surface) → ONE struct-array explode to
    k·(d+2) rows.  The corpus subtree is referenced exactly once."""
    k, d = cents_biased.shape
    b = _bias(quant, bound)
    spark = df.sparkSession
    agg = update_agg(df, cents_biased, vec_col=vec_col, quant=quant,
                     bound=bound)
    from ..session import local_dim_df

    # k-row driver literal: one partition, so each scan schedules one
    # task instead of defaultParallelism Python-worker round-trips
    prev = local_dim_df(
        spark,
        [(int(i), [int(v) for v in cents_biased[i]]) for i in range(k)],
        "cid int, prev array<bigint>")
    full = prev.join(agg, "cid", "left")
    items = [F.struct(
        F.lit("km_centroid").alias("op"), F.lit(i + 1).alias("comp"),
        F.coalesce(
            F.expr(halfup_mean_sql(f"s{i}", "n")),
            F.element_at("prev", i + 1)).alias("val")) for i in range(d)]
    items.append(F.struct(F.lit("km_size").alias("op"),
                          F.lit(-1).alias("comp"),
                          F.coalesce(F.col("n"), F.lit(0)).alias("val")))
    items.append(F.struct(F.lit("km_inertia_k").alias("op"),
                          F.lit(-1).alias("comp"),
                          F.coalesce(F.col("inertia_k"),
                                     F.lit(0)).alias("val")))
    out = (full.select(F.col("cid").cast("long").alias("cid"),
                       F.explode(F.array(*items)).alias("e"))
           .select("e.op", "cid", F.col("e.comp").cast("long").alias("comp"),
                   F.when(F.col("e.op") == "km_centroid",
                          F.col("e.val") - b)
                   .otherwise(F.col("e.val")).alias("val")))
    return out

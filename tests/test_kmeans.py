"""Distributed integer-exact Lloyd k-means (`operators/kmeans.py`).

Exactness gates: the Spark job must be BIT-IDENTICAL to a brute-force
integer reference at every iteration depth and partitioning (the module's
whole contract is order-freeness), empty cells must keep their previous
centroid, and the plan must touch the corpus exactly once per update.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from immich_geodata_zh_tw_spark.operators import kmeans


def _ref_quantize(x, quant, bound):
    b = quant * bound
    return (np.floor(np.asarray(x, dtype=np.float64) * float(quant) + 0.5)
            .astype(np.int64) + b)


def _ref_fit(X, init, iters, *, quant=kmeans.QUANT, bound=kmeans.BOUND):
    """Brute-force integer Lloyd reference (biased int64 end-to-end)."""
    xq = _ref_quantize(X, quant, bound)
    c = _ref_quantize(init, quant, bound)
    for _ in range(iters):
        d = ((xq[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d, axis=1)
        nxt = c.copy()
        for j in range(len(c)):
            m = a == j
            if m.any():
                s, n = xq[m].sum(0), int(m.sum())
                nxt[j] = (2 * s + n) // (2 * n)
        c = nxt
    return c


def _ref_result(X, c_biased, *, quant=kmeans.QUANT, bound=kmeans.BOUND):
    """Reference rows for `kmeans_result_plan`: one more update, long-form."""
    b = quant * bound
    xq = _ref_quantize(X, quant, bound)
    c = np.asarray(c_biased, dtype=np.int64)
    d = ((xq[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    a = np.argmin(d, axis=1)
    dmin = d[np.arange(len(xq)), a]
    rows = {}
    for j in range(len(c)):
        m = a == j
        if m.any():
            s, n = xq[m].sum(0), int(m.sum())
            cv = (2 * s + n) // (2 * n)
            inertia = int((dmin[m] // 1000).sum())
        else:
            cv, n, inertia = c[j], 0, 0
        for i in range(c.shape[1]):
            rows[("km_centroid", j, i + 1)] = int(cv[i]) - b
        rows[("km_size", j, -1)] = n
        rows[("km_inertia_k", j, -1)] = inertia
    return rows


def _toy(seed=7, n=120, d=6):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 0.3, size=(n, d)).clip(-7.9, 7.9)
    init = X[:: max(1, n // 4)][:4]
    return X, init


@pytest.fixture(scope="module")
def toy_df(spark):
    X, _ = _toy()
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>")
    # float32 round-trip: the reference must see the SAME float32 values
    return df


def _as_f32(X):
    return np.asarray(X, dtype=np.float32).astype(np.float64)


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_fit_matches_integer_reference(spark, toy_df, iters):
    X, init = _toy()
    got = kmeans.kmeans_fit(toy_df, init, iters=iters)
    want = _ref_fit(_as_f32(X), init, iters)
    np.testing.assert_array_equal(got, want)


def test_fit_partition_invariant(spark, toy_df):
    X, init = _toy()
    a = kmeans.kmeans_fit(toy_df.repartition(1), init, iters=2)
    b = kmeans.kmeans_fit(toy_df.repartition(7), init, iters=2)
    np.testing.assert_array_equal(a, b)


def test_result_plan_matches_reference_and_empty_cell(spark, toy_df):
    X, init = _toy()
    # plant a far-away centroid that captures nothing: empty-cell path
    init = np.vstack([init, np.full((1, X.shape[1]), 7.5)])
    c1 = kmeans.kmeans_fit(toy_df, init, iters=1)
    got = {(r["op"], r["cid"], r["comp"]): r["val"]
           for r in kmeans.kmeans_result_plan(toy_df, c1).collect()}
    want = _ref_result(_as_f32(X), c1)
    assert got == want
    # the planted far centroid is genuinely empty and kept verbatim
    k_far = init.shape[0] - 1
    assert got[("km_size", k_far, -1)] == 0
    b = kmeans.QUANT * kmeans.BOUND
    kept = [got[("km_centroid", k_far, i + 1)] for i in range(X.shape[1])]
    assert kept == [int(v) - b for v in c1[k_far]]


def test_result_plan_partition_invariant(spark, toy_df):
    X, init = _toy()
    c1 = kmeans.kmeans_fit(toy_df, init, iters=1)
    a = sorted(map(tuple, kmeans.kmeans_result_plan(
        toy_df.repartition(1), c1).collect()))
    b = sorted(map(tuple, kmeans.kmeans_result_plan(
        toy_df.repartition(5), c1).collect()))
    assert a == b


def test_blas_path_exact_at_bound_extremes(spark):
    """The float64-BLAS assignment path must equal int64 math at the
    WORST representable magnitudes (every component at ±quant·bound,
    partial sums at the documented < 2^53 ceiling).  The reference-match
    tests already cover it on typical data (the int reference is pure
    int64); this pins the adversarial envelope."""
    rng = np.random.default_rng(3)
    d = 64
    m = kmeans.QUANT * kmeans.BOUND
    X = rng.choice([-8.0, 8.0, 7.999999, -7.999999], size=(64, d))
    init = rng.choice([-8.0, 8.0], size=(5, d))
    xq = (np.floor(X.astype(np.float32).astype(np.float64)
                   * kmeans.QUANT + 0.5).astype(np.int64))
    cu = kmeans.quantize_centroids(init) - m
    assert np.abs(xq).max() <= m and np.abs(cu).max() <= m
    cc = (cu * cu).sum(axis=1)
    di = kmeans._dist_batch(xq, cu, cc, blas=False)
    # the assembled distance genuinely exceeds float64's exact-integer
    # range at the extremes — a naive all-float path WOULD be wrong here
    assert di.max() > 2 ** 53
    db = kmeans._dist_batch(xq, cu, cc, blas=True)
    np.testing.assert_array_equal(di, db)
    assert kmeans._blas_exact_ok(d, kmeans.QUANT, kmeans.BOUND)


def test_null_vector_rows_are_skipped(spark, toy_df):
    """A NULL embedding row has no cell: the kernel must skip it and
    produce the exact result of the corpus without that row (it used to
    crash the object fallback with numpy's inhomogeneous-shape error)."""
    X, init = _toy()
    with_null = toy_df.unionByName(spark.createDataFrame(
        [(10_000, None)], toy_df.schema))
    got = kmeans.kmeans_fit(with_null, init, iters=2)
    want = kmeans.kmeans_fit(toy_df, init, iters=2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bad_rows", [
    [[0.0] * 5],            # one short row
    [[0.0] * 5, [0.0] * 7],  # ragged lengths that SUM to a multiple of d
])
def test_wrong_length_vectors_fail_loudly(spark, toy_df, bad_rows):
    """Rows whose length ≠ d must raise, never silently misalign the
    flat-buffer reshape (ragged lengths summing to n·d used to pass the
    zero-copy gate and corrupt every vector after the first ragged row)."""
    X, init = _toy()
    bad = toy_df.unionByName(spark.createDataFrame(
        [(20_000 + i, [float(v) for v in r])
         for i, r in enumerate(bad_rows)], toy_df.schema))
    c0 = kmeans.quantize_centroids(init)
    with pytest.raises(Exception, match="length"):
        kmeans.update_agg(bad.repartition(1), c0).collect()


def test_halfup_mean_overflow_free(spark):
    """The quotient/remainder half-up mean must be exact where the naive
    (2·s + n) div (2·n) wraps int64 (s ≥ 2^62), in BOTH engines' form,
    and equal the naive form everywhere it doesn't overflow."""
    s_big, n = 2 ** 62 + 12345, 3
    want = (2 * s_big + n) // (2 * n)  # Python bigint: the true value
    assert kmeans._halfup_mean(s_big, n) == want
    row = spark.sql(
        f"SELECT {kmeans.halfup_mean_sql('s', 'n')} AS v FROM VALUES "
        f"(CAST({s_big} AS BIGINT), CAST({n} AS BIGINT)) t(s, n)").head()
    assert row["v"] == want
    rng = np.random.default_rng(11)
    for _ in range(200):
        s = int(rng.integers(0, 10 ** 12))
        m = int(rng.integers(1, 10 ** 6))
        assert kmeans._halfup_mean(s, m) == (2 * s + m) // (2 * m)


def test_plan_shape_one_corpus_pass(spark, toy_df):
    """The update is ONE corpus scan: exactly one Arrow partial-combine
    kernel in the plan (quantize + assign + per-batch fold — the corpus
    never returns to the JVM), and exactly one exchange in the bare
    update aggregate (≤k partial rows per batch → final k-row agg)."""
    X, init = _toy()
    c0 = kmeans.quantize_centroids(init)
    upd = kmeans.update_agg(toy_df, c0)
    plan = upd._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1
    assert plan.count("Exchange") == 1
    res = kmeans.kmeans_result_plan(toy_df, c0)
    rplan = res._jdf.queryExecution().executedPlan().toString()
    assert rplan.count("MapInArrow") == 1

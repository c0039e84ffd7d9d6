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


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
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

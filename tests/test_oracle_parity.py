"""Driver-style correctness gate: every ``queries()`` entry vs its
``oracle_sql()`` DuckDB result on sf0.01 — row count, schema-width, and
value equality after canonical sorting (stricter than the driver's hash:
exact for ints/strings, 1e-9 for floats)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _compare(name: str, got: pd.DataFrame, want: pd.DataFrame):
    assert len(got) == len(want), \
        f"{name}: row count {len(got)} != oracle {len(want)}"
    got, want = _canon(got), _canon(want)
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(got[c].dtype, np.floating) or \
                np.issubdtype(want[c].dtype, np.floating):
            a = a.astype(np.float64)
            b = b.astype(np.float64)
            ok = np.isclose(a, b, rtol=1e-9, atol=1e-9) | \
                (np.isnan(a) & np.isnan(b))
            if not ok.all():
                bad = np.where(~ok)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {len(bad)} mismatches, e.g. "
                    f"{a[bad].tolist()} vs {b[bad].tolist()}")
        else:
            if not (pd.isna(a) == pd.isna(b)).all() or \
                    not (a[~pd.isna(a)] == b[~pd.isna(b)]).all():
                bad = np.where(a != b)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: mismatches at {bad.tolist()}: "
                    f"{a[bad].tolist()} vs {b[bad].tolist()}")


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


def test_contract_size_never_regresses():
    """Guard against accidentally dropping queries()/oracle_sql() entries
    (block edits to the big oracle dict have done this once): pin the
    minimum contract size and the exact rows-only set."""
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert len(q) >= 74, f"queries() shrank to {len(q)}"
    assert len(o) >= 73, f"oracle_sql() shrank to {len(o)}"
    assert set(o) <= set(q)
    rows_only = set(q) - set(o)
    # only the approximate ANN query is legitimately rows-only
    assert rows_only <= {"cosine_topk_ivf"}, \
        f"unexpected rows-only queries: {rows_only}"


def test_every_oracle_key_has_a_query():
    q = entrymod.queries()
    missing = [k for k in ORACLE_KEYS if k not in q]
    assert not missing, f"oracle keys without queries: {missing}"


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    want = duck.sql(entrymod.oracle_sql()[name]).df()
    _compare(name, got, want)


def test_rows_only_queries_run(spark):
    q = entrymod.queries()
    rows_only = [k for k in q if k not in ORACLE_KEYS]
    for name in rows_only:
        df = q[name](spark, SF_DIR)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0

"""Every oracle_sql() entry must match its queries() twin (the driver's
correctness gate, run locally at sf0.001 for speed — the driver uses
sf0.01; tests/oracle_check.py runs any SF standalone)."""

import os

import duckdb
import pytest

from tests.oracle_check import TABLES, compare_one

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _pairs():
    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs), "oracle without a query"
    return [(n, qs[n], os_[n]) for n in os_]


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[n for n, _, _ in _pairs()])
def test_oracle_parity(spark, duck, name, qfn, sql):
    problems, n_rows = compare_one(spark, duck, name, qfn, sql, SF_DIR)
    assert not problems, f"{name}: {problems}"


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert {"clip_id", "cluster_id"} <= set(df.columns)
    assert df.count() > 0

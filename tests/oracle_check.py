"""Local stand-in for the driver's correctness gate: run every
queries()[k] against oracle_sql()[k] via DuckDB at a given SF and compare
row count + column names + order-insensitive values.

Usage:  python tests/oracle_check.py [sf_dir] [query ...]
Also importable by pytest (test_oracle_parity.py).
"""

from __future__ import annotations

import decimal
import math
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    if isinstance(v, decimal.Decimal):
        return f"{v:.6f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v) if v is not None else "\x00NULL"


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def compare_one(spark, con, name, qfn, sql, sf_dir):
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.sql(sql)
    ocols = res.columns
    orows = res.fetchall()
    problems = []
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    if not problems:
        cs = _canon_rows([c.lower() for c in scols], srows)
        co = _canon_rows([c.lower() for c in ocols], orows)
        if cs != co:
            diff_i = next(i for i, (x, y) in enumerate(zip(cs, co)) if x != y)
            problems.append(
                f"values differ at sorted-row {diff_i}:\n  spark ={cs[diff_i]}\n  oracle={co[diff_i]}"
            )
    return problems, len(srows)


def run(sf_dir="/root/testdata/sf0.01", only=None):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from simhash_spark.session import get_spark

    spark = get_spark(app="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, os_ = E.queries(), E.oracle_sql()
    failed = []
    for name, qfn in qs.items():
        if only and name not in only:
            continue
        if name not in os_:
            n = qfn(spark, sf_dir).count()
            print(f"  {name:28s} rows-only: {n} rows")
            continue
        problems, n = compare_one(spark, con, name, qfn, os_[name], sf_dir)
        if problems:
            failed.append(name)
            print(f"✗ {name:28s} ({n} rows)")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"✓ {name:28s} ({n} rows)")
    return failed


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else (set(args) or None)
    failed = run(sf, only)
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all oracle-checked queries match")

#!/usr/bin/env python
"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For each ``__spark_entry__.queries()`` entry with an ``oracle_sql()``
twin, runs BOTH on the same parquet tables and compares row count,
column names, and a value hash over name-sorted columns and sorted rows
(floats rounded to 9 significant digits — mirroring the driver's
tolerance). Lets a plan change be gate-checked in-session instead of
waiting a round for CORRECTNESS_r{N}.json.

Usage: python bin/correctness_gate.py [sf_dir] [query ...]
       (default sf_dir /root/testdata/sf0.01; default: all oracle-
        checked queries)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v) -> str:
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash_rows(cols: list[str], rows: list) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from simhash_spark.session import get_spark

    spark = get_spark(
        app="correctness-gate", master="local[8]", shuffle_partitions=16
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, oracles = E.queries(), E.oracle_sql()
    names = [n for n in qs if n in oracles and (not only or n in only)]
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            ok_rows = len(srows) == len(orows)
            ok_cols = sorted(scols) == sorted(ocols)
            sh, oh = _hash_rows(scols, srows), _hash_rows(ocols, orows)
            ok = ok_rows and ok_cols and sh == oh
            print(
                json.dumps(
                    {
                        "query": name,
                        "ok": ok,
                        "rows": [len(srows), len(orows)],
                        "cols_match": ok_cols,
                        "hash": [sh, oh],
                        "sec": round(time.time() - t0, 1),
                    }
                )
            )
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001 — report, keep gating the rest
            print(json.dumps({"query": name, "ok": False, "error": str(e)[:300]}))
            failures.append(name)
    print(
        json.dumps(
            {"gate": "done", "checked": len(names), "failed": failures}
        )
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

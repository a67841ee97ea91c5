#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run each registered query
on Spark AND its DuckDB oracle over the same parquet tables, compare row
count, schema (sorted column names), and an order-insensitive value hash.

Usage:  python scripts/check_oracles.py [query ...]     # default: all
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/check_oracles.py
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> None:
    import duckdb

    from ospo_ghcrawler_spark import queries as Q
    from ospo_ghcrawler_spark.session import get_spark

    names = sys.argv[1:] or [n for n in Q.QUERIES if n in Q.ORACLES]
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failed = []
    for name in names:
        if name not in Q.ORACLES:
            print(f"{name}: no oracle (rows-only by design)")
            continue
        sdf = Q.QUERIES[name](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        ores = con.execute(Q.ORACLES[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_schema and _hash(srows, scols) == _hash(orows, ocols)
        status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"schema={ok_schema} hash={ok_hash}"
        )
        if status == "FAIL":
            failed.append(name)
            if not ok_schema:
                print(f"  spark cols: {sorted(scols)}\n  oracle cols: {sorted(ocols)}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

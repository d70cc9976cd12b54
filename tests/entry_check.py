"""Driver-style correctness harness: run each __spark_entry__ query in
Spark AND its DuckDB oracle, compare row count + column names + an
order-insensitive value multiset (the local stand-in for the driver's
value-hash). Usable standalone:  python tests/entry_check.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def duckdb_result(con, sql: str):
    rel = con.sql(sql)
    return [d[0] for d in rel.description], rel.fetchall()


def spark_result(df):
    rows = [tuple(r) for r in df.collect()]
    return list(df.columns), rows


def check_query(spark, con, name: str, fn, sql: str | None, sf_dir: str) -> dict:
    out = {"name": name}
    df = fn(spark, sf_dir)
    scols, srows = spark_result(df)
    out["spark_rows"] = len(srows)
    if sql is None:
        out["status"] = "rows_only"
        return out
    dcols, drows = duckdb_result(con, sql)
    out["duck_rows"] = len(drows)
    if sorted(scols) != sorted(dcols):
        out["status"] = "SCHEMA_MISMATCH"
        out["spark_cols"] = scols
        out["duck_cols"] = dcols
        return out
    ms, md = _rows_to_multiset(scols, srows), _rows_to_multiset(dcols, drows)
    if ms == md:
        out["status"] = "MATCH"
    else:
        out["status"] = "VALUE_MISMATCH"
        out["only_spark"] = list((ms - md).elements())[:5]
        out["only_duck"] = list((md - ms).elements())[:5]
    return out


def run_all(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import duckdb

    import __spark_entry__ as E
    from codeontology_spark.session import get_spark

    spark = get_spark("entry-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            results.append(check_query(spark, con, name, fn, oracles.get(name), sf_dir))
        except Exception as ex:  # noqa: BLE001
            results.append({"name": name, "status": "ERROR", "error": str(ex)[:500]})
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    bad = 0
    for r in run_all(sf, only):
        ok = r["status"] in ("MATCH", "rows_only")
        bad += 0 if ok else 1
        line = f"{r['status']:16} {r['name']:32} rows={r.get('spark_rows')}"
        if not ok:
            line += f"  {({k: v for k, v in r.items() if k not in ('name', 'status')})}"
        print(line)
    sys.exit(1 if bad else 0)

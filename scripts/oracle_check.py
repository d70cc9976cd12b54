"""Driver-mimic correctness pre-check: every __spark_entry__ query vs
its DuckDB oracle at a given SF dir.

Mirrors the per-round driver gate (CORRECTNESS_r{N}.json): for each key
in queries() with an oracle_sql() entry, run the Spark DataFrame and the
DuckDB SQL over the same parquet tables, then compare

- row count,
- column-name set (driver sorts columns by name before hashing), and
- values (rows sorted by the string form of all columns; floats rounded
  to 6 significant-ish decimals so representation noise doesn't flag).

Usage: python scripts/oracle_check.py [sf_dir] [key_prefix ...]
Prints one line per query and a final JSON summary line.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    """Canonical string form of one cell (driver-hash analog)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _frame_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(_canon(r[c]) for c in cols) for _, r in df.iterrows()]
    return cols, sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:]

    import duckdb

    import __spark_entry__ as E
    from codeontology_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, oracles = E.queries(), E.oracle_sql()
    keys = [
        k
        for k in qs
        if not prefixes or any(k.startswith(p) for p in prefixes)
    ]
    results = {}
    import time

    for k in keys:
        t0 = time.time()
        try:
            sdf = qs[k](spark, sf_dir).toPandas()
            if k not in oracles:
                results[k] = "ROWS_ONLY"
                print(f"{k:36s} ROWS_ONLY rows={len(sdf)}")
                continue
            odf = con.execute(oracles[k]).fetchdf()
            scols, srows = _frame_rows(sdf)
            ocols, orows = _frame_rows(odf)
            if scols != ocols:
                results[k] = "SCHEMA_MISMATCH"
                print(f"{k:36s} SCHEMA  spark={scols} duck={ocols}")
            elif len(srows) != len(orows):
                results[k] = "ROWCOUNT_MISMATCH"
                print(
                    f"{k:36s} ROWS    spark={len(srows)} duck={len(orows)}"
                )
            elif srows != orows:
                results[k] = "VALUE_MISMATCH"
                bad = next(
                    (a, b) for a, b in zip(srows, orows) if a != b
                )
                print(f"{k:36s} VALUES  first diff: {bad}")
            else:
                results[k] = "MATCH"
                print(
                    f"{k:36s} MATCH   rows={len(srows)}"
                    f"  {time.time() - t0:.1f}s"
                )
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            results[k] = f"ERROR: {exc}"
            print(f"{k:36s} ERROR   {exc}")

    n_match = sum(1 for v in results.values() if v == "MATCH")
    summary = {
        "sf_dir": sf_dir,
        "n": len(results),
        "match": n_match,
        "rows_only": sum(1 for v in results.values() if v == "ROWS_ONLY"),
        "bad": {k: v for k, v in results.items() if v not in ("MATCH", "ROWS_ONLY")},
    }
    print(json.dumps(summary))
    spark.stop()
    return 0 if not summary["bad"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

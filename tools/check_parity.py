"""Mimic the driver's CORRECTNESS gate locally: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count + sorted-by-name columns + order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from html_qt_spark.plans.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("\x00".join(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name:22s} rows-only: {len(srows)} rows  "
                  f"schema={scols}")
            if len(srows) == 0 and name not in ():
                print(f"    !! WARNING: 0 rows")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_vals = (_normalize([tuple(r) for r in srows], scols)
                   == _normalize(orows, ocols))
        status = "OK " if (ok_count and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"  {name:22s} {status} spark={len(srows)} duck={len(orows)} "
              f"cols_match={ok_cols} vals_match={ok_vals}")
        if not ok_cols:
            print(f"    spark cols: {sorted(scols)}")
            print(f"    duck  cols: {sorted(ocols)}")
        if ok_cols and ok_count and not ok_vals:
            a = _normalize([tuple(r) for r in srows], scols)
            b = _normalize(orows, ocols)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diff:
                print(f"    spark: {x[:160]}")
                print(f"    duck : {y[:160]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB at sf0.01, compare row count + column names + an
order-insensitive multiset of normalized values.

    python scripts/check_entry.py [--sf /root/testdata/sf0.01] [-k name]
"""

from __future__ import annotations

import argparse
import datetime
import math
import sys
import time
from decimal import Decimal

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-k", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from ccrawler_spark.scheduler.cli import build_session

    spark = build_session(8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if args.k and args.k not in name:
            continue
        t0 = time.time()
        try:
            df = fn(spark, args.sf)
            cols = sorted(df.columns)
            rows = [tuple(norm(r[c]) for c in cols) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows (no oracle — rows-only), "
                  f"{time.time()-t0:.1f}s")
            if len(rows) == 0:
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = sorted(d[0] for d in res.description)
            fetched = res.fetchall()
            colidx = [
                [d[0] for d in res.description].index(c) for c in ocols
            ]
            orows = [tuple(norm(r[i]) for i in colidx) for r in fetched]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        ok_cols = cols == ocols
        ok_count = len(rows) == len(orows)
        ok_vals = sorted(map(repr, rows)) == sorted(map(repr, orows))
        if ok_cols and ok_count and ok_vals:
            print(f"OK    {name}: {len(rows)} rows, {time.time()-t0:.1f}s")
        else:
            failures.append(name)
            print(f"FAIL  {name}: cols {ok_cols} ({cols} vs {ocols}), "
                  f"count {ok_count} ({len(rows)} vs {len(orows)}), "
                  f"vals {ok_vals}")
            if ok_cols and not ok_vals:
                s, o = set(map(repr, rows)), set(map(repr, orows))
                print(f"      spark-only: {sorted(s - o)[:3]}")
                print(f"      duckdb-only: {sorted(o - s)[:3]}")
    print("=" * 60)
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

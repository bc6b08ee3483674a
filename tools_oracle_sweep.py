#!/usr/bin/env python
"""Pre-flight the driver's correctness gate locally: run EVERY
__spark_entry__.queries() entry against its oracle_sql() on DuckDB over
the same parquet tables, comparing rows, schema-by-name, and stringified
values — the same shape as the driver's CORRECTNESS_r{N} check.

Usage:  python tools_oracle_sweep.py [sf_dir] [query ...]
        (default sf_dir /root/testdata/sf0.01; default all queries)
Exit 0 = everything matches."""

from __future__ import annotations

import sys
import time

import duckdb

import __spark_entry__ as entry
from fever_spark.session import get_spark

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    sf = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    qs = entry.queries()
    if args:
        qs = {k: qs[k] for k in args}
    oracles = entry.oracle_sql()
    fails = []
    for i, (nm, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            df = fn(spark, sf)
            cols = sorted(df.columns)
            rows = sorted(tuple(str(r[c]) for c in cols)
                          for r in df.collect())
            osql = oracles.get(nm)
            if osql is None:
                print(f"[{i+1:2d}] {nm}: rows-only {len(rows)} "
                      f"({time.time()-t0:.1f}s)", flush=True)
                continue
            con = duckdb.connect()
            for t in TABLES:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{sf}/{t}.parquet')")
            od = con.execute(osql).fetchdf()
            if sorted(od.columns) != cols:
                fails.append((nm, f"schema {cols} vs {sorted(od.columns)}"))
                print(f"[{i+1:2d}] {nm}: SCHEMA MISMATCH", flush=True)
                continue
            orows = sorted(tuple(str(x) for x in r)
                           for r in od[cols].itertuples(index=False))
            ok = rows == orows
            if not ok:
                fails.append((nm, f"values ({len(rows)} vs {len(orows)})"))
            print(f"[{i+1:2d}] {nm}: {'OK' if ok else 'MISMATCH'} "
                  f"{len(rows)} rows ({time.time()-t0:.1f}s)", flush=True)
        except Exception as ex:  # keep sweeping; report at the end
            fails.append((nm, repr(ex)[:200]))
            print(f"[{i+1:2d}] {nm}: ERROR {repr(ex)[:200]}", flush=True)
    print("FAILS:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local emulation of the driver's correctness gate: run every
__spark_entry__ query AND its DuckDB oracle at sf0.01, sort columns by name,
value-compare. Usage:  python scripts/check_correctness.py [name ...]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import duckdb
    import pandas as pd  # noqa: F401

    import __spark_entry__ as entry
    from kermit_spark.session import build_session

    sf_dir = "/root/testdata/sf0.01"
    only = set(sys.argv[1:])
    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    oracles = entry.oracle_sql()
    failures = []
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {exc}")
            failures.append(name)
            continue
        cols = sorted(sdf.columns)
        ocols = sorted(odf.columns)
        if cols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
            failures.append(name)
            continue
        s = sdf[cols].sort_values(cols).reset_index(drop=True)
        o = odf[cols].sort_values(cols).reset_index(drop=True)
        if len(s) != len(o):
            print(f"{name}: ROWS MISMATCH spark={len(s)} oracle={len(o)}")
            failures.append(name)
            continue
        # driver-faithful compare: values as Python objects (int32/int64 both
        # become int; int-vs-float DOES differ, as the r1 sessionize row showed)
        bad_cols = []
        for c in cols:
            sv = [repr(x) for x in s[c].tolist()]
            ov = [repr(x) for x in o[c].tolist()]
            if sv != ov:
                n_diff = sum(1 for a, b in zip(sv, ov) if a != b)
                bad_cols.append((c, n_diff))
        if bad_cols:
            dt_s, dt_o = dict(s.dtypes.astype(str)), dict(o.dtypes.astype(str))
            print(f"{name}: VALUE MISMATCH cols={bad_cols}; dtypes s={dt_s} o={dt_o}")
            failures.append(name)
            continue
        print(f"{name}: OK ({len(s)} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

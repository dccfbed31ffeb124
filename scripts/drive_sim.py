"""Driver-protocol simulation: run the first DRIVER_QUERY_CAP contract
queries (the external driver's evaluation window) at sf0.01 and compare
each against its DuckDB oracle on row count, column names, and value
equality after canonical sorting (stricter than the driver's hash compare:
exact for ints/strings, 1e-9 relative for floats, element-wise for lists).

Run from anywhere (it inserts the repo root on sys.path the way the real
driver does)::

    python /root/repo/scripts/drive_sim.py [--sf-dir /root/testdata/sf0.01]
                                           [--only name1,name2] [--all]

``--all`` checks the full 94-query contract, not just the driver window.
Exit code 0 = every checked query passed.
"""
from __future__ import annotations

import argparse
import math
import sys
import time

REPO = "/root/repo"
TABLES = ["events", "documents", "embeddings", "lineitem", "orders",
          "customer", "supplier", "part", "nation", "region"]


def _values_equal(a, b, rel=1e-9, abs_=1e-9):
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        import numpy as np
        if a is None or b is None:
            return a is None and b is None
        a, b = list(np.asarray(a).tolist()), list(np.asarray(b).tolist())
        return len(a) == len(b) and all(
            _values_equal(x, y, rel, abs_) for x, y in zip(a, b))
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= max(abs_, rel * max(abs(fa), abs(fb)))
    return a == b


def _canon(df):
    import numpy as np
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(np.asarray(v).tolist())
                if isinstance(v, (list, tuple, np.ndarray)) else v)
    key = df.apply(lambda r: tuple(
        (repr(type(v)), str(v)) for v in r), axis=1)
    return df.loc[key.sort_values(kind="mergesort").index].reset_index(
        drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import duckdb
    import __spark_entry__ as m
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf_dir}/{t}.parquet')")

    n_entry = m.entry(spark).count()
    print(f"entry(): {n_entry} rows", flush=True)

    q, o = m.queries(), m.oracle_sql()
    names = list(q) if args.all else list(q)[:m.DRIVER_QUERY_CAP]
    if args.only:
        names = [n for n in args.only.split(",") if n]
    failed = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            sdf = q[name](spark, args.sf_dir).toPandas()
            odf = con.sql(o[name]).df()
            status = "ok"
            if sorted(sdf.columns) != sorted(odf.columns):
                status = f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            elif len(sdf) != len(odf):
                status = f"ROWS {len(sdf)} vs {len(odf)}"
            else:
                a, b = _canon(sdf), _canon(odf)
                for r in range(len(a)):
                    for c in a.columns:
                        if not _values_equal(a[c].iloc[r], b[c].iloc[r]):
                            status = (f"VALUE row {r} col {c}: "
                                      f"{a[c].iloc[r]!r} vs {b[c].iloc[r]!r}")
                            break
                    if status != "ok":
                        break
        except Exception as exc:  # noqa: BLE001 — report, keep going
            status = f"ERR {type(exc).__name__}: {exc}"
        dt = time.time() - t0
        tag = "PASS" if status == "ok" else "FAIL"
        print(f"[{i:2d}/{len(names)}] {tag} {name} ({dt:.1f}s)"
              + ("" if status == "ok" else f" — {status}"), flush=True)
        if status != "ok":
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed"
          + (f"; FAILED: {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

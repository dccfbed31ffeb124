"""Driver-protocol simulation: run the first DRIVER_QUERY_CAP contract
queries (the external driver's evaluation window) at sf0.01 and compare
each against its DuckDB oracle on row count, column names, and value
equality after canonical sorting — via ``wotan_spark.oracle_compare``,
the SAME comparator the local parity suite uses, so this script and
``tests/test_oracle_parity.py`` can never drift apart.

Run from anywhere (it inserts the repo root on sys.path the way the real
driver does)::

    python /root/repo/scripts/drive_sim.py [--sf-dir /root/testdata/sf0.01]
                                           [--only name1,name2] [--all]

``--all`` checks the full 94-query contract, not just the driver window.
Exit code 0 = every checked query passed.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

# the checkout this script LIVES in, not a hardcoded path — running a
# worktree's copy must validate the worktree's code, never a sibling
# checkout that happens to sit at a well-known location
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    from wotan_spark.oracle_compare import compare, register_views

    # validate --only BEFORE the expensive steps: queries() needs only the
    # module import, while SparkSession startup + the entry() count can
    # take minutes at larger scale factors — a typo should fail instantly
    q, o = m.queries(), m.oracle_sql()
    names = list(q) if args.all else list(q)[:m.DRIVER_QUERY_CAP]
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in names if n not in q]
        if unknown:
            ap.error(f"--only names not in the contract: {unknown} "
                     f"(see queries() in {REPO}/__spark_entry__.py)")

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    con = duckdb.connect()
    register_views(con, args.sf_dir)

    n_entry = m.entry(spark).count()
    print(f"entry(): {n_entry} rows", flush=True)
    failed = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            got = q[name](spark, args.sf_dir).toPandas()
            want = con.sql(o[name]).df()
            compare(name, got, want)
            status = "ok"
        except AssertionError as exc:
            status = str(exc)
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

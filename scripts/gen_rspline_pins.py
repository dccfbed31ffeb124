#!/usr/bin/env python
"""Generate the pinned-golden oracle table for ``detrend_rspline_packed``.

The rspline method (reference wotan/iter_spline.py:8-34) is an iteratively
sigma-clipped LSQ B-spline fit — not expressible in oracle SQL.  Its kernel
(`wotan_spark/kernels/splines.py::rspline`) is pytest-proven against the
reference library, so the driver-level oracle pins the kernel's own output:
this script rebuilds the per-user sequences EXACTLY as
``wotan_spark.spark.synth.sequences_from_events`` does (order by ts,
event_id; token = round(value*1000); cap 4096; y = 1 + token/1e6), runs the
kernel locally (no Spark), and writes (doc_id, flat_sum, n_pts) per doc to
``wotan_spark/data/rspline_pins_<sf>.json``.  ``oracle_sql()`` embeds that
table as VALUES, so the driver check proves the distributed mapInPandas
path reproduces the pytest-proven kernel bit-for-bit at sf0.01.

Sum discipline: ``F.aggregate`` is a strict left fold, so the pin uses
``cumsum`` (sequential) rather than ``np.sum`` (pairwise) before the
HALF_UP 6-decimal round that both sides share.

Usage: python scripts/gen_rspline_pins.py [sf_dir ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from wotan_spark.kernels.detrend import detrend_series  # noqa: E402

MAX_TOKENS = 4096
WINDOW_LENGTH = 17.0


def round_half_up(x: float, decimals: int) -> float:
    s = 10.0 ** decimals
    return math.copysign(math.floor(abs(x) * s + 0.5) / s, x)


def pins_for(sf_dir: str) -> list[dict]:
    con = duckdb.connect()
    rows = con.sql(f"""
        SELECT user_id,
               list(round(value * 1000)::INT ORDER BY ts, event_id) AS toks
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY user_id ORDER BY user_id
    """).fetchall()
    con.close()
    out = []
    for user_id, toks in rows:
        toks = np.asarray(toks[:MAX_TOKENS], dtype=np.int64)
        y = 1.0 + toks.astype(np.float64) / 1e6
        t = np.arange(len(y), dtype=np.float64)
        res = detrend_series(t, y, method="rspline",
                             window_length=WINDOW_LENGTH)
        flat = res.flatten_lc
        good = flat[~np.isnan(flat)]
        flat_sum = float(good.cumsum()[-1]) if len(good) else 0.0
        out.append({"doc_id": f"user_{user_id}",
                    "flat_sum": round_half_up(flat_sum, 6),
                    "n_pts": int(len(good))})
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    data_dir = os.path.join(REPO, "wotan_spark", "data")
    os.makedirs(data_dir, exist_ok=True)
    for sf_dir in sf_dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        path = os.path.join(data_dir, f"rspline_pins_{tag}.json")
        pins = pins_for(sf_dir)
        with open(path, "w") as f:
            json.dump(pins, f, indent=0)
        print(f"{path}: {len(pins)} docs")


if __name__ == "__main__":
    main()

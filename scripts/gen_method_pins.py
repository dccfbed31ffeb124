#!/usr/bin/env python
"""Generate pinned-golden oracle tables for the golden-tier detrend methods.

Same pattern as scripts/gen_rspline_pins.py (see its docstring for the
rationale): for each entry of ``__spark_entry__.PINNED_DETREND``, rebuild
the per-user sf0.01 sequences exactly as ``sequences_from_events`` does,
run the pytest-proven kernel locally (no Spark), and pin per-doc
(doc_id, flat_sum, n_pts) to ``wotan_spark/data/pins_<key>_sf0.01.json``.
``oracle_sql()`` embeds each table as VALUES, so the driver hash match
proves the distributed mapInPandas path reproduces the proven kernels.

Usage: python scripts/gen_method_pins.py [key ...]   (default: all)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from __spark_entry__ import PINNED_DETREND  # noqa: E402
from wotan_spark.kernels.detrend import detrend_series  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def round_half_up(x: float, decimals: int) -> float:
    s = 10.0 ** decimals
    return math.copysign(math.floor(abs(x) * s + 0.5) / s, x)


def load_sequences():
    con = duckdb.connect()
    rows = con.sql(f"""
        SELECT user_id,
               list(round(value * 1000)::INT ORDER BY ts, event_id) AS toks
        FROM read_parquet('{SF_DIR}/events.parquet')
        GROUP BY user_id ORDER BY user_id
    """).fetchall()
    con.close()
    return rows


def main() -> None:
    keys = sys.argv[1:] or list(PINNED_DETREND)
    rows = load_sequences()
    data_dir = os.path.join(REPO, "wotan_spark", "data")
    os.makedirs(data_dir, exist_ok=True)
    for key in keys:
        spec = PINNED_DETREND[key]
        method = spec.get("method", key)
        params = spec["params"]
        max_tokens = spec.get("max_tokens", 4096)
        n_docs = spec.get("n_docs")
        decimals = spec.get("decimals", 6)
        t0 = time.time()
        min_margin = math.inf
        out = []
        for user_id, toks in rows:
            if n_docs is not None and int(user_id) >= n_docs:
                continue
            toks = np.asarray(toks[:max_tokens], dtype=np.int64)
            y = 1.0 + toks.astype(np.float64) / 1e6
            t = np.arange(len(y), dtype=np.float64)
            with np.errstate(all="ignore"):
                res = detrend_series(t, y, method=method, **params)
            flat = res.flatten_lc
            good = flat[~np.isnan(flat)]
            flat_sum = float(good.cumsum()[-1]) if len(good) else 0.0
            # distance of the raw value from the nearest half-up rounding
            # boundary — if this ever approaches the method's numeric
            # jitter, the pin precision must drop a decimal
            frac = abs(flat_sum) * 10.0 ** decimals % 1.0
            min_margin = min(min_margin, abs(frac - 0.5))
            out.append({"doc_id": f"user_{user_id}",
                        "flat_sum": round_half_up(flat_sum, decimals),
                        "n_pts": int(len(good))})
        path = os.path.join(data_dir, f"pins_{key}_sf0.01.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=0)
        print(f"{key}: {len(out)} docs, {round(time.time() - t0, 1)}s, "
              f"min boundary margin {min_margin:.3g} ulp@{decimals}dec")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generate the pinned-golden oracle for ``downsample_lttb``.

LTTB's greedy largest-triangle selection is sequential per bucket — not
expressible in oracle SQL — so the driver-level oracle pins the kernel's
own output (the same pattern as the global-fit detrend methods): this
script rebuilds the per-user sequences EXACTLY as
``wotan_spark.spark.synth.sequences_from_events`` does (order by ts,
event_id; token = round(value*1000); cap 4096; y = 1 + token/1e6), runs
``kernels/downsample.py::lttb_indices`` locally (no Spark), and writes a
per-doc checksum row (doc_id, n_sel, t_md5, y_sum) to
``wotan_spark/data/lttb_pins_<sf>.json``:

- ``t_md5``   — md5 over the comma-joined selected t indices in selection
  order (integers stringify identically everywhere);
- ``y_sum``   — sequential left-fold sum of the selected y values (the
  ``F.aggregate`` discipline: cumsum, not np.sum's pairwise tree),
  HALF_UP-rounded at 6 decimals to match Spark's ``F.round``.

Usage: python scripts/gen_lttb_pins.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.gen_method_pins import round_half_up  # noqa: E402
from wotan_spark.kernels.downsample import lttb_indices  # noqa: E402

MAX_TOKENS = 4096
N_OUT = 64


def pins_for(sf_dir: str, limit: int | None = None) -> list[dict]:
    """Pins for all users, or (``limit``) only ``user_id < limit`` — the
    cheap subset the freshness test checks."""
    where = f"WHERE user_id < {int(limit)}" if limit is not None else ""
    con = duckdb.connect()
    rows = con.sql(f"""
        SELECT user_id,
               list(round(value * 1000)::INT ORDER BY ts, event_id) AS toks
        FROM read_parquet('{sf_dir}/events.parquet') {where}
        GROUP BY user_id ORDER BY user_id
    """).fetchall()
    con.close()
    out = []
    for user_id, toks in rows:
        toks = np.asarray(toks[:MAX_TOKENS], dtype=np.int64)
        y = 1.0 + toks.astype(np.float64) / 1e6
        sel = lttb_indices(y, N_OUT)
        t_md5 = hashlib.md5(
            ",".join(str(int(t)) for t in sel).encode()).hexdigest()
        ysum = float(y[sel].cumsum()[-1]) if len(sel) else 0.0
        out.append({"doc_id": f"user_{user_id}",
                    "n_sel": int(len(sel)),
                    "t_md5": t_md5,
                    "y_sum": round_half_up(ysum, 6)})
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    data_dir = os.path.join(REPO, "wotan_spark", "data")
    os.makedirs(data_dir, exist_ok=True)
    for sf_dir in sf_dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        path = os.path.join(data_dir, f"lttb_pins_{tag}.json")
        pins = pins_for(sf_dir)
        with open(path, "w") as f:
            json.dump(pins, f, indent=0)
        print(f"{path}: {len(pins)} docs")


if __name__ == "__main__":
    main()

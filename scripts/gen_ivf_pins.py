#!/usr/bin/env python
"""Generate the pinned-golden oracle table for ``cosine_topk_ivf``.

The IVF path is approximate by design (it probes ``nprobe`` coarse cells
instead of the full corpus), so no SQL twin can reproduce it — but with a
fixed k-means seed and a deterministic ``orderBy(vec_id).limit`` training
sample, its output on fixed data is fully deterministic.  This script runs
the recall-tested query (tests/test_datapipe_extra.py proves >=0.8 recall
vs brute force) once on the driver testdata and pins the exact
(query_id, neighbor_id, rank, cos_sim) rows, turning the last rows-only
contract entry into a real values oracle.

The smallest rank-adjacent similarity gap is printed as a determinism
margin — orders of magnitude above float64 dot-product jitter, so the
pinned ranking is stable across BLAS threading configurations.

Usage: python scripts/gen_ivf_pins.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"


ANN_PINS = {"cosine_topk_ivf": "pins_ivf_sf0.01.json",
            "cosine_topk_pq": "pins_pq_sf0.01.json",
            "cosine_topk_lsh": "pins_lsh_sf0.01.json"}


def main() -> None:
    from wotan_spark.spark.session import get_spark
    import __spark_entry__ as entry

    keys = sys.argv[1:] or list(ANN_PINS)
    spark = get_spark(app_name="gen-ann-pins", cores=4, shuffle_partitions=8)
    try:
        for key in keys:
            rows = (entry.queries()[key](spark, SF_DIR)
                    .orderBy("query_id", "rank").collect())
            out = [{"query_id": r.query_id, "neighbor_id": r.neighbor_id,
                    "rank": r.rank, "cos_sim": r.cos_sim} for r in rows]
            path = os.path.join(REPO, "wotan_spark", "data", ANN_PINS[key])
            with open(path, "w") as f:
                json.dump(out, f, indent=0)
            gaps = []
            by_q: dict[int, list] = {}
            for r in out:
                by_q.setdefault(r["query_id"], []).append(r["cos_sim"])
            for sims in by_q.values():
                gaps += [abs(a - b) for a, b in zip(sims, sims[1:])
                         if a != b]
            print(f"{key}: {len(out)} rows pinned to {path}; "
                  + (f"min nonzero rank gap: {min(gaps):.3g}" if gaps
                     else "no gaps"))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generate pinned-golden oracle tables for the approximate-ANN queries.

The ANN paths (LSH buckets, IVF cells, PQ codes) are approximate by design
— no SQL twin can reproduce them — but with fixed seeds and deterministic
training samples their outputs on fixed data are fully deterministic.
This script runs each recall-tested query (tests/test_datapipe_extra.py /
test_joins_pq.py prove recall vs brute force) once on the driver testdata
and pins the exact (query_id, neighbor_id, rank, cos_sim) rows, so every
ANN contract entry has a real values oracle.

The query params come from ``__spark_entry__.ANN_QUERY_PARAMS`` (single
source of truth with the contract queries); each run uses k+1 so the
printed determinism margins cover the boundary that actually decides pin
membership: the similarity gap between the pinned rank-k row and the first
EXCLUDED candidate, alongside the adjacent-rank gaps.  Both must stay
orders of magnitude above float64 dot-product jitter for the pins to be
stable across BLAS threading configurations.

Usage: python scripts/gen_ivf_pins.py [query_name ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from wotan_spark.spark.session import get_spark
    from __spark_entry__ import ANN_PINS, ANN_QUERY_PARAMS, _ann_func

    keys = sys.argv[1:] or list(ANN_PINS)
    spark = get_spark(app_name="gen-ann-pins", cores=4, shuffle_partitions=8)
    try:
        from __spark_entry__ import _emb
        emb = _emb(spark, SF_DIR)  # same frame the contract queries read
        for key in keys:
            params = dict(ANN_QUERY_PARAMS[key])
            k = params["k"]
            params["k"] = k + 1       # one extra rank: boundary margin
            rows = (_ann_func(key)(emb, **params)
                    .orderBy("query_id", "rank").collect())
            out = [{"query_id": r.query_id, "neighbor_id": r.neighbor_id,
                    "rank": r.rank, "cos_sim": r.cos_sim}
                   for r in rows if r.rank <= k]
            path = os.path.join(REPO, "wotan_spark", "data", ANN_PINS[key])
            with open(path, "w") as f:
                json.dump(out, f, indent=0)
            adj_gaps, boundary_gaps = [], []
            by_q: dict[int, list] = {}
            for r in rows:
                by_q.setdefault(r.query_id, []).append((r.rank, r.cos_sim))
            for ranked in by_q.values():
                ranked.sort()
                sims = [s for _, s in ranked]
                adj_gaps += [abs(a - b) for a, b in
                             zip(sims[:k], sims[1:k]) if a != b]
                if len(sims) > k and sims[k - 1] != sims[k]:
                    boundary_gaps.append(abs(sims[k - 1] - sims[k]))
            adj = (f"min adjacent-rank gap {min(adj_gaps):.3g}"
                   if adj_gaps else "no rank gaps")
            bound = (f"min rank-{k} vs rank-{k + 1} (pin boundary) gap "
                     f"{min(boundary_gaps):.3g}"
                     if boundary_gaps else "no boundary candidates")
            print(f"{key}: {len(out)} rows pinned to {path}; {adj}; {bound}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

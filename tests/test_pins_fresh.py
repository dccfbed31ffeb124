"""Pinned-golden oracle freshness: the committed pin tables must match a
live kernel re-run on the current driver testdata.  A driver-side testdata
regeneration would silently break every pinned VALUES oracle — this test
catches it in seconds (5-doc subset of three method families)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"
N_CHECK = 5


def _sequences(n_docs):
    import duckdb
    con = duckdb.connect()
    rows = con.sql(f"""
        SELECT user_id,
               list(round(value * 1000)::INT ORDER BY ts, event_id) AS toks
        FROM read_parquet('{SF_DIR}/events.parquet')
        WHERE user_id < {n_docs} GROUP BY user_id ORDER BY user_id
    """).fetchall()
    con.close()
    return rows


@pytest.mark.parametrize("key", ["lowess", "hspline", "ridge",
                                 "gp_squared_exp"])
def test_pins_match_live_kernel(key):
    from scripts.gen_method_pins import round_half_up
    from __spark_entry__ import PINNED_DETREND
    from wotan_spark.kernels.detrend import detrend_series

    path = os.path.join(REPO, "wotan_spark", "data",
                        f"pins_{key}_sf0.01.json")
    pins = {p["doc_id"]: p for p in json.load(open(path))}
    spec = PINNED_DETREND[key]
    for user_id, toks in _sequences(N_CHECK):
        toks = np.asarray(toks[:spec.get("max_tokens", 4096)], dtype=np.int64)
        y = 1.0 + toks.astype(np.float64) / 1e6
        t = np.arange(len(y), dtype=np.float64)
        with np.errstate(all="ignore"):
            res = detrend_series(t, y, method=spec.get("method", key),
                                 **spec["params"])
        flat = res.flatten_lc
        good = flat[~np.isnan(flat)]
        flat_sum = float(good.cumsum()[-1]) if len(good) else 0.0
        pin = pins[f"user_{user_id}"]
        assert pin["n_pts"] == len(good), (key, user_id)
        assert pin["flat_sum"] == round_half_up(
            flat_sum, spec.get("decimals", 6)), (key, user_id)


def test_lttb_pins_match_live_kernel():
    from scripts.gen_lttb_pins import pins_for
    path = os.path.join(REPO, "wotan_spark", "data",
                        "lttb_pins_sf0.01.json")
    pins = {p["doc_id"]: p for p in json.load(open(path))}
    live = {p["doc_id"]: p for p in pins_for(SF_DIR, N_CHECK)}
    check = [f"user_{i}" for i in range(N_CHECK)]
    for doc_id in check:
        assert pins[doc_id] == live[doc_id], doc_id

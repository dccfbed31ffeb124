"""Periodogram operator: known-period recovery, kernel parity, plan shape."""

from __future__ import annotations

import numpy as np

from wotan_spark.spark.periodogram import dominant_periods


def _seq_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_recovers_injected_periods(spark):
    """Pure sinusoids of known period must come back as the rank-1 peak
    within grid resolution."""
    rows = []
    for doc, period in (("p16", 16.0), ("p50", 50.0), ("p128", 128.0)):
        t = np.arange(1024)
        toks = (1000 * np.sin(2 * np.pi * t / period)).astype(int)
        rows.append((doc, toks.tolist()))
    out = {r.doc_id: r.period
           for r in dominant_periods(_seq_df(spark, rows)).collect()
           if r.rank == 1}
    for doc, period in (("p16", 16.0), ("p50", 50.0), ("p128", 128.0)):
        assert abs(out[doc] - period) / period < 0.05, (doc, out[doc])


def test_matches_local_kernel_exactly(spark):
    """The Spark pass must reproduce the local kernel bit-for-bit
    (same centering, grid, and argsort tie-break)."""
    from wotan_spark.constants import LS_FREQS
    from wotan_spark.kernels.gp import lombscargle
    rng = np.random.default_rng(3)
    rows = [(f"d{i}", rng.integers(0, 2000, rng.integers(10, 400)).tolist())
            for i in range(20)]
    from wotan_spark.spark.synth import decode_tokens
    got = {(r.doc_id, r.rank): (r.period, r.power)
           for r in dominant_periods(_seq_df(spark, rows), top_k=3).collect()}
    for doc_id, toks in rows:
        y = decode_tokens(np.asarray(toks, dtype=np.int32))
        y = y - np.median(y)
        t = np.arange(len(y), dtype=float)
        freqs = np.geomspace(1.0 / t[-1], 1.0, LS_FREQS)
        p = lombscargle(t, y, freqs)
        for r, i in enumerate(np.argsort(-p, kind="stable")[:3], 1):
            period, power = got[(doc_id, r)]
            assert period == 2.0 * np.pi / freqs[i]
            assert power == float(p[i])


def test_short_sequences_emit_nothing_and_plan_is_shuffle_free(spark):
    rows = [("tiny", [1, 2, 3]), ("ok", list(range(64)))]
    df = dominant_periods(_seq_df(spark, rows), top_k=2)
    assert {r.doc_id for r in df.collect()} == {"ok"}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_gap_sentinels_do_not_dominate_spectrum(spark):
    """Gap SENTINEL tokens must be decoded + dropped like every other
    token operator: a raw -2^31 spike against a ~1e-3-amplitude signal
    made the committed period report the gap geometry, not the series'
    dominant period.  Lomb-Scargle handles the irregular grid natively."""
    from wotan_spark.spark.synth import SENTINEL

    t = np.arange(1024)
    toks = (1000 * np.sin(2 * np.pi * t / 50.0)).astype(int)
    gapped = toks.copy()
    gapped[300:340] = int(SENTINEL)
    rows = [("clean", toks.tolist()), ("gapped", gapped.tolist())]
    out = {r.doc_id: r.period
           for r in dominant_periods(_seq_df(spark, rows)).collect()
           if r.rank == 1}
    assert abs(out["clean"] - 50.0) / 50.0 < 0.05
    assert abs(out["gapped"] - 50.0) / 50.0 < 0.05, out["gapped"]

"""Mergeable histogram sketch tiers: exactness of the cascade, bounded
quantile error, out-of-range accounting."""

from __future__ import annotations

import numpy as np

from wotan_spark.spark.histogram import (_bucket_histograms,
                                         cascade_histogram,
                                         histogram_quantile, tier_histogram)

SF_DIR = "/root/testdata/sf0.001"


def test_bucket_histograms_hand_case():
    y = np.array([1.0, 1.1, 1.3, np.nan, 0.5, 9.9])
    ids, n, below, above, M = _bucket_histograms(
        y, factor=3, n_bins=4, lo=1.0, hi=1.4)
    assert ids.tolist() == [0, 1]
    assert n.tolist() == [3, 2]            # NaN not counted at all
    assert below.tolist() == [0, 1]        # 0.5
    assert above.tolist() == [0, 1]        # 9.9
    # bucket 0: 1.0 -> bin 0, 1.1 -> bin 1, 1.3 -> bin 3
    assert M[0].tolist() == [1, 1, 0, 1]
    assert M[1].tolist() == [0, 0, 0, 0]


def test_bucket_histograms_match_numpy_histogram():
    rng = np.random.default_rng(3)
    y = rng.normal(1.0, 0.003, 2005)
    y[rng.integers(0, 2005, 60)] = np.nan
    ids, n, below, above, M = _bucket_histograms(
        y, factor=100, n_bins=32, lo=0.99, hi=1.01)
    for i, b in enumerate(ids):
        seg = y[b * 100:(b + 1) * 100]
        seg = seg[~np.isnan(seg)]
        inr = seg[(seg >= 0.99) & (seg < 1.01)]
        want, _ = np.histogram(inr, bins=32, range=(0.99, 1.01))
        assert M[i].tolist() == want.tolist()
        assert below[i] == np.sum(seg < 0.99)
        assert above[i] == np.sum(seg >= 1.01)


def test_bucket_histograms_degenerate_range_classifies_on_float():
    """A tiny [lo, hi) range pushes (y-lo)/width past 2^63; the int64
    cast used to wrap to INT64_MIN and misfile above-range samples as
    n_below.  Classification must happen on the float scale."""
    y = np.array([-1e308, 1.0, 1e308])
    ids, n, below, above, M = _bucket_histograms(
        y, factor=4, n_bins=1, lo=0.0, hi=1e-18)
    assert n.tolist() == [3]
    assert below.tolist() == [1]           # only the -1e308 sample
    assert above.tolist() == [2]           # 1.0 and 1e308 are above hi
    assert M[0].tolist() == [0]


def test_cascade_is_exact_additive_merge(spark):
    """tier-100 cascaded from tier-10 must equal the directly computed
    tier-100 histogram — bin counts are additive, merge introduces zero
    error."""
    from wotan_spark.spark.synth import sequences_from_events
    seq = sequences_from_events(spark, SF_DIR)
    t10 = tier_histogram(seq, factor=10, n_bins=64, lo=1.0, hi=1.6)
    t100_c = cascade_histogram(t10, step=10)
    t100_d = tier_histogram(seq, factor=100, n_bins=64, lo=1.0, hi=1.6)
    a = {(r.doc_id, r.bucket): (r.n, r.n_below, r.n_above, tuple(r.bins))
         for r in t100_c.collect()}
    b = {(r.doc_id, r.bucket): (r.n, r.n_below, r.n_above, tuple(r.bins))
         for r in t100_d.collect()}
    assert a == b and len(a) > 0


def test_quantile_error_bounded_by_bin_width(spark):
    from wotan_spark.spark.synth import decode_tokens, sequences_from_events
    seq = sequences_from_events(spark, SF_DIR)
    n_bins, lo, hi = 64, 1.0, 1.6
    width = (hi - lo) / n_bins
    t100 = tier_histogram(seq, factor=100, n_bins=n_bins, lo=lo, hi=hi)
    got = {(r.doc_id, r.bucket): r.value
           for r in histogram_quantile(t100, 0.9, n_bins=n_bins,
                                       lo=lo, hi=hi).collect()}
    local = {r.doc_id: decode_tokens(np.asarray(r.tokens, dtype=np.int32))
             for r in seq.collect()}
    assert len(got) > 0
    for (doc_id, bucket), v in got.items():
        seg = local[doc_id][bucket * 100:(bucket + 1) * 100]
        seg = seg[~np.isnan(seg)]
        exact = np.quantile(seg, 0.9)
        # the sketch pins the ceil(q*n)-th order stat to its bin;
        # np.quantile interpolates between adjacent order stats, which can
        # sit in the neighboring bin -> bound is two bin widths
        assert abs(v - exact) <= 2 * width + 1e-12, (doc_id, bucket, v,
                                                     exact)


def test_quantile_validates_q():
    import pytest
    with pytest.raises(ValueError, match="q must be"):
        histogram_quantile(None, 0.0)

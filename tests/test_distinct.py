"""Mergeable HLL distinct-count tiers: exact coupon-mode counts, exact
union cascade, sentinel exclusion."""

from __future__ import annotations

import numpy as np
import pytest

from wotan_spark.spark.distinct import (cascade_distinct, distinct_counts,
                                        tier_distinct)

SF_DIR = "/root/testdata/sf0.001"


def _exact_distinct(spark, seq, factor):
    """Ground truth: exact per-bucket distinct token counts computed from
    the collected packed rows (sentinels excluded)."""
    out = {}
    for r in seq.collect():
        toks = np.asarray(r.tokens, dtype=np.int64)
        toks = toks[toks != -2147483648]
        nb = (len(toks) + factor - 1) // factor
        for b in range(nb):
            seg = toks[b * factor:(b + 1) * factor]
            if len(seg):
                out[(r.doc_id, b)] = len(np.unique(seg))
    return out


def test_tier_distinct_exact_in_coupon_mode(spark):
    """At <=10 distinct values per bucket the sketch is in coupon mode:
    estimates equal COUNT(DISTINCT) exactly."""
    from wotan_spark.spark.synth import sequences_from_events
    seq = sequences_from_events(spark, SF_DIR)
    got = {(r.doc_id, r.bucket): r.n_distinct
           for r in distinct_counts(tier_distinct(seq, 10)).collect()}
    want = _exact_distinct(spark, seq, 10)
    assert got == want and len(got) > 0


def test_cascade_union_equals_direct_build(spark):
    """tier-100 sketches unioned from tier-10 must estimate identically
    to sketches built directly at factor=100 AND match the exact
    distinct counts — union(sketch(A), sketch(B)) == sketch(A ∪ B)."""
    from wotan_spark.spark.synth import sequences_from_events
    seq = sequences_from_events(spark, SF_DIR)
    t10 = tier_distinct(seq, 10)
    via_union = {(r.doc_id, r.bucket): r.n_distinct
                 for r in distinct_counts(
                     cascade_distinct(t10, 10)).collect()}
    direct = {(r.doc_id, r.bucket): r.n_distinct
              for r in distinct_counts(tier_distinct(seq, 100)).collect()}
    assert via_union == direct and len(direct) > 0
    assert via_union == _exact_distinct(spark, seq, 100)


def test_sentinel_tokens_are_not_values(spark):
    """Gap sentinels must not count as a distinct token value."""
    seq = spark.createDataFrame(
        [("d0", [5, 5, -2147483648, 7], 4, "synth")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    got = {(r.doc_id, r.bucket): r.n_distinct
           for r in distinct_counts(tier_distinct(seq, 4)).collect()}
    assert got == {("d0", 0): 2}           # {5, 7}, not {5, 7, sentinel}


def test_tier_distinct_validates_params():
    with pytest.raises(ValueError, match="factor"):
        tier_distinct(None, 0)
    with pytest.raises(ValueError, match="lgk"):
        tier_distinct(None, 10, lgk=3)
    with pytest.raises(ValueError, match="step"):
        cascade_distinct(None, 0)

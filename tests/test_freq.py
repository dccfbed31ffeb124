"""Mergeable frequent-items tiers: exact while under max_items, exact
union cascade, sentinel exclusion."""

from __future__ import annotations

import numpy as np
import pytest

from wotan_spark.spark.freq import cascade_topk, tier_topk, topk_estimate

SF_DIR = "/root/testdata/sf0.001"


def _exact_counts(seq, factor):
    """Bucket by ORIGINAL position, THEN drop sentinels — the engine
    filters after posexplode, so gaps keep their positions."""
    out = {}
    for r in seq.collect():
        toks = np.asarray(r.tokens, dtype=np.int64)
        nb = (len(toks) + factor - 1) // factor
        for b in range(nb):
            seg = toks[b * factor:(b + 1) * factor]
            seg = seg[seg != -2147483648]
            for v, c in zip(*np.unique(seg, return_counts=True)):
                out[(r.doc_id, b, int(v))] = int(c)
    return out


def test_tier_topk_exact_under_max_items(spark):
    from wotan_spark.spark.synth import sequences_from_events
    seq = sequences_from_events(spark, SF_DIR)
    got = {(r.doc_id, r.bucket, r.token): r.cnt
           for r in topk_estimate(tier_topk(seq, 10), k=16).collect()}
    assert got == _exact_counts(seq, 10) and len(got) > 0


def test_cascade_topk_union_equals_direct(spark):
    from wotan_spark.spark.synth import sequences_from_events
    seq = sequences_from_events(spark, SF_DIR)
    via_union = {(r.doc_id, r.bucket, r.token): r.cnt
                 for r in topk_estimate(
                     cascade_topk(tier_topk(seq, 10), 10), k=128).collect()}
    direct = {(r.doc_id, r.bucket, r.token): r.cnt
              for r in topk_estimate(tier_topk(seq, 100), k=128).collect()}
    assert via_union == direct and len(direct) > 0
    assert via_union == _exact_counts(seq, 100)


def test_topk_truncates_to_k_heaviest(spark):
    seq = spark.createDataFrame(
        [("d", [7, 7, 7, 5, 5, 9], 6, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    got = {(r.token): r.cnt
           for r in topk_estimate(tier_topk(seq, 6), k=2).collect()}
    assert got == {7: 3, 5: 2}              # 9 (count 1) cut by k=2


def test_topk_excludes_sentinel_and_validates(spark):
    seq = spark.createDataFrame(
        [("d", [5, -2147483648, 5], 3, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    got = {(r.token): r.cnt
           for r in topk_estimate(tier_topk(seq, 4), k=4).collect()}
    assert got == {5: 2}
    with pytest.raises(ValueError):
        tier_topk(None, 0)
    with pytest.raises(ValueError):
        cascade_topk(None, 0)
    with pytest.raises(ValueError):
        topk_estimate(None, 0)

"""As-of join semantics + product-quantization ANN quality."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from wotan_spark.spark.joins import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 5, 11.0), ("a", 5, 12.0), ("b", 2, 20.0),
         ("b", 9, 21.0), ("c", 3, 30.0)],
        "k string, t long, v double")
    right = spark.createDataFrame(
        [("a", 0, 100.0), ("a", 5, 105.0), ("a", 7, 107.0),
         ("b", 4, 200.0)],
        "k string, rt long, p double")
    return left, right


def test_asof_join_backward_with_ties(spark):
    """Backward as-of: latest right.t <= left.t per key, ties included;
    keys with no past right row get NULL payload."""
    left, right = _frames(spark)
    out = {(r.k, r.t, r.v): r.p_asof
           for r in asof_join(left, right, on="k",
                              left_time="t", right_time="rt").collect()}
    assert out == {("a", 1, 10.0): 100.0,
                   ("a", 5, 11.0): 105.0,   # tie: right@5 visible to left@5
                   ("a", 5, 12.0): 105.0,
                   ("b", 2, 20.0): None,
                   ("b", 9, 21.0): 200.0,
                   ("c", 3, 30.0): None}


def test_asof_join_rejects_reserved_and_colliding_names(spark):
    """Internal plumbing names (__t/__is_left/__m/__b/__f) and suffixed
    payload collisions with left columns must raise upfront instead of
    silently producing wrong joins / duplicate output columns (ADVICE
    r03; same contract as interval_join's '__bk' check)."""
    import pytest
    left, right = _frames(spark)
    for bad in ("__t", "__is_left", "__m", "__b", "__f"):
        with pytest.raises(ValueError, match="reserved"):
            asof_join(left.withColumn(bad, F.lit(1)), right,
                      on="k", left_time="t", right_time="rt")
        with pytest.raises(ValueError, match="reserved"):
            asof_join(left, right.withColumn(bad, F.lit(1)),
                      on="k", left_time="t", right_time="rt")
    # right payload 'p' suffixed '_asof' collides with a left column
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("p_asof", F.lit(0.0)), right,
                  on="k", left_time="t", right_time="rt")
    # and the documented '__rt' payload reservation still holds
    with pytest.raises(ValueError, match="__rt"):
        asof_join(left, right.withColumn("__rt", F.lit(1)),
                  on="k", left_time="t", right_time="rt")


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {(r.k, r.t, r.v): r.p_asof
           for r in asof_join(left, right, on="k", left_time="t",
                              right_time="rt", tolerance=3).collect()}
    assert out[("b", 9, 21.0)] is None       # 9 - 4 = 5 > 3: stale
    assert out[("a", 5, 11.0)] == 105.0      # 5 - 5 = 0 <= 3
    assert out[("a", 1, 10.0)] == 100.0      # 1 - 0 = 1 <= 3


def test_asof_join_null_payload_in_matched_row_stays_null(spark):
    """A NULL payload VALUE inside the matched right row must come back
    NULL — per-column ignoreNulls fills would stitch in a staler row's
    value and check tolerance against a different row's timestamp
    (pandas merge_asof returns the matched row as-is)."""
    left = spark.createDataFrame([("a", 2, 1.0)], "k string, t long, v double")
    right = spark.createDataFrame(
        [("a", 0, 5.0, 50.0), ("a", 1, None, 51.0)],
        "k string, rt long, p double, q double")
    row = asof_join(left, right, on="k", left_time="t", right_time="rt",
                    tolerance=1).collect()[0]
    # matched row is rt=1 (within tolerance): its NULL p stays NULL and its
    # q comes through — nothing is stitched from the stale rt=0 row
    assert row.p_asof is None and row.q_asof == 51.0
    row2 = asof_join(left, right, on="k", left_time="t",
                     right_time="rt").collect()[0]
    assert row2.p_asof is None and row2.q_asof == 51.0


def test_asof_join_plan_has_single_exchange_no_join(spark):
    """The union-sort formulation must not degrade into a join operator —
    one hash exchange on the keys, one window sort, zero joins."""
    left, right = _frames(spark)
    plan = asof_join(left, right, on="k", left_time="t",
                     right_time="rt")._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_pq_encode_shapes_and_determinism(spark, tmp_path):
    from wotan_spark.spark.datapipe import pq_codebooks, pq_encode
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    B = pq_codebooks(emb, m=8, n_centroids=16)
    assert B.shape == (8, 16, 8)
    B2 = pq_codebooks(emb, m=8, n_centroids=16)
    assert np.array_equal(B, B2)             # fixed seed + ordered sample
    codes = pq_encode(emb, B).orderBy("vec_id").limit(20).collect()
    assert all(len(r.codes) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r.codes)


def test_pq_topk_recall_vs_brute(spark):
    """ADC candidates + exact rerank must recover most of the true top-k
    (the rerank tail makes the scores exact; only candidate RECALL is
    approximate)."""
    from wotan_spark.spark.datapipe import cosine_topk, cosine_topk_pq
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    truth = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qids, k=3).collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in cosine_topk_pq(emb, qids, k=3, m=8, n_centroids=16,
                                   rerank=32).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"PQ recall {recall}"
    # exact-rerank property: every returned pair carries the true cosine
    brute_all = {(r.query_id, r.neighbor_id): r.cos_sim
                 for r in cosine_topk(emb, qids, k=50).collect()}
    for r in cosine_topk_pq(emb, qids, k=3, rerank=32).collect():
        key = (r.query_id, r.neighbor_id)
        if key in brute_all:
            assert abs(brute_all[key] - r.cos_sim) < 1e-9


def test_asof_join_property_vs_pandas(spark):
    """Randomized parity vs pandas merge_asof across all three directions
    (ties included, inclusive tolerance, nearest's backward tie-break),
    duplicate left times, empty keys, and key-disjoint sides."""
    import pandas as pd
    rng = np.random.RandomState(7)
    for trial in range(9):
        nl, nr = rng.randint(5, 60), rng.randint(0, 40)
        lk = rng.choice(list("abcd"), nl)
        rk = rng.choice(list("abce"), max(nr, 1))[:nr]
        l = pd.DataFrame({"k": lk, "t": rng.randint(0, 50, nl),
                          "v": rng.randn(nl)})
        r = pd.DataFrame({"k": rk, "rt": rng.randint(0, 50, nr),
                          "p": rng.randn(nr)})
        r = r.drop_duplicates(["k", "rt"])  # unique right (key, time)
        tol = int(rng.randint(1, 20)) if trial % 2 else None
        direction = ["backward", "forward", "nearest"][trial % 3]
        want = pd.merge_asof(
            l.sort_values("t", kind="stable"), r.sort_values("rt"),
            left_on="t", right_on="rt", by="k",
            tolerance=tol, direction=direction)
        # bucket_width exercises the skew path on every trial; both paths
        # must match pandas exactly (width 1 makes every bucket a carry
        # test, larger widths mix local and carry fills)
        width = [None, 1, 7, 25][trial % 4]
        got = asof_join(
            spark.createDataFrame(l), spark.createDataFrame(r),
            on="k", left_time="t", right_time="rt",
            tolerance=tol, direction=direction,
            bucket_width=width).toPandas()
        key = ["k", "t", "v"]
        want = want.sort_values(key).reset_index(drop=True)
        got = got.sort_values(key).reset_index(drop=True)
        assert len(got) == len(want)
        a = got["p_asof"].to_numpy(dtype=float)
        b = want["p"].to_numpy(dtype=float)
        ok = np.isclose(a, b) | (np.isnan(a) & np.isnan(b))
        assert ok.all(), (trial, width, got[~ok], want[~ok])


def test_asof_join_skewed_hot_key_bucketed(spark):
    """Adversarial skew (VERDICT r03 item 6): one key owning 90% of both
    sides.  The default single-window path puts that key in ONE task; the
    bucketed path must (a) produce the identical result and (b) bound the
    largest shuffle group by the bucket population, not the key
    population — the property that removes the straggler task."""
    n_hot, n_cold, width = 9000, 1000, 128
    left = [("hot", t, float(t)) for t in range(n_hot)] + \
           [(f"c{t % 20}", t, float(t)) for t in range(n_cold)]
    right = [("hot", rt, rt * 10.0) for rt in range(0, n_hot, 7)] + \
            [(f"c{i}", 100 + i, 1.0) for i in range(20)]
    ldf = spark.createDataFrame(left, "k string, t long, v double")
    rdf = spark.createDataFrame(right, "k string, rt long, p double")
    for direction, tol in (("backward", None), ("nearest", 40),
                           ("forward", 3)):
        base = {(r.k, r.t): r.p_asof for r in
                asof_join(ldf, rdf, on="k", left_time="t", right_time="rt",
                          direction=direction, tolerance=tol).collect()}
        skew = {(r.k, r.t): r.p_asof for r in
                asof_join(ldf, rdf, on="k", left_time="t", right_time="rt",
                          direction=direction, tolerance=tol,
                          bucket_width=width).collect()}
        assert skew == base, direction
    # shuffle-group bound: the hot key's window group shrinks from 90% of
    # the union frame to one bucket's population
    union_rows = [(k, t) for k, t, _ in left] + [(k, t) for k, t, _ in right]
    from collections import Counter
    single = Counter(k for k, _ in union_rows)
    bucketed = Counter((k, t // width) for k, t in union_rows)
    assert single.most_common(1)[0][1] > 0.8 * len(union_rows)
    per_bucket_density = 1 + 1 / 7          # left + right rows per tick
    assert bucketed.most_common(1)[0][1] <= width * per_bucket_density + 2


def test_asof_join_bucketed_rejects_nonnumeric_time(spark):
    import datetime
    import pytest
    l = spark.createDataFrame([("a", datetime.datetime(2024, 1, 1), 1.0)],
                              "k string, t timestamp, v double")
    r = spark.createDataFrame([("a", datetime.datetime(2024, 1, 1), 2.0)],
                              "k string, rt timestamp, p double")
    with pytest.raises(ValueError, match="numeric"):
        asof_join(l, r, on="k", left_time="t", right_time="rt",
                  bucket_width=60)


# ---------------------------------------------------------------------------
# interval_join


def _iv_frames(spark):
    pts = spark.createDataFrame(
        [("a", 0, "p0"), ("a", 5, "p1"), ("a", 10, "p2"), ("a", 99, "p3"),
         ("b", 5, "p4"), ("c", 1, "p5")],
        "k string, t long, tag string")
    ivs = spark.createDataFrame(
        [("a", 0, 10, "i0"),       # [0,10): catches t=0,5 not 10
         ("a", 5, 200, "i1"),      # long interval spanning many buckets
         ("a", 7, 7, "i2"),        # empty: matches nothing
         ("b", 6, 8, "i3"),        # misses b@5
         ("d", 0, 100, "i4")],     # key with no points
        "k string, s long, e long, name string")
    return pts, ivs


def test_interval_join_half_open_semantics(spark):
    from wotan_spark.spark.joins import interval_join
    pts, ivs = _iv_frames(spark)
    got = {(r.k, r.t, r.name_iv)
           for r in interval_join(pts, ivs, on="k", point_col="t",
                                  start_col="s", end_col="e",
                                  bucket_width=4).collect()}
    assert got == {("a", 0, "i0"),           # t=start included
                   ("a", 5, "i0"), ("a", 5, "i1"),   # overlap: both match
                   ("a", 10, "i1"),          # t=10 == i0.end excluded
                   ("a", 99, "i1")}          # far bucket of the long one


def test_interval_join_left_keeps_unmatched(spark):
    from wotan_spark.spark.joins import interval_join
    pts, ivs = _iv_frames(spark)
    out = interval_join(pts, ivs, on="k", point_col="t", start_col="s",
                        end_col="e", bucket_width=4, how="left")
    rows = {(r.k, r.t): r.name_iv for r in
            out.filter(F.col("name_iv").isNull()).collect()}
    assert rows == {("b", 5): None, ("c", 1): None}
    assert out.count() == 7                  # 5 matches + 2 null rows


def test_interval_join_matches_bruteforce_property(spark):
    """Random integer AND float inputs (negative times included) against
    the O(n*m) definition; every bucket-width must give the same set."""
    rng = np.random.default_rng(7)
    n_p, n_i = 200, 60
    pk = rng.integers(0, 4, n_p)
    pt = rng.integers(-500, 500, n_p)
    ik = rng.integers(0, 4, n_i)
    s = rng.integers(-520, 480, n_i)
    ln = rng.integers(0, 90, n_i)
    for as_float in (False, True):
        typ = "double" if as_float else "long"
        cast = float if as_float else int
        pts = spark.createDataFrame(
            [(f"k{k}", cast(t), i) for i, (k, t) in enumerate(zip(pk, pt))],
            f"k string, t {typ}, pid long")
        ivs = spark.createDataFrame(
            [(f"k{k}", cast(a), cast(a + l), i)
             for i, (k, a, l) in enumerate(zip(ik, s, ln))],
            f"k string, s {typ}, e {typ}, iid long")
        want = {(int(pi), int(ii))
                for pi, (kp, tp) in enumerate(zip(pk, pt))
                for ii, (ki, a, l) in enumerate(zip(ik, s, ln))
                if kp == ki and a <= tp < a + l}
        from wotan_spark.spark.joins import interval_join
        for w in (1, 7, 64, 1000):
            got = {(r.pid, r.iid_iv)
                   for r in interval_join(
                       pts, ivs, on="k", point_col="t", start_col="s",
                       end_col="e",
                       bucket_width=float(w) if as_float else w).collect()}
            assert got == want, (as_float, w)


def test_interval_join_plans_equi_join_not_nested_loop(spark):
    """The whole point: the plan must contain a hash/sort-merge EQUI join,
    never a BroadcastNestedLoopJoin or CartesianProduct."""
    from wotan_spark.spark.joins import interval_join
    pts, ivs = _iv_frames(spark)
    plan = interval_join(pts, ivs, on="k", point_col="t", start_col="s",
                         end_col="e", bucket_width=4)._jdf \
        .queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def test_interval_join_validates_params(spark):
    import pytest
    from wotan_spark.spark.joins import interval_join
    pts, ivs = _iv_frames(spark)
    with pytest.raises(ValueError, match="how"):
        interval_join(pts, ivs, "k", "t", "s", "e", 4, how="outer")
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(pts, ivs, "k", "t", "s", "e", 0)


def test_interval_join_auto_bucket_width(spark):
    """bucket_width=None tunes to the median interval length and gives
    the same matches as any explicit width; empty interval frames fall
    back cleanly."""
    from wotan_spark.spark.joins import interval_join
    pts, ivs = _iv_frames(spark)
    explicit = {(r.k, r.t, r.name_iv)
                for r in interval_join(pts, ivs, on="k", point_col="t",
                                       start_col="s", end_col="e",
                                       bucket_width=4).collect()}
    auto = {(r.k, r.t, r.name_iv)
            for r in interval_join(pts, ivs, on="k", point_col="t",
                                   start_col="s", end_col="e").collect()}
    assert auto == explicit
    empty = ivs.filter("1 = 0")
    assert interval_join(pts, empty, on="k", point_col="t",
                         start_col="s", end_col="e").count() == 0


def test_interval_join_nan_times_never_match(spark):
    """A NaN point time has no bucket (NULL after the long cast), so it
    matches nothing in inner mode and survives with NULL payload in left
    mode — pinned here as the documented semantics."""
    from wotan_spark.spark.joins import interval_join
    pts = spark.createDataFrame(
        [("a", 1.0, 0), ("a", float("nan"), 1)],
        "k string, t double, pid int")
    ivs = spark.createDataFrame([("a", 0.0, 10.0, "i0")],
                                "k string, s double, e double, name string")
    inner = interval_join(pts, ivs, on="k", point_col="t", start_col="s",
                          end_col="e", bucket_width=4.0)
    assert {r.pid for r in inner.collect()} == {0}
    left = interval_join(pts, ivs, on="k", point_col="t", start_col="s",
                         end_col="e", bucket_width=4.0, how="left")
    got = {r.pid: r.name_iv for r in left.collect()}
    assert got == {0: "i0", 1: None}


def test_interval_join_auto_width_survives_one_huge_interval(spark):
    """The auto width is floored at max_length/4096, so one huge interval
    amid short ones cannot explode the bucket sequence."""
    from wotan_spark.spark.joins import interval_join
    pts = spark.createDataFrame(
        [("a", 5, 0), ("a", 10_000_000_000, 1)], "k string, t long, pid int")
    ivs = spark.createDataFrame(
        [("a", 0, 2, "s0"), ("a", 2, 4, "s1"), ("a", 4, 6, "s2"),
         ("a", 0, 20_000_000_000, "huge")],
        "k string, s long, e long, name string")
    got = {(r.pid, r.name_iv)
           for r in interval_join(pts, ivs, on="k", point_col="t",
                                  start_col="s", end_col="e").collect()}
    assert got == {(0, "s2"), (0, "huge"), (1, "huge")}


def test_interval_join_skewed_hot_key_and_pathological_median(spark):
    """Adversarial skew (VERDICT r03 item 6): one key owns 90% of the
    points AND the interval-length median is pathological (thousands of
    2-tick sessions plus one corpus-spanning interval).  The bucketized
    rewrite must stay exact, and the largest (key, bucket) shuffle group
    must be bounded by bucket population — time spreads the hot key, so
    no single straggler task."""
    from collections import Counter

    from wotan_spark.spark.joins import interval_join
    n_hot, n_cold = 9000, 1000
    pts = [("hot", t, t) for t in range(n_hot)] + \
          [(f"c{t % 20}", t, n_hot + t) for t in range(n_cold)]
    ivs = [("hot", s, s + 2, f"s{s}") for s in range(0, n_hot, 4)] + \
          [("hot", 0, 10_000_000_000, "huge")] + \
          [(f"c{i}", 0, 500, f"cold{i}") for i in range(20)]
    pdf = spark.createDataFrame(pts, "k string, t long, pid long")
    idf = spark.createDataFrame(ivs, "k string, s long, e long, name string")
    want = {(pid, name) for k, t, pid in pts
            for ik, s, e, name in ivs if ik == k and s <= t < e}
    matched = {pid for pid, _ in want}
    for how in ("inner", "left"):
        out = interval_join(pdf, idf, on="k", point_col="t",
                            start_col="s", end_col="e", how=how)
        got = {(r.pid, r.name_iv) for r in out.collect()}
        expect = want if how == "inner" else want | {
            (pid, None) for _, _, pid in pts if pid not in matched}
        assert got == expect, how
    # shuffle-group bound: the long/short split sends the huge interval to
    # the broadcast pass, so the auto width stays at the median (2) — the
    # hot key's 9000 points spread over ~4500 buckets instead of packing
    # one (key, bucket) group.  Replicate the bucketing to assert it.
    width = 2
    groups = Counter((k, t // width) for k, t, _ in pts)
    hot_total = sum(1 for k, _, _ in pts if k == "hot")
    assert hot_total > 0.8 * len(pts)
    assert groups.most_common(1)[0][1] <= width + 1
    iv_groups = Counter()
    for ik, s, e, _ in ivs:
        if e - s > 64 * width:          # broadcast pass, never exploded
            continue
        for b in range(s // width, (e - 1) // width + 1):
            iv_groups[(ik, b)] += 1
    assert iv_groups.most_common(1)[0][1] <= 2
    # and the degenerate opt-out still bounds the explode via the /4096
    # floor (single-pass plan)
    legacy = interval_join(pdf, idf, on="k", point_col="t", start_col="s",
                           end_col="e", long_factor=None)
    assert {(r.pid, r.name_iv) for r in legacy.collect()} == want


def test_interval_join_explicit_width_is_lazy(spark):
    """An explicit bucket_width call must run ZERO Spark jobs at plan-build
    time (round-4 review: the long-side probe made every call eager,
    doubling the intervals-subtree cost of driver queries that had already
    sized their buckets)."""
    from wotan_spark.spark.joins import interval_join
    pts, ivs = _iv_frames(spark)
    sc = spark.sparkContext
    sc.setJobGroup("ij-lazy-check", "interval_join plan build")
    try:
        plan = interval_join(pts, ivs, on="k", point_col="t",
                             start_col="s", end_col="e", bucket_width=4)
        assert list(sc.statusTracker().getJobIdsForGroup(
            "ij-lazy-check")) == []
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert plan.count() == 5        # and the plan still works


def test_interval_join_auto_falls_back_past_broadcast_budget(spark):
    """Default-parameter calls on a heavy-tailed corpus (more long
    intervals than the broadcast budget) must DEGRADE to the floored
    single-pass plan, not raise (round-4 review); an explicit long_factor
    opts into the strict ValueError."""
    import pytest
    from wotan_spark.spark.joins import interval_join
    pts = spark.createDataFrame(
        [("k", t, t) for t in range(40)], "k string, t long, pid long")
    # median length 2, three intervals far past 64x the median
    ivs = spark.createDataFrame(
        [("k", i, i + 2, f"s{i}") for i in range(0, 20, 2)]
        + [("k", 0, 100_000_000 + i, f"L{i}") for i in range(3)],
        "k string, s long, e long, name string")
    iv_rows = [(r.s, r.e, r.name) for r in ivs.collect()]
    want = {(t, n) for t in range(40)          # pid == t
            for s, e, n in iv_rows if s <= t < e}
    got = {(r.pid, r.name_iv) for r in interval_join(
        pts, ivs, on="k", point_col="t", start_col="s", end_col="e",
        long_broadcast_max=2).collect()}
    assert got == want
    with pytest.raises(ValueError, match="long_broadcast_max"):
        interval_join(pts, ivs, on="k", point_col="t", start_col="s",
                      end_col="e", long_factor=64, long_broadcast_max=2)
    # a float factor ENGAGES the split (strict mode) — it must not pass
    # validation yet silently disable it
    with pytest.raises(ValueError, match="long_broadcast_max"):
        interval_join(pts, ivs, on="k", point_col="t", start_col="s",
                      end_col="e", long_factor=64.0, long_broadcast_max=2)
    with pytest.raises(ValueError, match="long_factor"):
        interval_join(pts, ivs, on="k", point_col="t", start_col="s",
                      end_col="e", long_factor="bogus")
    with pytest.raises(ValueError, match="long_factor"):
        interval_join(pts, ivs, on="k", point_col="t", start_col="s",
                      end_col="e", long_factor=0.5)


def test_asof_join_bucketed_mixed_time_types(spark):
    """Round-4 review: long left + double right promotes the union's __t
    to double; the bucket expression must follow the RESOLVED type, not
    left's (an integer `div` on a double column fails to plan)."""
    from wotan_spark.spark.joins import asof_join
    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2)], "k string, t long, pid int")
    right = spark.createDataFrame(
        [("a", 9.5, 100.0), ("a", 19.5, 200.0)],
        "k string, rt double, v double")
    out = asof_join(left, right, on="k", left_time="t", right_time="rt",
                    bucket_width=5)
    got = {(r.pid, r.v_asof) for r in out.collect()}
    assert got == {(1, 100.0), (2, 200.0)}
    # and the same frames agree with the single-window plan
    ref = asof_join(left, right, on="k", left_time="t", right_time="rt")
    assert got == {(r.pid, r.v_asof) for r in ref.collect()}


def test_interval_join_suffix_collision_raises(spark):
    """Same contract as asof_join: a suffixed interval column equal to a
    point column name would emit duplicate output columns (downstream
    select-by-name dies with AMBIGUOUS_REFERENCE)."""
    import pytest

    from wotan_spark.spark.joins import interval_join

    pts = spark.createDataFrame([(1, 5, "x")], "k int, t int, v_iv string")
    ivs = spark.createDataFrame([(1, 0, 10, "a")],
                                "k int, s int, e int, v string")
    with pytest.raises(ValueError, match="collide"):
        interval_join(pts, ivs, on="k", point_col="t",
                      start_col="s", end_col="e", bucket_width=4)

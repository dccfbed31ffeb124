"""Time-series joins: as-of alignment and interval containment over co-partitioned keys.

The reference library has no joins (SURVEY.md §2.5 — its only join-like
operation is the positional trend transplant), but a rollup engine over
10^12 sequences needs point-in-time alignment: enrich each observation with
the most recent state of a slowly-changing reference series (the latest
committed tier bucket, a calibration curve, a model-version row).

Spark has no ASOF JOIN operator, and the naive formulations are
scale-killers: a theta-join (``l.t >= r.t``) explodes into a broadcast
nested loop, and a per-key ``max(r.t)`` correlated subquery shuffles twice.
``asof_join`` instead uses the union-sort formulation: tag both inputs,
union them, and run ONE window pass per key ordered by time — the right
side's payload is filled onto left rows via RANGE-framed
``last/first(..., ignoreNulls=True)``.  Cost at scale: a single hash
exchange of |L| + |R| rows on the join keys (AQE-sizable), one sort within
partitions, zero joins — the same shape as the engine's segmentation and
gap-fill windows, so a co-partitioned input (bucketed tables) runs
shuffle-free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_time: str, right_time: str,
              tolerance: float | int | None = None,
              direction: str = "backward",
              suffix: str = "_asof",
              bucket_width: int | float | None = None) -> DataFrame:
    """For every left row, attach the payload of the right row nearest in
    time within the same key group (pandas ``merge_asof`` semantics, exact
    matches included):

    * ``backward`` — latest right with ``rt <= t`` (default);
    * ``forward`` — earliest right with ``rt >= t``;
    * ``nearest`` — whichever of the two is closer (backward wins ties).

    Right payload columns come back suffixed; left rows with no candidate
    (or none within ``tolerance`` absolute distance) get NULL payload.
    ``on`` — equality key column(s); right (key, time) pairs are assumed
    unique (true for bucketed tier tables; duplicates would make the
    chosen payload ambiguous).

    The RANGE window frames over the single time ordering include every
    right row at the exact left timestamp regardless of intra-instant sort
    position, so exact matches are deterministic without a secondary sort
    key.

    ``bucket_width`` (optional) is the SKEW path: the default single
    window per key puts a key owning 90% of the rows into one task (sort +
    fill are not splittable within a window partition).  With a width set,
    rows window within (key, time-div-width) buckets instead — the hot key
    spreads across its time range — and left rows with no in-bucket match
    take a carry-in fill computed on the BUCKET-LEVEL frame (one row per
    (key, bucket), orders of magnitude smaller, so its own window is
    cheap).  Output is identical to the single-window path (tested,
    including property parity vs pandas merge_asof); the trade is one
    extra small-frame shuffle join.  Pick a width so a typical key has
    many populated buckets — e.g. the tier bucket width.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys + [right_time]]
    carry = [c for c in left.columns if c not in keys + [left_time]]
    # fail upfront on names that would silently corrupt the union-sort
    # plumbing or emit ambiguous duplicate output columns (same contract
    # as interval_join's '__bk' check)
    reserved = {"__t", "__is_left", "__m", "__b", "__f",
                "__bk", "__lm", "__fm", "__cb", "__cf"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"column names {sorted(clash)} are reserved "
                         "by asof_join")
    out_names = set(keys) | {left_time} | set(carry)
    dup = [c for c in payload if f"{c}{suffix}" in out_names]
    if dup:
        raise ValueError(
            f"suffixed payload column(s) {[f'{c}{suffix}' for c in dup]} "
            "collide with left columns; pass a different suffix")

    # the match is filled as ONE struct (timestamp + all payload columns),
    # not column-by-column: independent last/first(ignoreNulls) fills
    # would skip a NULL payload VALUE in the matched row and stitch in a
    # staler row's value (and could pair a payload with a different row's
    # timestamp for the tolerance check).  A struct is non-null exactly
    # when the row is a right row, so the fill lands on whole rows.
    from pyspark.sql.types import StructField, StructType
    if "__rt" in payload:
        raise ValueError("right payload column name '__rt' is reserved")
    m_type = StructType(
        [StructField("__rt", right.schema[right_time].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in payload])

    lt = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in carry],
        F.lit(None).cast(m_type).alias("__m"),
    )
    rt = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
        F.struct(F.col(right_time).alias("__rt"),
                 *[F.col(c) for c in payload]).alias("__m"),
    )
    want_b = direction in ("backward", "nearest")
    want_f = direction in ("forward", "nearest")

    if bucket_width is None:
        base = Window.partitionBy(*keys).orderBy("__t")
        wb = base.rangeBetween(Window.unboundedPreceding, Window.currentRow)
        wf = base.rangeBetween(Window.currentRow, Window.unboundedFollowing)
        fills = []
        if want_b:
            fills.append(F.last("__m", ignorenulls=True).over(wb)
                         .alias("__b"))
        if want_f:
            fills.append(F.first("__m", ignorenulls=True).over(wf)
                         .alias("__f"))
        u = (lt.unionByName(rt)
             .select(*keys, "__t", "__is_left", *carry, *fills)
             .filter(F.col("__is_left") == 1))
    else:
        # the bucketing mode must follow the UNION's resolved __t type,
        # not left's alone: long left + double right promotes __t to
        # double, where an integer `div` bucket expression fails to plan
        un = lt.unionByName(rt)
        u = _asof_bucketed(un, keys, carry, bucket_width,
                           un.schema["__t"].dataType, want_b, want_f)

    def _bad(m: str, dist: F.Column) -> F.Column:
        bad = F.col(m).isNull()
        if tolerance is not None:
            bad = bad | (dist > F.lit(tolerance))
        return bad

    if direction == "backward":
        bad = _bad("__b", F.col("__t") - F.col("__b.__rt"))
        sel = [F.when(~bad, F.col(f"__b.{c}")).alias(f"{c}{suffix}")
               for c in payload]
    elif direction == "forward":
        bad = _bad("__f", F.col("__f.__rt") - F.col("__t"))
        sel = [F.when(~bad, F.col(f"__f.{c}")).alias(f"{c}{suffix}")
               for c in payload]
    else:
        bad_b = _bad("__b", F.col("__t") - F.col("__b.__rt"))
        bad_f = _bad("__f", F.col("__f.__rt") - F.col("__t"))
        use_b = ~bad_b & (bad_f | ((F.col("__t") - F.col("__b.__rt"))
                                   <= (F.col("__f.__rt") - F.col("__t"))))
        sel = [F.when(use_b, F.col(f"__b.{c}"))
               .otherwise(F.when(~bad_f, F.col(f"__f.{c}")))
               .alias(f"{c}{suffix}") for c in payload]

    return (u.select(*keys, F.col("__t").alias(left_time), *carry, *sel))


def _asof_bucketed(un: DataFrame, keys: list[str], carry: list[str],
                   bucket_width, time_type, want_b: bool,
                   want_f: bool) -> DataFrame:
    """Skew path of asof_join: windows run within (key, time-bucket)
    groups, so a hot key's rows split across its time range instead of one
    task.  Cross-bucket matches come from a bucket-level carry frame (one
    row per populated (key, bucket)).

    Bucket ids only need to be MONOTONIC in time for the carry ordering to
    be sound (every right row in an earlier bucket is strictly older than
    every left row in a later one), so integral times use exact truncating
    ``div`` (consistent, safe past 2^53) and floats use plain division —
    floor alignment is irrelevant.
    """
    from pyspark.sql.types import NumericType
    if not bucket_width > 0:
        raise ValueError("bucket_width must be > 0")
    if not isinstance(time_type, NumericType):
        raise ValueError("bucket_width (skew path) requires numeric time "
                         f"columns, got {time_type.simpleString()}")
    integral = time_type.typeName() in {"integer", "long", "short", "byte"}
    if integral and isinstance(bucket_width, int):
        bk = F.expr(f"`__t` div {int(bucket_width)}")
    else:
        bk = F.floor(F.col("__t") / F.lit(float(bucket_width))).cast("long")
    un = un.withColumn("__bk", bk)

    grp = Window.partitionBy(*keys, "__bk").orderBy("__t")
    whole = grp.rangeBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    fills = []
    if want_b:
        fills.append(F.last("__m", ignorenulls=True).over(
            grp.rangeBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("__b"))
        # newest right row of the whole bucket (feeds later buckets' carry)
        fills.append(F.last("__m", ignorenulls=True).over(whole)
                     .alias("__lm"))
    if want_f:
        fills.append(F.first("__m", ignorenulls=True).over(
            grp.rangeBetween(Window.currentRow, Window.unboundedFollowing))
            .alias("__f"))
        fills.append(F.first("__m", ignorenulls=True).over(whole)
                     .alias("__fm"))
    un = un.select(*keys, "__bk", "__t", "__is_left", *carry, *fills)

    # bucket-level carry frame: one row per populated (key, bucket) —
    # orders of magnitude smaller than the row frame, so ITS per-key
    # window is cheap even for the hot key
    bw = Window.partitionBy(*keys).orderBy("__bk")
    bags, cars = [], []
    if want_b:
        bags.append(F.any_value("__lm").alias("__lm"))
        cars.append(F.last("__lm", ignorenulls=True).over(
            bw.rowsBetween(Window.unboundedPreceding, -1)).alias("__cb"))
    if want_f:
        bags.append(F.any_value("__fm").alias("__fm"))
        cars.append(F.first("__fm", ignorenulls=True).over(
            bw.rowsBetween(1, Window.unboundedFollowing)).alias("__cf"))
    bframe = (un.groupBy(*keys, "__bk").agg(*bags)
              .select(*keys, "__bk", *cars))

    out_fill = []
    if want_b:
        out_fill.append(F.coalesce("__b", "__cb").alias("__b"))
    if want_f:
        out_fill.append(F.coalesce("__f", "__cf").alias("__f"))
    return (un.filter(F.col("__is_left") == 1)
            .join(bframe, [*keys, "__bk"], "left")
            .select(*keys, "__t", "__is_left", *carry, *out_fill))


def interval_join(points: DataFrame, intervals: DataFrame,
                  on: list[str] | str, point_col: str,
                  start_col: str, end_col: str,
                  bucket_width: int | float | None = None,
                  how: str = "inner", suffix: str = "_iv",
                  long_factor: int | str | None = "auto",
                  long_broadcast_max: int = 100_000) -> DataFrame:
    """For every point row, attach each half-open interval ``[start, end)``
    of the same key group that contains it (one output row per match;
    ``how="left"`` keeps pointless rows with NULL interval columns).

    The naive formulation (``t >= start AND t < end``) has no equi key, so
    Spark plans a broadcast-nested-loop or cartesian product — a
    scale-killer when neither side fits in memory.  This operator
    bucketizes instead: points land in ``bucket = t div W`` (exactly one
    bucket each), intervals EXPLODE over every bucket they cover, and the
    join becomes a plain shuffle-hash equi-join on (keys, bucket) with the
    exact containment predicate evaluated inside the join — the standard
    range-join optimization.  Each match is emitted exactly once (a point
    is in one bucket), so no post-join dedup is needed.

    Cost at scale: one exchange of |P| + |I| * (avg interval span / W)
    rows.  Pick ``bucket_width`` near the TYPICAL interval length: too
    small replicates long intervals over many buckets, too large packs
    unrelated rows into one bucket and degrades to per-bucket nested
    loops.  ``bucket_width=None`` (default) auto-tunes to the median
    interval length via one small eager aggregation over the intervals
    side.  Integer times use exact integer ``div`` throughout (no float
    rounding at bucket edges, safe past 2^53); float times use a
    consistent ``floor`` on both sides.  Empty intervals (``end <=
    start``) match nothing, as half-open semantics dictate.

    Long/short split (``long_factor``): an interval longer than
    ``long_factor * width`` would either explode over many buckets (small
    width) or force a width so coarse that one (key, bucket) group holds a
    skewed key's whole point set — the straggler task.  Such intervals are
    rare by construction (the width tracks the MEDIAN), so they take a
    separate BROADCAST pass instead: key-equi broadcast join + containment
    filter, fully parallel over the point partitions, no explode, while
    the 99% short intervals keep the fine bucketized join.  Deciding the
    split needs an eager count of the long side (guarded by
    ``long_broadcast_max``), so its default is ``"auto"``: engage (at
    factor 64) only when ``bucket_width`` is also auto — that path is
    already eager for the median, and it is where a pathological median
    can mis-size the buckets.  With an EXPLICIT ``bucket_width`` the call
    stays fully lazy (single-pass plan; the caller sized the buckets).
    Under ``"auto"``, more than ``long_broadcast_max`` long intervals
    falls back to the single-pass plan with the max/4096 explode floor —
    degraded bucketing, never an error.  An explicit integer
    ``long_factor`` forces the split for any ``bucket_width`` and treats
    an over-budget long side as a ValueError (the caller opted into the
    broadcast).  ``long_factor=None`` disables the split outright.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unknown how {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in intervals.columns if c not in keys]
    if "__bk" in points.columns or "__bk" in intervals.columns:
        raise ValueError("column name '__bk' is reserved")
    # same contract as asof_join: a suffixed interval column that equals a
    # point column name would silently emit duplicate output columns —
    # the join succeeds and the first downstream select-by-name fails
    # with AMBIGUOUS_REFERENCE (or positional access reads the wrong one)
    dup = [c for c in payload if f"{c}{suffix}" in set(points.columns)]
    if dup:
        raise ValueError(
            f"suffixed interval column(s) {[f'{c}{suffix}' for c in dup]} "
            "collide with point columns; pass a different suffix")

    explicit_factor = (isinstance(long_factor, (int, float))
                       and not isinstance(long_factor, bool))
    if isinstance(long_factor, str):
        if long_factor != "auto":
            raise ValueError(f"unknown long_factor {long_factor!r}")
    elif long_factor is not None and (not explicit_factor
                                      or long_factor < 1):
        raise ValueError("long_factor must be a number >= 1, 'auto', "
                         "or None")
    split = explicit_factor or (long_factor == "auto"
                                and bucket_width is None)
    factor = long_factor if explicit_factor else 64
    med = mx = None

    integral = {"integer", "long", "short", "byte"}
    cols_integral = (
        points.schema[point_col].dataType.typeName() in integral
        and intervals.schema[start_col].dataType.typeName() in integral
        and intervals.schema[end_col].dataType.typeName() in integral)
    if bucket_width is None:
        # auto-tune to the median interval length — ONE small eager
        # aggregation over the intervals side (documented trade: this
        # call is no longer fully lazy, but it removes the operator's
        # main footgun of a mis-sized bucket).  With the long/short split
        # active the width tracks the median alone (long outliers go to
        # the broadcast pass); without it the width is floored at
        # max_length/4096 so a single huge interval amid short ones can
        # never explode into an unbounded bucket sequence (the explode
        # would otherwise have to build a length/median-element array).
        row = (intervals
               .filter(F.col(end_col) > F.col(start_col))
               .select(F.expr(
                   f"percentile_approx(`{end_col}` - `{start_col}`, 0.5)")
                   .alias("m"),
                   F.expr(f"max(`{end_col}` - `{start_col}`)")
                   .alias("mx"))
               .first())
        med, mx = row["m"], row["mx"]
        if med is None:
            bucket_width = 1 if cols_integral else 1.0
        elif split:
            bucket_width = (max(1, int(med)) if cols_integral
                            else (float(med) if med > 0 else 1.0))
        elif cols_integral:
            bucket_width = max(1, int(med), -(-int(mx) // 4096))
        else:
            bucket_width = max(float(med), float(mx) / 4096.0) \
                if med > 0 or mx > 0 else 1.0
    if not bucket_width > 0:
        raise ValueError("bucket_width must be > 0")

    n_long = 0
    if split:
        # eager probe of the long side (bounded by limit+count).  Only
        # reached on the auto-width path — already eager for the median —
        # or an explicit long_factor opt-in.
        probe_len = F.col(end_col) - F.col(start_col)
        n_long = (intervals
                  .filter(F.col(end_col) > F.col(start_col))
                  .filter(probe_len > F.lit(factor) * F.lit(bucket_width))
                  .limit(long_broadcast_max + 1).count())
        if n_long > long_broadcast_max:
            if long_factor == "auto":
                # too many long intervals to broadcast: degrade to the
                # floored single-pass plan (med/mx are known here — the
                # auto split only engages with auto width) instead of
                # erroring a default-parameter call on a heavy-tailed
                # corpus
                split = False
                if cols_integral:
                    bucket_width = max(1, int(med), -(-int(mx) // 4096))
                else:
                    bucket_width = max(float(med), float(mx) / 4096.0)
            else:
                raise ValueError(
                    f"more than long_broadcast_max={long_broadcast_max} "
                    f"intervals exceed {factor}x the bucket width — raise "
                    "bucket_width/long_factor or disable the split "
                    "(long_factor=None)")

    int_mode = cols_integral and isinstance(bucket_width, int)
    if int_mode:
        w = F.lit(int(bucket_width))
        pb = F.expr(f"`{point_col}` div {int(bucket_width)}")
        lo = F.expr(f"`{start_col}` div {int(bucket_width)}")
        hi = F.expr(f"(`{end_col}` - 1) div {int(bucket_width)}")
    else:
        w = F.lit(float(bucket_width))
        pb = F.floor(F.col(point_col) / w).cast("long")
        lo = F.floor(F.col(start_col) / w).cast("long")
        hi = (F.ceil(F.col(end_col) / w) - 1).cast("long")

    def _cond(with_bucket: bool) -> F.Column:
        cond = (F.col(f"__p.`{point_col}`") >= F.col(f"__i.`{start_col}`")) \
            & (F.col(f"__p.`{point_col}`") < F.col(f"__i.`{end_col}`"))
        if with_bucket:
            cond = cond & (F.col("__p.__bk") == F.col("__i.__bk"))
        for k in keys:
            cond = cond & (F.col(f"__p.`{k}`") == F.col(f"__i.`{k}`"))
        return cond

    out_left = [F.col(f"__p.`{c}`").alias(c) for c in points.columns]
    out_right = [F.col(f"__i.`{c}`").alias(f"{c}{suffix}") for c in payload]
    valid = intervals.filter(F.col(end_col) > F.col(start_col))
    p = points.withColumn("__bk", pb)

    if not split:
        iv = valid.withColumn("__bk", F.explode(F.sequence(lo, hi)))
        return (p.alias("__p").join(iv.alias("__i"), _cond(True), how)
                .select(*out_left, *out_right))

    length = F.col(end_col) - F.col(start_col)
    thr = F.lit(factor) * F.lit(bucket_width)
    short_iv = valid.filter(length <= thr)
    long_iv = valid.filter(length > thr)
    iv = short_iv.withColumn("__bk", F.explode(F.sequence(lo, hi)))
    parts = [p.alias("__p").join(iv.alias("__i"), _cond(True), "inner")
             .select(*out_left, *out_right)]
    if n_long:
        parts.append(
            points.alias("__p")
            .join(F.broadcast(long_iv.alias("__i")), _cond(False), "inner")
            .select(*out_left, *out_right))
    inner = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    if how == "inner":
        return inner
    # how="left": unmatched point rows (row-level anti joins preserve
    # duplicate points) come back with NULL interval columns, exactly as
    # the single-pass left join emitted them
    un = p.alias("__p").join(iv.alias("__i"), _cond(True), "left_anti")
    if n_long:
        un = (un.alias("__p")
              .join(F.broadcast(long_iv.alias("__i")), _cond(False),
                    "left_anti"))
    nulls = [F.lit(None).cast(intervals.schema[c].dataType)
             .alias(f"{c}{suffix}") for c in payload]
    return inner.unionByName(
        un.select(*[F.col(c) for c in points.columns], *nulls))

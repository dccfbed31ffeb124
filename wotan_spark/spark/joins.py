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
              suffix: str = "_asof") -> DataFrame:
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
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys + [right_time]]
    carry = [c for c in left.columns if c not in keys + [left_time]]
    # fail upfront on names that would silently corrupt the union-sort
    # plumbing or emit ambiguous duplicate output columns (same contract
    # as interval_join's '__bk' check)
    reserved = {"__t", "__is_left", "__m", "__b", "__f"}
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
    base = Window.partitionBy(*keys).orderBy("__t")
    wb = base.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rangeBetween(Window.currentRow, Window.unboundedFollowing)

    fills = []
    if direction in ("backward", "nearest"):
        fills.append(F.last("__m", ignorenulls=True).over(wb).alias("__b"))
    if direction in ("forward", "nearest"):
        fills.append(F.first("__m", ignorenulls=True).over(wf).alias("__f"))

    u = (lt.unionByName(rt)
         .select(*keys, "__t", "__is_left", *carry, *fills)
         .filter(F.col("__is_left") == 1))

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


def interval_join(points: DataFrame, intervals: DataFrame,
                  on: list[str] | str, point_col: str,
                  start_col: str, end_col: str,
                  bucket_width: int | float | None = None,
                  how: str = "inner", suffix: str = "_iv") -> DataFrame:
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
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unknown how {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in intervals.columns if c not in keys]
    if "__bk" in points.columns or "__bk" in intervals.columns:
        raise ValueError("column name '__bk' is reserved")

    integral = {"integer", "long", "short", "byte"}
    cols_integral = (
        points.schema[point_col].dataType.typeName() in integral
        and intervals.schema[start_col].dataType.typeName() in integral
        and intervals.schema[end_col].dataType.typeName() in integral)
    if bucket_width is None:
        # auto-tune to the median interval length — ONE small eager
        # aggregation over the intervals side (documented trade: this
        # call is no longer fully lazy, but it removes the operator's
        # main footgun of a mis-sized bucket).  The width is floored at
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
        elif cols_integral:
            bucket_width = max(1, int(med), -(-int(mx) // 4096))
        else:
            bucket_width = max(float(med), float(mx) / 4096.0) \
                if med > 0 or mx > 0 else 1.0
    if not bucket_width > 0:
        raise ValueError("bucket_width must be > 0")
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

    p = points.withColumn("__bk", pb).alias("__p")
    iv = (intervals
          .filter(F.col(end_col) > F.col(start_col))
          .withColumn("__bk", F.explode(F.sequence(lo, hi)))
          .alias("__i"))
    cond = F.col("__p.__bk") == F.col("__i.__bk")
    for k in keys:
        cond = cond & (F.col(f"__p.`{k}`") == F.col(f"__i.`{k}`"))
    cond = (cond
            & (F.col(f"__p.`{point_col}`") >= F.col(f"__i.`{start_col}`"))
            & (F.col(f"__p.`{point_col}`") < F.col(f"__i.`{end_col}`")))
    out_left = [F.col(f"__p.`{c}`").alias(c)
                for c in points.columns if c != "__bk"]
    out_right = [F.col(f"__i.`{c}`").alias(f"{c}{suffix}") for c in payload]
    return p.join(iv, cond, how).select(*out_left, *out_right)

"""Time-series joins: as-of (nearest-past alignment) over co-partitioned keys.

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
side's payload is forward-filled onto left rows via
``last(..., ignoreNulls=True)``.  Cost at scale: a single hash exchange of
|L| + |R| rows on the join keys (AQE-sizable), one sort within partitions,
zero joins — the same shape as the engine's segmentation and gap-fill
windows, so a co-partitioned input (bucketed tables) runs shuffle-free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_time: str, right_time: str,
              tolerance: float | int | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the payload of the latest right row with
    ``right.t <= left.t`` within the same key group (backward as-of join,
    ties included).  Right payload columns are suffixed; left rows with no
    past right row (or none within ``tolerance``) get NULL payload.

    ``on`` — equality key column(s) shared by both sides;
    ``tolerance`` — optional max allowed ``left_t - right_t`` staleness.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys + [right_time]]
    carry = [c for c in left.columns if c not in keys + [left_time]]

    lt = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in carry],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in payload],
        F.lit(None).cast(right.schema[right_time].dataType)
        .alias(f"__rt{suffix}"),
    )
    rt = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        F.col(right_time).alias(f"__rt{suffix}"),
    )
    # at equal timestamps the right row must be visible to the left row:
    # order right (0) before left (1) within each instant
    w = (Window.partitionBy(*keys).orderBy("__t", "__is_left")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = [F.last(f"{c}{suffix}", ignorenulls=True).over(w)
              .alias(f"{c}{suffix}") for c in payload]
    rt_fill = F.last(f"__rt{suffix}", ignorenulls=True).over(w)

    out = (lt.unionByName(rt)
           .select(*keys, "__t", "__is_left", *carry, *filled,
                   rt_fill.alias("__rt"))
           .filter(F.col("__is_left") == 1))
    if tolerance is not None:
        stale = (F.col("__rt").isNull()
                 | (F.col("__t") - F.col("__rt") > F.lit(tolerance)))
        out = out.select(
            *keys, "__t", *carry,
            *[F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}"))
              .alias(f"{c}{suffix}") for c in payload])
    else:
        out = out.drop("__is_left", "__rt")
    return out.withColumnRenamed("__t", left_time)

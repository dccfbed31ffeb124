"""SQL surface: engine operators callable from pure Spark SQL.

``register_sql(spark)`` exposes:

* ``detrend(tokens, method, window_length)`` — a Python UDTF (lateral
  table function): one input row's token array -> (t, y, trend, flat) rows;
* ``wotan_transit_mask(t, period, duration, t0)`` and
  ``wotan_t14(rs, ms, p)`` — scalar SQL functions backed by the same
  Catalyst expressions used by the DataFrame API.

Example:

    SELECT s.doc_id, d.t, d.flat
    FROM sequences s, LATERAL detrend(s.tokens, 'biweight', 17.0) d
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="t bigint, y double, trend double, flat double")
class DetrendUDTF:
    def eval(self, tokens, method: str, window_length: float):
        import numpy as np
        from wotan_spark.kernels.detrend import detrend_series
        from wotan_spark.spark.synth import decode_tokens
        toks = np.asarray(tokens, dtype=np.int32)
        y = decode_tokens(toks)
        t = np.arange(len(y), dtype=np.float64)
        # SQL numeric literals arrive as decimal.Decimal
        res = detrend_series(t, y, method=str(method),
                             window_length=float(window_length))

        def v(x):
            return None if np.isnan(x) else float(x)
        for i in range(len(y)):
            yield i, v(y[i]), v(res.trend_lc[i]), v(res.flatten_lc[i])


def register_sql(spark: SparkSession) -> None:
    from wotan_spark.spark.shipping import ensure_shipped
    from wotan_spark import constants as c
    ensure_shipped(spark)
    spark.udtf.register("detrend", DetrendUDTF)
    # scalar helpers as pure SQL functions (Catalyst expressions, no UDF)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION wotan_transit_mask(
            t DOUBLE, period DOUBLE, duration DOUBLE, t0 DOUBLE)
        RETURNS BOOLEAN
        RETURN abs(pmod(t - t0 + period / 2, period) - period / 2)
               < duration / 2
    """)
    spark.sql(f"""
        CREATE OR REPLACE TEMPORARY FUNCTION wotan_t14(
            r_s DOUBLE, m_s DOUBLE, p DOUBLE)
        RETURNS DOUBLE
        RETURN ({c.R_SUN} * r_s + 2 * {c.R_JUP})
               * pow((4 * p * {c.SECONDS_PER_DAY})
                     / (pi() * {c.G} * {c.M_SUN} * m_s),
                     CAST(1 AS DOUBLE) / 3)
               / {c.SECONDS_PER_DAY}
    """)

"""SQL surface: the detrend UDTF and scalar SQL functions."""

from __future__ import annotations

import numpy as np
import numpy.testing as npt

from wotan_spark.kernels.detrend import detrend_series
from wotan_spark.spark.sql_api import register_sql
from wotan_spark.spark.synth import decode_tokens, synth_sequences


def test_detrend_udtf_matches_kernel(spark):
    register_sql(spark)
    seq = synth_sequences(spark, 3, median_len=120, max_len=200)
    seq.createOrReplaceTempView("sequences")
    rows = spark.sql("""
        SELECT s.doc_id, d.t, d.flat
        FROM sequences s, LATERAL detrend(s.tokens, 'mean', 17.0) d
    """).collect()
    by_doc: dict[str, dict[int, float]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.t] = r.flat
    for r in seq.collect():
        y = decode_tokens(np.asarray(r.tokens, dtype=np.int32))
        res = detrend_series(np.arange(len(y), dtype=np.float64), y,
                             method="mean", window_length=17.0)
        got = np.array([
            np.nan if by_doc[r.doc_id][i] is None else by_doc[r.doc_id][i]
            for i in range(len(y))])
        npt.assert_allclose(got, res.flatten_lc, rtol=1e-12, equal_nan=True)


def test_scalar_sql_functions(spark):
    register_sql(spark)
    row = spark.sql("""
        SELECT wotan_t14(1.0, 1.0, 365.0) AS t14,
               wotan_transit_mask(1.0, 3.1, 0.4, 1.0) AS m1,
               wotan_transit_mask(2.0, 3.1, 0.4, 1.0) AS m0
    """).collect()[0]
    npt.assert_almost_equal(row.t14, 0.6490025258902046)
    assert row.m1 is True and row.m0 is False

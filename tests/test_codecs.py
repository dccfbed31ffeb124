"""Codec round-trip tests (property-style via hypothesis + seeded arrays)."""

from __future__ import annotations

import numpy as np
import numpy.testing as npt
from hypothesis import given, settings
from hypothesis import strategies as st

from wotan_spark.codecs import dod, gorilla


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62), max_size=200))
@settings(max_examples=60, deadline=None)
def test_dod_roundtrip_property(xs):
    arr = np.array(xs, dtype=np.int64)
    npt.assert_array_equal(dod.decode(dod.encode(arr)), arr)


@given(st.lists(st.floats(allow_nan=False, allow_infinity=True,
                          width=64), max_size=200))
@settings(max_examples=60, deadline=None)
def test_gorilla_roundtrip_property(xs):
    arr = np.array(xs, dtype=np.float64)
    npt.assert_array_equal(gorilla.decode(gorilla.encode(arr)), arr)


def test_gorilla_nan_and_identical_runs():
    arr = np.array([1.5, 1.5, 1.5, np.nan, np.nan, 2.0, -0.0, 0.0])
    out = gorilla.decode(gorilla.encode(arr))
    assert np.array_equal(out, arr, equal_nan=True)
    assert np.signbit(out[6]) and not np.signbit(out[7])


def test_dod_regular_cadence_compresses_well():
    ts = np.arange(0, 100000, 10, dtype=np.int64)
    payload = dod.encode(ts)
    # regular cadence -> ~1 bit per timestamp
    assert len(payload) < len(ts) * 8 / 40
    npt.assert_array_equal(dod.decode(payload), ts)


def test_gorilla_smooth_series_compresses():
    rng = np.random.default_rng(7)
    y = 1.0 + np.cumsum(rng.normal(0, 1e-6, 5000))
    payload = gorilla.encode(y)
    assert len(payload) < y.nbytes  # strictly better than raw float64
    npt.assert_array_equal(gorilla.decode(payload), y)


def test_blocks_roundtrip_spark(spark):
    from wotan_spark.spark.blocks import decode_blocks, encode_blocks
    from wotan_spark.spark.synth import synth_sequences

    seq = synth_sequences(spark, 8, median_len=300, max_len=1200)
    blocks = encode_blocks(seq, column="tokens", codec="dod", tier=0,
                           block_size=256)
    decoded = decode_blocks(blocks)
    orig = {r.doc_id: np.asarray(r.tokens, dtype=np.int64)
            for r in seq.collect()}
    rebuilt: dict[str, list] = {}
    for r in decoded.orderBy("doc_id", "block_id").collect():
        rebuilt.setdefault(r.doc_id, []).extend(r.values)
    for doc_id, vals in rebuilt.items():
        npt.assert_array_equal(np.asarray(vals, dtype=np.int64), orig[doc_id])


def test_dod_full_int64_extremes_roundtrip():
    """The docstring promise is the FULL int64 range via modulo-2^64
    delta arithmetic — pin the extremes (wrap-around deltas) exactly,
    beyond the +/-2^62 envelope the property test draws from."""
    i64 = np.iinfo(np.int64)
    arr = np.array([i64.min, i64.max, 0, i64.max, i64.min, -1, 1,
                    i64.min + 1, i64.max - 1], dtype=np.int64)
    npt.assert_array_equal(dod.decode(dod.encode(arr)), arr)

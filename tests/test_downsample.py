"""M4 + LTTB downsampling: kernel hand-cases, properties, Spark path."""

from __future__ import annotations

import numpy as np
import pytest

from wotan_spark.kernels.downsample import lttb_indices, m4_stats

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# m4_stats
# ---------------------------------------------------------------------------

def test_m4_hand_case():
    y = np.array([5.0, 1.0, 3.0, 9.0, 2.0, 2.0, np.nan, 7.0])
    b, n, tf, yf, tl, yl, tmn, ymn, tmx, ymx = m4_stats(y, 4)
    assert b.tolist() == [0, 1]
    assert n.tolist() == [4, 3]
    # bucket 0: first (0,5), last (3,9), min (1,1), max (3,9)
    assert (tf[0], yf[0], tl[0], yl[0]) == (0, 5.0, 3, 9.0)
    assert (tmn[0], ymn[0], tmx[0], ymx[0]) == (1, 1.0, 3, 9.0)
    # bucket 1: NaN at t=6 skipped; min tie 2.0@4 vs 2.0@5 -> earliest t
    assert (tf[1], yf[1], tl[1], yl[1]) == (4, 2.0, 7, 7.0)
    assert (tmn[1], ymn[1], tmx[1], ymx[1]) == (4, 2.0, 7, 7.0)


def test_m4_all_nan_bucket_emits_no_row():
    y = np.array([1.0, 2.0, np.nan, np.nan, 3.0])
    b, n, *_ = m4_stats(y, 2)
    assert b.tolist() == [0, 2]
    assert n.tolist() == [2, 1]


def test_m4_reconstructs_extrema_exactly():
    rng = np.random.default_rng(7)
    y = rng.normal(size=1003)
    y[rng.integers(0, 1003, 40)] = np.nan
    b, n, tf, yf, tl, yl, tmn, ymn, tmx, ymx = m4_stats(y, 50)
    for i, bk in enumerate(b):
        seg = y[bk * 50:(bk + 1) * 50]
        assert ymn[i] == np.nanmin(seg)
        assert ymx[i] == np.nanmax(seg)
        assert n[i] == np.sum(~np.isnan(seg))
        assert y[tmn[i]] == ymn[i] and y[tmx[i]] == ymx[i]


# ---------------------------------------------------------------------------
# lttb_indices
# ---------------------------------------------------------------------------

def test_lttb_passthrough_and_endpoints():
    y = np.arange(10, dtype=float)
    assert lttb_indices(y, 20).tolist() == list(range(10))
    sel = lttb_indices(np.sin(np.arange(500) / 7.0), 20)
    assert sel[0] == 0 and sel[-1] == 499
    assert len(sel) == 20
    assert np.all(np.diff(sel) > 0)


def test_lttb_picks_the_spike():
    """A single huge spike in a flat series must be among the survivors."""
    y = np.zeros(1000)
    y[437] = 50.0
    sel = lttb_indices(y, 10)
    assert 437 in sel.tolist()


def test_lttb_skips_nans_and_keeps_original_axis():
    y = np.sin(np.arange(300) / 5.0)
    y[50:150] = np.nan
    sel = lttb_indices(y, 12)
    assert len(sel) == 12
    assert not np.any((sel >= 50) & (sel < 150))
    assert sel[0] == 0 and sel[-1] == 299


def test_lttb_validates_budget():
    with pytest.raises(ValueError, match="n_out"):
        lttb_indices(np.arange(10.0), 2)


# ---------------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------------

def test_downsample_spark_matches_kernels(spark):
    from wotan_spark.spark.downsample import downsample_lttb, downsample_m4
    from wotan_spark.spark.synth import decode_tokens, sequences_from_events

    seq = sequences_from_events(spark, SF_DIR)
    local = {r.doc_id: np.asarray(r.tokens, dtype=np.int32)
             for r in seq.collect()}

    m4 = downsample_m4(seq, factor=64).collect()
    by_doc: dict[str, list] = {}
    for r in m4:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(local)
    for doc_id, rows in by_doc.items():
        y = decode_tokens(local[doc_id])
        b, n, tf, yf, tl, yl, tmn, ymn, tmx, ymx = m4_stats(y, 64)
        rows.sort(key=lambda r: r.bucket)
        assert [r.bucket for r in rows] == b.tolist()
        assert [r.t_min for r in rows] == tmn.tolist()
        assert [r.y_max for r in rows] == ymx.tolist()

    lt = downsample_lttb(seq, n_out=50).collect()
    sel_by_doc: dict[str, list] = {}
    for r in lt:
        sel_by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in sel_by_doc.items():
        y = decode_tokens(local[doc_id])
        want = lttb_indices(y, 50)
        rows.sort(key=lambda r: r.rank)
        assert [r.t for r in rows] == want.tolist()
        assert np.array_equal(np.array([r.y for r in rows]), y[want])

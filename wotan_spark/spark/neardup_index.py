"""Incrementally maintained MinHash-LSH near-duplicate index.

``minhash_lsh_pairs`` recomputes shingles + signatures for the WHOLE corpus
on every call — the right shape for a one-shot audit, the wrong one for a
growing training corpus where each ingest batch is a sliver of the table.
MinHash bands are corpus-independent (a doc's signature depends only on its
own shingles), so the band frame is a maintainable TABLE, not a derived
temporary: this module keeps it (and the candidate-pair set) in
``SnapshotTable``s — resumable, snapshot-stamped, expirable by the same
lakehouse machinery as the stats/sketch tiers.

Warm-path cost of ``update_incremental`` for a delta of d docs against an
index of N docs: signature computation O(d) (the cold full-corpus build
never reruns), one broadcast hash join of the stored band index against the
delta's bands (index-only scan — 3 small columns, no text, no shuffle of
the big side), and the delta-internal pair expansion O(d).  New pairs are
appended; old pairs are never touched.

The index is APPEND-ONLY by doc identity: re-ingesting a changed document
would strand its old bands/pairs, so ``update_incremental`` refuses doc ids
it has already indexed (rebuild for mutations — near-dup curation corpora
are immutable-append in practice).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wotan_spark.spark.datapipe import (DEFAULT_BUCKET_CAP, _capped_pairs,
                                        minhash_bands)
from wotan_spark.spark.lakehouse import SnapshotTable


class NearDupIndex:
    """Maintained LSH band index + candidate-pair table under ``root``.

    ``bands``  — (doc_id, band_id, band_hash), one row per doc per band;
    ``pairs``  — (doc_a, doc_b, n_bands) with doc_a < doc_b, cumulative.
    """

    def __init__(self, root: str, n: int = 3, band_size: int = 2,
                 bucket_cap: int = DEFAULT_BUCKET_CAP):
        self.n = n
        self.band_size = band_size
        self.bucket_cap = bucket_cap
        self.bands = SnapshotTable(os.path.join(root, "bands"))
        self.pairs = SnapshotTable(os.path.join(root, "pairs"))

    # ------------------------------------------------------------------
    def _params_meta(self) -> dict:
        return {"n": self.n, "band_size": self.band_size}

    def _check_params(self) -> None:
        head = self.bands.current_snapshot_id()
        if head is None:
            raise ValueError("index has no build snapshot — call build()")
        meta = self.bands.snapshots()[-1]["meta"]
        stored = {k: meta.get(k) for k in ("n", "band_size")}
        if stored != self._params_meta():
            raise ValueError(f"index was built with {stored}, "
                             f"this handle has {self._params_meta()}")

    def build(self, spark: SparkSession, docs: DataFrame,
              run_id: str = "build") -> dict:
        """Cold full build: band frame + initial candidate pairs."""
        bands = minhash_bands(docs, self.n, self.band_size)
        b_sid = self.bands.overwrite(bands, run_id=run_id, op="build",
                                     **self._params_meta())
        pairs = self._pairs_within(self.bands.read(spark))
        p_sid = self.pairs.overwrite(pairs, run_id=run_id, op="build",
                                     **self._params_meta())
        return {"bands_snapshot": b_sid, "pairs_snapshot": p_sid}

    def _pairs_within(self, bands: DataFrame) -> DataFrame:
        return (_capped_pairs(bands, ["band_id", "band_hash"], "doc_id",
                              cap=self.bucket_cap)
                .groupBy(F.col("p.a").alias("doc_a"),
                         F.col("p.b").alias("doc_b"))
                .agg(F.countDistinct("band_id").alias("n_bands")))

    def update_incremental(self, spark: SparkSession, new_docs: DataFrame,
                           run_id: str) -> dict:
        """Index an appended batch: O(delta) signature work, one broadcast
        probe of the stored band index, new pairs appended.  The full
        corpus' text is never re-read (tested: the build input can be gone
        from disk and updates still run).

        ``run_id`` must be UNIQUE per batch — it is the idempotence key:
        each table's append is skipped when an UPDATE snapshot stamped
        with this run_id already exists (build snapshots never match, so
        reusing the build's run id cannot silently drop a batch), so a
        retry after a crash between the two appends completes the
        half-done update instead of double-appending pairs, and a retry
        after full success is a no-op."""
        from pyspark import StorageLevel
        self._check_params()
        done_p = self.pairs.find_snapshot(run_id=run_id, op="update")
        done_b = self.bands.find_snapshot(run_id=run_id, op="update")
        if done_p is not None and done_b is not None:
            return self._update_result(done_b["snapshot_id"],
                                       done_p["snapshot_id"])
        delta = minhash_bands(new_docs, self.n, self.band_size) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # the probe side is the index as of BEFORE this run: on a
            # retry whose bands append already landed, reading HEAD would
            # double-generate the delta's pairs (and trip the dup check)
            base_sid = (self.bands._manifest(done_b["snapshot_id"])
                        .get("parent") if done_b is not None
                        else self.bands.current_snapshot_id())
            indexed = self.bands.read(spark, snapshot_id=base_sid)
            if done_b is None:
                dup = (delta.select("doc_id").distinct()
                       .join(indexed.select("doc_id").distinct(), "doc_id",
                             "left_semi").limit(1).count())
                if dup:
                    raise ValueError(
                        "update_incremental got already-indexed doc ids — "
                        "the index is append-only by doc identity; rebuild "
                        "for mutated documents")
            # (old, new) pairs: broadcast the small delta against the
            # index — index-only scan, no shuffle of the stored side
            cross = (indexed.join(
                F.broadcast(delta.select(F.col("doc_id").alias("__nd"),
                                         "band_id", "band_hash")),
                ["band_id", "band_hash"])
                .select("band_id",
                        F.least("doc_id", "__nd").alias("a"),
                        F.greatest("doc_id", "__nd").alias("b")))
            # (new, new) pairs among the delta itself
            intra = (_capped_pairs(delta, ["band_id", "band_hash"],
                                   "doc_id", cap=self.bucket_cap)
                     .select("band_id", F.col("p.a").alias("a"),
                             F.col("p.b").alias("b")))
            # a cross pair never coincides with an intra pair (one member
            # is old vs both new), so the distinct-band count is exact
            new_pairs = (cross.unionByName(intra)
                         .groupBy(F.col("a").alias("doc_a"),
                                  F.col("b").alias("doc_b"))
                         .agg(F.countDistinct("band_id").alias("n_bands")))
            # per-table run_id guards: a crash between the two appends
            # leaves one table stamped — the retry skips it and completes
            # the other, never appending the same rows twice
            p_sid = (done_p["snapshot_id"] if done_p is not None
                     else self.pairs.append(new_pairs, run_id=run_id,
                                            op="update",
                                            **self._params_meta()))
            b_sid = (done_b["snapshot_id"] if done_b is not None
                     else self.bands.append(delta, run_id=run_id,
                                            op="update",
                                            **self._params_meta()))
        finally:
            delta.unpersist()
        return self._update_result(b_sid, p_sid)

    def _update_result(self, b_sid: int, p_sid: int) -> dict:
        def last_dir_rows(table: SnapshotTable, sid: int) -> int:
            return sum(s["rows"] for s in table._load_stats(
                table._manifest(sid)["files"][-1]).values())
        return {"bands_snapshot": b_sid, "pairs_snapshot": p_sid,
                "delta_band_rows": last_dir_rows(self.bands, b_sid),
                "new_pair_rows": last_dir_rows(self.pairs, p_sid)}

    def candidate_pairs(self, spark: SparkSession) -> DataFrame:
        """Cumulative (doc_a, doc_b, n_bands) — identical content to
        ``minhash_lsh_pairs`` over the full indexed corpus (tested)."""
        self._check_params()
        return self.pairs.read(spark)

"""Incrementally maintained near-duplicate indexes (text and embeddings).

``minhash_lsh_pairs`` / ``embedding_near_dup_pairs`` recompute signatures
for the WHOLE corpus on every call — the right shape for a one-shot audit,
the wrong one for a growing training corpus where each ingest batch is a
sliver of the table.  Both signature families are corpus-independent (a
doc's MinHash bands depend only on its own shingles; a vector's hyperplane
buckets only on the vector), so the signature frame is a maintainable
TABLE, not a derived temporary: this module keeps it (and the
candidate-pair set) in ``SnapshotTable``s — resumable, snapshot-stamped,
expirable by the same lakehouse machinery as the stats/sketch tiers.

Warm-path cost of ``update_incremental`` for a delta of d items against an
index of N items: signature computation O(d) (the cold full-corpus build
never reruns), one broadcast hash join of the stored signature index
against the delta's signatures (index-only scan — 3 small columns, no
text/vectors, no shuffle of the big side), and the delta-internal pair
expansion O(d).  New pairs are appended; old pairs are never touched.

Indexes are APPEND-ONLY by item identity: re-ingesting a changed item
would strand its old signatures/pairs, so ``update_incremental`` refuses
ids it has already indexed (rebuild for mutations — curation corpora are
immutable-append in practice).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wotan_spark.spark.datapipe import (DEFAULT_BUCKET_CAP, _capped_pairs,
                                        lsh_buckets, minhash_bands,
                                        verify_cosine_pairs)
from wotan_spark.spark.lakehouse import SnapshotTable, delta_fingerprint


class _PairIndexBase:
    """Shared machinery: two SnapshotTables (signatures + cumulative
    candidate pairs), guarded crash-idempotent incremental updates, and
    the bucket-capped pair expansion.  Subclasses bind the signature
    function and the column names."""

    ID: str                    # item id column in the signature frame
    KEYS: list[str]            # bucket key columns (KEYS[0] = per-table id)
    A: str                     # output pair columns
    B: str
    N: str                     # distinct-KEYS[0] count column
    SIG_NAME: str              # on-disk signature table directory name
    SIG_KEY: str               # result-dict key for the signature snapshot
    DELTA_KEY: str             # result-dict key for the delta row count

    def __init__(self, root: str, bucket_cap: int = DEFAULT_BUCKET_CAP):
        self.bucket_cap = bucket_cap
        self.sig_table = SnapshotTable(os.path.join(root, self.SIG_NAME))
        self.pairs = SnapshotTable(os.path.join(root, "pairs"))

    # -- subclass hooks --------------------------------------------------
    def _signatures(self, items: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _params_meta(self) -> dict:
        raise NotImplementedError

    # -- shared ----------------------------------------------------------
    def _check_params(self) -> None:
        from wotan_spark.spark.lakehouse import newest_stamped
        head = self.sig_table.current_snapshot_id()
        if head is None:
            raise ValueError("index has no build snapshot — call build()")
        want = self._params_meta()
        # walk the chain, not HEAD: maintenance commits (compact,
        # rewrite_manifests) carry no param stamps and would brick every
        # later call on this handle
        rec = newest_stamped(self.sig_table, next(iter(want)))
        if rec is None:
            raise ValueError(
                "signature table has snapshots but none carries the index "
                "parameter stamps — not an index signature table")
        meta = rec["meta"]
        stored = {k: meta.get(k) for k in want}
        if stored != want:
            raise ValueError(f"index was built with {stored}, "
                             f"this handle has {want}")

    def build(self, spark: SparkSession, items: DataFrame,
              run_id: str = "build") -> dict:
        """Cold full build: signature frame + initial candidate pairs."""
        sig = self._signatures(items)
        s_sid = self.sig_table.overwrite(sig, run_id=run_id, op="build",
                                         **self._params_meta())
        pairs = self._pairs_within(self.sig_table.read(spark))
        p_sid = self.pairs.overwrite(pairs, run_id=run_id, op="build",
                                     **self._params_meta())
        return {self.SIG_KEY: s_sid, "pairs_snapshot": p_sid}

    def _pairs_within(self, sig: DataFrame) -> DataFrame:
        return (_capped_pairs(sig, self.KEYS, self.ID,
                              cap=self.bucket_cap)
                .groupBy(F.col("p.a").alias(self.A),
                         F.col("p.b").alias(self.B))
                .agg(F.countDistinct(self.KEYS[0]).alias(self.N)))

    def update_incremental(self, spark: SparkSession, new_items: DataFrame,
                           run_id: str) -> dict:
        """Index an appended batch: O(delta) signature work, one broadcast
        probe of the stored signature index, new pairs appended.  The full
        corpus is never re-read (tested: the build input can be gone from
        disk and updates still run).

        ``run_id`` must be UNIQUE per batch — it is the idempotence key:
        each table's append is skipped when an UPDATE snapshot stamped
        with this run_id already exists (build snapshots never match, so
        reusing the build's run id cannot silently drop a batch), so a
        retry after a crash between the two appends completes the
        half-done update instead of double-appending pairs, and a retry
        after full success is a no-op.

        Idempotence assumes the retry replays the SAME batch content: each
        append is stamped with a fingerprint of the delta's signature rows
        (count + order-independent hash), and a half-done retry verifies
        the recomputed delta against the landed append's stamp — a retry
        under the same run_id with different content would otherwise
        append signatures inconsistent with the already-committed pairs,
        silently corrupting the pairs/signature parity invariant."""
        from pyspark import StorageLevel
        self._check_params()
        done_p = self.pairs.find_snapshot(run_id=run_id, op="update")
        done_s = self.sig_table.find_snapshot(run_id=run_id, op="update")
        delta = self._signatures(new_items) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        try:
            fp = self._delta_fingerprint(delta)
            for landed, table in ((done_p, "pairs"),
                                  (done_s, "signatures")):
                if landed is None:
                    continue
                stamped = {k: landed.get("meta", {}).get(k) for k in fp}
                if all(v is None for v in stamped.values()):
                    continue   # pre-fingerprint snapshot: nothing to check
                if stamped != fp:
                    raise ValueError(
                        f"retry of run_id={run_id!r} recomputed a delta "
                        f"with fingerprint {fp} but the landed {table} "
                        f"append was stamped {stamped} — a retry "
                        "must replay the identical batch content")
            # content-verified no-op AFTER the stamp checks: the old
            # early return skipped them entirely on a fully-landed
            # run_id, so reusing a past update's run_id with a NEW batch
            # silently dropped that batch (round-5b review finding).
            # Costs one delta recompute + fingerprint on replay — the
            # price of the "cannot silently drop a batch" promise.
            if done_p is not None and done_s is not None:
                return self._update_result(done_s["snapshot_id"],
                                           done_p["snapshot_id"])
            # the probe side is the index as of BEFORE this run: on a
            # retry whose signature append already landed, reading HEAD
            # would double-generate the delta's pairs (and trip the dup
            # check)
            base_sid = (self.sig_table._manifest(done_s["snapshot_id"])
                        .get("parent") if done_s is not None
                        else self.sig_table.current_snapshot_id())
            indexed = self.sig_table.read(spark, snapshot_id=base_sid)
            if done_s is None:
                dup = (delta.select(self.ID).distinct()
                       .join(indexed.select(self.ID).distinct(), self.ID,
                             "left_semi").limit(1).count())
                if dup:
                    raise ValueError(
                        "update_incremental got already-indexed ids — the "
                        "index is append-only by item identity; rebuild "
                        "for mutated items")
            # (old, new) pairs: broadcast the small delta against the
            # index — index-only scan, no shuffle of the stored side
            cross = (indexed.join(
                F.broadcast(delta.select(F.col(self.ID).alias("__nd"),
                                         *self.KEYS)),
                self.KEYS)
                .select(self.KEYS[0],
                        F.least(self.ID, "__nd").alias("a"),
                        F.greatest(self.ID, "__nd").alias("b")))
            # (new, new) pairs among the delta itself
            intra = (_capped_pairs(delta, self.KEYS, self.ID,
                                   cap=self.bucket_cap)
                     .select(self.KEYS[0], F.col("p.a").alias("a"),
                             F.col("p.b").alias("b")))
            # a cross pair never coincides with an intra pair (one member
            # is old vs both new), so the distinct count is exact
            new_pairs = (cross.unionByName(intra)
                         .groupBy(F.col("a").alias(self.A),
                                  F.col("b").alias(self.B))
                         .agg(F.countDistinct(self.KEYS[0])
                              .alias(self.N)))
            # per-table run_id guards: a crash between the two appends
            # leaves one table stamped — the retry skips it and completes
            # the other, never appending the same rows twice
            p_sid = (done_p["snapshot_id"] if done_p is not None
                     else self.pairs.append(new_pairs, run_id=run_id,
                                            op="update", **fp,
                                            **self._params_meta()))
            s_sid = (done_s["snapshot_id"] if done_s is not None
                     else self.sig_table.append(delta, run_id=run_id,
                                                op="update", **fp,
                                                **self._params_meta()))
        finally:
            delta.unpersist()
        return self._update_result(s_sid, p_sid)

    def _delta_fingerprint(self, delta: DataFrame) -> dict:
        """Order-independent content fingerprint of the delta's signature
        rows, stamped into both appends so a half-done retry can prove it
        is replaying the same batch (shared with the ANN index)."""
        return delta_fingerprint(delta)

    def _update_result(self, s_sid: int, p_sid: int) -> dict:
        def last_dir_rows(table: SnapshotTable, sid: int) -> int:
            return sum(s["rows"] for s in table._load_stats(
                table._manifest(sid)["files"][-1]).values())
        return {self.SIG_KEY: s_sid, "pairs_snapshot": p_sid,
                self.DELTA_KEY: last_dir_rows(self.sig_table, s_sid),
                "new_pair_rows": last_dir_rows(self.pairs, p_sid)}

    def candidate_pairs(self, spark: SparkSession) -> DataFrame:
        """Cumulative candidate pairs — identical content to the one-shot
        operator over the full indexed corpus (tested)."""
        self._check_params()
        return self.pairs.read(spark)


class NearDupIndex(_PairIndexBase):
    """Maintained MinHash-LSH band index + candidate-pair table.

    ``bands`` — (doc_id, band_id, band_hash), one row per doc per band;
    ``pairs`` — (doc_a, doc_b, n_bands) with doc_a < doc_b, cumulative;
    content identical to ``minhash_lsh_pairs`` over the indexed corpus.
    """

    ID = "doc_id"
    KEYS = ["band_id", "band_hash"]
    A, B, N = "doc_a", "doc_b", "n_bands"
    SIG_NAME = "bands"
    SIG_KEY = "bands_snapshot"
    DELTA_KEY = "delta_band_rows"

    def __init__(self, root: str, n: int = 3, band_size: int = 2,
                 bucket_cap: int = DEFAULT_BUCKET_CAP):
        super().__init__(root, bucket_cap)
        self.n = n
        self.band_size = band_size

    @property
    def bands(self) -> SnapshotTable:
        return self.sig_table

    def _signatures(self, docs: DataFrame) -> DataFrame:
        return minhash_bands(docs, self.n, self.band_size)

    def _params_meta(self) -> dict:
        return {"n": self.n, "band_size": self.band_size}


class EmbeddingNearDupIndex(_PairIndexBase):
    """Maintained hyperplane-LSH bucket index for embedding near-dups.

    ``buckets`` — (vec_id, table_id, bucket), one row per vector per LSH
    table (seeded-deterministic hyperplanes, so signatures are stable
    across build and every update); ``pairs`` — (vec_id_a, vec_id_b,
    n_tables) CANDIDATES, cumulative.  Candidates bound RECALL only;
    ``scored_pairs`` reranks them exactly (``verify_cosine_pairs``), so
    everything returned at a threshold is a true cosine near-dup — the
    same LSH->verify contract as ``embedding_near_dup_pairs(method=
    "lsh")``, without the per-call full-corpus bucketing.
    """

    ID = "vec_id"
    KEYS = ["table_id", "bucket"]
    A, B, N = "vec_id_a", "vec_id_b", "n_tables"
    SIG_NAME = "buckets"
    SIG_KEY = "buckets_snapshot"
    DELTA_KEY = "delta_bucket_rows"

    def __init__(self, root: str, n_planes: int = 4, n_tables: int = 8,
                 seed: int = 7, bucket_cap: int = DEFAULT_BUCKET_CAP):
        super().__init__(root, bucket_cap)
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.seed = seed

    @property
    def buckets(self) -> SnapshotTable:
        return self.sig_table

    def _signatures(self, emb: DataFrame) -> DataFrame:
        return lsh_buckets(emb, n_planes=self.n_planes,
                           n_tables=self.n_tables, seed=self.seed)

    def _params_meta(self) -> dict:
        return {"n_planes": self.n_planes, "n_tables": self.n_tables,
                "seed": self.seed}

    def scored_pairs(self, spark: SparkSession, emb: DataFrame,
                     threshold: float = 0.3,
                     round_to: int = 5) -> DataFrame:
        """Exact-cosine near-dup pairs at ``threshold`` among the indexed
        candidates: embeddings are fetched only for candidate ids (two
        equi-joins), never rescanned corpus-wide."""
        return verify_cosine_pairs(emb, self.candidate_pairs(spark),
                                   threshold=threshold, round_to=round_to)

"""Incrementally maintained IVF-PQ ANN index over embedding columns.

``cosine_topk_ivf`` / ``cosine_topk_pq`` retrain their quantizers and
re-encode the WHOLE corpus on every call — right for a one-shot audit,
wrong for a growing corpus where each ingest batch is a sliver of the
table.  Both models are corpus-independent once trained (a vector's cell
assignment and PQ codes depend only on the vector and the frozen
codebooks), so the encoded corpus is a maintainable TABLE: this module
persists the coarse centroids + PQ codebooks and the per-vector
``(vec_id, centroid_id, codes)`` rows as ``SnapshotTable``s — resumable,
snapshot-stamped, expirable by the same lakehouse machinery as the other
tiers (the FAISS IVFADC layout, Jegou et al. TPAMI 2011, as lakehouse
tables).

Warm-path cost of ``update_incremental`` for a delta of d vectors against
an index of N: one Arrow pass over the delta (assign + encode, O(d·C)),
one broadcast id-collision probe of the stored index (ids only — no codes,
no vectors), one append.  The corpus is never re-read.  ``search`` touches
the code table once (8 B/vector instead of the raw vectors), restricted to
the probed IVF cells, and exact-reranks only ``rerank`` candidates per
query against the raw table.

Append-only by vector identity, like the near-dup indexes: re-ingesting a
changed vector would strand its old codes, so updates refuse ids already
indexed (``retrain`` rebuilds model + codes for drift or mutations).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StructField, StructType)

from wotan_spark.spark.datapipe import (_rerank_candidates, ivf_centroids,
                                        pq_codebooks)
from wotan_spark.spark.lakehouse import SnapshotTable, delta_fingerprint

_CODE_SCHEMA = StructType([
    StructField("vec_id", LongType(), False),
    StructField("centroid_id", IntegerType(), False),
    StructField("codes", ArrayType(IntegerType(), False), False),
])


class AnnIndex:
    """Maintained IVF-PQ index: ``build`` once, ``update_incremental`` per
    ingest batch, ``search`` any time; ``retrain`` re-fits the quantizers
    when the distribution drifts (a new model generation re-encodes
    everything — PQ codes are meaningless across generations)."""

    def __init__(self, root: str, n_centroids: int = 16, m: int = 8,
                 pq_centroids: int = 16):
        self.n_centroids = int(n_centroids)
        self.m = int(m)
        self.pq_centroids = int(pq_centroids)
        self.model = SnapshotTable(os.path.join(root, "model"))
        self.codes = SnapshotTable(os.path.join(root, "codes"))

    # -- model persistence -------------------------------------------------
    def _params_meta(self) -> dict:
        return {"n_centroids": self.n_centroids, "m": self.m,
                "pq_centroids": self.pq_centroids}

    @staticmethod
    def _newest_stamped(table: SnapshotTable, key: str) -> dict | None:
        """See ``lakehouse.newest_stamped`` — stamps and the model
        GENERATION id are resolved by walking the chain, not HEAD."""
        from wotan_spark.spark.lakehouse import newest_stamped
        return newest_stamped(table, key)

    def _check_params(self) -> None:
        head = self.model.current_snapshot_id()
        if head is None:
            raise ValueError("index has no model — call build()")
        stamped = self._newest_stamped(self.model, "n_centroids")
        if stamped is None:
            raise ValueError(
                "model table has snapshots but none carries the index "
                "parameter stamps — not an AnnIndex model table")
        meta = stamped["meta"]
        want = self._params_meta()
        stored = {k: meta.get(k) for k in want}
        if stored != want:
            raise ValueError(f"index was built with {stored}, "
                             f"this handle has {want}")

    def _store_model(self, spark: SparkSession, C: np.ndarray,
                     B: np.ndarray, **meta) -> int:
        rows = [("ivf", 0, i, [float(x) for x in C[i]])
                for i in range(C.shape[0])]
        rows += [("pq", s, c, [float(x) for x in B[s, c]])
                 for s in range(B.shape[0]) for c in range(B.shape[1])]
        df = spark.createDataFrame(
            rows, schema="kind string, subspace int, centroid_id int, "
                         "centroid array<double>")
        return self.model.overwrite(df, **meta, **self._params_meta())

    def _load_model(self, spark: SparkSession) -> tuple[np.ndarray,
                                                        np.ndarray, int]:
        """(C [n_centroids, dim], B [m, pq_centroids, dsub], model_sid) —
        a few KB, driver-side, closed over by the Arrow passes.

        The returned sid is the model GENERATION: the newest snapshot that
        carries the parameter stamps (i.e. the newest build()/retrain()
        commit), NOT the table HEAD — maintenance commits move HEAD
        without changing the generation."""
        self._check_params()
        sid = self._newest_stamped(self.model, "n_centroids")["snapshot_id"]
        pdf = self.model.read(spark).toPandas()
        ivf = pdf[pdf["kind"] == "ivf"].sort_values("centroid_id")
        C = np.stack([np.asarray(v, dtype=np.float64)
                      for v in ivf["centroid"]])
        pq = pdf[pdf["kind"] == "pq"].sort_values(["subspace",
                                                   "centroid_id"])
        flat = np.stack([np.asarray(v, dtype=np.float64)
                         for v in pq["centroid"]])
        B = flat.reshape(self.m, self.pq_centroids, -1)
        return C, B, sid

    # -- encode --------------------------------------------------------------
    def _assign_encode(self, emb: DataFrame, C: np.ndarray,
                       B: np.ndarray) -> DataFrame:
        """One fused shuffle-free Arrow pass: nearest IVF cell + PQ codes
        per vector (the separate ivf_assign / pq_encode operators each
        scan the corpus once; the maintained index only ever needs both)."""
        m, _, dsub = B.shape

        def run(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                X = np.stack([np.asarray(v, dtype=np.float64)
                              for v in pdf["embedding"]])
                X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True),
                                1e-12, None)
                cell = (X @ C.T).argmax(axis=1).astype(np.int32)
                codes = np.empty((len(X), m), dtype=np.int32)
                for s in range(m):
                    Xs = X[:, s * dsub:(s + 1) * dsub]
                    d2 = ((Xs[:, None, :] - B[s][None, :, :]) ** 2) \
                        .sum(axis=2)
                    codes[:, s] = d2.argmin(axis=1)
                yield pd.DataFrame({
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "centroid_id": cell, "codes": list(codes)})

        coded = emb.select("vec_id", "embedding") \
            .mapInPandas(run, schema=_CODE_SCHEMA)
        # cluster by cell before the write: each data file then covers a
        # tight centroid_id range (the IVF posting-list layout), so
        # search's where_in read prunes non-probed cells at the FILE
        # level instead of scanning the whole code table.  One cheapest-
        # possible shuffle (20 B/row) at write time, paid once per batch.
        return (coded.repartitionByRange(self.n_centroids, "centroid_id")
                .sortWithinPartitions("centroid_id"))

    # -- lifecycle -------------------------------------------------------
    def build(self, spark: SparkSession, emb: DataFrame,
              run_id: str = "build") -> dict:
        """Cold build: train quantizers on a bounded sample, encode the
        whole corpus once."""
        C = ivf_centroids(emb, n_centroids=self.n_centroids)
        B = pq_codebooks(emb, m=self.m, n_centroids=self.pq_centroids)
        m_sid = self._store_model(spark, C, B, run_id=run_id, op="build")
        c_sid = self.codes.overwrite(
            self._assign_encode(emb, C, B), run_id=run_id, op="build",
            model_snapshot=m_sid, **self._params_meta())
        return {"model_snapshot": m_sid, "codes_snapshot": c_sid}

    def retrain(self, spark: SparkSession, emb: DataFrame,
                run_id: str = "retrain") -> dict:
        """Distribution drift / mutated vectors: new model generation +
        full re-encode (codes from different generations must never mix —
        the overwrite guarantees it)."""
        return self.build(spark, emb, run_id=run_id)

    def update_incremental(self, spark: SparkSession, new_emb: DataFrame,
                           run_id: str) -> dict:
        """Encode an appended batch against the FROZEN model: O(delta)
        work, one append.  ``run_id`` must be unique per batch — a retry
        with an UPDATE snapshot already stamped is a no-op, and a retry
        whose recomputed delta mismatches the landed append's content
        fingerprint raises (same discipline as the near-dup indexes)."""
        from pyspark import StorageLevel

        C, B, m_sid = self._load_model(spark)
        self._check_generation(m_sid)
        done = self.codes.find_snapshot(run_id=run_id, op="update")
        delta = self._assign_encode(new_emb, C, B) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # identity must be unique WITHIN the batch too: the stored-index
            # probe below can't see a vec_id duplicated by upstream join
            # fan-out, and a landed duplicate permanently occupies two
            # top-k slots in every search that reaches it
            dup_in = (delta.groupBy("vec_id").count()
                      .filter(F.col("count") > 1).limit(1).collect())
            if dup_in:
                raise ValueError(
                    f"vec_id {dup_in[0][0]} appears {dup_in[0][1]} times "
                    "in this ingest batch — deduplicate the batch by "
                    "vector identity before update_incremental()")
            fp = self._delta_fingerprint(delta)
            if done is not None:
                stamped = {k: done.get("meta", {}).get(k) for k in fp}
                if stamped != fp:
                    raise ValueError(
                        f"retry of run_id={run_id!r} recomputed a delta "
                        f"with fingerprint {fp} but the landed append was "
                        f"stamped {stamped} — a retry must replay the "
                        "identical batch content")
                return {"codes_snapshot": done["snapshot_id"],
                        "new_rows": fp["delta_fp_rows"]}
            # append-only by identity: an already-indexed id would strand
            # its old codes (ids only — no codes, no vectors shuffled)
            indexed = self.codes.read(spark)
            if indexed is not None:
                dup = (delta.select("vec_id")
                       .join(indexed.select("vec_id"), "vec_id", "semi")
                       .limit(1).collect())
                if dup:
                    raise ValueError(
                        f"vec_id {dup[0][0]} is already indexed — the "
                        "index is append-only by identity; retrain() "
                        "for mutated vectors")
            sid = self.codes.append(delta, run_id=run_id, op="update",
                                    model_snapshot=m_sid, **fp,
                                    **self._params_meta())
        finally:
            delta.unpersist()
        return {"codes_snapshot": sid, "new_rows": fp["delta_fp_rows"]}

    def maintain(self, spark: SparkSession,
                 target_file_rows: int = 1_000_000, **meta) -> int:
        """Restore posting-list locality: every ``update_incremental``
        appends its own (internally clustered) small dir, so the file
        count — and with it ``search``'s footer/stats overhead — grows
        with ingest batches.  Re-cluster the whole code table by
        ``centroid_id`` into bin-packed files; searches before and after
        return identical results (compaction is a multiset-identical
        rewrite) and the where_in pruning gets one tight file range per
        cell again.  A plain ``codes.compact()`` (no cluster_by) would
        KEEP correctness but mix cells per file and destroy pruning —
        this wrapper exists so maintenance can't reach for it by
        accident."""
        meta.setdefault("op", "maintain")
        return self.codes.compact(spark, target_file_rows=target_file_rows,
                                  cluster_by="centroid_id", **meta)

    def _delta_fingerprint(self, delta: DataFrame) -> dict:
        return delta_fingerprint(delta)

    def _check_generation(self, m_sid: int) -> None:
        """The codes HEAD must be stamped with the CURRENT model snapshot.
        A ``retrain()`` that crashed between its two commits (model
        overwrite landed, codes overwrite did not) leaves gen-N+1
        centroids/codebooks over gen-N codes — ADC would score against
        the wrong codebooks and return arbitrary candidates silently, and
        an update would append gen-N+1 codes onto the gen-N table.  Fail
        loudly instead; re-running ``retrain()`` restores consistency.

        A codes table with NO snapshot while a model exists is the same
        crash class one commit earlier (``build()`` died between its model
        and codes commits) — serving or appending to it would silently
        present the delta as the whole corpus, so that fails loudly too."""
        c_head = self.codes.current_snapshot_id()
        if c_head is None:
            raise ValueError(
                "the model table has a committed model but the codes "
                "table has no snapshot — a build()/retrain() crashed "
                "between its model and codes commits; re-run build() "
                "before serving or updating this index")
        rec = self._newest_stamped(self.codes, "model_snapshot")
        stamped = None if rec is None else rec["meta"].get("model_snapshot")
        if stamped != m_sid:
            raise ValueError(
                f"codes HEAD (snapshot {c_head}) was encoded against "
                f"model snapshot {stamped}, but the current model is "
                f"{m_sid} — a retrain() committed its model but not its "
                "codes; re-run retrain() before serving this index")

    # -- search ------------------------------------------------------------
    def search(self, spark: SparkSession, emb: DataFrame,
               query_ids: list[int], k: int = 3, nprobe: int = 4,
               rerank: int = 32, round_to: int = 5) -> DataFrame:
        """IVFADC: probe the ``nprobe`` nearest cells per query, ADC-score
        ONLY the probed cells' code rows with a per-query LUT, then
        exact-rerank the approximate top-``rerank`` against the raw
        vectors.  Output shape matches ``cosine_topk``.

        Scale path: the code table scan is centroid-restricted
        (~nprobe/n_centroids of the corpus) and 8-byte-per-vector; the
        probe list is a tiny broadcast dim; the only raw-vector touches
        are the query collect and the rerank join."""
        from pyspark.sql import Window

        C, B, m_sid = self._load_model(spark)
        self._check_generation(m_sid)
        m, _, dsub = B.shape
        if self.codes.current_snapshot_id() is None:
            raise ValueError("index has no codes — call build()")

        qpdf = (emb.filter(F.col("vec_id").isin(query_ids))
                .select("vec_id", "embedding").toPandas())
        Q = np.stack([np.asarray(v, dtype=np.float64)
                      for v in qpdf["embedding"]])
        Q = Q / np.clip(np.linalg.norm(Q, axis=1, keepdims=True),
                        1e-12, None)
        qids = qpdf["vec_id"].to_numpy()
        order = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
        probes = [(int(qid), int(cid))
                  for qid, row in zip(qids, order) for cid in row]
        # posting-list read: the writes are clustered by centroid_id, so
        # this prunes every file whose stats range holds no probed cell —
        # non-probed cells are skipped at the file level, not filtered
        # post-scan (self.codes.last_scan records files_read/files_pruned)
        coded = self.codes.read(
            spark, where_in=("centroid_id",
                             sorted({cid for _, cid in probes})))
        probe_df = F.broadcast(spark.createDataFrame(
            probes, schema="query_id long, centroid_id int"))
        # LUT[q, s, c] = <Q_sub(q,s), centroid(s,c)>; ADC = sum_s LUT
        lut = np.einsum("qsd,scd->qsc", Q.reshape(len(Q), m, dsub), B)
        qpos = {int(qid): j for j, qid in enumerate(qids)}

        cand_schema = StructType([
            StructField("query_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("approx", DoubleType(), False),
        ])

        def score(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                keep = ~pdf["vec_id"].isin(query_ids)
                if not keep.any():
                    continue
                pdf = pdf[keep]
                codes = np.stack([np.asarray(c, dtype=np.int64)
                                  for c in pdf["codes"]])
                qrow = np.fromiter((qpos[int(q)] for q in pdf["query_id"]),
                                   dtype=np.int64, count=len(pdf))
                approx = lut[qrow[:, None], np.arange(m)[None, :],
                             codes].sum(axis=1)
                out = pd.DataFrame({
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["vec_id"].to_numpy(),
                    "approx": approx})
                # per-batch partial top-rerank bounds the exchange at
                # rerank * parts * queries rows
                out = (out.sort_values(["query_id", "approx",
                                        "neighbor_id"],
                                       ascending=[True, False, True])
                       .groupby("query_id").head(rerank))
                yield out

        cands = (probe_df.join(coded, "centroid_id")
                 .select("query_id", "vec_id", "codes")
                 .mapInPandas(score, schema=cand_schema))
        w = Window.partitionBy("query_id").orderBy(
            F.col("approx").desc(), F.col("neighbor_id"))
        cand = (cands.withColumn("r", F.row_number().over(w))
                .filter(F.col("r") <= rerank)
                .select("query_id", "neighbor_id"))
        # qpdf was already collected for the LUT/probes above — hand it to
        # the rerank so the raw table is scanned once per search, not twice
        return _rerank_candidates(emb, cand, query_ids, k, round_to,
                                  qpdf=qpdf)

"""Sequence packing: fixed-context training chunks from tokenized docs.

The canonical LLM training-data op over the ``(doc_id, tokens:array<int>,
n_tok, source)`` table this engine is built around: concatenate every
document's token array in a deterministic global order (ascending
``doc_id``, optionally an end-of-document separator token after each doc)
and re-slice the stream into consecutive chunks of exactly ``context_len``
tokens.  Every token keeps its global stream position, so the output is a
bijective re-bucketing of the input stream — the per-row token-array
equality invariant extends to the packed table (property-tested).

Scale shape — the naive plan is a single global-order window
(``Window.orderBy("doc_id")``), which Spark executes on ONE partition: a
scale-killer at 10^12 docs.  Instead the global offset of each doc is
computed in two bounded phases:

1. range-repartition the tiny doc-level ``(doc_id, n)`` frame by doc_id
   and take per-physical-partition token totals — ONE row per partition
   collected to the driver (bounded metadata, like the IVF sample);
2. broadcast the exclusive prefix per partition back and add a
   WITHIN-partition running sum (parallel window, no global sort).

The doc-level frame is persisted between the two phases so both jobs see
the same range-partition assignment (``repartitionByRange`` samples range
boundaries per job; an unpersisted recompute may re-draw them, silently
skewing every offset), then released as soon as the finished offsets are
checkpointed — nothing stays pinned in the session cache.  Token payloads never enter the window: they join
the finished offsets by doc_id, slice into chunk-aligned segments inside
Catalyst (a doc emits ceil(n/L)+1 segments at most — linear), and one
groupBy(chunk_id) reassembles each chunk from at most ``context_len``
segments.  No pandas UDF anywhere: the whole operator is JVM-side.

No reference counterpart (wotan is a detrending library) — this is the
tokens-payload extension of the engine's data model.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.storagelevel import StorageLevel


def _exclusive_prefix(df: DataFrame, *, range_keys: list[str],
                      order_keys: list[str], group_keys: list[str],
                      group_schema: str, weight: str | None, out_col: str,
                      partitions: int) -> DataFrame:
    """Exclusive running total of ``weight`` (row count when ``None``) in
    global ``(group_keys, order_keys)`` order, per group — WITHOUT a
    global-order window (which Spark executes on ONE partition: the
    scale-killer this module exists to avoid).  Shared by
    ``pack_sequences`` (token offsets) and ``shard_chunks`` (shard
    positions) so the subtle invariants live in one place:

    - the range-partitioned frame is persisted so BOTH jobs (the totals
      collect and the window pass) see the same range boundaries
      (``repartitionByRange`` samples boundaries per job; an unpersisted
      recompute may re-draw them, silently skewing every offset);
    - ONE row per (partition, group) comes back to the driver — bounded
      metadata — and the exclusive prefix is broadcast back for a
      parallel WITHIN-partition window;
    - the result is eagerly materialized (checkpoint when a reliable dir
      is set, else executor-local) so the internal cache can be released
      before returning instead of pinning one row per input row in the
      session cache; the checkpointed RDD is reclaimed by the
      ContextCleaner when the returned frame is dropped.

    ``range_keys`` must order rows consistently with ``(group_keys,
    order_keys)`` and the combined ordering must be total (unique), or
    positions within tied rows would be nondeterministic.  Returns the
    input columns plus ``out_col``.
    """
    keyed = (df.repartitionByRange(partitions, *range_keys)
             .withColumn("__pid", F.spark_partition_id())
             .persist(StorageLevel.MEMORY_AND_DISK))
    w = (F.col(weight) if weight is not None else F.lit(1)).cast("long")
    totals = (keyed.groupBy("__pid", *group_keys)
              .agg(F.sum(w).alias("__tot")).collect())
    prefix_rows, acc = [], {}
    for r in sorted(totals,
                    key=lambda r: tuple(r[k] for k in
                                        (*group_keys, "__pid"))):
        g = tuple(r[k] for k in group_keys)
        prefix_rows.append((int(r["__pid"]), *g, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + int(r["__tot"])
    schema = "__pid int, " + (group_schema + ", " if group_schema else "") \
        + "__part_off long"
    prefix_df = df.sparkSession.createDataFrame(prefix_rows, schema)
    win = (Window.partitionBy("__pid", *group_keys).orderBy(*order_keys)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (keyed.join(F.broadcast(prefix_df), ["__pid", *group_keys])
           .withColumn(out_col,
                       F.col("__part_off") + F.sum(w).over(win) - w)
           .drop("__pid", "__part_off"))
    reliable = df.sparkSession.sparkContext.getCheckpointDir() is not None
    out = (out.checkpoint(eager=True) if reliable
           else out.localCheckpoint(eager=True))
    keyed.unpersist()
    return out


def pack_sequences(seqs: DataFrame, context_len: int,
                   eod_token: int | None = None,
                   drop_last: bool = True,
                   partitions: int | None = None) -> DataFrame:
    """Pack token arrays into fixed-length chunks.

    Returns ``(chunk_id:long, tokens:array<int>, n_docs:long)`` where
    ``chunk_id`` numbers consecutive windows of the concatenated stream
    and ``n_docs`` counts the documents contributing to the chunk.  With
    ``drop_last`` (default) the trailing partial chunk is dropped, so
    every output row has exactly ``context_len`` tokens; otherwise the
    remainder is emitted short.  ``eod_token`` appends a separator after
    every document before packing (GPT-style document boundary).
    """
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    spark = seqs.sparkSession
    n_par = partitions or max(int(spark.sparkContext.defaultParallelism), 4)

    toks = F.col("tokens")
    if eod_token is not None:
        toks = F.concat(toks, F.array(F.lit(int(eod_token)).cast("int")))
    body = (seqs.select(F.col("doc_id"), toks.alias("toks"))
            .filter(F.size("toks") > 0))

    # phase 1+2: global exclusive prefix of token counts in doc_id order,
    # without a global-order window (see module docstring).  The size
    # column: the input contract declares n_tok == len(tokens), and using
    # it lets the metadata pass prune the token payload out of its scan
    # entirely (two thin columns instead of re-reading every array just
    # to size it — the payload is then read once, by the segment pass)
    eod_extra = 0 if eod_token is None else 1
    if "n_tok" in seqs.columns:
        n_col = (F.col("n_tok").cast("long") + eod_extra).alias("n")
    else:
        n_col = (F.size("tokens").cast("long") + eod_extra).alias("n")
    offsets = _exclusive_prefix(
        seqs.select("doc_id", n_col).filter(F.col("n") > 0),
        range_keys=["doc_id"], order_keys=["doc_id"], group_keys=[],
        group_schema="", weight="n", out_col="off", partitions=n_par)

    # chunk-aligned segments, sliced inside Catalyst per doc.  Chunk ids
    # use integer DIV: a float64 division would lose exactness once the
    # global stream passes 2^53 tokens — inside this module's stated scale
    L = int(context_len)
    # the metadata pass trusted the declared n_tok; a stale value would
    # misplace every later doc's offsets and silently drop the misshapen
    # chunks under drop_last — fail loudly instead.  The join is FULL
    # OUTER so a doc present on only one side (n_tok NULL or <= 0 with a
    # non-empty payload, or declared positive with an empty payload)
    # surfaces as a NULL on the other side rather than vanishing in an
    # inner join; size(NULL) == n is NULL, and assert_true raises on
    # non-true.  The guard feeds the sequence lower bound (coalesce of
    # assert_true's always-NULL pass value), so it is evaluated before
    # any segment is emitted and the optimizer cannot prune it
    n_ok = F.coalesce(
        F.assert_true(
            F.size("toks") == F.col("n"),
            F.concat(F.lit("pack_sequences: declared n_tok does not match "
                           "len(tokens) for doc_id="),
                     F.coalesce(F.col("doc_id").cast("string"),
                                F.lit("NULL")))).cast("long"),
        F.lit(0).cast("long"))
    # n_ok on the LEFT: interpreted-mode binary ops short-circuit on a
    # NULL left operand, and `off` IS NULL for the anomalous rows the
    # guard exists to catch
    first_c = n_ok + F.expr(f"off DIV {L}")
    last_c = F.expr(f"(off + n - 1) DIV {L}")
    segs = (body.join(offsets, "doc_id", "full")
            .select(F.explode(F.transform(
                F.sequence(first_c, last_c),
                lambda c: F.struct(
                    c.alias("chunk_id"),
                    F.greatest(c * L, F.col("off")).alias("gpos"),
                    F.slice(
                        F.col("toks"),
                        (F.greatest(c * L, F.col("off"))
                         - F.col("off") + 1).cast("int"),
                        (F.least((c + 1) * L, F.col("off") + F.col("n"))
                         - F.greatest(c * L, F.col("off"))).cast("int"),
                    ).alias("seg")))).alias("s")))
    packed = (segs.groupBy(F.col("s.chunk_id").alias("chunk_id"))
              .agg(F.flatten(F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("s.gpos"), F.col("s.seg")))),
                       lambda x: x["seg"])).alias("tokens"),
                   F.count("*").alias("n_docs")))
    if drop_last:
        packed = packed.filter(F.size("tokens") == L)
    return packed.select("chunk_id", "tokens", "n_docs")


def shard_chunks(chunks: DataFrame, n_shards: int, seed: int = 0,
                 partitions: int | None = None) -> DataFrame:
    """Deterministic training-order sharding of packed chunks:
    ``(chunk_id, shard, pos)`` with shards balanced by hash and ``pos``
    a dense 0-based position within the shard.

    The permutation is a pure function of ``(seed, chunk_id)`` — an
    md5-derived 56-bit key (``datapipe.md5_long``, the same portable
    idiom as ``stratified_sample``) — so there is no RNG state to
    coordinate across executors, re-running at any parallelism or
    partitioning yields the identical order, and changing ``seed``
    reshuffles globally.  Chunk ids break the (vanishingly unlikely)
    hash ties so the order stays total.

    Positions use the same two-phase prefix technique as
    ``pack_sequences``: a naive ``Window.partitionBy("shard")`` funnels
    ~N/n_shards rows through ONE task per shard — with billions of
    chunks and a handful of shards, a straggler/OOM funnel.  Instead the
    keyed rows are range-partitioned by (shard, key), per-partition
    per-shard counts come back as bounded metadata, and the exclusive
    prefix is broadcast for a parallel within-partition window.
    """
    from wotan_spark.spark.datapipe import md5_long

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    spark = chunks.sparkSession
    n_par = partitions or max(int(spark.sparkContext.defaultParallelism), 4)
    u = md5_long(F.concat_ws(
        ":", F.lit(str(int(seed))), F.col("chunk_id").cast("string")))
    keyed = (chunks.select("chunk_id", u.alias("u"))
             .withColumn("shard", (F.col("u") % n_shards).cast("int")))
    out = _exclusive_prefix(
        keyed, range_keys=["shard", "u", "chunk_id"],
        order_keys=["u", "chunk_id"], group_keys=["shard"],
        group_schema="shard int", weight=None, out_col="pos",
        partitions=n_par)
    return out.select("chunk_id", "shard", "pos")

#!/usr/bin/env python
"""Headline benchmark: one JSON line with per-query wall times.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     WOTAN_BENCH_DOCS (override synth corpus size).

Covers the engine's hot paths: packed robust detrend (biweight), packed
mean detrend, tier rollup + cascade, gap-fill interpolation, MinHash LSH
dedup, cosine top-k, slide clip, plus a synthesized-corpus full pipeline
(detrend -> tier10 -> tier100) reporting sequences/sec — the metric in
BASELINE.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0
    # stamp BEFORE Spark starts: the 1-min load here is pre-existing host
    # contention, not our own executors
    load_start = [round(x, 2) for x in os.getloadavg()]

    import __spark_entry__ as entrymod
    from wotan_spark.spark.rollup import cascade_tier, detrend_rollup_fused
    from wotan_spark.spark.session import get_spark
    from wotan_spark.spark.shipping import ensure_shipped
    from wotan_spark.spark.synth import synth_sequences

    spark = get_spark(app_name="wotan-bench", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_shipped(spark)

    q = entrymod.queries()
    timings: dict[str, float] = {}

    # warm the JVM + python workers once (excluded from timings)
    q["tier10_rollup"](spark, sf_dir).count()

    # ngram dedup benches the prefix-filtered (PPJoin) variant: identical
    # exact output to the unfiltered pass (shared oracle), ~half the cost —
    # it is the at-scale path
    headline = ["detrend_biweight_packed", "detrend_mean_packed",
                "tier10_rollup", "tier100_cascade", "gapfill_interp",
                "median_slider_rows", "minhash_lsh_pairs", "cosine_topk",
                "slide_clip_packed", "ngram_jaccard_prefix",
                "pricing_summary"]
    # median-of-reps with per-rep samples recorded: this shared host drifts
    # 2-3x run to run, so a single number per query is not adjudicable —
    # the medians are the headline, the rep lists + load averages are the
    # variance evidence
    reps = int(os.environ.get("WOTAN_BENCH_REPS", "3"))
    rep_samples: dict[str, list[float]] = {}
    for name in headline:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            q[name](spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 3))
        rep_samples[name] = samples
        # statistics.median averages the middle pair for even rep counts
        # (indexing the upper-middle would report a max as a "median" at
        # reps=2)
        timings[name] = round(statistics.median(samples), 3)

    # synthesized tokenized corpus: fused detrend+tier10 -> tier100 cascade
    n_docs = int(os.environ.get("WOTAN_BENCH_DOCS", max(int(sf * 20000), 200)))
    seq = synth_sequences(spark, n_docs, median_len=1000, max_len=20000)
    seq = seq.persist()
    n_seq = seq.count()  # materialize input outside the timed region
    t0 = time.perf_counter()
    t10 = detrend_rollup_fused(seq, "biweight", window_length=17)
    cascade_tier(t10).count()
    pipeline_sec = time.perf_counter() - t0
    seq.unpersist()
    timings["pipeline_synth"] = round(pipeline_sec, 3)
    seq_per_sec = round(n_seq / pipeline_sec, 2)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "synth_docs": n_seq,
        "sequences_per_sec": seq_per_sec,
        "cpus": cpus,
        "reps": reps,
        "rep_samples": rep_samples,
        "load_avg_start": load_start,
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()

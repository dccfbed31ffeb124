#!/usr/bin/env python
"""Throughput scaling evidence: same job at N and 4N cores.

The sandbox host's deliverable CPU drifts over time (shared hypervisor), so
each efficiency sample comes from an *adjacent-in-time* pair of runs — a
fresh local[N] session immediately followed by a fresh local[4N] session —
and the reported efficiency is the median over rounds.

Job: fused detrend(biweight, W=17) + tier-10 rollup + tier-100 cascade over
a deterministic 10k-sequence parquet corpus (lognormal lengths, heavy tail).

Env: WOTAN_SCALE_DOCS (10000), WOTAN_SCALE_N ("8"), WOTAN_SCALE_ROUNDS (3),
WOTAN_SCALE_REPS (2: reps within a session, min taken),
WOTAN_SCALE_JOB ("rollup"; "pack" runs fixed-context sequence packing).
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

for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")


def corpus_path(n_docs: int) -> str:
    path = f"/tmp/wotan_scale_corpus_{n_docs}"
    if not os.path.exists(path):
        from wotan_spark.spark.session import get_spark
        from wotan_spark.spark.synth import synth_sequences
        spark = get_spark(app_name="scale-gen", cores=32)
        spark.sparkContext.setLogLevel("ERROR")
        synth_sequences(spark, n_docs, median_len=1000, max_len=20000,
                        partitions=128).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def run_level(path: str, cores: int, reps: int,
              job_name: str = "rollup") -> float:
    from wotan_spark.spark.session import get_spark
    spark = get_spark(app_name=f"scale-{cores}", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    seq = spark.read.parquet(path)

    if job_name == "pack":
        from wotan_spark.spark.packing import pack_sequences

        def job():
            # the full operator per rep: offset collect, checkpoint,
            # segment shuffle, chunk reassembly
            pack_sequences(seq, 1024).count()
    else:
        from wotan_spark.spark.rollup import (cascade_tier,
                                              detrend_rollup_fused)

        def job():
            cascade_tier(detrend_rollup_fused(seq, "biweight",
                                              window_length=17)).count()

    job()  # warm: codegen + worker spawn
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        job()
        best = min(best, time.perf_counter() - t0)
    spark.stop()
    return best


def main() -> None:
    n_docs = int(os.environ.get("WOTAN_SCALE_DOCS", "10000"))
    levels = [int(x) for x in os.environ.get("WOTAN_SCALE_N", "8").split(",")]
    rounds = int(os.environ.get("WOTAN_SCALE_ROUNDS", "3"))
    reps = int(os.environ.get("WOTAN_SCALE_REPS", "2"))
    # seconds to idle before each round so the 1-min load average sheds the
    # previous round's own sessions — keeps the pre-round stamp an honest
    # external-contention reading
    cooldown = int(os.environ.get("WOTAN_SCALE_COOLDOWN", "0"))
    job_name = os.environ.get("WOTAN_SCALE_JOB", "rollup")
    if job_name not in ("rollup", "pack"):
        raise ValueError(f"WOTAN_SCALE_JOB must be rollup|pack, "
                         f"got {job_name!r}")
    path = corpus_path(n_docs)

    out = {"docs": n_docs, "job": job_name, "rounds": []}
    for n in levels:
        effs = []
        for _ in range(rounds):
            if cooldown:
                time.sleep(cooldown)
            load_pre = [round(x, 2) for x in os.getloadavg()]
            w_lo = run_level(path, n, reps, job_name)
            w_hi = run_level(path, 4 * n, reps, job_name)
            eff = (w_lo / w_hi) / 4.0
            effs.append(eff)
            out["rounds"].append({
                "n": n, "wall_n": round(w_lo, 3), "wall_4n": round(w_hi, 3),
                "tput_n": round(n_docs / w_lo, 1),
                "tput_4n": round(n_docs / w_hi, 1),
                "efficiency": round(eff, 3),
                # pre-round external load (our own sessions are torn down
                # between rounds; 1-min avg still carries some tail of the
                # previous round's own work)
                "load_avg_pre": load_pre,
            })
        out[f"efficiency_{n}_to_{4*n}_median"] = round(
            statistics.median(effs), 3)
        out[f"efficiency_{n}_to_{4*n}_best"] = round(max(effs), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Deterministic scale-up of the driver testdata (default: sf0.1 -> sf1.0).

The sandbox ships sf{0.001,0.01,0.1}; the 100x-scale claims need at least
one measured decade above the per-round bench, so this synthesizes an
sfK-shaped directory by replicating the fact tables REP times with
deterministic key remapping:

* events   — user_id/event_id offset per replica: REP x series, same
  per-series shape (the detrend/rollup unit of work);
* documents — doc_id offset; every word of replica r>0 is suffixed with
  ``~r`` so vocabularies are DISJOINT across replicas: the near-dup pair
  set and LSH bucket profile scale exactly REP x (naively copying text
  would make every doc a 10-way near-duplicate of itself — a pair-count
  explosion no natural corpus has);
* embeddings — vec_id offset; replica r>0 circularly shifted by r lanes
  (an orthogonal permutation: same norms, intra-replica cosines exact,
  no cross-replica cosine-1.0 clones);
* lineitem — l_orderkey offset;
* dims (orders/customer/supplier/part/nation/region) copied unchanged.

Usage: python tools/gen_scale.py [--rep 10] [--src /root/testdata/sf0.1]
                                 [--out /tmp/testdata/sf1.0]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/testdata/sf1.0")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads TO {max(os.cpu_count() or 4, 4)}")

    def src(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    def write(sql: str, t: str) -> None:
        con.sql(f"COPY ({sql}) TO '{args.out}/{t}.parquet' "
                f"(FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM "
                    f"read_parquet('{args.out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    reps = f"(SELECT unnest(range({args.rep})) AS rep)"

    ev_hi = con.sql(f"SELECT max(user_id)+1, max(event_id)+1 "
                    f"FROM {src('events')}").fetchone()
    write(f"""
        SELECT event_id + rep * {ev_hi[1]} AS event_id, ts,
               user_id + rep * {ev_hi[0]} AS user_id,
               event_type, value, props
        FROM {src('events')}, {reps}
        ORDER BY user_id, ts
    """, "events")

    doc_hi = con.sql(f"SELECT max(doc_id)+1 "
                     f"FROM {src('documents')}").fetchone()[0]
    write(f"""
        SELECT doc_id + rep * {doc_hi} AS doc_id,
               CASE WHEN rep = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)',
                                        '\\1~' || rep, 'g') END AS text,
               lang, source,
               CASE WHEN rep = 0 THEN n_chars
                    ELSE length(regexp_replace(text, '(\\S+)',
                                               '\\1~' || rep, 'g'))
               END AS n_chars
        FROM {src('documents')}, {reps}
        ORDER BY doc_id
    """, "documents")

    vec_hi = con.sql(f"SELECT max(vec_id)+1 "
                     f"FROM {src('embeddings')}").fetchone()[0]
    # replica r>0 is circularly shifted by r lanes: a coordinate
    # permutation is orthogonal, so norms and every intra-replica cosine
    # are preserved EXACTLY (each replica is the same workload), while
    # cross-replica exact duplicates are destroyed — verbatim copies would
    # hand every query REP-1 cosine-1.0 clones and inflate every LSH
    # bucket REP x, the same pair-count explosion the ~r word-suffix
    # avoids for documents
    write(f"""
        SELECT vec_id + rep * {vec_hi} AS vec_id,
               CASE WHEN rep = 0 THEN embedding
                    ELSE embedding[rep + 1:] || embedding[1:rep]
               END AS embedding,
               label
        FROM {src('embeddings')}, {reps}
        ORDER BY vec_id
    """, "embeddings")

    lo_hi = con.sql(f"SELECT max(l_orderkey)+1 "
                    f"FROM {src('lineitem')}").fetchone()[0]
    write(f"""
        SELECT l_orderkey + rep * {lo_hi} AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, {reps}
        ORDER BY l_orderkey, l_linenumber
    """, "lineitem")

    for t in ["orders", "customer", "supplier", "part", "nation",
              "region"]:
        shutil.copyfile(f"{args.src}/{t}.parquet",
                        f"{args.out}/{t}.parquet")
        print(f"{t}: copied")


if __name__ == "__main__":
    main()

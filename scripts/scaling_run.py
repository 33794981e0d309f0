#!/usr/bin/env python
"""Round-2 scaling evidence: the six formerly-weak queries at sf0.1 vs a
10x synthetic scale-up, after the de-quadratification fixes.

Builds /tmp/tsdt_scale10 by unioning sf0.1 ten times with shifted keys
(derived scratch data, never committed):

* orders/lineitem/customer: order/cust keys offset per copy (dimension
  tables nation/region/supplier/part are NOT grown - they are true
  dimensions)
* documents: doc_id offset, text suffixed per copy (docs stay distinct,
  so dedup work scales instead of collapsing)
* embeddings: vec_id offset, elements jittered with md5-derived noise
  (copies are NOT near-dups - candidate volume reflects the random-pair
  collision rate, the honest worst case)
* events: user_id/event_id offset (10x users, same hour span)

For the LSH-blocked embedding query, bits follows log2(N) (+3 bits at
10x) per the operator's scale rule - buckets stay O(1) and candidates
grow ~linearly, the property the measurement demonstrates.

Usage: python scripts/scaling_run.py [--rebuild]
Prints one JSON line per query: name, sf0.1 sec, 10x sec, growth.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_data_trimmer_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/tsdt_scale10"
COPIES = 10


def _shifted_union(spark, table, shifts):
    """COPIES shifted copies of a base table unioned (shifts: {col:
    per-copy offset}) — shared by build() and build_dup_dense so the
    two 10x builders cannot drift."""
    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    parts = []
    for i in range(COPIES):
        p = df
        for col, off in shifts.items():
            p = p.withColumn(col, F.col(col) + F.lit(i * off))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build(spark):
    os.makedirs(DST, exist_ok=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def shifted_union(table, shifts):
        return _shifted_union(spark, table, shifts)

    okey, ckey = 10_000_000, 1_000_000
    shifted_union("orders", {"o_orderkey": okey, "o_custkey": ckey}).write.mode(
        "overwrite"
    ).parquet(f"{DST}/orders.parquet")
    shifted_union("lineitem", {"l_orderkey": okey}).write.mode("overwrite").parquet(
        f"{DST}/lineitem.parquet"
    )
    shifted_union("customer", {"c_custkey": ckey}).write.mode("overwrite").parquet(
        f"{DST}/customer.parquet"
    )
    for t in ("nation", "region", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
            .withColumn("text", F.concat(F.col("text"), F.lit(f" copytag{i}")))
            .withColumn("n_chars", F.length("text"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    parts = []
    for i in range(COPIES):
        # deterministic md5 jitter in [-0.25, 0.25): decorrelates copies
        noise = F.transform(
            F.col("embedding"),
            lambda x, j: x
            + (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|", F.lit(i), F.col("vec_id").cast("string"), j.cast("string")
                            )
                        ),
                        1,
                        6,
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(float(16**6))
                - F.lit(0.5)
            )
            * F.lit(0.5),
        )
        parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000)).withColumn(
                "embedding", noise.cast("array<float>")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000)).withColumn(
                "event_id", F.col("event_id") + F.lit(i * 100_000_000)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/events.parquet")


def steady(fn, runs=2):
    t = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        t = time.time() - t0
    return t


DUP_DST = "/tmp/tsdt_scale10_dup"


def build_dup_dense(spark):
    """A 10× documents table where the copies are BYTE-IDENTICAL (only
    doc_id shifts): distinct content stays at sf0.1 level while rows
    grow 10× — the corpus shape real crawls have (30%+ exact dups) and
    the one the r5 digest-collapsed Jaccard path is built for."""
    os.makedirs(DUP_DST, exist_ok=True)
    _shifted_union(spark, "documents", {"doc_id": 1_000_000}).write.mode(
        "overwrite"
    ).parquet(f"{DUP_DST}/documents.parquet")


def run_dup_dense(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    if not os.path.exists(f"{DUP_DST}/documents.parquet"):
        build_dup_dense(spark)
    name = "dedup_ngram_jaccard"
    t1 = steady(lambda: qs[name](spark, SRC).collect())
    t10 = steady(lambda: qs[name](spark, DUP_DST).collect())
    n1 = qs[name](spark, SRC).count()
    n10 = qs[name](spark, DUP_DST).count()
    print(
        json.dumps(
            {
                "query": f"{name} (dup-dense 10x: identical copies)",
                "sf0.1": round(t1, 2),
                "x10": round(t10, 2),
                "growth": round(t10 / t1, 2),
                "pairs_sf0.1": n1,
                "pairs_x10": n10,
            }
        )
    )


def run_recall(spark):
    """ANN recall at 10× (VERDICT r4 #4): plant 20 near-dups of the
    query vector into the 10× embeddings table, then measure recall of
    each probe structure vs brute-force cosine — plus the natural
    (unplanted) recall@10 and the fraction of the corpus each probe
    actually scans (the selectivity the recall is bought with).

    Probes measured: multi-table LSH bucket union (bits per the
    log2(N) rule), IVF seed centroids, and IVF after one Lloyd round
    (`ivf_lloyd_refine`) — refined recall must be >= seed recall."""
    import hashlib
    import math

    from time_series_data_trimmer_spark.operators import similarity as sim

    DIM = 64
    emb = spark.read.parquet(f"{DST}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    n_total = emb.count()

    # plant 20 near-dups (cosine ~0.9998: 2%-of-norm md5 jitter)
    nrm = math.sqrt(sum(x * x for x in qvec))
    planted_rows = []
    for j in range(20):
        p = [
            int(hashlib.md5(f"plant{j}|{i}".encode()).hexdigest()[:8], 16)
            / float(2**31)
            - 1.0
            for i in range(DIM)
        ]
        pn = math.sqrt(sum(z * z for z in p))
        planted_rows.append(
            (
                900_000_000 + j,
                [x + 0.02 * nrm * y / pn for x, y in zip(qvec, p)],
            )
        )
    planted_ids = {r[0] for r in planted_rows}
    df = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted_rows, "vec_id bigint, embedding array<float>")
    ).cache()
    df.count()

    def topk_ids(frame, k):
        return [r["vec_id"] for r in sim.brute_force_topk(frame, qvec, k=k).collect()]

    exact10 = set(topk_ids(emb, 10))          # natural: no planted rows
    exact_planted = set(topk_ids(df, 21))      # {qvec} + the 20 planted

    def lsh_candidates(frame, bits, tables):
        sigs = sim.lsh_signatures(frame, DIM, bits=bits, tables=tables)
        qs = sigs.filter(F.col("vec_id") == 0).select("t", "sig")
        ids = sigs.join(F.broadcast(qs), ["t", "sig"]).select("vec_id").distinct()
        return frame.join(ids, "vec_id")

    def ivf_candidates(frame, cents, nprobe=4):
        probe = sim.probe_centroids(cents, qvec, nprobe=nprobe)
        assigned = sim.ivf_assign(frame, cents)
        return frame.join(
            assigned.filter(F.col("centroid_id").isin(probe)).select("vec_id"),
            "vec_id",
        )

    # bits per the operator's log2(N) rule: 2^bits ~ N/64 buckets/table
    bits10 = max(6, int(math.log2(max(n_total, 2))) - 6)
    probes = {}
    probes["lsh_multitable(bits=%d,tables=6)" % bits10] = lsh_candidates(
        df, bits10, 6
    )
    seeds = sim.ivf_centroids(df, 16)
    refined = sim.ivf_lloyd_refine(df, seeds, rounds=1)
    probes["ivf_seed(16 cells, nprobe=4)"] = ivf_candidates(df, seeds)
    probes["ivf_lloyd1(16 cells, nprobe=4)"] = ivf_candidates(df, refined)

    out = []
    for name, cand in probes.items():
        cand = cand.cache()
        n_cand = cand.count()
        # natural recall excludes the planted rows (they would crowd
        # out every natural neighbor at cosine ~0.9998)
        got10 = set(topk_ids(cand.filter(F.col("vec_id") < 900_000_000), 10))
        gotp = set(topk_ids(cand, 21))
        out.append(
            {
                "probe": name,
                "n_total": n_total + 20,
                "scanned_frac": round(n_cand / (n_total + 20), 4),
                "recall@10_natural": round(len(exact10 & got10) / 10.0, 2),
                "recall_planted@20": round(
                    len((gotp & exact_planted) & planted_ids) / 20.0, 2
                ),
            }
        )
        cand.unpersist()

    # IVF-PQ (VERDICT r5 #7): same probed cells as ivf_seed, but the
    # fine scan reads int8 RECONSTRUCTIONS and only the shortlist gets
    # exact vectors — recall must survive the quantization noise.
    pq_natural = {
        r["vec_id"]
        for r in sim.ivf_pq_topk(
            df.filter(F.col("vec_id") < 900_000_000), qvec, k=10, shortlist=40
        ).collect()
    }
    pq_planted = {
        r["vec_id"]
        for r in sim.ivf_pq_topk(df, qvec, k=21, shortlist=60).collect()
    }
    seed_cells = ivf_candidates(df, seeds)
    seed_frac = round(seed_cells.count() / (n_total + 20), 4)
    out.append(
        {
            "probe": "ivf_pq(16 cells, nprobe=4, int8, shortlist=40/60)",
            "n_total": n_total + 20,
            "scanned_frac": seed_frac,
            "recall@10_natural": round(len(exact10 & pq_natural) / 10.0, 2),
            "recall_planted@20": round(
                len(pq_planted & planted_ids) / 20.0, 2
            ),
        }
    )
    # r7: second PQ operating point (VERDICT r6 #7) — 4-bit codes
    # (levels=16, 8× less candidate I/O than float32) at the same
    # shortlist: the accuracy-vs-scan tradeoff now has two measured
    # points like IVF/LSH got in r5.
    pq4_natural = {
        r["vec_id"]
        for r in sim.ivf_pq_topk(
            df.filter(F.col("vec_id") < 900_000_000), qvec, k=10,
            shortlist=40, levels=16,
        ).collect()
    }
    pq4_planted = {
        r["vec_id"]
        for r in sim.ivf_pq_topk(df, qvec, k=21, shortlist=60, levels=16).collect()
    }
    out.append(
        {
            "probe": "ivf_pq(16 cells, nprobe=4, 4-bit, shortlist=40/60)",
            "n_total": n_total + 20,
            "scanned_frac": seed_frac,
            "recall@10_natural": round(len(exact10 & pq4_natural) / 10.0, 2),
            "recall_planted@20": round(
                len(pq4_planted & planted_ids) / 20.0, 2
            ),
        }
    )
    df.unpersist()
    for row in out:
        print(json.dumps(row))
    return out


def main():
    spark = get_spark("scaling-run")
    if "--rebuild" in sys.argv or not os.path.exists(f"{DST}/embeddings.parquet"):
        build(spark)
    if "--recall" in sys.argv:
        run_recall(spark)
        return
    # --only q1,q2,... : measure a subset of the REGISTERED queries and
    # skip every special-cased measurement block (fast iteration on new
    # operators without re-paying the full matrix)
    if "--dup-dense" in sys.argv:
        run_dup_dense(spark)
        return

    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))

    import __spark_entry__ as entry
    from time_series_data_trimmer_spark.operators import similarity as sim
    from time_series_data_trimmer_spark.queries import _table
    from time_series_data_trimmer_spark.streaming import stream_ops

    qs = entry.queries()
    results = {}

    if only is not None:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries in --only: {sorted(unknown)}")
        for name in sorted(only):
            t1 = steady(lambda: qs[name](spark, SRC).collect())
            t10 = steady(lambda: qs[name](spark, DST).collect())
            results[name] = (t1, t10)
        for name, (a, b) in results.items():
            print(json.dumps({"query": name, "sf0.1": round(a, 2), "x10": round(b, 2), "growth": round(b / a, 2) if a else None}))
        return

    for name in (
        "tpch_q3_shipping_priority",
        "tpch_q10_returned_items",
        "tpch_q18_large_volume_orders",
        "corpus_pipeline_end_to_end",
    ):
        t1 = steady(lambda: qs[name](spark, SRC).collect())
        t10 = steady(lambda: qs[name](spark, DST).collect())
        results[name] = (t1, t10)

    # LSH-blocked embedding pairs: bits follows log2(N) (8 -> 11 at 10x)
    def emb_pairs(sf_dir, bits):
        df = sim.topk_similar_pairs_blocked(
            _table(spark, sf_dir, "embeddings"), k=20, bits=bits, tables=6, dim=64
        )
        df.collect()

    t1 = steady(lambda: emb_pairs(SRC, 8))
    t10 = steady(lambda: emb_pairs(DST, 11))
    results["dedup_embedding_topk_pairs(blocked, bits=log2 N)"] = (t1, t10)

    # round-3 changed queries: bounded-by-default ngram Jaccard, the
    # N-adaptive combinatorial SimHash blocking, and the three new
    # TPC-H join shapes (semi/anti/disjunctive-pushdown)
    for name in (
        "dedup_ngram_jaccard",
        "dedup_simhash_pairs",
        "tpch_q19_disjunctive_revenue",
        "tpch_q21_waiting_supplier",
        "tpch_q22_global_sales_opportunity",
    ):
        t1 = steady(lambda: qs[name](spark, SRC).collect())
        t10 = steady(lambda: qs[name](spark, DST).collect())
        results[name] = (t1, t10)

    cand1 = sim.lsh_candidate_pairs(_table(spark, SRC, "embeddings"), 64, 8, 6).count()
    cand10 = sim.lsh_candidate_pairs(_table(spark, DST, "embeddings"), 64, 11, 6).count()
    results["_lsh_candidates"] = (cand1, cand10)

    # r4: fused multi-op paths + the scale-safe packing rewrite
    for name in (
        "recipe_compiled_chain",
        "mix_sequence_pack_offsets",
        "mix_sequence_pack_sharded",
        "dedup_ngram_jaccard_prefix",
    ):
        t1 = steady(lambda: qs[name](spark, SRC).collect())
        t10 = steady(lambda: qs[name](spark, DST).collect())
        results[name] = (t1, t10)

    # r4: PPJoin candidate volume — prefix filter alone vs + length
    # + positional (both only prune; result set identical, tested)
    from time_series_data_trimmer_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    def ppjoin_cands(sf_dir, use_len, use_pos):
        docs = _table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
        toks = docs.select(
            F.col("doc_id"),
            F.explode(dd.word_shingles(F.col("text"), dd.DEFAULT_SHINGLE)).alias("g"),
        )
        cand, _ = dd.prefix_join_candidates(
            toks, 0.2, use_length_filter=use_len, use_positional_filter=use_pos
        )
        return cand.count()

    for sf_name, d in (("sf0.1", SRC), ("x10", DST)):
        results[f"_ppjoin_candidates_{sf_name}(prefix_only,+len,+len+pos)"] = (
            ppjoin_cands(d, False, False),
            (ppjoin_cands(d, True, False), ppjoin_cands(d, True, True)),
        )

    # r4: JOIN-side skew rehearsal — events fact side with 70% of rows
    # on one hot key, joined to a small-but-not-broadcast dim; AQE must
    # split the hot partition (skew=true) at both scales
    from time_series_data_trimmer_spark.operators.skew import aqe_skew_split_applied

    def skew_join(sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        facts = ev.select(
            F.when(F.col("event_id") % 10 < 7, F.lit(0))
            .otherwise(F.col("user_id"))
            .alias("k"),
            "event_id",
            "value",
            F.repeat(F.md5(F.col("event_id").cast("string")), 4).alias("pad"),
        )
        dims = spark.range(0, 2000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("dv")
        )
        prev = {
            "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
                "spark.sql.autoBroadcastJoinThreshold"
            ),
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
            ),
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            ),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes"
            ),
        }
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1048576"
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "524288"
            )
            t0 = time.time()
            split = aqe_skew_split_applied(facts.join(dims, "k"))
            return time.time() - t0, split
        finally:
            for k, v in prev.items():
                spark.conf.set(k, v)

    (t1, s1), (t10, s10) = skew_join(SRC), skew_join(DST)
    results["skew_join_aqe_split(events, 70% hot key)"] = (
        (round(t1, 2), s1),
        (round(t10, 2), s10),
    )

    # streaming production path: append-mode file sink at 1x and 10x
    import shutil
    import uuid

    def stream_files(sf_dir):
        d = f"/tmp/tsdt_sink_{uuid.uuid4().hex[:8]}"
        stream_ops.tumbling_hour_agg_to_files(
            spark, f"{sf_dir}/events.parquet", f"{d}/out", f"{d}/ckpt"
        ).count()
        shutil.rmtree(d, ignore_errors=True)

    t1 = steady(lambda: stream_files(SRC), runs=1)
    t10 = steady(lambda: stream_files(DST), runs=1)
    results["stream_tumbling_file_sink"] = (t1, t10)

    for name, (a, b) in results.items():
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            growth = round(b / a, 2) if a else None
            print(
                json.dumps(
                    {"query": name, "sf0.1": round(a, 2), "x10": round(b, 2), "growth": growth}
                )
            )
        else:
            print(json.dumps({"query": name, "sf0.1": a, "x10": b}))


if __name__ == "__main__":
    main()

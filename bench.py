"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": ..., "value": ..., "unit": "sec", "queries": {...}, "sf": ...}

Headline = the extraction engine (turns/sec over the synthesized transcripts
table for this sf), plus the operator suite.  Scaling evidence across two
parallelism levels lives in tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(min(32, os.cpu_count() or 8))))
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or "0.1"

    import __spark_entry__ as entry
    from arabic_ocr_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(16, 2 * cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # make sure the synth cache is built before timing anything
    synth_dir = entry.synth_dir_for(sf_dir)
    n_turns = spark.read.parquet(os.path.join(synth_dir, "transcripts.parquet")).filter(
        "text <> ''"
    ).count()

    qs = entry.queries()
    # warmup outside every timed window: JVM codegen, python workers,
    # broadcast deserialization.  Uses the UNCACHED extraction plan so the
    # timed extract_turns still pays the full kernel; extract_eval /
    # extract_lineage then measure the cached-reuse path by design.
    entry._extraction_plan(spark, sf_dir, cached=False).limit(16 * cpus).count()
    qs["token_stats"](spark, sf_dir).count()

    bench_queries = [
        "extract_turns",
        "extract_eval",
        "dedup_exact",
        "minhash_lsh_pairs",
        "jaccard_pairs",
        "dedup_groups",
        "simhash",
        "token_stats",
        "bpe_tokens",
        "payload_meta",
        "payload_features",
        "payload_ink",
        "quality",
        "lang_id",
        "fingerprint",
        "cosine_topk",
        "embedding_dup_pairs",
        "embedding_neardup_hi",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "payload_thumbnail",
        "payload_profile",
        "pricing_summary",
        "orders_by_nation",
        "events_hourly",
        "asof_join",
        "range_join",
        "curated_docs",
    ]

    timings: dict[str, float] = {}
    extract_sec = None
    for name in bench_queries:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        if name == "extract_turns":
            extract_sec = dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    # ANN quality metric + its wall time: recall@10 vs exact cosine_topk
    t0 = time.perf_counter()
    recall_row = qs["ann_recall"](spark, sf_dir).collect()[0]
    timings["ann_recall"] = round(time.perf_counter() - t0, 3)

    # high-threshold near-dup pruning evidence: LSH-band candidate volume vs
    # the n^2/2 pairs the exact path would score, at the collision-model
    # banding auto-sized for this corpus (the same params the driver's
    # embedding_neardup_hi query now derives)
    from arabic_ocr_spark.operators.similarity import (
        embedding_neardup_candidates,
        neardup_band_params,
    )

    aug = entry._augmented_embeddings(spark, sf_dir)
    n_aug = aug.count()
    nb, rpb = neardup_band_params(n_aug)
    neardup_cands = embedding_neardup_candidates(aug, nb, rpb).count()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "extract_turns": n_turns,
        "extract_turns_per_sec": round(n_turns / extract_sec, 1) if extract_sec else None,
        "ann_ivf_recall_at_10": recall_row["ivf_recall"],
        "ann_lsh_recall_at_10": recall_row["lsh_recall"],
        "neardup_hi_candidates": neardup_cands,
        "neardup_hi_allpairs": n_aug * (n_aug - 1) // 2,
        "neardup_band_params": [nb, rpb],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

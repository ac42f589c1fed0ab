"""Extraction data-scale evidence: the FULL kernel path at sf0.1 vs sf1
(~10x turns), same parallelism, one clean window.

tools/bench_datascale.py covers the dedup / CC / ANN ladders at 1x vs 10x
rows; this closes the remaining gap — the headline extraction itself had no
10x-data point.  Both scales run the identical un-cached plan
(__spark_entry__._extraction_plan(cached=False): pruned+pushed scan -> one
salted-chunk shuffle -> sortWithinPartitions -> mapInPandas kernel,
broadcast-once model).  A linear engine holds per-turn throughput roughly
flat as rows x10; a driver-bottlenecked or quadratic one would not.

Writes BENCH/sf1_result.json.  Run on an otherwise idle machine (see
CLAUDE.md on shared-VM throttling).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALES = ["sf0.1", "sf1"]


def main() -> None:
    import __spark_entry__ as entry
    from arabic_ocr_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=max(16, 2 * CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    # build both synth caches before any timed window
    sf_dirs = {s: f"/root/testdata/{s}" for s in SCALES}
    for s in SCALES:
        entry.synth_dir_for(sf_dirs[s])

    # warmup outside the timed windows: JVM codegen, python worker pool,
    # broadcast deserialization
    entry._extraction_plan(spark, sf_dirs[SCALES[0]], cached=False).limit(16 * CPUS).count()

    result: dict = {"cpus": CPUS}
    per_sec: dict[str, float] = {}
    for s in SCALES:
        plan = entry._extraction_plan(spark, sf_dirs[s], cached=False)
        t0 = time.perf_counter()
        n = plan.count()
        dt = time.perf_counter() - t0
        per_sec[s] = n / dt
        result[s] = {
            "turns": n,
            "wall_s": round(dt, 2),
            "turns_per_sec": round(per_sec[s], 1),
        }
        print(f"# {s}: {n} turns in {dt:.1f}s -> {per_sec[s]:.1f} turns/s",
              file=sys.stderr)

    lo, hi = SCALES
    result["data_ratio"] = round(result[hi]["turns"] / result[lo]["turns"], 2)
    # per-turn throughput retention at 10x data (1.0 = perfectly linear)
    result["throughput_retention"] = round(per_sec[hi] / per_sec[lo], 3)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "sf1_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

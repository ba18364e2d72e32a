"""Benchmark harness for the driver (BENCH_r{N}.json).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with a noop-format write
(all partitions computed, nothing collected to the driver), the same
way Spark's own benchmarks do it — ``count()`` alone can skip column
evaluation through pruning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: flagship IPF pipeline + one representative per engine
# area (scan-agg, multi-join, matrix core, window/sessionize, text,
# dedup, ANN, ML).
# h01 first: it absorbs the one-time session warmup (first parquet
# read, codegen baseline) so the flagship's number reflects the
# pipeline, not the JVM cold start.
HEADLINE = [
    "h01_pricing_summary",
    "ipf_cost_per_visit",
    "h02_revenue_by_nation",
    "h03_shipping_priority",
    "a13_mmult",
    "a16_ipf_step",
    "e03_sessionize",
    "e04_resample_gapfill",
    "h13_large_volume_orders",
    "st01_stream_hourly",
    "j01_asof_join",
    "t01_token_stats",
    "t06_tfidf",
    "p02_corpus_stats",
    "d03_minhash_near_dup",
    "s01_lsh_topk",
    "s03_ivf_topk",
    "m01_als_recommend",
]


def sf_from_dir(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.removeprefix("sf"))
    except ValueError:
        return -1.0


def main() -> None:
    from alternating_least_squares_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="alternating-least-squares-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.1f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()

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
# FROZEN AT <=52 ENTRIES (round 12): the driver captures only a
# ~2000-char stdout tail and the compact metric line costs ~30 chars
# per query (r11 measured 1608 chars at 58 queries — two rounds from
# the r6 parsed:null failure).  When a round adds new entries, RETIRE
# same-family members oldest-first to stay under the cap; retired
# entries keep their oracle rows and pytest coverage, they just leave
# the per-round timing line.  The assert below makes forgetting this
# a test-time failure, not a silent driver-side truncation.
# A warmup pass (below) touches every input table and the noop sink
# once before the clock starts, so timings measure query execution,
# not first-file-listing / committer init / JVM class loading.
# (Rounds 1-2 instead let h01 absorb the warmup — its r3+ numbers drop
# accordingly; see the methodology note in BASELINE.md.)
WARMUP_TABLES = [
    "lineitem", "orders", "customer", "supplier", "part",
    "nation", "region", "events", "documents", "embeddings",
]
HEADLINE = [
    "h01_pricing_summary",
    "ipf_cost_per_visit",
    "h02_revenue_by_nation",
    "a13_mmult",
    "a16_ipf_step",
    "e03_sessionize",
    "e04_resample_gapfill",
    "c16_scd2",
    "st01_stream_hourly",
    "j01_asof_join",
    "t01_token_stats",
    "t06_tfidf",
    "p02_corpus_stats",
    "s01_lsh_topk",
    "s03_ivf_topk",
    "m01_als_recommend",
    # round-5 additions (VERDICT r4 #7): the round-4 operator families
    # whose regressions plans alone wouldn't catch, plus the round-5
    # recursive closure and the flagship's deterministic twin
    "t14_context_assembly",
    "ipf_cost_per_visit_fixed",
    "gr01_pagerank_fixed",
    # round-6 additions (VERDICT r5 #6): the round-5 shuffle shapes the
    # headline didn't cover — PIT join, dynamic partition pruning,
    # native session windows, basket lift — plus the round-6 LSH
    # corpus-admission and semantic dedup paths
    "j06_point_in_time",
    "x13_dynamic_partition_pruning",
    "w07_native_session_window",
    "m04_market_basket",
    "sm01_semantic_dedup",
    # late round-6 additions: LM scorers, persisted-index admission,
    # exact moments, triangles, line dedup, temporal anti-join
    "d10_indexed_admission",
    "g08_exact_corr",
    "gr03_triangles",
    # restart-session additions: span-level dedup, tokenizer-training
    # pair counts, training-order shuffle
    "t21_repeated_spans",
    "t22_bpe_merge_pairs",
    "x16_training_shuffle",
    "d11_neardup_keep_one",
    "x17_dsir_weights",
    "p03_training_pipeline",
    # round-8 addition: the per-event stateful streaming shape
    "st11_stream_ewma",
    # round-11 additions: pinned-coefficient ML scoring, the native
    # recursive CTE, the PSI drift monitor, and inlined SQL UDFs
    "m05_pinned_scoring",
    "rc05_recursive_cte",
    "q04_psi_drift",
    "sql03_sql_udf",
    "sql04_lateral_topk",
    "a22_rake3",
    "e17_locf_fill",
    "t24_ngram_decontaminate",
    "v04_binary_hamming_topk",
    "st12_stream_drift_gate",
    # round-12 additions: the pinned ALS recommend/ranking twins, the
    # hash-keyed decontamination variant, and linear interpolation
    "m06_pinned_recommend",
    "m07_pinned_ranking",
    "t25_hashed_decontaminate",
    "e18_linear_interpolate",
    # round-13 rotation (VERDICT r12 #2): retired d09 (d10 is the
    # production band-index path and stays), t19 (t18 keeps the LM
    # family), j07 (temporal anti-join shape folded into j06's slot),
    # and d03 (d11 covers the same LSH pair-gen plus keep-one choice);
    # admitted the round-12 plan shapes that lacked timing history —
    # interval coalescing, trailing OLS, hash-min components, and the
    # exact token-budget mix
    "e19_interval_coalesce",
    "w09_rolling_slope",
    "gr08_connected_components",
    "x22_token_budget_mix",
]
# The freeze (see the policy comment above HEADLINE): ~30 chars/query
# in the compact line, 52 * 30 + ~120 overhead ~= 1680 < the 1900
# guard < the driver's ~2000-char tail.
assert len(HEADLINE) <= 52, (
    f"headline frozen at 52 entries (now {len(HEADLINE)}): retire "
    "same-family members oldest-first before adding"
)


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

    from alternating_least_squares_spark.sources import load_table

    qs = entry_mod.queries()
    for table in WARMUP_TABLES:
        load_table(spark, SF_DIR, table).count()
    # initialize the noop committer path outside the timed region
    load_table(spark, SF_DIR, "region").write.format("noop").mode(
        "overwrite"
    ).save()

    def release_leftovers() -> None:
        """Between-query isolation (untimed): queries that pin state
        (localCheckpoint blocks, streaming memory sinks) would
        otherwise accumulate across the whole bench session and tax
        every LATER query's GC — measured as 2-4x inflation of the
        last few entries."""
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in jmap.values():
                jrdd.unpersist(False)
        except Exception:
            pass
        for table in spark.catalog.listTables():
            if table.name.startswith("stream_replay_"):
                spark.catalog.dropTempView(table.name)

    # N_RUNS passes per query, report the MEDIAN: this box throttles
    # under sustained load (BASELINE.md documents same-code totals
    # drifting 65 -> 133 s), so a single pass regularly produces false
    # 2x "regressions". The raw runs ride along so a reader can see
    # the throttle pattern (monotonically increasing runs = VM heat,
    # not plan change).
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}

    def loadavg() -> list[float]:
        """(1-min, 5-min) system load — the round-18 lesson: a loaded
        window is indistinguishable from a plan regression unless the
        artifact itself records the load (VERDICT r18 item 2). Returns
        [-1, -1] where the platform has no getloadavg."""
        try:
            l1, l5, _ = os.getloadavg()
            return [round(l1, 2), round(l5, 2)]
        except (AttributeError, OSError):
            return [-1.0, -1.0]

    load_start = loadavg()
    # per-query 1-min load sampled just before its first run: the
    # throttle pattern per entry, riding the sidecar + stderr only
    # (the compact line stays bounded).
    query_loads: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        runs: list[float] = []
        query_loads[name] = loadavg()[0]
        for _ in range(n_runs):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            release_leftovers()
        raw_runs[name] = runs
        # true median (even n averages the middle pair — the
        # upper-middle element would bias HIGH on this throttling box,
        # where later runs are monotonically slower)
        s = sorted(runs)
        mid = len(s) // 2
        timings[name] = round(
            s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2, 3
        )
        print(
            f"# {name}: median {timings[name]:.1f}s {runs} "
            f"load1 {query_loads[name]:.2f}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    load_end = loadavg()
    # drift-robust secondary aggregate (additions-only): the sum of
    # per-query MINIMUM runs — on this box the min is far less
    # load-sensitive than the median (BASELINE.md / OPTIMIZATION_r18
    # both use MIN-sum as the operative cross-window comparator).
    total_min = round(sum(min(r) for r in raw_runs.values()), 3)
    # The driver captures only a ~2000-char stdout TAIL; round 6's
    # final line (~3.4 KB with raw runs inline) overflowed it and
    # BENCH_r06.json recorded parsed:null.  The machine-readable line
    # therefore stays compact (medians only, 2 decimals) with a hard
    # length guard; the full record including raw runs goes to a
    # sidecar file + stderr where humans read the throttle pattern.
    full_record = {
        "metric": "headline_queries_total",
        "aggregation": "median_of_runs",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": raw_runs,
        "n_runs": n_runs,
        "sf": sf_from_dir(SF_DIR),
        "value_min_sum": total_min,
        "load_start": load_start,
        "load_end": load_end,
        "query_load1": query_loads,
    }
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_last_full.json"
    )
    try:
        with open(sidecar, "w") as f:
            json.dump(full_record, f, indent=1)
        print(f"# full record (raw runs): {sidecar}", file=sys.stderr)
    except OSError as exc:  # read-only checkout: stderr still has medians
        print(f"# sidecar write failed: {exc}", file=sys.stderr)
    compact = {
        "metric": "headline_queries_total",
        "aggregation": "median_of_runs",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "n_runs": n_runs,
        "sf": sf_from_dir(SF_DIR),
        # additions-only self-defense fields (VERDICT r18 item 2): a
        # reader can tell a loaded window (high load_*, value_min_sum
        # far below value) from a plan regression without rerunning.
        "value_min_sum": total_min,
        "load_start": load_start,
        "load_end": load_end,
    }
    # NOTE: sum(queries) in the emitted line won't exactly equal
    # `value` — per-query medians are rounded to 2 decimals for length
    # while `value` is the 3-decimal sum of the unrounded medians.
    # Intentional: `value` is the accurate headline, the per-query
    # map is the compact detail; the sidecar has full precision.
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # still over: drop per-query detail, keep total
        compact.pop("queries")
        compact["queries_in_sidecar"] = len(timings)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # never assert after the timed runs: the
        # minimal record below is bounded by construction, and losing
        # the machine-readable line over a length guard would discard
        # the whole (already completed) bench.
        compact = {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "n_runs": n_runs,
            "sf": sf_from_dir(SF_DIR),
            "value_min_sum": total_min,
            "load_start": load_start,
            "load_end": load_end,
        }
        line = json.dumps(compact, separators=(",", ":"))
    # Visible length audit (VERDICT r11 #2): the driver records only a
    # ~2000-char stdout tail, so the emitted length is itself a metric.
    # `compact` is reassigned in every fallback branch above, so this
    # count always describes the dict actually serialized into `line`
    # (ADVICE r12: it previously described the abandoned pre-fallback
    # dict).
    print(f"# metric line length: {len(line)} chars "
          f"({len(compact.get('queries', {}))} queries inline)",
          file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()

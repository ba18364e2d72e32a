"""Registry-wide physical-plan lint: NO registry entry may plan a
CartesianProduct, and BroadcastNestedLoopJoin may appear only where a
tiny side is deliberately broadcast (scalar subqueries, centroid
tables, dense-domain builders, the documented brute-force baseline).

This is the catch-all behind the targeted shape tests in
test_plans.py: a new entry (or a Catalyst regression) that silently
degenerates into an all-pairs join fails here before it ever reaches
the driver's correctness run."""

from __future__ import annotations

from alternating_least_squares_spark import registry
from tests.conftest import SF_SMALL

# Construction of these entries executes side effects (table writes,
# streaming replays, snapshot commits, ML training, Python-source
# registration) — plan-linting them would re-run minutes of work that
# their own tests already cover.
SKIP_PREFIXES = (
    # "ac" (not "ac0") and "st1": ac10/st10-st13 are side-effecting
    # lifecycle entries (shared-scratch rmtree + streams + vacuum) —
    # plan-linting them races a concurrent driver/bench run reading
    # the same /tmp table (round-12 review finding; the earlier "ac0"
    # spelling silently let ac10 through)
    "st0", "st1", "ac", "b0", "m0", "x07", "mm0", "ipf", "a21", "x09", "x10",
    "s06",  # trains two quantizers; covered by test_plans.py's own lint
    "d10",  # writes bucketed catalog tables; its own plan test asserts
            # the no-corpus-shuffle shape (test_dedup.py)
    "sm01",  # trains KMeans per construction; one-Join shape asserted
             # in test_semdedup.py
)

# Entries allowed EXACTLY ONE BroadcastNestedLoopJoin, with the tiny
# broadcast side documented here:
BNLJ_ALLOWED = {
    "a01_cmap",            # dense domain: keys x 24-hour literal range
    "a09_laplace_smooth",  # densify: same 24-row hour domain
    "a14_seed_matrix",     # same dense-domain builder
    "c09_ones_matrix",     # same dense-domain builder
    "t08_contamination",   # docs x tiny benchmark n-gram set
    "v02_topk_cosine",     # documented brute-force baseline (<=20 queries)
    "v04_binary_hamming_topk",  # same brute-force fixture over 8-byte
                                # sign codes (<=20 queries broadcast)
    "v05_mips_topk",       # same brute-force baseline (<=20 queries);
                           # the MIPS augmentation feeds the bucketed
                           # ladder at scale
    "m06_pinned_recommend",  # bounded query side: every 29th user
                             # broadcast against the item factors
    "m07_pinned_ranking",    # same scored-subset cross inside its recs
    "h14_idle_rich_customers",  # scalar avg-balance subquery (1 row)
    "h18_important_parts",      # scalar avg-quantity subquery (1 row)
    "x15_temperature_mix",  # scalar N_min crossJoin (1 row) onto the
                            # tiny per-source count table
}


def test_no_registry_plan_degenerates_to_all_pairs(spark):
    bad: dict[str, str] = {}
    for name, (fn, _) in registry.REGISTRY.items():
        if name.startswith(SKIP_PREFIXES):
            continue
        plan = (
            fn(spark, SF_SMALL)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan:
            bad[name] = "CartesianProduct"
            continue
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        if n_bnlj > 1 or (n_bnlj == 1 and name not in BNLJ_ALLOWED):
            bad[name] = f"BroadcastNestedLoopJoin x{n_bnlj} (not allowed)"
    assert not bad, bad


def test_bench_headline_frozen_and_line_bounded():
    """The driver records only a ~2000-char stdout tail (r6 lost its
    whole bench line to this).  The headline set is frozen at <=52
    entries; verify every entry resolves in the registry and that a
    worst-case compact metric line (4-digit medians) stays under the
    1900-char guard."""
    import json

    import bench

    assert len(bench.HEADLINE) <= 52
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    missing = [n for n in bench.HEADLINE if n not in registry.REGISTRY]
    assert not missing, missing
    worst = {
        "metric": "headline_queries_total",
        "aggregation": "median_of_runs",
        "value": 9999.999,
        "unit": "sec",
        "queries": {n: 9999.99 for n in bench.HEADLINE},
        "n_runs": 3,
        "sf": 0.1,
    }
    line = json.dumps(worst, separators=(",", ":"))
    assert len(line) <= 1900, len(line)

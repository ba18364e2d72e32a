"""Dump the optimized physical plan of registry queries.

Usage::

    python tools/plan_dump.py h02_revenue_by_nation [more ...]
    python tools/plan_dump.py --all        # every registered query

CAVEAT: building a query runs its builder — a few registry builders
are eager (x03 collects strata; m01/s0x/d05 fit ML models), so
``--all`` does real compute before printing. Name specific queries
when you only need one plan.

The scale checklist when reading a plan: PushedFilters non-empty where
a filter exists, ReadSchema pruned to used columns, dims joined via
BroadcastHashJoin, ORDER BY+LIMIT as TakeOrderedAndProject, no
CartesianProduct/BroadcastNestedLoopJoin anywhere near a fact table
(tests/test_plans.py asserts these for the headline queries).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from alternating_least_squares_spark import registry
    from alternating_least_squares_spark.session import get_spark

    args = sys.argv[1:]
    qs = registry.queries()
    names = list(qs) if args == ["--all"] else args
    unknown = [n for n in names if n not in qs]
    if unknown or not names:
        print(f"unknown or missing query names: {unknown or '(none given)'}")
        print(f"available: {', '.join(qs)}")
        sys.exit(2)

    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = qs[name](spark, SF_DIR)
        print(f"\n===== {name} =====")
        df.explain("formatted")


if __name__ == "__main__":
    main()

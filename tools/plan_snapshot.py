"""Snapshot `.explain("formatted")` for registry queries to files.

Usage::

    python tools/plan_snapshot.py before q1 q2 ...
    python tools/plan_snapshot.py after --headline

Writes ``plans/r18/<query>_<tag>.txt``. Runs at the BENCH scale factor
(sf0.1 by default, ``$SPARK_GRAFT_SF_DIR``) so the plan matches what
the bench times (AQE initial plan; the formatted output includes scan
PushedFilters/ReadSchema, join strategies, and Exchange placement).

CAVEAT (same as plan_dump.py): building a query runs its builder —
eager builders (ML fits, streaming replays) do real compute before the
plan prints.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_TAG", "r19"),
)

USAGE = (
    "usage: python tools/plan_snapshot.py <tag> <query> [query ...]\n"
    "       python tools/plan_snapshot.py <tag> --headline\n"
    "(<tag> is a filename suffix like 'before'/'after', not a query "
    "name)"
)


def main() -> None:
    # ADVICE r18: no-arg invocations crashed with a bare IndexError,
    # and a query name typed first was silently eaten as the tag.
    if len(sys.argv) < 3:
        raise SystemExit(USAGE)
    tag = sys.argv[1]
    names = sys.argv[2:]
    from alternating_least_squares_spark import registry
    from alternating_least_squares_spark.session import get_spark

    qs = registry.queries()
    if tag in qs:
        raise SystemExit(
            f"tag {tag!r} collides with a registry query name — "
            f"did you forget the tag argument?\n{USAGE}"
        )
    if names == ["--headline"]:
        import bench

        names = list(bench.HEADLINE)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        try:
            import contextlib
            import io

            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # keep going: one bad builder != no plans
            plan = f"PLAN CAPTURE FAILED: {ex}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Regenerate SCALING.md's measured plan-facts table.

Runs every registered query at a small SF and extracts the
scale-relevant physical-plan facts (shuffle exchanges, broadcast
joins, scans with pushed filters, top-k operator) via
:mod:`redshift_avro_spark.plans` — the same extractors
tests/test_plans.py regression-checks. Prints a GitHub-flavored
markdown table so the numbers in SCALING.md are reproducible, not
hand-maintained.

Usage::

    python tools/plan_report.py [query ...]   # default: all batch queries
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redshift_avro_spark.plans import (  # noqa: E402
    broadcast_join_count,
    explain_str,
    pushed_filters,
    shuffle_count,
    uses_top_k,
)
from redshift_avro_spark.queries import load_all  # noqa: E402
from redshift_avro_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    registry = load_all()
    names = sys.argv[1:] or sorted(registry)
    spark = get_spark(app_name="plan-report")
    spark.sparkContext.setLogLevel("ERROR")

    print("| query | shuffles | broadcast joins | scans w/ pushed filters | top-k op |")
    print("|---|---|---|---|---|")
    for name in names:
        spec = registry[name]
        try:
            df = spec.fn(spark, SF_DIR)
        except Exception as ex:  # streaming-only entries may need a sink
            print(f"| {name} | — | — | — | ({type(ex).__name__}) |")
            continue
        topk = "TakeOrderedAndProject" if uses_top_k(df) else "—"
        print(
            f"| {name} | {shuffle_count(df)} | {broadcast_join_count(df)} "
            f"| {len(pushed_filters(df))} | {topk} |"
        )
        if os.environ.get("PLAN_REPORT_VERBOSE"):
            print(explain_str(df, "simple"))


if __name__ == "__main__":
    main()

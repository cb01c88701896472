"""Dump ``.explain("formatted")`` for queries into plans/r10/.

Usage::

    python tools/dump_plans.py before q01_pricing_summary q03_... [...]
    python tools/dump_plans.py after  q187_full_funnel [...]

Writes ``plans/r10/<query>_<tag>.txt``. Queries whose returned frame is
driver-assembled literals (q157/q187/q189/q199/q200/q203 — the
bounded-collect pattern) get the OUTPUT plan plus, where the module
exposes the stage frames, each stage frame's plan appended, so the
physical shape of the actual work is on record, not just the literal
result."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redshift_avro_spark.plans import explain_str  # noqa: E402
from redshift_avro_spark.queries import load_all  # noqa: E402
from redshift_avro_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    registry = load_all()
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        parts = [f"== {name} ({tag}) — output plan, sf={SF_DIR} ==\n"]
        parts.append(explain_str(df, "formatted"))
        if name == "q187_full_funnel":
            from redshift_avro_spark.queries.curation import _funnel_frames

            frames = _funnel_frames(spark, SF_DIR)
            for k, fr in frames.items():
                parts.append(f"\n== stage frame: {k} ==\n")
                parts.append(explain_str(fr, "formatted"))
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write("\n".join(parts))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

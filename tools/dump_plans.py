"""Dump ``.explain("formatted")`` for queries into plans/<round>/.

Usage::

    python tools/dump_plans.py before q01_pricing_summary q03_... [...]
    python tools/dump_plans.py after  q187_full_funnel [...]

Writes ``plans/<round>/<query>_<tag>.txt`` (round from
``$SPARK_GRAFT_PLANS_ROUND``, default r11). Queries whose returned
frame is driver-assembled literals (the bounded-collect pattern) get
the OUTPUT plan plus each stage frame's plan appended via the
``_FRAME_PROVIDERS`` registry below, so the physical shape of the
actual work is on record, not just the literal result (VERDICT r10
"Next round" #7 — previously only q187 exposed its frames and the
other bounded-collect queries' job-count claims were not
plan-file-checkable)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redshift_avro_spark.plans import explain_str  # noqa: E402
from redshift_avro_spark.queries import load_all  # noqa: E402
from redshift_avro_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
ROUND = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", ROUND
)

# bounded-collect queries: (module, attr) of a `fn(spark, sf_dir) ->
# dict[str, DataFrame]` exposing the stage frames whose plans carry the
# real work. Building the frames runs the queries' eager staging
# boundaries, same as the query itself.
_FRAME_PROVIDERS: dict = {
    "q157_curation_funnel": ("redshift_avro_spark.queries.curation", "_q157_frames"),
    "q187_full_funnel": ("redshift_avro_spark.queries.curation", "_funnel_frames"),
    "q189_filter_agreement": ("redshift_avro_spark.queries.text", "_q189_frames"),
    "q200_filter_roc_audit": ("redshift_avro_spark.queries.text", "_q200_frames"),
    "q199_epoch_allocation": ("redshift_avro_spark.queries.training", "_q199_frames"),
    "q203_context_length_sweep": (
        "redshift_avro_spark.queries.training",
        "_q203_frames",
    ),
}


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__.split("\n\n")[1], file=sys.stderr)
        raise SystemExit(2)
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
        if name in _FRAME_PROVIDERS:
            import importlib

            mod_name, attr = _FRAME_PROVIDERS[name]
            provider = getattr(importlib.import_module(mod_name), attr, None)
            if provider is None:
                parts.append(
                    f"\n== stage frames: {mod_name}.{attr} not present in "
                    f"this tree (pre-r11 state) ==\n"
                )
            else:
                for k, fr in provider(spark, SF_DIR).items():
                    parts.append(f"\n== stage frame: {k} ==\n")
                    parts.append(explain_str(fr, "formatted"))
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write("\n".join(parts))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""One consistent set of round numbers, emitted FROM THE ARTIFACTS
(VERDICT r8 task #5) — SCALING.md / COVERAGE.md / docstrings quote this
output instead of hand-copied figures that drift:

* registry / gated / folded counts from the live registry;
* test counts from pytest's own collector;
* headline + extended bench figures from the newest BENCH_r{N}.json /
  BENCH_DETAIL_r{N}.json on disk (the driver's committed artifacts, not
  a builder's private run);
* gate pass counts from the newest CORRECTNESS_r{N}.json.

Usage::

    python tools/round_stats.py          # human-readable block
    python tools/round_stats.py --json   # machine-readable
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _newest(pattern: str) -> str | None:
    paths = glob.glob(os.path.join(_REPO, pattern))
    if not paths:
        return None
    return max(paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def collect() -> dict:
    from redshift_avro_spark.queries import gated_names, load_all

    registry = load_all()
    gated = gated_names()

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True,
        text=True,
        cwd=_REPO,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)

    stats: dict = {
        "registry_total": len(registry),
        "gated": len(gated),
        "folded": len(registry) - len(gated),
        "oracle_less": sum(1 for s in registry.values() if not s.oracle),
        "tests_collected": int(m.group(1)) if m else None,
    }

    bench_p = _newest("BENCH_r*.json")
    if bench_p:
        b = json.load(open(bench_p))
        stats["bench_artifact"] = os.path.basename(bench_p)
        # the driver artifact wraps bench.py's JSON line in "parsed"
        # (older rounds: somewhere in the captured stdout "tail")
        parsed = b.get("parsed")
        if not isinstance(parsed, dict):
            m = re.search(r"\{\"metric\".*\}", b.get("tail", ""))
            parsed = json.loads(m.group(0)) if m else {}
        stats["headline_total_sec"] = parsed.get("value")
    detail_p = _newest("BENCH_DETAIL_r*.json")
    if detail_p:
        d = json.load(open(detail_p))
        stats["bench_detail_artifact"] = os.path.basename(detail_p)
        stats["extended_total_sec"] = d.get("extended_total")
        stats["extended_count"] = len(d.get("extended_queries", {}))
        stats["regressions"] = len(d.get("regressions", []))
        sb, sa = d.get("sentinel_before"), d.get("sentinel_after")
        if sb and sa:
            stats["sentinel_best"] = [sb["best"], sa["best"]]
    corr_p = _newest("CORRECTNESS_r*.json")
    if corr_p:
        c = json.load(open(corr_p))
        stats["correctness_artifact"] = os.path.basename(corr_p)
        stats["gate_rows"] = len(c)
        stats["gate_full_pass"] = sum(
            1
            for v in c.values()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
        )
    return stats


def main() -> None:
    stats = collect()
    if "--json" in sys.argv:
        print(json.dumps(stats, indent=1))
        return
    for k, v in stats.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()

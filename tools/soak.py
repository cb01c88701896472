"""Combined-load soak (VERDICT r8 task #4): bench + the full gate
replica + the whole pytest suite SEQUENTIALLY IN ONE PROCESS, with

* a peak-RSS tracker sampling the entire process tree (driver Python,
  Spark JVM, Python UDF workers — the r8 staging-lifecycle fix is
  proven for the suite alone; this is the combined stress), and
* a counter on staging-eviction warnings (``materialize[...]:
  evicting``) — the newest-N generation cap must never evict a frame
  that a later phase still reads, so under the combined load the
  expected count is ZERO from the replica/bench phases' bounded label
  reuse (the suite's own eviction-liveness test triggers a handful ON
  PURPOSE; those are counted separately by phase).

Usage::

    python tools/soak.py [--skip-suite]   # full run ~45 min

Exit code 0 iff bench has no budget regressions, the replica has no
bad rows, and the suite passes. Prints one JSON line with phase
outcomes + peak RSS for SCALING.md.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)


def _tree_rss_kib() -> int:
    """Sum VmRSS over this process and every descendant."""
    me = os.getpid()
    children: dict[int, list[int]] = {}
    procs: list[int] = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            ppid = int(parts[3])
            children.setdefault(ppid, []).append(int(pid))
        except OSError:
            continue
    stack = [me]
    while stack:
        p = stack.pop()
        procs.append(p)
        stack.extend(children.get(p, []))
    total = 0
    for p in procs:
        try:
            with open(f"/proc/{p}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        except OSError:
            continue
    return total


class _PeakTracker(threading.Thread):
    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.peak_kib = 0
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            self.peak_kib = max(self.peak_kib, _tree_rss_kib())
            self._stop.wait(2.0)

    def stop(self) -> int:
        self._stop.set()
        return self.peak_kib


class _EvictionCounter(logging.Handler):
    def __init__(self) -> None:
        super().__init__(level=logging.WARNING)
        self.count = 0

    def emit(self, record: logging.LogRecord) -> None:
        if "evicting" in record.getMessage():
            self.count += 1


def main() -> None:
    tracker = _PeakTracker()
    tracker.start()
    evictions = _EvictionCounter()
    logging.getLogger("redshift_avro_spark.operators.staging").addHandler(evictions)
    result: dict = {}
    t0 = time.time()

    # Phase 1: bench (in-process import so everything shares ONE
    # driver + JVM — bench.main() stops its SparkSession; get_spark()
    # in later phases builds a fresh one in the same JVM-per-process
    # model, which is exactly the combined-load shape)
    os.environ.setdefault("SPARK_GRAFT_BENCH_DETAIL", "/tmp/soak_bench_detail.json")
    import bench

    bench.main()
    detail = json.load(open(os.environ["SPARK_GRAFT_BENCH_DETAIL"]))
    result["bench_total"] = detail["value"]
    result["bench_regressions"] = len(detail["regressions"])
    result["evictions_after_bench"] = evictions.count

    # Phase 2: full gate replica (all 50 gated entries at sf0.01),
    # in-process — after bench.main()'s spark.stop() the JVM gateway
    # survives, so the replica's fresh SparkContext lands in the SAME
    # JVM: the single-process accumulation the r8 lifecycle fix is
    # being stressed against
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    import gate_replica

    rep = gate_replica.run()
    bad = {
        k: v for k, v in rep.items() if v["err"] or v["hash_match"] is False
    }
    result["replica_n"] = len(rep)
    result["replica_bad"] = bad or None
    result["evictions_after_replica"] = evictions.count

    # Phase 3: the whole suite, pytest.main IN-PROCESS — conftest's
    # session Spark lands in the same JVM again. NB the suite's own
    # eviction-liveness test fires a handful of evictions ON PURPOSE;
    # the phase-attributed counters above are the zero-expected ones.
    if "--skip-suite" not in sys.argv:
        import pytest

        result["suite_rc"] = int(pytest.main(["tests/", "-q", "--tb=no", "-p", "no:cacheprovider"]))

    result["evictions_total"] = evictions.count
    result["peak_rss_gib"] = round(tracker.stop() / 1024 / 1024, 2)
    result["wall_sec"] = round(time.time() - t0, 1)
    ok = (
        result["bench_regressions"] == 0
        and not result["replica_bad"]
        and result.get("suite_rc", 0) == 0
    )
    result["ok"] = ok
    print(json.dumps(result))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

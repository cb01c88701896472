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

    python tools/soak.py [--skip-suite] [--max-rss-gib N]  # ~45 min

Exit code 0 iff bench has no budget regressions, the replica has no
bad rows, and the suite passes. Prints one JSON line with phase
outcomes + peak RSS for SCALING.md.

``--max-rss-gib N`` (round 10, VERDICT r9 #7) clamps the whole run to
N GiB so the soak PROVES the system fits a fraction of the box instead
of merely reporting its peak — catching the next q93-style
driver-environment OOM before the driver does. The clamp is a REAL
kernel limit where the environment allows it (a dedicated cgroup-v1
memory group the process moves itself into; breach = kernel OOM-kill
inside the group = loud non-zero exit), and always ALSO a watchdog
that marks ``rss_breach`` and fails the run if the sampled tree RSS
ever exceeds the clamp (covers the cgroup-unwritable case, and
records the breach even if the kernel kill lands later).
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
    def __init__(self, max_kib: int | None = None) -> None:
        super().__init__(daemon=True)
        self.peak_kib = 0
        self.max_kib = max_kib
        self.breached = False
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            self.peak_kib = max(self.peak_kib, _tree_rss_kib())
            if self.max_kib is not None and self.peak_kib > self.max_kib:
                if not self.breached:
                    print(
                        f"soak: RSS breach — tree peak {self.peak_kib >> 20} GiB"
                        f" > clamp {self.max_kib >> 20} GiB",
                        file=sys.stderr,
                        flush=True,
                    )
                self.breached = True
            self._stop.wait(2.0)

    def stop(self) -> int:
        self._stop.set()
        return self.peak_kib


def _enter_cgroup_clamp(gib: float) -> str:
    """Move this process (and all future children) into a fresh
    cgroup-v1 memory group limited to ``gib`` GiB. Returns the
    enforcement mode actually achieved: 'cgroup' (kernel-enforced) or
    'watchdog' (creation/attach failed — sampled-RSS check only)."""
    try:
        base = "/sys/fs/cgroup/memory"
        # sweep empty groups left by earlier (possibly OOM-killed) runs
        # — a process can't remove the group it is sitting in, so each
        # run tidies its predecessors'
        for name in os.listdir(base):
            if name.startswith("spark_graft_soak_"):
                try:
                    with open(os.path.join(base, name, "cgroup.procs")) as f:
                        if not f.read().strip():
                            os.rmdir(os.path.join(base, name))
                except OSError:
                    pass
        grp = f"{base}/spark_graft_soak_{os.getpid()}"
        os.makedirs(grp, exist_ok=True)
        with open(os.path.join(grp, "memory.limit_in_bytes"), "w") as f:
            f.write(str(int(gib * (1 << 30))))
        with open(os.path.join(grp, "cgroup.procs"), "w") as f:
            f.write(str(os.getpid()))
        return "cgroup"
    except OSError as e:
        print(f"soak: cgroup clamp unavailable ({e}); watchdog only",
              file=sys.stderr)
        return "watchdog"


class _EvictionCounter(logging.Handler):
    def __init__(self) -> None:
        super().__init__(level=logging.WARNING)
        self.count = 0

    def emit(self, record: logging.LogRecord) -> None:
        if "evicting" in record.getMessage():
            self.count += 1


def main() -> None:
    max_rss_gib = None
    if "--max-rss-gib" in sys.argv:
        max_rss_gib = float(sys.argv[sys.argv.index("--max-rss-gib") + 1])
    clamp_mode = None
    if max_rss_gib is not None:
        clamp_mode = _enter_cgroup_clamp(max_rss_gib)
    tracker = _PeakTracker(
        max_kib=int(max_rss_gib * (1 << 20)) if max_rss_gib else None
    )
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
    if max_rss_gib is not None:
        result["rss_clamp_gib"] = max_rss_gib
        result["rss_clamp_mode"] = clamp_mode
        result["rss_breach"] = tracker.breached
    ok = (
        result["bench_regressions"] == 0
        and not result["replica_bad"]
        and result.get("suite_rc", 0) == 0
        and not tracker.breached
    )
    result["ok"] = ok
    print(json.dumps(result))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

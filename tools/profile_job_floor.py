"""Scheduling-floor profile for the BASELINE.md drift-watch trigger.

This is the pre-declared response when the ex-kmeans bench ratio crosses
1.8x (BASELINE.md "Drift watch"): before accepting a noise/host
attribution, decompose each named contributor into

- its Spark JOB COUNT per run (``statusTracker().getJobIdsForGroup`` —
  local-mode scheduling floor is paid once per job, so job count x
  measured floor brackets the irreducible wall time);
- min-of-three WARM passes at sf0.01 AND sf0.1 — a query whose wall time
  is FLAT across 10x data is floor-dominated (scheduling, JVM fixed
  costs), while one that grows is doing data-proportional work;
- the host's warm per-job floor, measured directly as the mean of 30
  trivial ``spark.range(1).count()`` jobs after 3 warm-up jobs.

First used round 14, when the trigger fired at 1.81x: the profile showed
all three named contributors FASTER in absolute merged minima than the
prior round, `lineage_closure_deep` (30 jobs/run) flat across 10x data,
and a ~102 ms warm per-job floor — i.e. the crossing was the recovered
host shrinking DuckDB's denominator faster than Spark's floor-bounded
numerator, not work amplification. Full results in BASELINE.md.

Usage: python tools/profile_job_floor.py [QUERY ...]
       (defaults to the three drift-watch contributors)

Serialize with any bench run — never profile while a bench window is
live (the bench protocol note in BASELINE.md applies here too).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_DEFAULT = ["lineage_closure_deep", "duplicated_spans", "source_overlap_matrix"]
# repo root derived from this file's location (r14 ADVICE: hardcoded
# /root/repo made the checked-in profiler non-portable); the fixture
# root is a flag with the same default the r14 profile used
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--data",
        default="/root/testdata",
        help="fixture root containing sf0.01/ and sf0.1/",
    )
    args = ap.parse_args()
    names = args.names or _DEFAULT
    sfs = (
        os.path.join(args.data, "sf0.01"),
        os.path.join(args.data, "sf0.1"),
    )

    sys.path.insert(0, _REPO)
    import __spark_entry__ as e
    from databricks_observe_spark.session import get_spark

    spark = get_spark("profile-job-floor")
    sc = spark.sparkContext
    qs = e.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}")
        return 2

    for _ in range(3):  # warm the JVM/codegen before measuring the floor
        spark.range(1).count()
    t0 = time.time()
    for _ in range(30):
        spark.range(1).count()
    floor = (time.time() - t0) / 30
    print(f"per-job floor (warm spark.range(1).count): {floor * 1000:.1f} ms")

    tracker = sc.statusTracker()
    for name in names:
        for sf in sfs:
            times, jobs = [], []
            for p in range(args.passes):
                group = f"{name}-{sf.rsplit('/', 1)[-1]}-{p}"
                sc.setJobGroup(group, name)
                t1 = time.time()
                qs[name](spark, sf).count()
                times.append(time.time() - t1)
                jobs.append(len(tracker.getJobIdsForGroup(group)))
            # job count recorded PER PASS (r14 ADVICE: the final warm
            # pass can reuse cached shuffle stages and understate the
            # cold job count); the floor-share bracket uses the max so
            # the printed share is an upper bound on the fixed cost
            jmin, jmax = min(jobs), max(jobs)
            jdesc = str(jmax) if jmin == jmax else f"{jmin}-{jmax}"
            print(
                f"{name} @ {sf.rsplit('/', 1)[-1]}: min {min(times):.2f}s "
                f"(passes {['%.2f' % t for t in times]}), jobs/run {jdesc}, "
                f"job-floor share <= ~{jmax * floor:.2f}s"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

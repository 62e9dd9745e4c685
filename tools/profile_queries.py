#!/usr/bin/env python
"""Per-query overhead profile: wall seconds + SPARK JOB COUNT for named
queries (or the top-N slowest from a bench artifact). At sf0.1 every
input is tiny (≤ 10 MB), so wall time is dominated by fixed per-job
overhead — a query whose job count is high is overhead-bound and gets
faster by REMOVING JOBS (fused passes, fewer materializations, fewer
FS commits), not by moving fewer bytes. This is the measure-first tool
behind OPTIMIZATION_r13.md's checklist.

Usage:
    python tools/profile_queries.py q1 [q2 ...]
    python tools/profile_queries.py --top 25   # from baseline artifact
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "2"))

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--top" in sys.argv:
        n = int(sys.argv[sys.argv.index("--top") + 1])
        art = os.path.join(here, "plans", "r13", "bench_baseline_head.json")
        with open(art) as fh:
            base = json.loads(fh.readline())
        q = {k: v for k, v in base["queries"].items() if v}
        names += [
            k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[:n]
        ]

    import __spark_entry__ as entry_mod
    from ecommerce_realtime_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile-queries")
    sc = spark.sparkContext
    queries = entry_mod.queries()

    # warm the session so query 1 doesn't absorb codegen/JVM startup
    try:
        next(iter(queries.values()))(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception as exc:
        print(f"# warmup failed: {exc}", file=sys.stderr)

    tracker = sc.statusTracker()
    out = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        best = None
        for r in range(runs):
            group = f"profile-{name}-{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                df.unpersist()
            except Exception as exc:
                print(f"# {name} FAILED: {exc}", file=sys.stderr)
                break
            finally:
                sc.setJobGroup(None, None)
            wall = time.perf_counter() - t0
            jobs = len(tracker.getJobIdsForGroup(group))
            if best is None or wall < best[0]:
                best = (wall, jobs)
            import gc

            gc.collect()
        if best:
            out[name] = {"sec": round(best[0], 3), "jobs": best[1]}
            print(
                f"{name:45s} {best[0]:7.2f}s  jobs={best[1]:4d}  "
                f"ms/job={1000*best[0]/max(best[1],1):6.0f}"
            )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line the driver can parse.

Runs every query registered in ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]``, forcing full execution with a ``noop``
format write (computes everything, writes nothing, no driver collect).

Wall-times in this sandbox are noisy (the same query has been observed
to vary 1.7s → 91s under contention), so each query is timed
``$SPARK_GRAFT_BENCH_RUNS`` (default 3) times and the **median** is
reported. Output (single line, last line of stdout):

    {"metric": "suite_median_wall_sec", "value": <sum of medians>,
     "unit": "sec", "queries": {name: median_sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _force(df) -> None:
    """Force full evaluation without materializing rows on the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    import __spark_entry__ as entry_mod
    from ecommerce_realtime_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = entry_mod.queries()

    # Warm the JVM/codegen once with the cheapest full pass so the first
    # timed query doesn't absorb all session start-up cost.
    first = next(iter(queries.values()))
    try:
        _force(first(spark, SF_DIR))
    except Exception as exc:  # pragma: no cover - warmup best-effort
        print(f"warmup failed: {exc}", file=sys.stderr)

    per_query: dict[str, float] = {}
    for name, fn in queries.items():
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            try:
                _force(fn(spark, SF_DIR))
            except Exception as exc:
                print(f"{name} failed: {exc}", file=sys.stderr)
                times.append(float("nan"))
                break
            times.append(time.perf_counter() - t0)
        ok = [t for t in times if t == t]
        if not ok:
            # failed query: report null, never bare NaN (invalid JSON)
            per_query[name] = None
            print(f"# {name}: FAILED", file=sys.stderr)
            continue
        med = statistics.median(ok)
        per_query[name] = round(med, 4)
        print(f"# {name}: runs={[round(t, 3) for t in times]} median={med:.3f}s", file=sys.stderr)

    total = round(sum(v for v in per_query.values() if v is not None), 4)
    print(
        json.dumps(
            {
                "metric": "suite_median_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

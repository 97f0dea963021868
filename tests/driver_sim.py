"""Driver simulation: run every registry query EXACTLY the way the
grading driver does — a bare SparkSession (none of our session.py
configs, 200 shuffle partitions), registry iteration order, .collect()
per query — and report per-query wall time. Catches bare-session-only
failures (timestamp configs, shuffle-partition blowups, temp-view
collisions) that the oracle_check harness, which uses get_spark, cannot.

Usage:  python tests/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    t0 = time.perf_counter()
    print("entry rows:", em.entry(spark).count())
    print(f"# entry: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    qs = em.queries()
    failures = []
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            rows = fn(spark, sf_dir).collect()
            print(f"OK   {name:24s} {len(rows):6d} rows  {time.perf_counter() - t0:6.1f}s")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name:24s} {type(e).__name__}: {str(e)[:160]}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries ran", f"failures={failures}" if failures else "")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""One-off same-window timings for breadth queries (BASELINE.md tables).

Usage: python scripts/time_queries.py [sf_dir] q1 q2 ...
Runs each named ``queries()`` entry twice on local[32] and prints
``name best_sec rows`` (min-of-2, matching the bench suite discipline).
Run ALONE — never concurrently with bench/scaling passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as e
    from xdan_dqa_spark.session import get_spark

    spark = get_spark("time_queries", master="local[32]")
    qs = e.queries()
    # JVM/page-cache warmup on an unrelated table scan
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for name in names:
        best, rows = None, None
        for _ in range(2):
            t0 = time.monotonic()
            rows = qs[name](spark, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        print(f"{name}\t{best:.2f}\t{rows}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Isolated per-query probe: time CONSTRUCTION (translation + plan
build) separately from EXECUTION (noop sink) for named queries.

    python tools/isolate_probe.py <reps> <query> [<query> ...]

Prints per-query median construction and execution seconds — the tool
for adjudicating bench flags (is it translate-time or runtime?).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from api_to_parquet_spark import get_spark
    from api_to_parquet_spark.queries import all_queries

    spark = get_spark("isolate_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        # warm
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cons, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
        cons.sort()
        execs.sort()
        print(
            f"{name}: construct={cons[len(cons) // 2]:.3f}s"
            f" exec={execs[len(execs) // 2]:.3f}s"
            f" total={cons[len(cons) // 2] + execs[len(execs) // 2]:.3f}s"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

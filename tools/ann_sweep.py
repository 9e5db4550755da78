"""ANN parameter sweep: recall + wall time vs the tuning knobs, so the
100 TB knob guidance in PLANS.md is measured, not asserted.

    python tools/ann_sweep.py [sf_dir]     # default /root/testdata/sf0.1

Sweeps, one knob at a time around the committed defaults:
- LSH:  BITS_PER_TABLE (bucket granularity; more bits = smaller buckets,
        fewer candidates, lower recall)
- IVF:  N_PROBE (cells probed per query; more probes = more candidates)
- PQ:   PQ_REFINE (exact-re-rank depth over the ADC shortlist)

Recall is measured against q_knn_bruteforce (exact top-5) on the same
corpus; wall time is a median of 3 materializations via the noop sink.
Prints a markdown table ready to paste into PLANS.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from api_to_parquet_spark import get_spark, similarity  # noqa: E402


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def _timed(fn, spark, sf_dir) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        reps.append(time.perf_counter() - t0)
    return sorted(reps)[1]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    exact = _pairs(similarity.q_knn_bruteforce(spark, sf_dir))
    t_exact = _timed(similarity.q_knn_bruteforce, spark, sf_dir)
    print(f"exact brute-force: {len(exact)} pairs, {t_exact:.2f}s\n")
    print("| query | knob | value | recall@5 | median sec |")
    print("|---|---|---|---|---|")
    print(
        f"| knn_bruteforce | (exact baseline) | — | 1.000 | {t_exact:.2f} |"
    )

    sweeps = [
        ("ann_lsh_topk", similarity.q_ann_lsh_topk, "BITS_PER_TABLE", [2, 4, 6, 8]),
        ("ann_ivf_topk", similarity.q_ann_ivf_topk, "N_PROBE", [1, 2, 4, 8]),
        ("ann_pq_topk", similarity.q_ann_pq_topk, "PQ_REFINE", [2, 4, 8, 16]),
    ]
    for qname, fn, knob, values in sweeps:
        default = getattr(similarity, knob)
        for v in values:
            setattr(similarity, knob, v)
            try:
                recall = len(exact & _pairs(fn(spark, sf_dir))) / len(exact)
                sec = _timed(fn, spark, sf_dir)
                mark = " (default)" if v == default else ""
                print(
                    f"| {qname} | {knob} | {v}{mark} |"
                    f" {recall:.3f} | {sec:.2f} |"
                )
            finally:
                setattr(similarity, knob, default)


if __name__ == "__main__":
    main()

"""Wholesale bench-pin re-derivation (round-15, VERDICT item 6).

Runs bench.py N times back-to-back on the CURRENT tree and writes
bench_pins.json where every absolute pin, ratio pin, the ingest floor
and ingest_rate_x_canary are medians over the batch — one era, one
machine, recorded provenance. Per the governance rule in bench.py this
is the ONLY sanctioned way to change pins: wholesale, >= 5 runs, never
a single touched query.

    python tools/derive_pins.py [n_runs] [--source "<note>"]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANARY = "pricing_summary"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    note = ""
    if "--source" in sys.argv:
        note = sys.argv[sys.argv.index("--source") + 1]
    runs: list[dict] = []
    loadavg = os.getloadavg()[0]
    t0 = time.time()
    for i in range(n):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            check=True,
            cwd=REPO,
        ).stdout.strip().splitlines()[-1]
        runs.append(json.loads(out))
        print(
            f"run {i + 1}/{n}: total {runs[-1]['value']} s,"
            f" ingest {runs[-1]['ingest_rows_per_sec']} rows/s",
            flush=True,
        )
    names = sorted(
        set.intersection(*(set(r["queries"]) for r in runs))
    )
    med = lambda xs: round(statistics.median(xs), 3)  # noqa: E731
    queries = {
        q: med([r["queries"][q] for r in runs]) for q in names
    }
    canary = queries[CANARY]
    ratios = {
        q: round(queries[q] / canary, 3) for q in names if q != CANARY
    }
    ingest = med([r["ingest_rows_per_sec"] for r in runs])
    rate_x = med(
        [
            r["ingest_rows_per_sec"] * r["queries"][CANARY]
            for r in runs
        ]
    )
    totals = "/".join(f"{r['value']:.2f}" for r in runs)
    ingests = "/".join(
        f"{r['ingest_rows_per_sec'] / 1000:.1f}k" for r in runs
    )
    pins = {
        "sf": runs[0]["sf"],
        "source": (
            f"Round-15 FULL re-derivation (verdict item 6): medians of"
            f" ONE batch of {n} sequential bench.py runs on the final"
            f" r15 tree, idle machine (loadavg {loadavg:.2f} at"
            f" start, {time.strftime('%Y-%m-%d %H:%MZ', time.gmtime(t0))})."
            f" Per-run totals: {totals} s; ingest: {ingests} rows/s."
            f" Governance: pins may only change via this wholesale"
            f" protocol — a round must not re-pin a query it touched"
            f" (rule stated in bench.py). {note}"
        ),
        "ingest_rows_per_sec": ingest,
        "queries": queries,
        "ratios": ratios,
        "ingest_rate_x_canary": rate_x,
    }
    with open(os.path.join(REPO, "bench_pins.json"), "w") as fh:
        json.dump(pins, fh, indent=1)
    print(f"wrote bench_pins.json ({n}-run medians, total {med([r['value'] for r in runs])} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

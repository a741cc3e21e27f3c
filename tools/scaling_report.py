"""Per-query core-scaling report (round 12, r11 verdict order #7).

Joins a round's main bench detail (``BENCH_DETAIL_r{N}.json``, default
core count) with its low-core twin (``BENCH_DETAIL_r{N}_c{C}.json`` —
bench.py names non-default-core runs with the ``_c{cpus}`` suffix) into
per-query rows::

    query  wall@main  wall@low  ratio(low/main)  cpu@main  cpu@low  verdict

Interpretation (the r11 finding this automates): at sf0.1 most queries
sit at the job-scheduling floor — wall barely moves with 4x the cores
while total CPU halves at 8 cores (less parallelization overhead). A
query only "needs cores" when ratio >> 1; a query whose ratio stays ~1
at a scale factor where its input exceeds cores x maxPartitionBytes is
genuinely serial (flagged SERIAL-RISK); below that input size it is
floor-bound by definition (FLOOR).

Usage::

    python tools/scaling_report.py 12 8          # round 12, low tier c8
    python tools/scaling_report.py 12 8 --json   # machine-readable
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sf0.1 fixture inputs are ~17 MB total — far under one 128 MB split per
# core; every query's input at this SF is floor-bound by construction.
# The threshold is parameterized for future larger-SF runs.
MAX_PARTITION_BYTES = 128 * 1024 * 1024


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    rnd, low = int(sys.argv[1]), int(sys.argv[2])
    as_json = "--json" in sys.argv
    main_path = os.path.join(REPO, f"BENCH_DETAIL_r{rnd:02d}.json")
    low_path = os.path.join(REPO, f"BENCH_DETAIL_r{rnd:02d}_c{low}.json")
    d_main, d_low = load(main_path), load(low_path)
    qm, ql = d_main["queries"], d_low["queries"]
    cm = d_main.get("queries_cpu", {})
    cl = d_low.get("queries_cpu", {})
    sf = d_main.get("sf")
    # sf0.1 total input ~17 MB; linear growth assumption for the flag
    input_bytes = 17 * 1024 * 1024 * (float(sf) / 0.1 if sf else 1.0)
    ncores_main = d_main.get("ncpus") or 32
    floor_bound = input_bytes < ncores_main * MAX_PARTITION_BYTES
    rows = []
    for q in qm:
        if q not in ql:
            continue
        ratio = round(ql[q] / qm[q], 2) if qm[q] else None
        if ratio is None:
            verdict = "n/a"
        elif ratio >= 1.5:
            verdict = "CORES-HELP"
        elif floor_bound:
            verdict = "FLOOR"
        else:
            verdict = "SERIAL-RISK"
        rows.append(
            {
                "query": q,
                "wall_main": qm[q],
                "wall_low": ql[q],
                "ratio_low_over_main": ratio,
                "cpu_main": cm.get(q),
                "cpu_low": cl.get(q),
                "verdict": verdict,
            }
        )
    rows.sort(key=lambda r: -(r["ratio_low_over_main"] or 0))
    summary = {
        "round": rnd,
        "low_cpus": low,
        "sf": sf,
        "total_wall_main": d_main["value"],
        "total_wall_low": d_low["value"],
        "cpu_total_main": d_main.get("cpu_total"),
        "cpu_total_low": d_low.get("cpu_total"),
        "floor_bound_at_this_sf": floor_bound,
        "rows": rows,
    }
    if as_json:
        print(json.dumps(summary, indent=1))
        return
    print(
        f"round {rnd} scaling: total {d_main['value']}s @main vs "
        f"{d_low['value']}s @c{low}; cpu {d_main.get('cpu_total')} vs "
        f"{d_low.get('cpu_total')}"
    )
    print(f"{'query':34} {'main':>7} {'c' + str(low):>7} {'ratio':>6}  verdict")
    for r in rows:
        print(
            f"{r['query']:34} {r['wall_main']:7.3f} {r['wall_low']:7.3f} "
            f"{r['ratio_low_over_main']:6.2f}  {r['verdict']}"
        )


if __name__ == "__main__":
    main()

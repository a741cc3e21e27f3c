"""Per-query profiling harness for optimization rounds.

Same methodology as bench.py (2 unmeasured warm passes, best-of-3 timed
count(), per-query JVM CPU delta) but over an arbitrary subset of
queries, with optional plan capture:

    python tools/profile_queries.py [--plans OUTDIR[:SUFFIX]] [--sf SFDIR] q1 q2 ...

With ``--plans plans/r11:before`` each query's ``explain("formatted")``
is written to ``plans/r11/<query>_before.txt`` (the optimization-round
deliverable; the judge reads these instead of running Spark).

Prints one JSON line per query: {"name", "wall", "wall_band", "cpu"}.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            spec = args[i + 1]
            plans_dir, _, sfx = spec.partition(":")
            if sfx:
                suffix = sfx
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    import __spark_entry__ as entry_mod
    from bench import _jvm_cpu_seconds
    from cloudtrace_exporter_spark.session import get_spark

    spark = get_spark("profile")
    qs = entry_mod.queries()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        entry_mod.load_table(spark, sf_dir, t).count()

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        if name not in qs:
            print(json.dumps({"name": name, "error": "unknown query"}))
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        qs[name](spark, sf_dir).count()
        qs[name](spark, sf_dir).count()
        samples, cpu_samples, job_samples = [], [], []

        def _max_job_id() -> int:
            ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
            return max(ids) if ids else -1

        for _ in range(3):
            j0 = _max_job_id()
            c0 = _jvm_cpu_seconds(spark)
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            samples.append(time.time() - t0)
            cpu_samples.append(_jvm_cpu_seconds(spark) - c0)
            job_samples.append(_max_job_id() - j0)
        if plans_dir:
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "name": name,
            "wall": round(min(samples), 3),
            "wall_band": [round(min(samples), 3), round(max(samples), 3)],
            "cpu": round(cpu_samples[samples.index(min(samples))], 3),
            "cpu_band": [round(min(cpu_samples), 3), round(max(cpu_samples), 3)],
            # round 12 (r11 verdict order #5): Spark jobs per invocation —
            # the scheduling-floor currency (~0.1 s of driver-side fixed
            # cost each at fixture scale)
            "jobs": job_samples[samples.index(min(samples))],
        }), flush=True)


if __name__ == "__main__":
    main()

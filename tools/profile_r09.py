#!/usr/bin/env python
"""Round-9 optimization profiler: solo-time named queries (median of N
with a discarded warm-up) and dump each query's .explain("formatted")
to plans/r09/<name>_<tag>.txt.

Usage: python tools/profile_r09.py [--tag before|after] [--runs 3] q1 q2 ...
Prints one JSON line {name: {"median": s, "samples": [...]}}.

(Replaces tools/profile_r08.py, whose median was the upper-middle sample
for even counts and crashed on --runs 0 — ADVICE r8.)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from fink_science_spark.session import get_session
    from fink_science_spark.plans.explain import formatted_plan
    import __spark_entry__ as entrymod

    spark = get_session(app_name="profile_r09")
    queries = entrymod.queries()
    out: dict[str, dict] = {}
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r09",
    )
    os.makedirs(plan_dir, exist_ok=True)

    for name in args.names:
        fn = queries.get(name)
        if fn is None:
            print(f"profile: unknown query {name}", file=sys.stderr)
            continue
        samples: list[float] = []
        spark.sparkContext.setJobDescription(f"profile:{name}")
        for rnd in range(args.runs + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if rnd > 0:
                samples.append(dt)
        if args.tag and not args.no_plan:
            try:
                spark.catalog.clearCache()
                df = fn(spark, SF_DIR)
                with open(
                    os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w"
                ) as fh:
                    fh.write(formatted_plan(df))
            except Exception as exc:  # noqa: BLE001
                print(f"profile: plan dump failed for {name}: {exc}",
                      file=sys.stderr)
        out[name] = {
            "median": round(statistics.median(samples), 3) if samples else -1.0,
            "samples": [round(s, 3) for s in sorted(samples)],
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Skew rehearsal (round-9 verdict item 8): no query shows shuffle-key
skew at sf0.1, so the engine's skew remedies (AQE skew-join splitting,
operators/salting.salted_equi_join) were untested claims. This builds a
deliberately skewed ×N events replica (half the replicas keep the
uniform user spread, half collapse onto ONE hot user_id), runs the same
large⋈small equi-join + aggregation through three paths —

  sortmerge      plain sort-merge join, AQE skew handling OFF
  aqe_skew       plain sort-merge join, AQE skew-join splitting ON
  salted         operators/salting.salted_equi_join (16 buckets)

— asserts all three return identical results, and reports the join
stage's per-task time histogram (max/median ratio is the skew metric;
the salted/AQE paths must collapse it) parsed from the Spark event log.

Broadcast is disabled throughout: the point is shuffle-key skew, and
broadcasting the small side would bypass the shuffle entirely (that IS
remedy #1 in practice — documented in salting.py — but it rehearses
nothing).

Usage: python tools/skewcheck_r09.py [replicas=64] [hot_frac_denom=2]
Prints one JSON line per path: wall, result checksum, join-stage task
histogram.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_scratch")
HOT_USER = 7
OFFSET = 1 << 40


def build_fixture(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"skewcheck_x{replicas}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    ev = spark.read.parquet(os.path.join(BASE, "events.parquet")).select(
        "event_id", "user_id", "event_type", "value"
    )
    parts = []
    for k in range(replicas):
        rep = ev.withColumn("event_id", F.col("event_id") + k * OFFSET)
        if k % 2 == 1:
            # odd replicas: every row lands on the hot key
            rep = rep.withColumn("user_id", F.lit(HOT_USER).cast("long"))
        parts.append(rep)
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    # many files so the SCAN side is parallel — the rehearsal must
    # isolate reducer skew, not the single-file scan bottleneck
    allr.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    open(marker, "w").close()
    return out


def task_histogram(logdir: str, app_id: str, desc: str) -> dict:
    """Per-task duration stats of the longest stage inside jobs whose
    description == desc."""
    path = os.path.join(logdir, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(logdir) if app_id in p]
        path = os.path.join(logdir, cands[0])
    lines = []
    if os.path.isdir(path):
        for p in sorted(os.listdir(path)):
            if p.startswith("events_"):
                with open(os.path.join(path, p)) as fh:
                    lines.extend(fh)
    else:
        with open(path) as fh:
            lines = list(fh)
    want_stages: set[int] = set()
    durs: dict[int, list[float]] = {}
    for line in lines:
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            if ev.get("Properties", {}).get("spark.job.description") == desc:
                want_stages.update(s["Stage ID"] for s in ev["Stage Infos"])
        elif e == "SparkListenerTaskEnd" and ev["Stage ID"] in want_stages:
            ti = ev.get("Task Info", {})
            d = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000
            durs.setdefault(ev["Stage ID"], []).append(d)
    if not durs:
        return {}

    def stats(sid, ds):
        ds = sorted(ds)
        med = ds[len(ds) // 2]
        return {
            "stage": sid,
            "n_tasks": len(ds),
            "median_s": round(med, 3),
            "p95_s": round(ds[int(len(ds) * 0.95) - 1], 3),
            "max_s": round(ds[-1], 3),
            "max_over_median": round(ds[-1] / med, 1) if med > 0 else None,
        }

    # every multi-task stage of the job — the skew shows up in the
    # REDUCE stage (post-shuffle), which is not necessarily the stage
    # with the largest total task time
    return {"stages": [stats(sid, ds) for sid, ds in sorted(durs.items())
                       if len(ds) >= 4]}


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from pyspark.sql import functions as F

    from fink_science_spark.operators.salting import salted_equi_join
    from fink_science_spark.session import get_session

    logdir = tempfile.mkdtemp(prefix="skewcheck_")
    spark = get_session(
        app_name="skewcheck_r09",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fdir = build_fixture(spark, replicas)
    ev = spark.read.parquet(os.path.join(fdir, "events.parquet"))
    # small side: per-user category table — too wide to assume broadcast
    # at 100 TB (here broadcast is disabled outright, see module doc)
    users = (
        spark.read.parquet(os.path.join(BASE, "events.parquet"))
        .select("user_id").distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(17)))
    )

    def agg(joined):
        return (
            joined.groupBy("segment")
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("sv"),
            )
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    results = {}
    for tag in ("sortmerge", "aqe_skew", "salted"):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if tag == "aqe_skew" else "false",
        )
        if tag == "salted":
            joined = salted_equi_join(
                ev, users, ["user_id"], unique_col="event_id",
                salt_buckets=16,
            )
        else:
            joined = ev.join(users, "user_id")
        spark.sparkContext.setJobDescription(f"skew:{tag}")
        t0 = time.perf_counter()
        rows = {r["segment"]: (r["n"], round(r["sv"], 2))
                for r in agg(joined).collect()}
        wall = time.perf_counter() - t0
        results[tag] = {"wall_s": round(wall, 2), "rows": rows}
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    base = results["sortmerge"]["rows"]
    for tag, r in results.items():
        assert r["rows"] == base, f"{tag} result differs from sortmerge"
    for tag in results:
        hist = task_histogram(logdir, app_id, f"skew:{tag}")
        print(json.dumps(
            {"path": tag, "replicas": replicas,
             "wall_s": results[tag]["wall_s"], "join_stage_tasks": hist},
        ), flush=True)
    print(json.dumps({"results_identical": True,
                      "n_segments": len(base)}), flush=True)


if __name__ == "__main__":
    main()

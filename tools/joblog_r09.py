#!/usr/bin/env python
"""Job/stage-level attribution for one query (round-9 profiling aid).

Runs a named query (1 discarded warm-up + 1 counted run) with the Spark
event log enabled, then parses the log and prints every job of the
counted run: wall time, description, stage task counts and summed task
metrics (executor run time, GC, python boundary time when present) —
the measurement step guide §1/§7 asks for before touching anything.

Usage: python tools/joblog_r09.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: joblog_r09.py <query> [...]", file=sys.stderr)
        sys.exit(2)

    from fink_science_spark.session import get_session
    import __spark_entry__ as entrymod

    logdir = tempfile.mkdtemp(prefix="joblog_")
    spark = get_session(
        app_name="joblog_r09",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
        },
    )
    queries = entrymod.queries()
    marks: dict[str, tuple[float, float]] = {}
    for name in names:
        fn = queries[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"counted:{name}")
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        marks[name] = (t0 * 1000, t1 * 1000)
        print(f"== {name}: counted wall {t1 - t0:.3f}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 event-log layouts: single file `<appid>[.inprogress]` or the
    # rolling dir `eventlog_v2_<appid>/events_*`
    path = os.path.join(logdir, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(logdir) if app_id in p]
        path = os.path.join(logdir, cands[0])
    if os.path.isdir(path):
        parts = sorted(
            p for p in os.listdir(path) if p.startswith("events_")
        )
        lines = []
        for p in parts:
            with open(os.path.join(path, p)) as fh:
                lines.extend(fh)
    else:
        with open(path) as fh:
            lines = list(fh)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0)
                           - si.get("Submission Time", 0)),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["run_ms"] = st.get("run_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                st["n_tasks_done"] = st.get("n_tasks_done", 0) + 1

    for name in names:
        t0, t1 = marks[name]
        sel = [
            (jid, j) for jid, j in sorted(jobs.items())
            if j.get("desc") == f"counted:{name}"
        ]
        total = sum(j.get("end", t1) - j["start"] for _, j in sel)
        gaps = 0.0
        prev_end = None
        for _, j in sel:
            if prev_end is not None:
                gaps += max(0, j["start"] - prev_end)
            prev_end = j.get("end")
        print(f"\n### {name}: {len(sel)} jobs, in-job {total/1000:.3f}s, "
              f"between-job gaps {gaps/1000:.3f}s, "
              f"wall {(t1 - t0)/1000:.3f}s")
        for jid, j in sel:
            wall = (j.get("end", t1) - j["start"]) / 1000
            if wall < 0.02:
                continue
            stage_bits = []
            for sid in j["stages"]:
                st = stages.get(sid)
                if st and st.get("ms", 0) > 10:
                    stage_bits.append(
                        f"[{st.get('tasks', '?')}t "
                        f"{st.get('ms', 0)}ms run {st.get('run_ms', 0)}ms "
                        f"{st.get('name', '')[:45]}]"
                    )
            print(f"  job {jid}: {wall:.3f}s  {' '.join(stage_bits)}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-stage profile of headline bench queries via the Spark event log.

Usage: python tools/profile_query.py q_rank_movers [q_other ...]

Runs each key once untimed (warmup; codegen + JIT), then once timed, with
event logging on; then parses the event log and prints, for the timed run
only: each job (description, wall ms) and each stage (name, wall ms, tasks,
executor run ms, shuffle read/write bytes). This answers "where does the
wall-clock go" at stage granularity without the UI.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
LOG_DIR = "/tmp/spark-events-profile"


def main() -> None:
    keys = sys.argv[1:]
    import shutil

    shutil.rmtree(LOG_DIR, ignore_errors=True)
    Path(LOG_DIR).mkdir(exist_ok=True)

    import bench
    from quantms_utils_spark.session import get_spark
    from quantms_utils_spark.queries import REGISTRY

    spark = get_spark(
        app_name="profile-query",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": LOG_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    name_by_key = dict(bench.HEADLINE)

    marks: dict[str, tuple[float, float]] = {}
    for key in keys:
        fn = REGISTRY[name_by_key[key]][0]
        fn(spark, SF_DIR).count()  # warmup
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"timed:{key}")
        t0 = time.time() * 1000
        start = time.perf_counter()
        fn(spark, SF_DIR).count()
        wall = time.perf_counter() - start
        t1 = time.time() * 1000
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        marks[key] = (t0, t1)
        print(f"== {key}: timed wall {wall:.3f}s", flush=True)

    spark.stop()

    # parse the event log (Spark 4 writes a rolling-log directory)
    entry = next(Path(LOG_DIR).glob("*"))
    logfiles = sorted(entry.glob("events_*")) if entry.is_dir() else [entry]
    jobs = {}          # job_id -> dict
    stages = {}        # stage_id -> dict
    stage_tasks = defaultdict(lambda: [0, 0.0, 0, 0, 0.0])  # n, runtime, sread, swrite, gc
    job_of_stage = {}
    for logf in logfiles:
        for line in open(logf):
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                jobs[jid] = {"desc": desc, "t0": ev["Submission Time"], "t1": None}
                for sid in ev.get("Stage IDs", []):
                    job_of_stage[sid] = jid
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si["Stage Name"],
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                    "ntask": si.get("Number of Tasks"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                agg = stage_tasks[sid]
                agg[0] += 1
                agg[1] += tm.get("Executor Run Time", 0)
                agg[2] += (tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0) + (
                    tm.get("Shuffle Read Metrics") or {}
                ).get("Local Bytes Read", 0)
                agg[3] += (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
                agg[4] += tm.get("JVM GC Time", 0)

    for key, (t0, t1) in marks.items():
        print(f"\n#### {key} (window {t1 - t0:.0f} ms)")
        sel_jobs = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j["desc"] == f"timed:{key}"
            or (j["t0"] >= t0 - 50 and (j["t1"] or j["t0"]) <= t1 + 50)
        ]
        for jid, j in sel_jobs:
            dur = (j["t1"] - j["t0"]) if j["t1"] else -1
            print(f"job {jid:>4} {dur:>7} ms  {j['desc'][:60]}")
            for sid in sorted(s for s, jj in job_of_stage.items() if jj == jid):
                st = stages.get(sid)
                if not st:
                    continue
                sdur = (st["t1"] - st["t0"]) if st.get("t1") and st.get("t0") else -1
                n, rt, sr, sw, gc = stage_tasks[sid]
                print(
                    f"   stage {sid:>4} {sdur:>6} ms tasks={n:<3} exec={rt:>6} ms "
                    f"gc={gc:>4} ms sread={sr:>9} swrite={sw:>9}  {st['name'][:70]}"
                )


if __name__ == "__main__":
    main()

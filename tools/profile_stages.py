#!/usr/bin/env python
"""Stage-level utilization profile of the pipeline bench job.

Runs the same timed region as bench.py --pipeline-only at the current
process's CPU budget, then pulls per-stage task metrics from the Spark UI
REST API and reports wall time, summed executor task time, and utilization
(task_time / (wall * cores)) — separating 'tasks got slower' from 'cores
sat idle' when diagnosing scaling efficiency.

Usage:  taskset -c 0-7 python tools/profile_stages.py 8 [n_turns]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    from omop2obo_spark import fixtures as FX
    from omop2obo_spark.fixtures.generators import transcripts_df, vocab_map_dict
    from omop2obo_spark.operators.linking import LexiconDims
    from omop2obo_spark.plans.pipeline import run_pipeline
    from omop2obo_spark.session import get_spark

    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if master.startswith("local-cluster"):
        import pyspark

        os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    spark = get_spark(
        app_name=f"stageprof-{cpus}",
        master=master,
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            "spark.executor.memory": "6g","spark.executor.extraJavaOptions":"-XX:+UseParallelGC -XX:ParallelGCThreads=2",
        },
    )

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    lex = FX.lexicon_df(spark)
    vm = vocab_map_dict()
    dims = LexiconDims.from_lexicon(lex, vm)

    api = f"{spark.sparkContext.uiWebUrl}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{api}/applications"))
    app_id = apps[0]["id"]

    def stage_snapshot():
        stages = json.load(urllib.request.urlopen(f"{api}/applications/{app_id}/stages?status=complete"))
        return {(s["stageId"], s["attemptId"]): s for s in stages}

    def run(n: int):
        tr = transcripts_df(spark, n_convs=n // 10, turns_per_conv=10).persist()
        tr.count()
        # snapshot AFTER generation/persist so the stage window matches the
        # wall timer exactly — otherwise the generation stages inflate
        # sum_task_sec against a wall that excludes them (utilization > 1)
        before = stage_snapshot()
        t0 = time.time()
        res = run_pipeline(
            spark, tr, lex, vm, mrconso=FX.mrconso_df(spark), mrsty=FX.mrsty_df(spark),
            ancestors=FX.ancestors_df(spark), with_similarity=False, dims=dims,
        )
        force(res.triples)
        wall = time.time() - t0
        after = stage_snapshot()
        tr.unpersist()
        return wall, before, after

    run(100_000)  # warm-up

    wall, before, after = run(n_turns)

    new_stages = [s for k, s in after.items() if k not in before]
    total_task_ms = sum(s["executorRunTime"] for s in new_stages)
    total_cpu_ms = sum(s.get("executorCpuTime", 0) for s in new_stages) / 1e6  # ns → ms
    total_gc_ms = sum(s.get("jvmGcTime", 0) for s in new_stages)
    per_stage = sorted(
        (
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "run_ms": s["executorRunTime"],
                "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                "gc_ms": s.get("jvmGcTime", 0),
                "records_in": s.get("inputRecords", 0) or s.get("shuffleReadRecords", 0),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "shuffle_write_records": s.get("shuffleWriteRecords", 0),
                "details": (s.get("details") or "").split("\n")[0][:200],
            }
            for s in new_stages
        ),
        key=lambda d: -d["run_ms"],
    )
    print(json.dumps({
        "cpus": cpus,
        "n_turns": n_turns,
        "wall_sec": round(wall, 2),
        "sum_task_sec": round(total_task_ms / 1000, 1),
        "sum_cpu_sec": round(total_cpu_ms / 1000, 1),
        "sum_gc_sec": round(total_gc_ms / 1000, 1),
        "utilization": round(total_task_ms / 1000 / (wall * cpus), 3),
        "stages": per_stage[:15],
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

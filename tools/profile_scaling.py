#!/usr/bin/env python
"""Phase-level profiling of the scaling-bench pipeline job.

Runs the same job as ``bench.py --pipeline-only --execs N`` but reports
per-phase wall times (run_pipeline's ``timings`` marks + execute), to
isolate the non-scaling (serial) fraction that caps N→4N efficiency:

    taskset -c 0-9 python tools/profile_scaling.py --execs 4 --turns 2000000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    execs = int(sys.argv[sys.argv.index("--execs") + 1]) if "--execs" in sys.argv else 4
    turns = int(sys.argv[sys.argv.index("--turns") + 1]) if "--turns" in sys.argv else 2_000_000
    warmup = int(sys.argv[sys.argv.index("--warmup") + 1]) if "--warmup" in sys.argv else 100_000

    os.environ.setdefault("SPARK_GRAFT_UI", "1")  # stage metrics need the UI REST API
    from bench import _spark_cluster, run_pipeline_bench

    t0 = time.time()
    spark = _spark_cluster(execs)
    out: dict = {"spark_start": round(time.time() - t0, 2), "execs": execs, "turns": turns}

    from omop2obo_spark import fixtures as FX
    from omop2obo_spark.fixtures.generators import transcripts_df, vocab_map_dict
    from omop2obo_spark.operators.linking import LexiconDims
    from omop2obo_spark.plans.pipeline import run_pipeline

    lex = FX.lexicon_df(spark)
    vm = vocab_map_dict()
    t = time.time()
    dims = LexiconDims.from_lexicon(lex, vm)
    out["dims_build"] = round(time.time() - t, 2)

    if warmup:
        t = time.time()
        run_pipeline_bench(spark, "", n_turns=warmup)
        out["warmup"] = round(time.time() - t, 2)

    tr = transcripts_df(spark, n_convs=turns // 10, turns_per_conv=10).persist()
    tr.count()
    # delimit the timed region: stages completed before this point (warmup,
    # dims build, generation) must not be mixed into the scaling diagnosis
    seen_before = _completed_stage_ids(spark)

    timings: dict = {}
    t_all = time.time()
    res = run_pipeline(
        spark, tr, lex, vm, mrconso=FX.mrconso_df(spark), mrsty=FX.mrsty_df(spark),
        ancestors=FX.ancestors_df(spark), with_similarity=False, dims=dims,
        timings=timings,
    )
    t = time.time()
    res.triples.write.format("noop").mode("overwrite").save()
    timings["execute"] = round(time.time() - t, 2)
    timings["total"] = round(time.time() - t_all, 2)
    out["phases"] = timings
    out["stages"] = _stage_metrics(spark, exclude=seen_before)
    print(json.dumps(out))
    spark.stop()


def _completed_stage_ids(spark) -> set:
    """(stageId, attemptId) pairs completed so far — the 'before' side of
    the timed-region delimiter (same snapshot-diff as profile_stages.py)."""
    try:
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            return {(s["stageId"], s["attemptId"]) for s in json.loads(r.read())}
    except Exception:  # pragma: no cover - diagnostics only
        return set()


def _stage_metrics(spark, exclude: set = frozenset()) -> list[dict]:
    """Per-stage task/GC/shuffle totals from the driver's REST API —
    pinpoints which stages fail to scale with executor count."""
    try:
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete",
                                    timeout=10) as r:
            stages = json.loads(r.read())
        rows = []
        for s in stages:
            if (s["stageId"], s["attemptId"]) in exclude:
                continue
            rows.append({
                "id": s["stageId"],
                "name": s["name"].split("\n")[0][:70],
                "tasks": s["numCompleteTasks"],
                "run_ms": s["executorRunTime"],
                "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                "gc_ms": s.get("jvmGcTime", 0),
                "shuf_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuf_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            })
        rows.sort(key=lambda r: -r["run_ms"])
        return rows[:20]
    except Exception as e:  # pragma: no cover - diagnostics only
        return [{"error": str(e)[:200]}]


if __name__ == "__main__":
    main()

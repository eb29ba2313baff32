#!/usr/bin/env python
"""Benchmark harness.

Default mode: run every ``queries()`` entry at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32)
and print ONE JSON line:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "pipeline": {"turns": T, "turns_per_sec": R}}

``--scaling``: evidence for the north rule's two-cluster-size criterion —
run the identical pipeline job at local[8] and local[32] (fresh JVM each)
on the same input and report turns/sec at both plus scaling efficiency
(rate_32 / rate_8) / 4, appended to BENCH/BASELINE.md.

``--pipeline-only --cpus N``: internal child mode for --scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _spark(cpus: int):
    from omop2obo_spark.session import get_spark

    return get_spark(
        app_name=f"bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _force(df) -> int:
    """Execute the full plan without driver-side collection."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_pipeline_bench(spark, sf_dir: str) -> dict:
    """Flagship pipeline throughput: transcripts→triples, turns/sec."""
    from omop2obo_spark import fixtures as FX
    from omop2obo_spark.fixtures.generators import transcripts_from_documents, vocab_map_dict
    from omop2obo_spark.plans.pipeline import run_pipeline

    transcripts = transcripts_from_documents(spark, sf_dir).persist()
    turns = transcripts.count()
    t0 = time.time()
    res = run_pipeline(
        spark, transcripts, FX.lexicon_df(spark), vocab_map_dict(),
        mrconso=FX.mrconso_df(spark), mrsty=FX.mrsty_df(spark),
        ancestors=FX.ancestors_df(spark), with_similarity=False,
    )
    _force(res.triples)
    wall = time.time() - t0
    transcripts.unpersist()
    return {"turns": turns, "wall_sec": round(wall, 2),
            "turns_per_sec": round(turns / wall, 1)}


def main_bench() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    spark = _spark(CPUS)
    per_query: dict[str, float] = {}
    total = 0.0
    for name, fn in entry.queries().items():
        t0 = time.time()
        _force(fn(spark, SF_DIR))
        dt = time.time() - t0
        per_query[name] = round(dt, 2)
        total += dt
    pipe = run_pipeline_bench(spark, SF_DIR)
    total += pipe["wall_sec"]
    print(json.dumps({
        "metric": "total_wall_sec",
        "value": round(total, 2),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_from_dir(SF_DIR),
        "pipeline": pipe,
        "cpus": CPUS,
    }))
    spark.stop()


def main_pipeline_only(cpus: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    spark = _spark(cpus)
    out = run_pipeline_bench(spark, SF_DIR)
    out["cpus"] = cpus
    print(json.dumps(out))
    spark.stop()


def main_scaling() -> None:
    """Same job, two parallelism levels, fresh JVM each — the sandbox
    evidence for the N→4N executor scaling-efficiency gate."""
    results = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pipeline-only", "--cpus", str(cpus)],
            capture_output=True, text=True, env={**os.environ},
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r8, r32 = results[8]["turns_per_sec"], results[32]["turns_per_sec"]
    eff = (r32 / r8) / 4
    summary = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": _sf_from_dir(SF_DIR),
        "local8": results[8],
        "local32": results[32],
    }
    print(json.dumps(summary))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n| {_sf_from_dir(SF_DIR)} | {results[8]['turns']} | "
            f"{r8} | {r32} | {round(eff, 3)} |\n"
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--pipeline-only" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1]) if "--cpus" in sys.argv else CPUS
        main_pipeline_only(cpus)
    else:
        main_bench()

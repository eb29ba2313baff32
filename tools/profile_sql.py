#!/usr/bin/env python
"""Dump per-operator metrics of the pipeline's SQL executions.

Runs the bench-timed region once, then prints every SQL execution's
physical operators with their reported metrics (rows, time), sorted by
duration — identifies exactly which operator burns the time that stage-
level metrics can only bound.

Usage:  taskset -c 0-7 python tools/profile_sql.py 8 [n_turns]
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
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000

    from omop2obo_spark import fixtures as FX
    from omop2obo_spark.fixtures.generators import transcripts_df, vocab_map_dict
    from omop2obo_spark.operators.linking import LexiconDims
    from omop2obo_spark.plans.pipeline import run_pipeline
    from omop2obo_spark.session import get_spark

    spark = get_spark(
        app_name=f"sqlprof-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.driver.memory": f"{max(8, 4 * cpus)}g",
        },
    )

    lex = FX.lexicon_df(spark)
    vm = vocab_map_dict()
    dims = LexiconDims.from_lexicon(lex, vm)

    tr = transcripts_df(spark, n_convs=n_turns // 10, turns_per_conv=10).persist()
    tr.count()
    t0 = time.time()
    res = run_pipeline(
        spark, tr, lex, vm, mrconso=FX.mrconso_df(spark), mrsty=FX.mrsty_df(spark),
        ancestors=FX.ancestors_df(spark), with_similarity=False, dims=dims,
    )
    res.triples.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(f"wall_sec={round(wall, 2)} cpus={cpus} n_turns={n_turns}")

    api = f"{spark.sparkContext.uiWebUrl}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{api}/applications"))
    app_id = apps[0]["id"]
    sqls = json.load(urllib.request.urlopen(
        f"{api}/applications/{app_id}/sql?details=true&planDescription=false&length=200"))
    import re

    def total_ms(val: str) -> float:
        # timing metric values lead with a header line ('total (min, med,
        # max (stageId: taskId))\n290 ms (...)') — the number is on the
        # LAST line; matching the raw value parsed the header and returned
        # 0.0 for every metric, flattening the duration ranking
        m = re.match(r"([\d.,]+)\s*(ms|s|m)?", val.splitlines()[-1].strip())
        if not m:
            return 0.0
        x = float(m.group(1).replace(",", ""))
        unit = m.group(2) or "ms"
        return x * {"ms": 1, "s": 1000, "m": 60000}[unit]

    for q in sorted(sqls, key=lambda q: -q.get("duration", 0))[:4]:
        print(f"\n=== SQL {q['id']} dur={q.get('duration')}ms {q.get('description','')[:60]}")
        scored = []
        for node in q.get("nodes", []):
            dur = sum(
                total_ms(m["value"]) for m in node.get("metrics", [])
                if m["name"] in ("duration", "time in aggregation build", "sort time",
                                  "time to collect", "shuffle write time")
            )
            rows = [m["value"] for m in node.get("metrics", []) if m["name"] == "number of output rows"]
            scored.append((dur, node["nodeId"], node["nodeName"][:58], rows[:1]))
        for dur, nid, name, rows in sorted(scored, reverse=True)[:15]:
            print(f"  {round(dur/1000,1):>7}s [{nid:>3}] {name:<60} rows={rows}")
    spark.stop()


if __name__ == "__main__":
    main()

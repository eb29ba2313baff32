#!/usr/bin/env python
"""Per-phase scaling profile of the transcripts→triples pipeline.

Runs each phase in isolation at a given core count (fresh JVM per
invocation) and prints one JSON line of per-phase wall seconds — the tool
for localizing Amdahl bottlenecks when bench.py --scaling reports low
efficiency.

Usage:  python tools/profile_pipeline.py <cpus> [n_turns]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    from pyspark.sql import functions as F

    from omop2obo_spark import fixtures as FX
    from omop2obo_spark.fixtures.generators import transcripts_df, vocab_map_dict
    from omop2obo_spark.operators.compile import compile_mappings
    from omop2obo_spark.operators.linking import LexiconDims, dbxref_link, exact_string_link
    from omop2obo_spark.plans.mention import detect_code_mentions, detect_term_mentions
    from omop2obo_spark.plans.pipeline import (
        KEY_COLS,
        _expand_ancestors,
        _stack_code_mentions,
        build_triples,
        run_pipeline,
    )
    from omop2obo_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": f"{max(8, 2 * cpus)}g",
        },
    )

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    lex = FX.lexicon_df(spark)
    vm = vocab_map_dict()
    dims = LexiconDims.from_lexicon(lex, vm)
    term_dim = dims.strings.select(F.col("CODE").alias("surface"))

    # warm-up (codegen/JIT) on a small input
    tr_warm = transcripts_df(spark, n_convs=10_000, turns_per_conv=10).persist()
    tr_warm.count()
    res = run_pipeline(
        spark, tr_warm, lex, vm, mrconso=FX.mrconso_df(spark), mrsty=FX.mrsty_df(spark),
        ancestors=FX.ancestors_df(spark), with_similarity=False, dims=dims,
    )
    force(res.triples)
    tr_warm.unpersist()

    tr = transcripts_df(spark, n_convs=n_turns // 10, turns_per_conv=10).persist()
    tr.count()

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 2)
        return out

    timed("code_mentions", lambda: force(detect_code_mentions(tr)))
    timed("term_mentions", lambda: force(detect_term_mentions(tr, term_dim)))

    mentions = detect_code_mentions(tr).unionByName(detect_term_mentions(tr, term_dim))
    mentions = timed("mentions_checkpoint", lambda: mentions.localCheckpoint(eager=True))

    code_stack = _stack_code_mentions(mentions, vm)
    timed("dbxref_tier", lambda: force(dbxref_link(code_stack, dims, KEY_COLS, "concept")))

    term_stack = mentions.filter(F.col("kind") == "term").select(
        *KEY_COLS, F.col("surface").alias("CODE"),
        F.lit("MENTION_LABEL").alias("CODE_COLUMN"), F.lit(0).alias("src_rank"),
    )
    timed("string_tier", lambda: force(exact_string_link(term_stack, dims, KEY_COLS, "concept")))

    dbx = dbxref_link(code_stack, dims, KEY_COLS, "concept")
    strs = exact_string_link(term_stack, dims, KEY_COLS, "concept")
    exact = dbx.unionByName(strs).withColumn("LEVEL", F.lit("concept"))
    exact = exact.unionByName(_expand_ancestors(exact, FX.ancestors_df(spark), dims.labels))
    exact = timed("exact_checkpoint", lambda: exact.localCheckpoint(eager=True))

    mappings = compile_mappings(exact, None, dims.labels, KEY_COLS)
    timed("compile_and_triples", lambda: force(build_triples(mentions, mappings, None)))

    t0 = time.time()
    res = run_pipeline(
        spark, tr, lex, vm, mrconso=FX.mrconso_df(spark), mrsty=FX.mrsty_df(spark),
        ancestors=FX.ancestors_df(spark), with_similarity=False, dims=dims,
    )
    force(res.triples)
    timings["full_pipeline"] = round(time.time() - t0, 2)

    print(json.dumps({"cpus": cpus, "n_turns": n_turns, "phases": timings}))
    spark.stop()


if __name__ == "__main__":
    main()

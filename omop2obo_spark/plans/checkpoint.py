"""Checkpoint-resumable partitioned execution.

The north rule requires per-partition resume with lineage + metrics: a
re-run after a mid-job failure must (a) skip partitions already committed,
(b) produce byte-identical output for re-processed partitions (idempotent
overwrite), and (c) leave an auditable manifest. The reference's analogue
is its skip-if-exists caching of processed ontologies
(/root/reference/omop2obo/ontology_explorer.py:91-92) — generalized here to
data partitions.

Protocol per partition batch:
    1. filter the fact table to the batch's part_ids (one predicate —
       partition pruning on a pre-bucketed Iceberg table)
    2. run the pipeline on the subset
    3. dynamic-partition-overwrite the triple output for those part_ids
    4. append 'done' manifest records (data commit strictly before state
       commit, so a crash between 3 and 4 re-runs the partition — safe,
       because 3 is an overwrite, not an append)
"""

from __future__ import annotations

import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omop2obo_spark.sources.writers import GraphSink


def run_partitioned(
    spark: SparkSession,
    transcripts: DataFrame,
    build_triples: Callable[[DataFrame], DataFrame],
    sink: GraphSink,
    batch_partitions: int | None = None,
    run_id: str | None = None,
) -> dict:
    """Run ``build_triples`` over the transcripts bucket-by-bucket,
    skipping buckets already marked done in the sink manifest.

    Args:
        build_triples: transcripts-subset → triples DataFrame (typically a
            closure over run_pipeline).
        batch_partitions: how many buckets to process per Spark job;
            default = all pending in one job (small inputs) — at cluster
            scale pick ~the number that fits one failure domain.

    Returns:
        summary dict {run_id, processed, skipped, rows}.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    if batch_partitions is not None and batch_partitions <= 0:
        raise ValueError(f"batch_partitions must be >= 1, got {batch_partitions}")
    done = sink.completed_partitions()
    pending = [p for p in range(sink.n_buckets) if p not in done]
    batch = batch_partitions if batch_partitions is not None else max(1, len(pending))

    bucketed = sink.with_part_id(transcripts)
    processed, total_rows = [], 0
    for i in range(0, len(pending), batch):
        part_ids = pending[i : i + batch]
        t0 = time.time()
        subset = bucketed.filter(F.col("part_id").isin(part_ids)).drop("part_id")
        for p in part_ids:
            sink.record(run_id, p, "pending")
        triples = sink.with_part_id(build_triples(subset))
        # persist so the write below reuses the same data the pre-write
        # partition probe saw (no recompute between probe and write)
        triples = triples.persist()
        nonempty = {r["part_id"] for r in triples.select("part_id").distinct().collect()}
        # a build whose output conv_ids hash outside this batch would be
        # dynamic-overwritten into a FOREIGN partition and clobbered when
        # that partition's own batch runs — fail loudly instead (the
        # standard pipeline preserves conv_id, so this only fires for a
        # build_triples that rewrites or nulls the bucket key)
        foreign = nonempty - set(part_ids)
        if foreign:
            triples.unpersist()
            raise ValueError(
                f"build_triples emitted rows for partitions {sorted(foreign)} "
                f"outside the current batch {part_ids}; bucket key must be "
                "preserved for per-partition overwrite resume to be sound"
            )
        # dynamic overwrite only rewrites partitions PRESENT in the frame:
        # batch partitions that produced zero rows must be cleared
        # explicitly, or a previous crash-window attempt's files survive
        # (and would be mis-attributed to this run by the count below)
        sink.clear_partitions([p for p in part_ids if p not in nonempty])
        if nonempty:
            sink.write_partitions(triples)
        triples.unpersist()
        # manifest counts come from the files actually written (partition-
        # pruned scan, parquet footer counts): if the cache was partially
        # evicted the write recomputed the plan, and a pre-write count
        # would audit data that never hit disk. Skipped for an all-empty
        # batch: nothing was written, and a fresh sink has no dataset to
        # read (schema inference on zero files fails).
        written = (
            {
                r["part_id"]: r["n"]
                for r in sink.read_triples(spark)
                .filter(F.col("part_id").isin(part_ids))
                .groupBy("part_id").agg(F.count("*").alias("n")).collect()
            }
            if nonempty
            else {}
        )
        n = sum(written.values())
        wall_ms = int((time.time() - t0) * 1000)
        for p in part_ids:
            sink.record(run_id, p, "done", triples_out=written.get(p, 0),
                        wall_ms=wall_ms, batch=part_ids)
        processed.extend(part_ids)
        total_rows += n

    return {"run_id": run_id, "processed": processed, "skipped": sorted(done),
            "rows": total_rows}

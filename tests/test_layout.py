"""Z-order layout: exact key parity vs a Python bit-interleave model,
bucket-edge semantics, and the actual pruning property the operator
exists for (per-file bounding boxes tight on EVERY clustered column)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omop2obo_spark.operators.layout import (
    equiwidth_bucket,
    quantile_buckets,
    rank_bucket,
    zorder_key,
    zorder_layout,
)


def _interleave(vals: list[int], bits: int) -> int:
    z, n = 0, len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * n + j)
    return z


def test_zorder_key_matches_python_interleave(spark):
    bits = 4
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("bigint").alias("y")
    )
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key([F.col("x"), F.col("y")], bits)).collect()
    }
    for x in range(16):
        for y in range(16):
            assert got[(x, y)] == _interleave([x, y], bits)

    # 3-dimension interleave too
    df3 = spark.createDataFrame([(1, 2, 3), (7, 0, 5)], "a long, b long, c long")
    got3 = [
        r.z
        for r in df3.withColumn(
            "z", zorder_key([F.col("a"), F.col("b"), F.col("c")], 3)
        ).collect()
    ]
    assert got3 == [_interleave([1, 2, 3], 3), _interleave([7, 0, 5], 3)]

    with pytest.raises(ValueError, match="at least 2"):
        zorder_key([F.col("a")], 4)
    with pytest.raises(ValueError, match="fit in int64"):
        zorder_key([F.col("a")] * 4, 16)


def test_equiwidth_bucket_edges_and_exactness(spark):
    bits = 8
    df = spark.createDataFrame(
        [(v,) for v in [100, 101, 150, 199, 200, 99, None]], "v long"
    )
    out = {
        r.v: r.b
        for r in df.withColumn(
            "b", equiwidth_bucket(F.col("v"), F.lit(100), F.lit(200), bits)
        ).collect()
    }
    # python replay of the exact integer bucket
    def pyb(v):
        return min(max((v - 100) * 2**bits // 101, 0), 2**bits - 1)

    for v in [100, 101, 150, 199, 200]:
        assert out[v] == pyb(v), v
    # vmin → 0; vmax → the exact-formula top bucket (== 2**bits - 1 only
    # when the domain span >= 2**bits; here span=101 < 256 so it's 253)
    assert out[100] == 0 and out[200] == pyb(200) == 253
    assert out[99] == 0          # clamped below vmin
    assert out[None] is None     # NULL stays NULL
    with pytest.raises(ValueError, match="bits"):
        equiwidth_bucket(F.col("v"), F.lit(0), F.lit(1), 0)


def test_rank_and_quantile_buckets(spark):
    # skewed data: quantile buckets equi-populate where equi-width cannot
    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.col("id") % 10).otherwise(F.col("id")).alias("v")
    )
    bounds = quantile_buckets(df, "v", bits=2)  # 3 boundaries
    assert len(bounds) == 3 and bounds == sorted(bounds)
    out = df.withColumn("b", rank_bucket(F.col("v"), bounds))
    counts = {r.b: r.c for r in out.groupBy("b").agg(F.count("*").alias("c")).collect()}
    # no bucket may hold more than ~60% of a 4-bucket equi-populated split
    # of this 90%-skewed data (equi-width would put 90% in bucket 0)
    assert max(counts.values()) <= 600, counts


def test_zorder_layout_prunes_both_dimensions(spark):
    """The point of the operator: partition bounding boxes are tight on
    BOTH dims, so predicates on either prune most partitions — vs an
    x-sorted layout where y footprints span the whole domain."""
    n, side = 4096, 64
    df = spark.range(0, n).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("bigint").alias("y"),
    )
    bounds = {c: [float(i) for i in range(1, side)] for c in ("x", "y")}

    def avg_y_span(frame):
        spans = (
            frame.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg((F.max("y") - F.min("y")).alias("s"))
            .agg(F.avg("s").alias("a"))
            .collect()[0]["a"]
        )
        return spans

    z = zorder_layout(df, ["x", "y"], bits=6, n_files=16, boundaries=bounds)
    x_sorted = df.repartitionByRange(16, "x").sortWithinPartitions("x")
    z_span, x_span = avg_y_span(z), avg_y_span(x_sorted)
    # x-sorted partitions each span (almost) the full y domain; z-curve
    # segments cover compact tiles — require at least a 2x tighter box
    assert x_span > side * 0.9
    assert z_span < x_span / 2, (z_span, x_span)
    # zkey is carried and sorted within partitions
    assert "zkey" in z.columns

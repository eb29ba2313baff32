"""Data-layout operators: multi-dimensional (Z-order) clustering.

The reference materializes its outputs as flat pickles/Excel (SURVEY.md
§2.6); at 100 TB the file LAYOUT is a first-class operator: a table
queried by several dimensions (user AND time, entity AND date) wants its
files clustered so min/max footer stats prune most of them for point or
range predicates on ANY of the clustered columns — one sorted column
prunes only itself. Z-order (bit-interleaved) keys are how Delta
``OPTIMIZE ZORDER BY`` and Iceberg's zorder rewrite spell this; here the
key is built from native Spark expressions so the whole thing stays in
whole-stage codegen and is exactly replayable in SQL.

  * equiwidth_bucket — exact integer rank bucket from global min/max
    (engine-portable; the oracle-able spelling)
  * quantile_buckets / rank_bucket — approxQuantile boundary buckets
    (skew-robust; the production spelling — boundaries become plan
    literals, never a join)
  * zorder_key — bit-interleave n pre-bucketed dimensions
  * zorder_layout — bucket → interleave → repartitionByRange + sort:
    the write-side clustering pass
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equiwidth_bucket(col: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Map an integer column to its equi-width bucket in [0, 2**bits).

    Exact bigint arithmetic — ``(v - vmin) * 2**bits DIV (vmax - vmin + 1)``
    — so the same expression is byte-identical in any engine (no float
    rounding at bucket edges). Caller guarantees ``(v - vmin) * 2**bits``
    fits in int64 (a 2**40-wide domain at bits=16 does). NULLs stay NULL.

    The quotient is spelled ``round((scaled - scaled % span) / span)``:
    the numerator is exactly divisible, the true quotient is < 2**bits,
    and the double round-trip error bound (3 ulp on operands up to 2**63)
    is < 2**-30 of a unit — round() recovers the exact integer quotient
    without needing a SQL-string DIV.
    """
    if not 1 <= bits <= 20:
        raise ValueError(f"bits must be in [1, 20], got {bits}")
    span = vmax.cast("bigint") - vmin.cast("bigint") + F.lit(1)
    scaled = (col.cast("bigint") - vmin.cast("bigint")) * F.lit(2**bits)
    q = F.round((scaled - scaled % span) / span).cast("bigint")
    # clamp is for out-of-[vmin, vmax] inputs only: in-range values land in
    # [0, 2**bits) by construction (span = vmax - vmin + 1). greatest/least
    # SKIP nulls in Spark, so gate NULL input explicitly.
    clamped = F.least(F.greatest(q, F.lit(0)), F.lit(2**bits - 1)).cast("bigint")
    return F.when(col.isNull(), F.lit(None).cast("bigint")).otherwise(clamped)


def zorder_key(bucket_cols: list[Column], bits: int) -> Column:
    """Bit-interleave ``n`` pre-bucketed dimensions (each in [0, 2**bits))
    into one Z-order key: bit ``i`` of dimension ``j`` lands at position
    ``i*n + j``. Unrolled shift/mask expression — pure codegen, no UDF.
    """
    n = len(bucket_cols)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 dimensions")
    if not 1 <= bits <= 20:
        raise ValueError(f"bits must be in [1, 20], got {bits}")
    if n * bits > 62:
        raise ValueError(f"n*bits must fit in int64, got {n}*{bits}")
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(bucket_cols):
        cb = c.cast("bigint")
        for i in range(bits):
            z = z + F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), i * n + j)
    return z


def quantile_buckets(
    df: DataFrame, col: str, bits: int, relative_error: float = 0.001
) -> list[float]:
    """Approximate quantile boundaries splitting ``col`` into 2**bits
    rank buckets — the skew-robust production bucketing (equi-POPULATED,
    not equi-width, so a Zipf dimension still spreads across the curve).
    One Greenwald-Khanna pass, driver list bounded at 2**bits - 1 floats.
    """
    q = [i / 2**bits for i in range(1, 2**bits)]
    return df.approxQuantile(col, q, relative_error)


def rank_bucket(col: Column, boundaries: list[float]) -> Column:
    """Bucket a value by counting boundaries <= v over the literal sorted
    boundary array — a branch-free plan-literal lookup, never a join."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= col.cast("double"))).cast("bigint")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_files: int = 64,
    boundaries: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional scan pruning: quantile-bucket
    each dimension, interleave into a Z-key, then ``repartitionByRange``
    on the key and sort within partitions — each output file covers one
    compact Z-curve segment, so its footer min/max on EVERY clustered
    column is tight and point/range predicates on any of them prune files.

    ``boundaries`` (per-column sorted floats) overrides the approxQuantile
    pass for deterministic tests/resume. The returned frame carries the
    transient ``zkey`` column; callers drop it after write if undesired.
    Scale shape: one GK-sketch pass per column (or none, with explicit
    boundaries), then exactly the one range-exchange any clustered write
    pays; the boundary lists are plan literals.
    """
    bs = boundaries or {c: quantile_buckets(df, c, bits) for c in cols}
    buckets = [rank_bucket(F.col(c), bs[c]) for c in cols]
    out = df.withColumn("zkey", zorder_key(buckets, bits))
    return out.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")

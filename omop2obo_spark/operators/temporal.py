"""Temporal joins over event streams: as-of (nearest-timestamp) join.

The reference has no temporal operators (its clinical table is static),
but a transcript/event pipeline at 10^12 rows constantly needs "attach the
most recent dimension state at event time" (slowly-changing vocabularies,
session context, price-at-time-of-order). Spark has no built-in as-of
join; this is the union + partitioned-window formulation:

    1. union left (probe) and right (state) rows into one stream, tagged;
    2. one shuffle: partition by key, sort by (ts, tag) — right rows sort
       before probes at equal timestamps so "at or before" is inclusive;
    3. running ``last(payload, ignorenulls=True)`` carries the latest
       state forward onto each probe row (``first`` over the following
       frame for direction='forward').

Physical notes for 100 TB: exactly ONE shuffle (the window), no Python,
payload carried as a single struct column. Per-key event
volume lands on a single reducer — for pathological keys (one user with
billions of events) pre-split by coarse time bucket and carry the last
state row across bucket boundaries; AQE cannot split window skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _micros(c: Column) -> Column:
    """Epoch micros for TIMESTAMP and TIMESTAMP_NTZ alike (unix_micros
    rejects NTZ; the cast interprets NTZ in session tz, consistently for
    every column in one comparison)."""
    return F.unix_micros(c.cast("timestamp_ltz"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_sec: int = 86_400,
) -> DataFrame:
    """Interval join: left rows whose ``left_ts`` falls inside the right
    row's ``[right_start, right_end]`` (inclusive), matched per key.

    A naive ``l.ts BETWEEN r.start AND r.end`` predicate is a non-equi
    join — Catalyst can only plan it as a broadcast-nested-loop or a
    per-key cartesian, both quadratic hot spots at scale. This is the
    bucketized formulation: each probe hashes to ONE coarse time bucket,
    each interval explodes to the buckets it overlaps, the join becomes a
    plain equi-join on (key, bucket) + an exact range filter. Each
    (probe, interval) pair meets in exactly one bucket (the probe's), so
    no dedup is needed. Pick ``bucket_sec`` near the typical interval
    length: replication factor = interval_len/bucket_sec + 1.
    """
    lb = F.floor(_micros(F.col(left_ts)) / F.lit(bucket_sec * 1_000_000))
    l2 = left.withColumn("__b", lb.cast("long"))
    b0 = F.floor(_micros(F.col(right_start)) / F.lit(bucket_sec * 1_000_000))
    b1 = F.floor(_micros(F.col(right_end)) / F.lit(bucket_sec * 1_000_000))
    r2 = right.withColumn("__b", F.explode(F.sequence(b0.cast("long"), b1.cast("long"))))
    cond = (
        (l2[left_on] == r2[right_on])
        & (l2["__b"] == r2["__b"])
        & (l2[left_ts] >= r2[right_start])
        & (l2[left_ts] <= r2[right_end])
    )
    return l2.join(r2, cond, "inner").drop(l2["__b"]).drop(r2["__b"])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``right_cols`` payload
    of the single right row with the greatest ``right_ts`` <= ``left_ts``
    (direction='backward', inclusive) or smallest ``right_ts`` >=
    ``left_ts`` ('forward') for the same key. Unmatched probes keep nulls
    — plain left-join semantics, like DuckDB/pandas ``ASOF LEFT JOIN``.

    Ties: if multiple right rows share (key, right_ts), the one latest in
    the sort wins — deduplicate the right side first for a deterministic
    result (e.g. ``groupBy(key, ts).agg(max(...))``).

    ``tolerance_sec`` nulls the payload when the matched state is farther
    than the tolerance from the probe timestamp (pandas ``merge_asof``
    tolerance semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (right_on, right_ts)]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    l2 = left.withColumn("__ts", F.col(left_ts)).withColumn("__src", F.lit(1))
    # payload travels as ONE struct: ``last(ignorenulls)`` must take every
    # field from the SAME matched row — per-column carries would reach
    # further back for fields that are genuinely null in the right table.
    r2 = right.select(
        F.col(right_on).alias(left_on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("__rp"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "backward":
        # right rows (__src 0) sort before probes at equal ts → inclusive
        w = (
            Window.partitionBy(left_on)
            .orderBy(F.col("__ts").asc(), F.col("__src").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
        gap = _micros(F.col("__ts")) - _micros(F.col("__mts"))
    else:
        # probes sort before right rows at equal ts → inclusive forward
        w = (
            Window.partitionBy(left_on)
            .orderBy(F.col("__ts").asc(), F.col("__src").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
        gap = _micros(F.col("__mts")) - _micros(F.col("__ts"))

    matched = u.withColumn("__mp", pick("__rp")).withColumn("__mts", F.col("__mp.__rts"))

    out = matched.filter(F.col("__src") == 1)
    keep = F.lit(True)
    if tolerance_sec is not None:
        keep = F.col("__mts").isNotNull() & (gap <= F.lit(int(tolerance_sec) * 1_000_000))
    return out.select(
        *left.columns,
        *[F.when(keep, F.col(f"__mp.{c}")).alias(c) for c in right_cols],
    )

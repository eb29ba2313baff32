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
    if bucket_sec <= 0:
        # non-ANSI division by zero yields NULL buckets that join nothing:
        # the caller would get a silently empty result instead of an error
        raise ValueError(f"bucket_sec must be positive, got {bucket_sec}")
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
        # a NULL-ts state row has no position on the time axis and must
        # never match (DuckDB/pandas ASOF drop such rows): NULL payload
        # here makes last/first(ignorenulls) skip it
        F.when(
            F.col(right_ts).isNotNull(),
            F.struct(
                F.col(right_ts).alias("__rts"),
                *[F.col(c).alias(c) for c in right_cols],
            ),
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
    # a NULL-ts probe has no as-of position and keeps a NULL payload: in
    # the forward direction NULLS FIRST ordering would otherwise put it at
    # the partition head where the following-frame window sees EVERY state
    keep = F.col("__ts").isNotNull()
    if tolerance_sec is not None:
        keep = keep & F.col("__mts").isNotNull() & (
            gap <= F.lit(int(tolerance_sec) * 1_000_000)
        )
    return out.select(
        *left.columns,
        *[F.when(keep, F.col(f"__mp.{c}")).alias(c) for c in right_cols],
    )


# --------------------------------------------------------------------------
# Temporal knowledge graph: assertion-time validity, as-of snapshots, bursts
# --------------------------------------------------------------------------
#
# The reference's mapping table is static; a transcript-fed graph is not —
# every triple is asserted at the ts of the turn that produced it. These
# operators give the materialized graph a time axis: per-triple validity
# intervals (first/last assertion), point-in-time snapshots ("the graph as
# of T", the KG analogue of Iceberg time travel over the triple tables),
# and per-entity mention-rate burst detection (which concepts suddenly
# spike in the stream — drift/incident signal for a curation pipeline).


def ts_rel_seconds(ts: Column, origin: str = "2026-01-01 00:00:00") -> Column:
    """Whole seconds between ``ts`` and ``origin``, timezone-portable:
    both sides go through the same session-tz interpretation so the tz
    term cancels, and the result is a plain BIGINT that hashes identically
    in any engine (raw unix epochs would encode the session timezone)."""
    return F.unix_seconds(ts.cast("timestamp_ltz")) - F.unix_seconds(
        F.to_timestamp(F.lit(origin)).cast("timestamp_ltz")
    )


def triple_validity(
    triples: DataFrame,
    transcripts: DataFrame,
    origin: str = "2026-01-01 00:00:00",
) -> DataFrame:
    """Per-triple validity interval over assertion time: each distinct
    (subj, pred, obj) with the relative-seconds timestamp of its first and
    last asserting turn plus the number of distinct asserting turns.

    This is the temporal index of the graph — downstream snapshot ("as
    of"), decay-weighting, and staleness queries all read it instead of
    re-scanning the per-turn triple log.

    Scale shape: the (conv_id, turn_idx) equi-join attaches ts to each
    triple row — both sides are fact-scale but the key is the maximally
    high-cardinality skew-free turn key, and the transcript side is
    projected to (conv_id, turn_idx, ts) only, so the shuffle moves three
    columns, never text. The groupBy (subj, pred, obj) partial-aggregates
    min/max/count map-side; output cardinality is the distinct-triple
    count, far below the assertion log.
    """
    turn_ts = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        ts_rel_seconds(F.col("ts"), origin).alias("__rel_s"),
    )
    return (
        triples.select("conv_id", "turn_idx", "subj", "pred", "obj")
        .join(turn_ts, on=["conv_id", "turn_idx"])
        .groupBy("subj", "pred", "obj")
        .agg(
            F.min("__rel_s").alias("first_seen_s"),
            F.max("__rel_s").alias("last_seen_s"),
            # distinct asserting TURNS, per the contract: a triple repeated
            # inside one turn, or a duplicated (conv_id, turn_idx)
            # transcript row fanning the join, must not inflate the count
            F.countDistinct("conv_id", "turn_idx").alias("n_assertions"),
        )
    )


def graph_asof(validity: DataFrame, cutoff_rel_s: int | None = None) -> DataFrame:
    """Point-in-time snapshot of the graph: every (subj, pred, obj) first
    asserted at or before ``cutoff_rel_s`` (relative seconds, same origin
    as :func:`triple_validity`). ``None`` snapshots at the corpus
    midpoint — min + (max-min)//2 of first_seen_s, integer arithmetic so
    any SQL engine lands on the same cutoff.

    Scale shape: with an explicit cutoff this is a pure pushed-down
    filter over the validity table (no shuffle, no job). The midpoint
    default costs one scalar aggregate broadcast back via a 1-row
    cross-join — never a driver collect in the plan consumer's path.
    """
    if cutoff_rel_s is not None:
        return validity.filter(
            F.col("first_seen_s") <= F.lit(int(cutoff_rel_s))
        ).select("subj", "pred", "obj", "first_seen_s")
    bounds = validity.agg(
        F.min("first_seen_s").alias("__mn"), F.max("first_seen_s").alias("__mx")
    )
    return (
        validity.crossJoin(F.broadcast(bounds))
        .filter(
            F.col("first_seen_s")
            <= F.col("__mn") + F.floor((F.col("__mx") - F.col("__mn")) / F.lit(2))
        )
        .select("subj", "pred", "obj", "first_seen_s")
    )


def entity_bursts(
    triples: DataFrame,
    transcripts: DataFrame,
    bucket_s: int = 3600,
    trail: int = 3,
    factor_num: int = 3,
    factor_den: int = 1,
    preds: tuple[str, ...] = (
        "omop2obo:hasExactMapping",
        "omop2obo:hasConstructorMapping",
    ),
    origin: str = "2026-01-01 00:00:00",
) -> DataFrame:
    """Per-entity mention-rate burst detection over assertion time:
    mapping triples bucketed into ``bucket_s``-second windows, each
    (entity, bucket) count compared against the trailing ``trail``
    observed buckets — a burst is a bucket with a full trailing window
    whose count ≥ (factor_num/factor_den) × the trailing mean. All
    comparisons are integer cross-multiplications (cnt·trail·den ≥
    num·prev_sum), so the flag is bit-identical across engines.

    Returns (ent, bucket, n_mentions, prev_sum, is_burst); ``prev_sum``
    is the trailing-window total (NULL until ``trail`` buckets exist).

    Scale shape: one turn-key equi-join to attach ts (three-column
    transcript projection), one partial-aggregated groupBy on
    (ent, bucket), then a window partitioned by entity — per-entity
    bucket series are bounded by time range / bucket_s, so no reducer
    holds more than that many rows regardless of corpus size.
    """
    turn_ts = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        ts_rel_seconds(F.col("ts"), origin).alias("__rel_s"),
    )
    counts = (
        triples.filter(F.col("pred").isin(*preds))
        .select("conv_id", "turn_idx", F.col("obj").alias("ent"))
        .join(turn_ts, on=["conv_id", "turn_idx"])
        .groupBy("ent", F.floor(F.col("__rel_s") / F.lit(int(bucket_s))).alias("bucket"))
        .agg(F.count("*").alias("n_mentions"))
    )
    w = (
        Window.partitionBy("ent")
        .orderBy("bucket")
        .rowsBetween(-int(trail), -1)
    )
    prev_n = F.count("n_mentions").over(w)
    prev_sum = F.sum("n_mentions").over(w)
    return counts.select(
        "ent",
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_mentions",
        F.when(prev_n == int(trail), prev_sum).alias("prev_sum"),
        (
            (prev_n == int(trail))
            & (
                F.col("n_mentions") * F.lit(int(trail) * int(factor_den))
                >= F.lit(int(factor_num)) * prev_sum
            )
        ).alias("is_burst"),
    )


def scd2_dimension(
    log: DataFrame,
    key_cols: list[str],
    value_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing dimension from an observation log: per key,
    collapse CONSECUTIVE runs of the same ``value_col`` (in ``(ts,
    value, tiebreak)`` order) into one versioned row with
    ``valid_from``/``valid_to`` (half-open: ``valid_to`` is the next
    run's start, NULL on the current run), ``n_obs``, and ``is_current``
    — the dimension-build every warehouse pipeline runs over a CDC or
    assertion stream (here: entity-state history from the per-turn triple
    log, or user-state history from the events table).

    The reference has no temporal dimension handling (static clinical
    table); this is the gaps-and-islands formulation: a lag window marks
    run starts, a running sum numbers runs, one aggregate per run, and a
    lead window attaches the successor's start. Value changes are
    detected null-safely (``eqNullSafe``), so NULL is a real trackable
    state, distinct from every value.

    Ordering contract: ``tiebreak_col`` must make ``(ts, value,
    tiebreak)`` a total order per key — with it the output is a pure
    function of the input set (partitioning/engine independent; the SQL
    oracle replays it verbatim).

    Scale shape: exactly ONE shuffle (partition by key; every window and
    the run aggregate reuse that partitioning — lag/run-sum/lead are all
    ``partitionBy(key)``, and the groupBy keys are a superset prefixed
    by the key, so Catalyst plans zero additional Exchanges). Output
    cardinality is the number of state CHANGES, far below the log. Keys
    here are user/entity-grain — high-cardinality and skew-free; a
    pathological single-key log (billions of observations of one key)
    serializes in the window, the same boundary as asof_join above.
    """
    missing = [c for c in [*key_cols, value_col, ts_col, tiebreak_col] if c not in log.columns]
    if missing:
        raise ValueError(f"scd2_dimension: columns absent from the log: {missing}")
    order = [F.col(ts_col).asc(), F.col(value_col).asc_nulls_first(), F.col(tiebreak_col).asc()]
    w_seq = Window.partitionBy(*key_cols).orderBy(*order)
    prev_val = F.lag(F.col(value_col)).over(w_seq)
    prev_seen = F.lag(F.lit(1)).over(w_seq)  # distinguishes "first row" from "prev value NULL"
    is_start = F.when(prev_seen.isNull(), F.lit(1)).otherwise(
        (~F.col(value_col).eqNullSafe(prev_val)).cast("int")
    )
    runs = log.select(
        *key_cols,
        F.col(value_col),
        F.col(ts_col),
        F.sum(is_start).over(w_seq).alias("__run"),
    )
    per_run = runs.groupBy(*key_cols, "__run").agg(
        F.first(value_col).alias(value_col),  # constant within a run by construction
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_obs"),
    )
    w_runs = Window.partitionBy(*key_cols).orderBy("__run")
    nxt = F.lead("valid_from").over(w_runs)
    return per_run.select(
        *key_cols,
        value_col,
        "valid_from",
        nxt.alias("valid_to"),
        "n_obs",
        nxt.isNull().alias("is_current"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: how many keys complete ``steps[0] ->
    steps[1] -> ...`` in strict time order (greedy earliest matching:
    step k matches the MINIMUM timestamp strictly after the key's step
    k-1 match). ``within_us`` optionally bounds the whole conversion to
    a window after the first step (epoch-micro integer arithmetic —
    tz-portable). Output: one row per step, ``(step_idx, step,
    n_keys)`` — the classic conversion funnel, monotone non-increasing.

    Greedy-earliest is the standard funnel semantics AND the property
    that makes it distributable: each stage only needs the per-key MIN
    of the previous stage, so stage k is one equi-join on the key + a
    map-side-combined min — never a per-key sequence scan. len(steps)
    joins total, all on the high-cardinality skew-free key; each stage's
    frame is one row per surviving key. The SQL oracle replays the same
    chained-min CTEs.
    """
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    if within_us is not None and within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")
    ev = events.select(
        F.col(key_col).alias("__k"),
        F.col(type_col).alias("__ty"),
        _micros(F.col(ts_col)).alias("__us"),
    )
    stages: list[DataFrame] = []
    cur = (
        ev.filter(F.col("__ty") == steps[0])
        .groupBy("__k")
        .agg(F.min("__us").alias("__t"))
    )
    if within_us is not None:
        cur = cur.withColumn("__t0", F.col("__t"))
    stages.append(cur)
    for step in steps[1:]:
        prev = stages[-1]
        nxt = (
            ev.filter(F.col("__ty") == step)
            .join(prev.select("__k", F.col("__t").alias("__pt"),
                              *(["__t0"] if within_us is not None else [])),
                  on="__k")
            .filter(F.col("__us") > F.col("__pt"))
        )
        if within_us is not None:
            nxt = nxt.filter(F.col("__us") <= F.col("__t0") + F.lit(int(within_us)))
        agg_cols = [F.min("__us").alias("__t")]
        if within_us is not None:
            agg_cols.append(F.first("__t0").alias("__t0"))  # constant per key
        stages.append(nxt.groupBy("__k").agg(*agg_cols))
    counts = None
    for i, (step, df) in enumerate(zip(steps, stages)):
        row = df.agg(F.count("*").cast("long").alias("n_keys")).select(
            F.lit(i).alias("step_idx"), F.lit(step).alias("step"), "n_keys"
        )
        counts = row if counts is None else counts.unionByName(row)
    return counts


def resample_forward_fill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_sec: int,
) -> DataFrame:
    """Regularize an irregular event stream onto a fixed time grid with
    forward fill: per key, one row per ``interval_sec`` bucket from that
    key's first to last event (``bucket_us`` = epoch micros of the bucket
    start), carrying the LAST observed ``value_col`` in or before the
    bucket — the resample step every time-series feature pipeline runs
    before windowed aggregation or model input, and the batch analogue
    of a stream's state carry-over.

    Within a bucket the winner is the max ``(ts, value)`` struct —
    latest event, value as the deterministic tie-break for simultaneous
    events — so the grid is a pure function of the data. Buckets with no
    events forward-fill from the nearest earlier bucket; the first
    bucket of a key always has an event by construction.

    Scale shape: the per-bucket winner is ONE map-side-combinable
    min/max-struct aggregate (never a window over raw events — a hot
    (key, bucket) combines before the shuffle); the grid explodes from a
    2-column per-key bounds dim, so grid size is span/interval per key,
    independent of event count; the forward fill is one window over the
    already-bucket-grained grid. Integer micro arithmetic end to end —
    no timestamp-type drift between engines.
    """
    if interval_sec <= 0:
        raise ValueError(f"interval_sec must be positive, got {interval_sec}")
    step = int(interval_sec) * 1_000_000
    e = events.select(
        F.col(key_col).alias("key"),
        _micros(F.col(ts_col)).alias("__us"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(F.col("__us").isNotNull())
    e = e.withColumn("bucket", F.floor(F.col("__us") / F.lit(step)))
    last_per_bucket = (
        e.groupBy("key", "bucket")
        .agg(F.max(F.struct("__us", "__v")).alias("__m"))
        .select("key", "bucket", F.col("__m.__v").alias("__bv"))
    )
    bounds = e.groupBy("key").agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    grid = bounds.select(
        "key", F.explode(F.sequence("__b0", "__b1")).alias("bucket")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_per_bucket, on=["key", "bucket"], how="left")
        .select(
            F.col("key").alias(key_col),
            (F.col("bucket") * F.lit(step)).cast("long").alias("bucket_us"),
            F.last("__bv", ignorenulls=True).over(w).alias(value_col),
        )
    )


def rolling_range_agg(
    events: DataFrame,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_sec: int = 3600,
) -> DataFrame:
    """Per-key rolling time-window aggregate: for every event, the count
    and value sum of that key's events in the trailing ``window_sec``
    seconds INCLUDING the event itself — rate limiting, burst scoring,
    trailing-activity features. This is the RANGE-frame window (frame
    membership decided by timestamp VALUE, not row position), so the
    result is deterministic under timestamp ties — all peers share one
    frame regardless of physical order, where a ROWS frame would be
    partition-order-dependent.

    Frame bound is exact integer microseconds: ``[t − window_sec·1e6,
    t]`` inclusive on ``unix_micros`` — bit-identical across engines.

    Returns (id, key, n_win, sum_win) — sum rounded 2dp.

    Scale shape: ONE shuffle on the key; the window sorts within the
    key's time range only. Hot keys (a user with millions of events)
    serialize within their partition — pre-split such keys upstream or
    bucket time first if a corpus has super-emitters.
    """
    if window_sec < 0:
        raise ValueError(f"window_sec must be >= 0, got {window_sec}")
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    base = events.select(
        F.col(id_col).alias("id"),
        F.col(partition_col).alias("key"),
        epoch.alias("__us"),
        F.col(value_col).alias("__v"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("__us")
        .rangeBetween(-window_sec * 1_000_000, 0)
    )
    return base.select(
        "id",
        "key",
        F.count("*").over(w).alias("n_win"),
        F.round(F.sum("__v").over(w), 2).alias("sum_win"),
    )


def time_decayed_agg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_s: int = 86_400,
) -> DataFrame:
    """Exponential time-decay aggregates: per key, the decayed count
    ``Σ 2^(−age/half_life)`` and decayed value sum — the freshness
    weighting every ranking/feature system applies (an event loses half
    its weight every ``half_life_s``). Age is measured from the
    corpus's own max timestamp (a 1-row broadcast), so the result is a
    pure function of the data, reproducible in any engine.

    Weights are spelled ``exp(−ln2·age/half_life)`` and rounded to 9dp
    PER ROW before summation — libm exp implementations differ in the
    last ulp across engines, and the row-level round erases that before
    it can accumulate. Output sums round to 4dp. NULL values contribute
    weight to the decayed count but nothing to the sum.

    Scale shape: one 1-row bounds broadcast + ONE map-side-combined
    aggregate on the key. Nothing else moves.
    """
    if half_life_s < 1:
        raise ValueError(f"half_life_s must be >= 1, got {half_life_s}")
    import math

    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    base = events.select(
        F.col(key_col).alias("key"), us.alias("__us"),
        F.col(value_col).cast("double").alias("__v"),
    )
    bounds = base.agg(F.max("__us").alias("__mx"))
    age_s = (F.col("__mx") - F.col("__us")) / F.lit(1_000_000.0)
    w = F.round(
        F.exp(-F.lit(math.log(2.0)) * age_s / F.lit(float(half_life_s))), 9
    )
    return (
        base.crossJoin(F.broadcast(bounds))
        .select("key", w.alias("__w"), (w * F.col("__v")).alias("__wv"))
        .groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("__w"), 4).alias("decayed_n"),
            F.round(F.sum("__wv"), 4).alias("decayed_sum"),
        )
    )


def temporal_split(
    events: DataFrame,
    ts_col: str = "ts",
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """Leakage-safe temporal train/val/test split: cut points are the
    exact interpolated time quantiles, train = earliest ``train_frac``,
    val = next ``val_frac``, test = the rest — the split a temporal
    model must use (a random split leaks future information into
    training; this one never does, by construction). NULL timestamps
    get split 'unsplit' (surfaced, not silently dropped — the caller
    decides).

    Pinned rule: epoch-microsecond quantiles (type-7, the oracle twin);
    a row is train when ``ts_us <= q_train``, val when ``<= q_val`` —
    boundary rows fall in the EARLIER split.

    Scale shape: one exact-percentile aggregate (1-row broadcast) + a
    codegen CASE over the scan. Swap percentile_approx in at 100 TB
    exactly as the other quantile ops do.
    """
    if not (0.0 < train_frac and 0.0 < val_frac and train_frac + val_frac < 1.0):
        raise ValueError(f"need positive fracs with train+val < 1, got ({train_frac}, {val_frac})")
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    base = events.withColumn("__us", us)
    probs = F.array(F.lit(float(train_frac)), F.lit(float(train_frac + val_frac)))
    qs = base.filter(F.col("__us").isNotNull()).agg(
        F.percentile(F.col("__us").cast("double"), probs).alias("__qs")
    )
    q_train = F.element_at(F.col("__qs"), 1)
    q_val = F.element_at(F.col("__qs"), 2)
    split = (
        F.when(F.col("__us").isNull(), F.lit("unsplit"))
        .when(F.col("__us") <= q_train, F.lit("train"))
        .when(F.col("__us") <= q_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        base.crossJoin(F.broadcast(qs))
        .withColumn("split", split)
        .drop("__us", "__qs")
    )


def series_autocorr(
    events: DataFrame, ts_col: str = "ts", bucket_s: int = 3600, lag: int = 1
) -> DataFrame:
    """Lag-k autocorrelation of the bucketed event-count series — the
    one-number seasonality/burstiness check on an ingest stream (r near
    0 = memoryless arrivals; high positive r = sustained load waves;
    negative = alternating bursts). Buckets with no events count 0 via
    dense completion over the [min, max] bucket range, so gaps don't
    silently splice the series.

    Pinned arithmetic: Pearson r between the series and its lag over
    the overlapping n−lag points, exact sum formulas, 6dp. Output one
    row (n_buckets, lag, r, mean_per_bucket).

    Scale shape: one bucket-count aggregate (time-dimension result),
    dense completion via sequence+explode of the 1-row bounds, one
    ordered window over the BUCKET dimension (bounded by time range /
    bucket_s — hours, not events), one fold.
    """
    if bucket_s < 1 or lag < 1:
        raise ValueError(f"bucket_s and lag must be >= 1, got ({bucket_s}, {lag})")
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    b = F.floor(us / F.lit(bucket_s * 1_000_000))
    counts = events.select(b.alias("b")).filter(F.col("b").isNotNull()).groupBy("b").agg(
        F.count("*").alias("n")
    )
    bounds = counts.agg(F.min("b").alias("__lo"), F.max("b").alias("__hi"))
    dense = (
        bounds.select(F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("b"))
        .join(counts, on="b", how="left")
        .fillna(0, ["n"])
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("b")
    pair = dense.withColumn("__prev", F.lag("n", lag).over(w)).filter(
        F.col("__prev").isNotNull()
    )
    x, y = F.col("n").cast("double"), F.col("__prev").cast("double")
    agg = pair.agg(
        F.count("*").alias("m"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
    )
    m, sx, sy, sxy, sxx, syy = (F.col(c) for c in ("m", "sx", "sy", "sxy", "sxx", "syy"))
    num = m * sxy - sx * sy
    den = F.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    total = dense.agg(
        F.count("*").alias("__nb"), F.avg(F.col("n").cast("double")).alias("__mean")
    )
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            F.col("__nb").cast("long").alias("n_buckets"),
            F.lit(int(lag)).alias("lag"),
            F.when(den == 0, F.lit(0.0)).otherwise(F.round(num / den, 6)).alias("r"),
            F.round(F.col("__mean"), 6).alias("mean_per_bucket"),
        )
    )

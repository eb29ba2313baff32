"""Join strategies: broadcast dictionary joins and an explicit salted join
for skewed keys.

All of the reference's merges are equality hash joins (SURVEY.md §2.3).
The ontology-lexicon side is always small → broadcast. When the dimension
is too big to broadcast (full MRCONSO at production scale) the join
shuffles, and Zipf-skewed keys ("pain"-class surface forms at 10^12 turns)
produce straggler partitions; ``salted_join`` splits each hot key across
``salt_buckets`` shuffle partitions by salting the fact side with a
deterministic hash and exploding the dimension side, trading a k-times
replication of the (small) dimension rows for even partition sizes.

AQE's skew-join handling covers sort-merge joins after the fact; explicit
salting is still the right tool when we *know* the skew ahead of time and
want even map-side partitions from the start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Broadcast-hash join with an explicit hint (never rely on stats for
    dictionary tables — Iceberg/Parquet size estimates can overshoot)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 32,
    fact_salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join on ``on``.

    The fact side gets ``salt = pmod(xxhash64(<stable cols>), k)`` (stable
    columns, not rand(), so retries/resume are deterministic); the dim side
    is exploded k times. Join key becomes (on, salt): each hot key's rows
    spread over k shuffle partitions.

    Args:
        fact: large, potentially skewed side.
        dim: small-to-medium side (replicated k×; must fit k× in the
            shuffle, which holds for dictionary-scale tables).
        on: equality key column name (must exist on both sides).
        salt_buckets: k.
        fact_salt_cols: columns used to derive the deterministic salt;
            defaults to the join key + all fact columns' hash — pass the
            row-identity columns (e.g. conv_id, turn_idx, mention_idx).
    """
    # salting is only sound when unmatched DIM rows never surface: the dim
    # side is replicated once per salt bucket, so right/full joins would
    # emit every unmatched dim row k times (and null-padded phantom rows
    # for matched keys' unused salts)
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: dim-side replication "
            "corrupts right/full joins; supported: inner/left/semi/anti"
        )
    salt_src = fact_salt_cols or fact.columns
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(salt_buckets)).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(salted_dim, on=[on, "__salt"], how=how)
    return out.drop("__salt")

"""Bloom pre-screen for incremental dedup: no false negatives at any
filter size, result parity with the plain exact anti-join, packed-word
size bound, and probe-plan shape."""

import pytest
from pyspark.sql import functions as F

from omop2obo_spark.operators.dedup import (
    bloom_build,
    bloom_maybe_dup,
    dedup_against,
    dedup_against_bloom,
)

CORPUS = [
    (100, "the quick brown fox jumps"),
    (101, "pack my box with five dozen jugs"),
    (102, "sphinx of black quartz judge my vow"),
    (103, None),
]
# 1, 3 are exact dups of corpus content (modulo case/whitespace); others new
NEW = [
    (1, "The  QUICK brown fox   jumps"),
    (2, "entirely novel sentence about glaciers"),
    (3, "sphinx of black quartz judge my vow"),
    (4, "another fresh doc with new words"),
    (5, None),
    (6, ""),
]
SCHEMA = "doc_id long, text string"


@pytest.mark.parametrize("m_bits", [64, 1 << 12])  # 64 forces false positives
def test_bloom_no_false_negatives_any_size(spark, m_bits):
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    flags = {
        r["doc_id"]: r["maybe_dup"]
        for r in bloom_maybe_dup(
            new, bloom_build(corpus, m_bits=m_bits), m_bits=m_bits
        ).collect()
    }
    assert set(flags) == {r[0] for r in NEW}
    assert flags[1] and flags[3], "actual dups must always flag maybe"
    assert flags[5] is False, "NULL text is never a dup candidate"


@pytest.mark.parametrize("m_bits", [64, 256, 1 << 12])
def test_dedup_against_bloom_matches_plain_anti_join(spark, m_bits):
    """Result-identical to dedup_against's exact phase at every filter
    size — false positives only re-route docs to the verify, never drop."""
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    want = sorted(r["doc_id"] for r in dedup_against(new, corpus).collect())
    got = sorted(
        r["doc_id"] for r in dedup_against_bloom(new, corpus, m_bits=m_bits).collect()
    )
    assert got == want
    assert 1 not in got and 3 not in got
    assert {2, 4, 5, 6} <= set(got)


def test_bloom_word_table_bounded_and_mergeable(spark):
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    m_bits = 128
    bloom = bloom_build(corpus, m_bits=m_bits)
    assert bloom.count() <= m_bits // 32
    # partitioning invariance: bit_or is associative/commutative
    again = bloom_build(spark.createDataFrame(CORPUS, SCHEMA).repartition(5), m_bits=m_bits)
    assert sorted(map(tuple, bloom.collect())) == sorted(map(tuple, again.collect()))


def test_bloom_probe_join_is_broadcast(spark):
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    plan = (
        bloom_maybe_dup(new, bloom_build(corpus, m_bits=256), m_bits=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_bloom_probe_falls_back_to_plain_join_past_broadcast_budget(spark):
    """Past broadcast_max_bits the probe must NOT force a broadcast (an
    8-GB forced broadcast is a driver OOM at production m_bits); the plan
    may still broadcast via AQE when the table actually fits, so assert
    on the optimized logical plan's hint, not the physical operator."""
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    big = bloom_maybe_dup(
        new, bloom_build(corpus, m_bits=1 << 12), m_bits=1 << 12,
        broadcast_max_bits=1 << 10,
    )
    logical = big._jdf.queryExecution().optimizedPlan().toString()
    assert "UnresolvedHint" not in logical
    # result parity regardless of join strategy
    small = bloom_maybe_dup(new, bloom_build(corpus, m_bits=1 << 12), m_bits=1 << 12)
    assert sorted(map(tuple, big.collect())) == sorted(map(tuple, small.collect()))

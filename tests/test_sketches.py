"""Sketch tier: Misra-Gries frequent keys (exactness, guarantee,
partition invariance), mergeable-HLL distinct round trip, quantile
sketch error contract."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.operators.sketches import frequent_keys_exact

SF_DIR = "/root/testdata/sf0.001"


def _zipf_rows():
    # planted Zipf-ish stream: key_i appears ~1000/i times; heavy head,
    # long tail — 6904 rows total, so support 1/20 cuts at ceil(345.2)
    rows = []
    for i in range(1, 101):
        rows.extend([f"k{i:03d}"] * (1000 // i))
    return rows


@pytest.fixture(scope="module")
def zipf_df(spark):
    return spark.createDataFrame([(k,) for k in _zipf_rows()], "key string")


def _brute(rows, num, den):
    total = len(rows)
    counts = collections.Counter(rows)
    keep = sorted(
        ((k, c) for k, c in counts.items() if c * den >= num * total),
        key=lambda kc: (-kc[1], kc[0]),
    )
    return keep


def test_frequent_keys_matches_bruteforce(spark, zipf_df):
    got = [
        (r["key"], r["freq"])
        for r in frequent_keys_exact(zipf_df, "key", 1, 20).collect()
    ]
    assert got == _brute(_zipf_rows(), 1, 20)
    assert len(got) > 0  # the planted head is actually above support


def test_frequent_keys_partition_invariant(spark, zipf_df):
    """The MG candidate pass sees different per-partition streams under
    different layouts; the verified output must not."""
    a = frequent_keys_exact(zipf_df.repartition(1), "key", 1, 20).collect()
    b = frequent_keys_exact(zipf_df.repartition(13, "key"), "key", 1, 20).collect()
    c = frequent_keys_exact(zipf_df.repartition(8), "key", 1, 20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] == [tuple(r) for r in c]


def test_frequent_keys_tight_counters_still_exact(spark, zipf_df):
    """Even at the minimum counter budget the guarantee covers
    (m + 1 >= den/num), candidates contain every at-support key, so
    the verified output is still exactly the brute-force answer."""
    got = [
        (r["key"], r["freq"])
        for r in frequent_keys_exact(zipf_df, "key", 1, 20, counters=20).collect()
    ]
    assert got == _brute(_zipf_rows(), 1, 20)


def test_frequent_keys_empty_input(spark):
    empty = spark.createDataFrame([], "key string")
    assert frequent_keys_exact(empty, "key", 1, 10).collect() == []


def test_frequent_keys_rejects_bad_support(spark, zipf_df):
    with pytest.raises(ValueError):
        frequent_keys_exact(zipf_df, "key", 0, 10)


def test_hll_merge_tracks_exact_at_real_cardinality(spark):
    """Split -> hll_sketch_agg -> hll_union_agg at a cardinality where
    the sketch is genuinely estimating (80k distinct values across 4
    disjoint batches), merged estimate within the documented ~2% HLL
    band (asserted at 5%)."""
    df = spark.range(0, 80000).select(
        (F.col("id") % 4).alias("batch"),
        F.col("id").cast("string").alias("u"),
    )
    partials = df.groupBy("batch").agg(F.hll_sketch_agg("u").alias("sk"))
    est = partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    assert abs(est - 80000) <= 0.05 * 80000


def test_sketch_bindings_flags_hold(spark):
    """The error-contract booleans the oracles pin as TRUE are actually
    computed, not constants: both sketch bindings must produce all-true
    flags on the test tables."""
    from gapless_deribit_clickhouse_spark.bindings.sketch_ops import (
        approx_distinct_rollup,
        quantile_sketch_rollup,
    )

    for row in approx_distinct_rollup(spark, SF_DIR).collect():
        assert row["hllpp_ok"] and row["merge_ok"], row
    for row in quantile_sketch_rollup(spark, SF_DIR).collect():
        assert row["sketch_p50_ok"] and row["sketch_p90_ok"], row


def test_frequent_keys_null_keys_excluded_from_total(spark):
    """ADVICE r6: null keys must not inflate the support denominator.
    'a' has 5 of the 20 NON-null occurrences — exactly at support 1/4.
    With the old bug (N counted 16 null rows too, N=36), 5*4 < 36
    would wrongly exclude it."""
    rows = [("a",)] * 5 + [("b",)] * 12 + [("c",)] * 3 + [(None,)] * 16
    df = spark.createDataFrame(rows, "key string").repartition(5)
    got = [(r["key"], r["freq"]) for r in frequent_keys_exact(df, "key", 1, 4).collect()]
    assert got == [("b", 12), ("a", 5)]


def test_frequent_keys_non_string_key_type(spark):
    """ADVICE r6: the mapInPandas output schema carries the input key
    type instead of a hardcoded string."""
    rows = [(7,)] * 6 + [(42,)] * 3 + [(9,)] * 1
    df = spark.createDataFrame(rows, "key long").repartition(3)
    out = frequent_keys_exact(df, "key", 1, 5)
    assert out.schema["key"].dataType.simpleString() == "bigint"
    assert [(r["key"], r["freq"]) for r in out.collect()] == [(7, 6), (42, 3)]

"""Sequence packing: budget respected, nothing lost, deterministic
under partitioning, decent fill rate on natural length mixes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.pipelines.packing import (
    pack_sequences,
    pack_stats,
)

MAX = 512


@pytest.fixture(scope="module")
def docs_with_lengths(spark):
    rng = np.random.default_rng(17)
    lengths = np.concatenate(
        [
            rng.integers(10, 200, size=400),     # short tail
            rng.integers(200, 500, size=150),    # mid
            [600, 900, 2000],                    # oversized singles
        ]
    )
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(lengths), dtype="int64"), "n_tok": lengths}
    )
    return spark.createDataFrame(pdf)


def test_packing_respects_budget_and_loses_nothing(spark, docs_with_lengths):
    packed = pack_sequences(
        docs_with_lengths,
        id_col="doc_id",
        token_col="n_tok",
        max_tokens=MAX,
        num_shards=8,
    ).cache()
    n_in = docs_with_lengths.count()
    assert packed.count() == n_in  # no doc lost
    assert packed.select("doc_id").distinct().count() == n_in  # none duplicated
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n"),
        F.max(F.col("oversized").cast("int")).alias("over"),
    )
    # every non-oversized pack fits the budget; oversized docs sit alone
    bad = per_pack.filter((F.col("over") == 0) & (F.col("tot") > MAX)).count()
    assert bad == 0
    solo = per_pack.filter(F.col("over") == 1)
    assert solo.count() == 3 and solo.filter(F.col("n") != 1).count() == 0
    # pack_pos is a dense 0..n-1 order within each pack
    pos_ok = (
        packed.groupBy("pack_id")
        .agg(F.count("*").alias("n"), F.max("pack_pos").alias("mx"), F.min("pack_pos").alias("mn"))
        .filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
        .count()
    )
    assert pos_ok == 0


def test_packing_deterministic_under_partitioning(docs_with_lengths):
    a = sorted(
        map(
            tuple,
            pack_sequences(
                docs_with_lengths.repartition(13),
                token_col="n_tok", max_tokens=MAX, num_shards=8,
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(
                docs_with_lengths.coalesce(1),
                token_col="n_tok", max_tokens=MAX, num_shards=8,
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_packing_fill_rate_and_stats(spark, docs_with_lengths):
    packed = pack_sequences(
        docs_with_lengths, token_col="n_tok", max_tokens=MAX, num_shards=8
    )
    stats = pack_stats(packed, MAX).collect()[0]
    assert stats.n_docs == docs_with_lengths.count()
    assert stats.oversized_packs == 3
    # FFD on this mix should waste little: >= 80% fill
    assert stats.fill_rate >= 0.8


def test_packing_from_text_column(spark):
    docs = spark.createDataFrame(
        [(1, "one two three"), (2, "a b c d e"), (3, "x")],
        "doc_id long, text string",
    )
    packed = pack_sequences(docs, max_tokens=8, num_shards=2).collect()
    assert {r.doc_id for r in packed} == {1, 2, 3}
    assert all(r.n_tokens > 0 for r in packed)


def test_packing_rejects_bad_budget(spark, docs_with_lengths):
    with pytest.raises(ValueError):
        pack_sequences(docs_with_lengths, token_col="n_tok", max_tokens=0)


def test_zero_token_docs_never_join_oversized_packs(spark):
    """r4 review finding: a zero-token doc used to first-fit into an
    oversized doc's room-0 pack, breaking the 'oversized sits alone'
    contract. Oversized packs are now closed at creation."""
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "n_tok": [2000, 0, 0, 100]}
    )
    packed = (
        pack_sequences(
            spark.createDataFrame(pdf),
            token_col="n_tok", max_tokens=512, num_shards=1,
        )
        .toPandas()
        .set_index("doc_id")
    )
    over_pack = packed.loc[1].pack_id
    assert packed.loc[1].oversized
    assert (packed.drop(index=1).pack_id != over_pack).all()
    # zero-token docs still land somewhere exactly once
    assert len(packed) == 4


def test_null_token_counts_pack_as_zero(spark):
    """A null token count (corrupt upstream row) must not fail the
    job: it packs as 0 tokens."""
    df = spark.createDataFrame(
        [(1, 100), (2, None), (3, 50)], "doc_id long, n_tok long"
    )
    packed = pack_sequences(df, token_col="n_tok", max_tokens=512, num_shards=1)
    out = packed.toPandas().set_index("doc_id")
    assert len(out) == 3
    assert out.loc[2].n_tokens == 0 and not out.loc[2].oversized
    null_text = spark.createDataFrame(
        [(1, "some text"), (2, None)], "doc_id long, text string"
    )
    out2 = pack_sequences(null_text, max_tokens=64, num_shards=1).toPandas()
    assert len(out2) == 2


def test_segment_tree_ffd_budget_and_quality(spark):
    """Exact FFD via the segment tree: budget never violated and fill
    is near-optimal (>= 0.95 on a uniform mix — the bounded-window
    variant this replaced measured only ~0.78 here)."""
    rng = np.random.default_rng(23)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(5000, dtype="int64"),
            "n_tok": rng.integers(10, 500, size=5000),
        }
    )
    packed = pack_sequences(
        spark.createDataFrame(pdf),
        token_col="n_tok", max_tokens=MAX, num_shards=4,
    )
    per_pack = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("tot"))
    assert per_pack.filter(F.col("tot") > MAX).count() == 0
    stats = pack_stats(packed, MAX).collect()[0]
    assert stats.n_docs == 5000 and stats.fill_rate >= 0.95


def test_first_fit_tree_matches_naive_scan():
    """The segment-tree first-fit must place identically to the naive
    linear scan (lowest-indexed pack with room) on random streams."""
    from gapless_deribit_clickhouse_spark.pipelines.packing import _FirstFitTree

    rng = np.random.default_rng(5)
    for _ in range(20):
        tree = _FirstFitTree()
        rooms: list[int] = []
        for t in rng.integers(1, 100, size=200):
            t = int(t)
            naive = next((j for j, r in enumerate(rooms) if r >= t), None)
            got = tree.find_and_take(t)
            assert got == naive
            if naive is None:
                rooms.append(int(rng.integers(0, 150)))
                tree.add(rooms[-1])
            else:
                rooms[naive] -= t


def test_chunk_documents_invariants(spark):
    from gapless_deribit_clickhouse_spark.pipelines.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, max_tokens=10, overlap=4).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_idx")
    # 25 tokens, stride 6: nc = 1 + ceil((25-10)/6) = 4
    assert list(d1.chunk_idx) == [0, 1, 2, 3]
    assert (d1.n_chunks == 4).all() and (d1.doc_n_tokens == 25).all()
    # chunk_uid is the injective length-prefixed encoding
    assert d1.iloc[1].chunk_uid == "1:1:1"
    # windows advance by stride and keep the 4-token overlap
    assert d1.iloc[0].chunk_text.split() == [f"w{i}" for i in range(10)]
    assert d1.iloc[1].chunk_text.split() == [f"w{i}" for i in range(6, 16)]
    # last chunk is the clipped tail, ending at the final token
    assert d1.iloc[3].chunk_text.split() == [f"w{i}" for i in range(18, 25)]
    # every token index appears in some chunk (no gaps)
    covered = {t for c in d1.chunk_text for t in c.split()}
    assert covered == {f"w{i}" for i in range(25)}
    # at/under budget -> exactly one chunk, itself
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].chunk_text == "short doc"
    # empty and null text both yield one empty chunk, not a lost row
    for did in (3, 4):
        dx = out[out.doc_id == did]
        assert len(dx) == 1 and dx.iloc[0].chunk_text == ""
        assert dx.iloc[0].doc_n_tokens == 0
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=8, overlap=8)


def test_training_set_pack_invariants_sql(spark):
    """SQL-checkable pack invariants over the REAL flagship output
    (VERDICT r4 next-round #1, second half): the chunk projection has
    a full DuckDB oracle (`training_set_chunks` binding); the pack
    assignment — the only non-SQL-expressible tier — obeys invariants
    an external SQL engine can verify on the materialized result:
    every chunk packed exactly once, (pack_id, pack_pos) a bijection,
    per-pack token sums within budget unless the pack is a flagged
    single-chunk oversized one, and n_tokens equal to the BPE-ish
    count of the chunk's own text."""
    import duckdb

    from gapless_deribit_clickhouse_spark.core.tables import load_table
    from gapless_deribit_clickhouse_spark.pipelines.curation import (
        build_training_set,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = build_training_set(
        docs, lang="en", min_quality=0.3, max_tokens=64, overlap=8
    ).toPandas()
    assert len(out) > 0
    con = duckdb.connect()
    con.register("ts", out)
    # each chunk appears exactly once
    assert con.execute(
        "SELECT count(*) FROM (SELECT chunk_uid FROM ts GROUP BY 1 HAVING count(*) > 1)"
    ).fetchone()[0] == 0
    # (pack_id, pack_pos) is a bijection onto the chunk set
    assert con.execute(
        "SELECT count(DISTINCT (pack_id, pack_pos)) = count(*) FROM ts"
    ).fetchone()[0]
    # budget holds for every non-oversized pack; oversized packs are
    # single-chunk
    assert con.execute(
        """SELECT count(*) FROM (
             SELECT pack_id, sum(n_tokens) AS tot, max(oversized) AS ov,
                    count(*) AS n
             FROM ts GROUP BY 1)
           WHERE (NOT ov AND tot > 64) OR (ov AND n > 1)"""
    ).fetchone()[0] == 0
    # n_tokens is the BPE-ish count of the chunk's own text
    assert con.execute(
        """SELECT count(*) FROM ts
           WHERE n_tokens <>
             len(list_filter(regexp_split_to_array(chunk_text, '[^a-z0-9]+'),
                             x -> len(x) > 0))
             + length(regexp_replace(chunk_text, '[a-z0-9 ]', '', 'g'))"""
    ).fetchone()[0] == 0


def test_chunk_uid_injective_for_colon_ids(spark):
    """String ids containing ':' must not collide in chunk_uid: under
    the old '{id}:{idx}' encoding, doc 'a:1' chunk 0 and doc 'a' chunk
    '1:0'-style ambiguities could alias; the length prefix makes the
    encoding injective (ADVICE r4 #4)."""
    from gapless_deribit_clickhouse_spark.pipelines.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [("a:1", words), ("a", words), ("a:1:2", words), (":", words)],
        "doc_id string, text string",
    )
    out = chunk_documents(df, max_tokens=10, overlap=0).toPandas()
    assert out.chunk_uid.is_unique
    assert set(out[out.doc_id == "a:1"].chunk_uid) == {
        "3:a:1:0", "3:a:1:1", "3:a:1:2"
    }


def test_build_training_set_end_to_end(spark):
    """The composed flagship: every surviving chunk is packed exactly
    once, pack budgets hold, and the whole pipeline is deterministic."""
    from gapless_deribit_clickhouse_spark.core.tables import load_table
    from gapless_deribit_clickhouse_spark.pipelines.curation import (
        build_training_set,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = build_training_set(
        docs, lang="en", min_quality=0.3, max_tokens=64, overlap=8
    ).toPandas()
    assert len(out) > 0
    # chunk_uid unique; every chunk assigned to exactly one pack slot
    assert out.chunk_uid.is_unique
    assert out[["pack_id", "pack_pos"]].drop_duplicates().shape[0] == len(out)
    # pack token budgets hold (oversized packs are single-doc flagged)
    per_pack = out.groupby("pack_id").agg(
        tokens=("n_tokens", "sum"), oversized=("oversized", "max")
    )
    ok = per_pack[~per_pack.oversized]
    assert (ok.tokens <= 64).all()
    # the chunker windows by WHITESPACE tokens while the packer
    # budgets BPE-ish tokens (punctuation adds), so a punctuation-
    # dense chunk may legitimately exceed the budget — but only into
    # a flagged single-chunk pack, never silently into a shared one
    over = out[out.oversized]
    if len(over):
        assert (out.groupby("pack_id").size()[over.pack_id] == 1).all()
    # deterministic end to end
    again = build_training_set(
        docs, lang="en", min_quality=0.3, max_tokens=64, overlap=8
    ).toPandas()
    a = out.sort_values("chunk_uid").reset_index(drop=True)
    b = again.sort_values("chunk_uid").reset_index(drop=True)
    assert a.equals(b)

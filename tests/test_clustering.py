"""Value-level pins for spherical k-means and semantic_dedup (no SQL
oracle exists for iterative clustering — same compensating-test policy
as EGARCH): planted well-separated blobs must be recovered exactly at
the assignment level, planted near-duplicates must be pruned, and
reruns must agree (determinism across the mapInPandas batching)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.pipelines.clustering import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)

DIM = 16


def _blob_frame(spark, n_per=40, n_blobs=3, jitter=0.05, seed=7):
    """Unit vectors in tight cones around n_blobs orthogonal axes —
    separable by construction (cross-blob cosine ~= 0)."""
    rng = np.random.default_rng(seed)
    rows = []
    for b in range(n_blobs):
        axis = np.zeros(DIM)
        axis[b] = 1.0
        for i in range(n_per):
            v = axis + jitter * rng.standard_normal(DIM)
            v /= np.linalg.norm(v)
            rows.append((b * n_per + i, [float(x) for x in v], b))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, blob int")


def test_kmeans_recovers_planted_blobs(spark):
    df = _blob_frame(spark)
    c = kmeans_fit(df, k=3, max_iter=10, seed=1)
    assert c.shape == (3, DIM)
    # unit centroids
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-9)
    # each centroid points into exactly one blob cone, all blobs hit
    axes = c.argmax(axis=1)
    assert sorted(axes) == [0, 1, 2]
    # assignment purity: every row lands with its blob-mates
    out = kmeans_assign(df, c).join(df.select("vec_id", "blob"), "vec_id").toPandas()
    purity = out.groupby("blob")["cluster_id"].nunique()
    assert (purity == 1).all()
    assert out["centroid_sim"].min() > 0.9


def test_kmeans_deterministic_and_guards(spark):
    df = _blob_frame(spark, n_per=25)
    a = kmeans_fit(df, k=3, seed=5)
    b = kmeans_fit(df.repartition(7), k=3, seed=5)
    # same data, different partitioning -> same centroids up to float
    # associativity noise in the partial-sum reduction
    assert np.allclose(a, b, atol=1e-9)
    # distributed full-corpus path agrees with the sample path when
    # the sample IS the corpus (same seeds, same update rule)
    c = kmeans_fit(df, k=3, seed=5, fit_sample_size=None)
    assert np.allclose(a, c, atol=1e-9)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=10, fit_sample_size=5)
    # k capped at usable rows; zero-norm and null vectors dropped
    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    c = kmeans_fit(tiny, k=5)
    assert c.shape == (1, 2)
    with pytest.raises(ValueError):
        kmeans_fit(tiny.filter(F.col("vec_id") > 1), k=2)
    # mixed-dimension rows are DROPPED, not an opaque np.stack crash
    # deep in an executor (ADVICE r4 #3): dim derives from the first
    # non-null row, deviants are filtered in _usable_rows
    from gapless_deribit_clickhouse_spark.pipelines.clustering import (
        kmeans_assign,
    )

    mixed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0, 1.0]), (4, [0.5])],
        "vec_id long, embedding array<double>",
    )
    cm = kmeans_fit(mixed, k=2, seed=5)
    assert cm.shape[1] == 2
    assigned = kmeans_assign(mixed, cm).toPandas()
    assert sorted(assigned.vec_id) == [1, 2]
    # assign keys the filter to the CENTROID width, so a deviant-width
    # FIRST row cannot mislead it into dropping the valid rows
    # (r5 review finding #1)
    deviant_first = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    a2 = kmeans_assign(deviant_first, cm).toPandas()
    assert sorted(a2.vec_id) == [1, 2]
    # NaN / inf vectors are dropped, not crowned rank-1 neighbors via
    # NaN-is-largest ordering (r5 review finding #2)
    nan_rows = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [float("nan"), 1.0]),
            (3, [float("inf"), 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    a3 = kmeans_assign(nan_rows, cm).toPandas()
    assert sorted(a3.vec_id) == [1]


def test_semantic_dedup_prunes_planted_near_dups(spark):
    base = _blob_frame(spark, n_per=30, seed=11)
    # plant exact duplicates of 10 docs (ids offset by 10_000)
    dups = base.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "blob"
    )
    df = base.unionByName(dups)
    out = semantic_dedup(df, k=3, threshold=0.99, seed=3).toPandas()
    assert len(out) == df.count()  # one verdict per usable row
    planted = out[out.vec_id >= 10_000]
    by_id = out.set_index("vec_id")
    # a planted exact duplicate (cosine 1.0) can never coexist with
    # its original: at most one of each pair survives (both may drop
    # if a third blob-mate within threshold shadows them)
    for vid in planted.vec_id:
        pair = out[out.vec_id.isin([vid, vid - 10_000])]
        assert pair.kept.sum() <= 1, f"pair {vid}"
    # every dropped doc names a KEPT shadow in its own cluster
    dropped = out[~out.kept]
    assert len(dropped) >= len(planted)
    for _, r in dropped.iterrows():
        shadow = by_id.loc[r.dup_of]
        assert bool(shadow.kept), f"{r.name}: dup_of points at a dropped doc"
        assert shadow.cluster_id == r.cluster_id
    # pruning is semantic, not wholesale: most of the corpus survives
    assert out.kept.sum() >= len(out) * 0.6
    # deterministic rerun
    again = semantic_dedup(df, k=3, threshold=0.99, seed=3).toPandas()
    assert set(out[out.kept].vec_id) == set(again[again.kept].vec_id)


def test_semantic_dedup_chunk_cap_bounds_group_size(spark):
    df = _blob_frame(spark, n_per=50, n_blobs=2, seed=13)
    out = semantic_dedup(df, k=2, threshold=0.999, max_cluster_size=16)
    # cap forces ceil(50/16)=4 chunks per cluster; all rows come back
    assert out.count() == 100
    # near-identity threshold -> nothing pruned even inside chunks
    assert out.filter(~F.col("kept")).count() == 0


def test_diverse_sample_covers_every_cluster(spark):
    from gapless_deribit_clickhouse_spark.pipelines.clustering import diverse_sample

    df = _blob_frame(spark, n_per=40, n_blobs=3, seed=21)
    out = diverse_sample(df, n_per_cluster=5, k=3, seed=2).toPandas()
    # exactly n per cluster, all clusters represented
    sizes = out.groupby("cluster_id").size()
    assert len(sizes) == 3 and (sizes == 5).all()
    # deterministic under repartitioning
    again = diverse_sample(df.repartition(7), n_per_cluster=5, k=3, seed=2).toPandas()
    assert set(out.vec_id) == set(again.vec_id)
    # balanced even when the corpus is skewed: one giant + one tiny blob
    skew = _blob_frame(spark, n_per=100, n_blobs=1, seed=5).unionByName(
        _blob_frame(spark, n_per=8, n_blobs=2, seed=6).filter(F.col("blob") == 1)
    )
    s = diverse_sample(skew, n_per_cluster=4, k=2, seed=9).toPandas()
    assert (s.groupby("cluster_id").size() == 4).all()


def test_ivf_kmeans_recall_vs_brute_force(spark):
    from gapless_deribit_clickhouse_spark.core.tables import load_table
    from gapless_deribit_clickhouse_spark.pipelines.clustering import (
        ivf_kmeans_topk,
    )
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import cosine_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, queries, k=5).toPandas()
    approx = ivf_kmeans_topk(
        emb, queries, k=5, n_centroids=8, nprobe=4, seed=4
    ).toPandas()
    e = exact.groupby("query_id").vec_id.apply(set)
    a = approx.groupby("query_id").vec_id.apply(set)
    recall = np.mean([len(e[q] & a.get(q, set())) / len(e[q]) for q in e.index])
    assert recall >= 0.8
    # rank 1 is the vector itself: its own list is always probed first
    self_hits = approx[approx["rank"] == 1]
    assert (self_hits.query_id == self_hits.vec_id).all()
    # deterministic rerun
    again = ivf_kmeans_topk(
        emb, queries, k=5, n_centroids=8, nprobe=4, seed=4
    ).toPandas()
    assert approx.equals(again)
    # the corpus-scale path (shuffled probe join instead of broadcast)
    # must return the SAME results — only the physical join strategy
    # differs
    shuffled = ivf_kmeans_topk(
        emb, queries, k=5, n_centroids=8, nprobe=4, seed=4,
        broadcast_queries=False,
    ).toPandas()
    key = ["query_id", "rank"]
    assert (
        approx.sort_values(key).reset_index(drop=True)
        .equals(shuffled.sort_values(key).reset_index(drop=True))
    )
    # and malformed query vectors (null / wrong dim / zero norm) are
    # skipped inside the distributed probe stage, not crashed on
    bad = spark.createDataFrame(
        [(100, None), (101, [1.0]), (102, [0.0] * 8)],
        "query_id long, query_vec array<double>",
    )
    assert (
        ivf_kmeans_topk(
            emb, queries.unionByName(bad), k=5, n_centroids=8, nprobe=4,
            seed=4,
        )
        .filter(F.col("query_id") >= 100)
        .count()
        == 0
    )


def test_knn_self_join_graph(spark):
    """Corpus-as-query-set kNN graph: no self edges, dense ranks 1..k,
    recall vs per-vector brute force above the IVF floor — the
    workload the distributed probe routing exists for."""
    from gapless_deribit_clickhouse_spark.core.tables import load_table
    from gapless_deribit_clickhouse_spark.pipelines.clustering import (
        knn_self_join,
    )
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import cosine_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") < 60
    )
    g = knn_self_join(emb, k=5, n_centroids=4, nprobe=3, seed=4).toPandas()
    assert (g.query_id != g.vec_id).all()
    ranks = g.groupby("query_id")["rank"].apply(lambda s: sorted(s))
    assert all(r == list(range(1, len(r) + 1)) for r in ranks)
    # brute-force reference: top-(k+1) per query, self dropped
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = cosine_topk(emb, queries, k=6).toPandas()
    brute = brute[brute.query_id != brute.vec_id]
    b = brute.sort_values(["query_id", "rank"]).groupby("query_id").vec_id.apply(
        lambda s: set(s.head(5))
    )
    a = g.groupby("query_id").vec_id.apply(set)
    recall = np.mean([len(b[q] & a.get(q, set())) / len(b[q]) for q in b.index])
    assert recall >= 0.7
    # deterministic
    again = knn_self_join(emb, k=5, n_centroids=4, nprobe=3, seed=4).toPandas()
    key = ["query_id", "rank"]
    assert (
        g.sort_values(key).reset_index(drop=True)
        .equals(again.sort_values(key).reset_index(drop=True))
    )


def test_kmeans_assign_step_degenerate_input_fails_both_engines(spark, tmp_path):
    """ADVICE r9: with fewer than K usable centroid rows the Spark
    binding raises ValueError — the DuckDB oracle must error too, not
    silently proceed with a smaller centroid set."""
    import duckdb
    import pytest as _pytest

    from gapless_deribit_clickhouse_spark.bindings.llm_ops import (
        _KM_DIM,
        _KM_K,
        KMEANS_ASSIGN_STEP_SQL,
        kmeans_assign_step_q,
    )

    # K-1 usable vectors (plus one degenerate all-zero row that the
    # usable filter drops on both engines)
    rows = [(i, [float(i + 1)] * _KM_DIM) for i in range(_KM_K - 1)]
    rows.append((_KM_K - 1, [0.0] * _KM_DIM))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(f"{sf_dir}/embeddings.parquet")

    with _pytest.raises(ValueError, match="usable centroid rows"):
        kmeans_assign_step_q(spark, sf_dir)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    with _pytest.raises(duckdb.Error, match="usable centroid rows"):
        con.execute(KMEANS_ASSIGN_STEP_SQL).fetchall()

    # ZERO usable rows must error too (r10 self-review: a per-row
    # CASE guard is never evaluated over an empty relation — the
    # guard is a UNION ALL branch precisely so this path fires)
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW embeddings AS SELECT vec_id, "
        f"CAST(NULL AS DOUBLE[]) AS embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    with _pytest.raises(duckdb.Error, match="usable centroid rows"):
        con2.execute(KMEANS_ASSIGN_STEP_SQL).fetchall()

"""Plan contracts: every registered query must keep the physical-plan
properties the 100 TB design depends on. PLANS.md documents them; this
test ENFORCES them, so a refactor that silently introduces a
nested-loop join or an undeclared Python crossing fails CI.
"""

from __future__ import annotations

import pytest

from gapless_deribit_clickhouse_spark.bindings import ALL_BINDINGS

SF_DIR = "/root/testdata/sf0.001"

# the only operators allowed off the JVM (Arrow-batched, SURVEY §2.10).
# The embedding bindings cross once for the LSH signature stage: a
# whole-Arrow-batch BLAS matmul (batch x dim @ dim x n_bits) — the
# wide-vector-math case §2.10 reserves the crossing for. The
# pure-Column twin (use_arrow=False) is pinned equal by
# tests/test_pipelines.py.
REQUIRED_PYTHON = {
    "egarch_params",
    "multimodal_features",
    "image_decode_features",  # real decode kernel (stdlib PNG/PGM)
    "audio_decode_features",  # real decode kernel (stdlib PCM-WAV)
    "rolling_percentile",
    "embedding_near_dup",
    "ivf_topk",
    "video_decode_features",  # framepack build + per-frame decode
    "semantic_dedup",  # k-means assign + per-cluster greedy prune
    "sequence_packing",  # per-shard first-fit-decreasing
    "ivf_kmeans_topk",  # k-means assign stage keeps raw vectors
    "hybrid_rrf",  # fuses ivf_topk, inheriting its SRP crossings
    "diverse_sample",  # k-means assign below the group tournament
    "training_set",  # composed flagship: FFD packing crossing
    "training_set_chunks",  # same flagship, pack columns projected out
    "kmeans_assign_step",  # the shared Arrow assign kernel (update
    # half is relational; assignment is _assign_table by design)
    "egarch_loglik",  # the exact _neg_loglik sequential kernel the
    # optimizer evaluates, one applyInPandas crossing per group —
    # the crossing IS the thing the DuckDB recursive oracle checks
    "egarch_nm_step",  # one Nelder-Mead iteration: 9 _neg_loglik
    # evaluations + the acceptance rule in the same single crossing;
    # the DuckDB twin replays all of it (VERDICT r9 #4)
}
# dup_clusters consumes the LSH stage too, but its connected-components
# local tier executes during construction on small graphs, so the
# returned plan may be a LocalTableScan with no visible crossing.
# frequent_tokens' Misra-Gries mapInPandas pass sits behind its lazy
# localCheckpoint barrier, so the visible plan shows the checkpoint's
# RDD scan instead of the crossing (PLANS.md "+2ckpt" scans column).
ALLOWED_PYTHON = REQUIRED_PYTHON | {"dup_clusters", "frequent_tokens"}

# BroadcastNestedLoopJoin is allowed ONLY where the build side is
# bounded by construction:
# - tfidf_top_terms: 1-row corpus-size scalar broadcast
# - cosine_topk: brute-force similarity baseline — each corpus row
#   scans the (small, broadcast) query set; the scale paths
#   (ivf_topk, embedding_near_dup, minhash_lsh_pairs) must NOT NLJ
#   since round 3's banded-LSH equi-join rewrite
# - q22_dormant_customers: 1-row global-average scalar broadcast
# - value_histogram: 1-row min/max-bounds scalar broadcast
# - q11_important_stock: 1-row avg-part-value scalar broadcast
# - lm_score: 1-row vocabulary-size scalar broadcast
# - quality_gate: lm_score's vocabulary scalar + the 1-row
#   median-ppl percentile scalar
# - scan_keyset: 1-row pagination-cursor broadcast (LIMIT 1 by
#   construction — the keyset predicate references the cursor's
#   (ts, event_id) on every row, the textbook scalar-broadcast shape)
ALLOWED_NLJ = {
    "tfidf_top_terms",
    "cosine_topk",
    "q22_dormant_customers",
    "value_histogram",
    "q11_important_stock",
    "lm_score",
    "quality_gate",
    "scan_keyset",
    "frequent_tokens",  # 1-row total-count scalar broadcast
    "pit_enrich",  # 1-row horizon (max fact ts) scalar broadcast that
    # closes the SCD2 history's open intervals before the bucketed
    # interval join (operators/scd.py point_in_time_join)
    "bm25_topk",  # 1-row (n_docs, avgdl) scalar broadcast
    "hybrid_rrf",  # inherits cosine_topk's broadcast-queries crossJoin
    "quantized_topk",  # broadcast-queries crossJoin over the int8 index
    "event_cooccurrence",  # 1-row total-group-count scalar broadcast
    # (the lift denominator; the pair join itself is an equi-join on
    # the group id)
    "overlap_hot_hours",  # 1-row hourly-average scalar broadcast (the
    # hot-hour threshold, the q22 pattern); the overlap join itself is
    # the bucketed hash equi-join
}


def _plan(fn, spark) -> str:
    return fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name,fn", [(n, f) for n, f, _ in ALL_BINDINGS])
def test_no_nested_loop_or_cartesian(spark, name, fn):
    plan = _plan(fn, spark)
    if name not in ALLOWED_NLJ:
        assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize("name,fn", [(n, f) for n, f, _ in ALL_BINDINGS])
def test_python_only_at_declared_edges(spark, name, fn):
    plan = _plan(fn, spark)
    crossings = sum(
        plan.count(op)
        for op in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    )
    if name in REQUIRED_PYTHON:
        assert crossings >= 1, f"{name} should use an Arrow-batched op"
    elif name not in ALLOWED_PYTHON:
        assert crossings == 0, f"{name} crosses into Python unexpectedly"


def test_simhash_has_no_post_checkpoint_exchange(spark):
    """r11 rework pin: simhash_near_pairs' candidate dedup is a
    first-zero-XOR-chunk filter, not a distinct() — the visible plan
    (everything downstream of the checkpointed signature table) must
    contain NO Exchange at all. A refactor that reintroduces a
    shuffle over the candidate set fails here, not in a bench diff."""
    import re

    from gapless_deribit_clickhouse_spark.bindings import ALL_BINDINGS

    fn = next(f for n, f, _ in ALL_BINDINGS if n == "simhash_near_pairs")
    plan = _plan(fn, spark)
    exchanges = len(re.findall(r"\bExchange\b", plan)) - len(
        re.findall(r"ReusedExchange", plan)
    )
    assert exchanges == 0, f"simhash candidate stage shuffles:\n{plan[:2000]}"

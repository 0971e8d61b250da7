"""Semantics tests for BM25 top-k retrieval: the Spark plan against a
pure-Python reference implementation of the same Robertson/Lucene
formula (the DuckDB value oracle lives in bindings/llm_ops.py)."""

from __future__ import annotations

import math

import pytest

from gapless_deribit_clickhouse_spark.pipelines.retrieval import (
    bm25_topk,
    rrf_fuse,
    tokenize_query,
)

CORPUS = [
    (0, "spark shuffle join join"),          # tf(join)=2, dl=4
    (1, "a very long document about a join somewhere in the middle of text"),
    (2, "hash tables and probes"),
    (3, "join"),                             # short doc, tf=1
    (4, ""),                                 # empty doc: counts in N/avgdl only
]


def _py_bm25(corpus, query, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores = {}
    for term in tokenize_query(query):
        hits = {i: t.count(term) for i, t in docs.items() if term in t}
        df = len(hits)
        if not df:
            continue
        idf = math.log(1.0 + ((n - df) + 0.5) / (df + 0.5))
        for i, tf in hits.items():
            dl = len(docs[i])
            s = idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
            scores[i] = scores.get(i, 0.0) + s
    return scores


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bm25_matches_reference(spark):
    out = bm25_topk(_df(spark), {"q": "join hash"}, k=10).collect()
    expect = _py_bm25(CORPUS, "join hash")
    got = {r["doc_id"]: r["score"] for r in out}
    assert set(got) == set(expect)
    for i, s in expect.items():
        assert got[i] == pytest.approx(s, abs=1e-6)
    # rank order = reference order (scores are well separated here)
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == sorted(expect, key=lambda i: (-expect[i], i))


def test_bm25_tf_and_length_normalization(spark):
    # doc 0 (tf=2, short) must outrank doc 1 (tf=1, long) and doc 3
    # (tf=1, very short) must outrank doc 1 too
    got = {
        r["doc_id"]: r["rank"]
        for r in bm25_topk(_df(spark), {"q": "join"}, k=10).collect()
    }
    assert got[0] < got[1] and got[3] < got[1]


def test_bm25_no_hit_query_returns_no_rows(spark):
    out = bm25_topk(_df(spark), {"gone": "zzz missing"}, k=5).collect()
    assert out == []


def test_bm25_k_caps_per_query(spark):
    out = bm25_topk(_df(spark), {"q": "join", "h": "hash"}, k=1).collect()
    by_q = {r["query_id"]: r for r in out}
    assert len(out) == 2
    assert by_q["q"]["rank"] == 1 and by_q["h"]["doc_id"] == 2


def test_tokenize_query_dedupes_and_normalizes():
    assert tokenize_query("Join  JOIN hash") == ["join", "hash"]


def test_rrf_fuse(spark):
    schema = "query_id string, vec_id long, rank int"
    a = spark.createDataFrame([("q", 1, 1), ("q", 2, 2)], schema)
    b = spark.createDataFrame([("q", 2, 1), ("q", 3, 2)], schema)
    out = sorted(
        rrf_fuse([a, b], on=("query_id", "vec_id"), c=60, k=10).collect(),
        key=lambda r: r["rank"],
    )
    # doc 2 appears in both systems (ranks 2 and 1) and must win
    assert [r["vec_id"] for r in out] == [2, 1, 3]
    assert [r["n_systems"] for r in out] == [2, 1, 1]
    assert out[0]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
    assert out[1]["rrf_score"] == pytest.approx(1 / 61)
    # k caps the fused list
    assert len(rrf_fuse([a, b], on=("query_id", "vec_id"), k=2).collect()) == 2

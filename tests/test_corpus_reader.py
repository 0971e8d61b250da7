"""JSONL corpus source/sink: schema enforcement, corrupt-record
quarantine, shard-balanced writes, and the read->write->read
roundtrip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gapless_deribit_clickhouse_spark.sources.corpus_reader import (
    DOCUMENT_SCHEMA,
    read_jsonl_corpus,
    write_corpus_shards,
)

GOOD = [
    '{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web"}',
    '{"doc_id": 2, "text": "gamma delta", "lang": "de", "source": "web"}',
    '{"doc_id": 3, "text": "epsilon", "lang": "en", "source": "books"}',
]
BAD = [
    '{"doc_id": 4, "text": "trailing',  # truncated JSON
    "not json at all",  # garbage line
    '{"doc_id": "not-a-number", "text": "typed wrong"}',  # type mismatch
    '{"doc_id": 5, "lang": "en"}',  # parses, but required text is null
]


@pytest.fixture()
def corpus_path(tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(GOOD + BAD) + "\n")
    return str(p)


def test_read_splits_good_rows_from_quarantine(spark, corpus_path):
    docs, quarantined = read_jsonl_corpus(spark, corpus_path)
    got = docs.orderBy("doc_id").toPandas()
    assert list(got.doc_id) == [1, 2, 3]
    assert list(got.columns) == ["doc_id", "text", "lang", "source"]
    q = quarantined.toPandas()
    assert len(q) == 4
    reasons = sorted(q.reason)
    # 3 parse/type failures + 1 schema (null required col) failure
    assert reasons.count("malformed") == 3
    assert reasons.count("missing:text") == 1
    # parse failures keep the raw offending line for the audit trail
    assert "not json at all" in set(q.raw)
    # nothing lost: good + quarantined == input lines
    assert len(got) + len(q) == len(GOOD) + len(BAD)


def test_read_rejects_bad_schema_args(spark, corpus_path):
    with pytest.raises(ValueError):
        read_jsonl_corpus(
            spark,
            corpus_path,
            schema=T.StructType(
                [T.StructField("_corrupt_record", T.StringType())]
            ),
        )
    with pytest.raises(ValueError):
        read_jsonl_corpus(spark, corpus_path, required=("no_such_col",))


def test_write_shards_balanced_and_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc {i} text", "en", "web") for i in range(200)],
        DOCUMENT_SCHEMA,
    )
    out = str(tmp_path / "shards")
    write_corpus_shards(docs, out, num_shards=4)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 4
    # round-robin: balanced within one row PER INPUT PARTITION (each
    # upstream partition deals its rows out independently, starting at
    # its own offset)
    sizes = sorted(
        spark.read.schema(DOCUMENT_SCHEMA).json(os.path.join(out, p)).count()
        for p in parts
    )
    assert sizes[-1] - sizes[0] <= docs.rdd.getNumPartitions()
    # roundtrip: reading the shards back reproduces the corpus exactly
    back, quarantined = read_jsonl_corpus(spark, out)
    assert quarantined.count() == 0
    a = docs.orderBy("doc_id").toPandas()
    b = back.orderBy("doc_id").toPandas()
    assert a.equals(b)


def test_quarantine_rate_over_testdata_documents(spark, tmp_path):
    """The real documents table, written as JSONL and read back: a
    clean corpus quarantines nothing and survives the roundtrip."""
    from gapless_deribit_clickhouse_spark.core.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out = str(tmp_path / "docs_jsonl")
    write_corpus_shards(docs, out, num_shards=2)
    back, quarantined = read_jsonl_corpus(spark, out)
    assert quarantined.count() == 0
    assert back.count() == docs.count()
    assert (
        back.agg(F.sum(F.length("text"))).first()[0]
        == docs.agg(F.sum(F.length("text"))).first()[0]
    )

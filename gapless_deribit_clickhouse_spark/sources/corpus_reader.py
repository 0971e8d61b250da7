"""JSONL corpus source/sink — the LLM training-data interchange format.

Web-scale corpora (C4, The Pile, RefinedWeb derivatives) ship as
line-delimited JSON; the first step of every curation pipeline is a
schema-enforced read that neither crashes on the inevitable malformed
lines nor silently drops them. This module gives that step the engine
treatment:

- ``read_jsonl_corpus`` reads with an EXPLICIT schema (never
  ``inferSchema`` — schema inference is an extra full scan of 100 TB
  and a schema lottery per batch) in PERMISSIVE mode, and splits the
  result into (docs, quarantined): parse failures land in a
  quarantine DataFrame carrying the raw offending line, so bad input
  is auditable instead of vanished.
- ``write_corpus_shards`` writes a corpus back out as N JSONL shards
  (round-robin repartition — shards are size-balanced regardless of
  upstream partitioning skew). Distinct from the serving-layer
  exporter ``sinks.connector.write_jsonl_shards`` (deterministic
  hash-sharded delivery keyed on an id column): this one optimizes
  read parallelism of the NEXT pipeline stage, that one byte-stable
  delivery artifacts.

Scale notes: uncompressed / zstd / bzip2 JSONL splits by line within
Spark's file partitioning, so the read parallelizes by
``maxPartitionBytes`` like any text source; gzip is NOT splittable —
one .json.gz = one task — which is why the shard writer exists
(many medium shards beat one giant file). The quarantine split
evaluates the same scan twice only in the plan; with filter pushdown
both branches prune to the columns they keep.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark's reserved column for the raw text of rows that fail to parse
CORRUPT_COL = "_corrupt_record"

# the de-facto minimal document schema (doc_id, text + provenance);
# callers with richer corpora pass their own StructType
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


class CorpusRead(NamedTuple):
    docs: DataFrame
    quarantined: DataFrame


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    required: tuple[str, ...] = ("doc_id", "text"),
) -> CorpusRead:
    """Schema-enforced JSONL read with corrupt-record quarantine.

    Returns ``(docs, quarantined)``: ``docs`` holds rows that parsed
    AND carry non-null values for every ``required`` column;
    ``quarantined`` holds everything else, reduced to
    ``(raw, reason)`` where ``raw`` is the offending line for parse
    failures (reason ``malformed``) or the row's JSON re-encoding for
    schema failures (reason ``missing:<col>``).

    Mechanics worth knowing (they are the reason this helper exists):
    PERMISSIVE mode nulls out unparseable rows and stores the raw
    line in ``columnNameOfCorruptRecord``; Spark REFUSES a query that
    references only the corrupt column (a type-mismatched field makes
    the whole row corrupt too, not just the field), so both branches
    here keep real columns in scope. The explicit schema means NO
    inference pass — one scan, pushdown-friendly, and a type drift in
    the input becomes a quarantined row, not a silently restyped
    column."""
    if CORRUPT_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not define {CORRUPT_COL!r}")
    read_schema = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    data_cols = [f.name for f in schema.fields]
    missing = [c for c in required if c not in data_cols]
    if missing:
        raise ValueError(f"required columns {missing} not in schema")

    parsed = F.col(CORRUPT_COL).isNull()
    complete = parsed
    for c in required:
        complete = complete & F.col(c).isNotNull()
    docs = raw.filter(complete).select(*data_cols)

    reason = F.when(~parsed, F.lit("malformed"))
    for c in required:
        reason = reason.when(F.col(c).isNull(), F.lit(f"missing:{c}"))
    quarantined = raw.filter(~complete).select(
        F.coalesce(
            F.col(CORRUPT_COL),
            F.to_json(F.struct(*data_cols)),
        ).alias("raw"),
        reason.alias("reason"),
    )
    return CorpusRead(docs=docs, quarantined=quarantined)


def write_corpus_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    mode: str = "error",
) -> None:
    """Write a corpus as ``num_shards`` size-balanced JSONL shards.
    Round-robin repartition deliberately ignores content: shard size
    is what downstream read parallelism keys on, and a hash of any
    real column inherits that column's skew."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    df.repartition(num_shards).write.mode(mode).json(path)

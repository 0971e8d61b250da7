"""DDL generation from the SSoT.

Parity with the reference's ``cmd_init``
(``/root/reference/src/gapless_deribit_clickhouse/schema/cli.py:67-113``),
which renders CREATE DATABASE/TABLE with engine + PARTITION BY + ORDER
BY from the YAML. Here the target dialect is Spark SQL: a parquet (or
any ``USING``-able) table partitioned by the declared columns; the
within-partition sort order is applied by the writer, not the DDL
(parquet has no ORDER BY — row-group min/max stats do the pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.schema.loader import TableSchema

_DDL_TYPES = {
    "string": "STRING",
    "double": "DOUBLE",
    "float": "FLOAT",
    "int": "INT",
    "bigint": "BIGINT",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "binary": "BINARY",
}


def create_table_ddl(schema: TableSchema, location: str | None = None) -> str:
    """Render `CREATE TABLE IF NOT EXISTS ... USING <format> PARTITIONED BY`."""
    cols = []
    for c in schema.columns:
        null_sql = "" if c.nullable else " NOT NULL"
        comment = f" COMMENT '{c.description}'" if c.description else ""
        cols.append(f"  {c.name} {_DDL_TYPES[c.spark_type]}{null_sql}{comment}")
    for p in schema.partition_by:
        if p not in schema.column_names:
            cols.append(f"  {p} STRING NOT NULL COMMENT 'derived partition column'")
    lines = [
        f"CREATE TABLE IF NOT EXISTS {schema.table} (",
        ",\n".join(cols),
        f") USING {schema.format}",
    ]
    if schema.partition_by:
        lines.append(f"PARTITIONED BY ({', '.join(schema.partition_by)})")
    if location:
        lines.append(f"LOCATION '{location}'")
    if schema.description:
        lines.append(f"COMMENT '{schema.description}'")
    return "\n".join(lines)


def init_table(spark: SparkSession, schema: TableSchema, location: str | None = None) -> None:
    spark.sql(create_table_ddl(schema, location))


def with_partition_columns(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Add declared-but-derived partition columns (e.g. trade_month =
    yyyyMM of timestamp — the Spark analogue of the reference's
    ``PARTITION BY toYYYYMM(timestamp)``, options_trades.yaml:31)."""
    for p in schema.partition_by:
        if p not in df.columns and p.endswith("_month"):
            src = p[: -len("_month")] if p != "trade_month" else "timestamp"
            # best-effort: a frame without the source column (e.g. a
            # projected subset headed to a connector) passes through
            # unchanged rather than failing analysis
            if src in df.columns:
                df = df.withColumn(p, F.date_format(F.col(src), "yyyyMM"))
    return df


def write_table(df: DataFrame, schema: TableSchema, path: str, mode: str = "append") -> None:
    """Write parquet in the declared physical layout: derived partition
    columns, partitionBy, and within-partition sort for row-group
    pruning (the reference's ORDER BY analogue)."""
    out = with_partition_columns(df, schema)
    if schema.sort_within_partitions:
        out = out.sortWithinPartitions(*schema.sort_within_partitions)
    writer = out.write.mode(mode).format(schema.format)
    if schema.partition_by:
        writer = writer.partitionBy(*schema.partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write a bucketed (hash-clustered) catalog table — Spark's
    pre-shuffled layout for co-located joins and aggregations, the
    analogue of the reference's ORDER-BY-keyed MergeTree locality
    (``options_trades.yaml:30``).

    Scale rationale: a fact table bucketed on its join/group key is
    shuffled ONCE at write time; every subsequent
    ``groupBy(bucket_cols)`` or join against a table bucketed the same
    way runs with NO Exchange — at 100 TB that converts the dominant
    per-query cost into a one-time layout cost. Requires
    ``saveAsTable`` (bucket metadata lives in the catalog, not in
    parquet files); pick ``num_buckets`` so one bucket ≈ 100-500 MB at
    the target scale.
    """
    # Cluster rows by their bucket BEFORE the write (optimization r12,
    # guide §6 file layout): repartition(num_buckets, bucket_cols)
    # uses the same HashPartitioning (pmod(murmur3, n)) that assigns
    # bucket ids at write time, so each write task holds exactly one
    # bucket — num_buckets parallel writers, ONE file per bucket
    # (instead of every input task writing a sliver of all
    # num_buckets files: tasks x buckets small files, and at sf0.1 a
    # 4-task write doing 32 sequential per-bucket sorts each). Table
    # content is identical; only file count/parallelism change.
    clustered = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        clustered.write.format(format).mode(mode).bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)

"""Schema drift detection: SSoT vs a live table / DataFrame.

Parity with the reference introspector
(``/root/reference/src/gapless_deribit_clickhouse/schema/introspector.py:36-44``
drift categories, ``:80-153`` validate loop) — but instead of querying
``system.columns`` over HTTPS, the live side is whatever Spark already
knows: a DataFrame's StructType or ``spark.catalog`` metadata.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gapless_deribit_clickhouse_spark.schema.loader import TableSchema


class DriftKind(str, Enum):
    MISSING = "MISSING"            # declared, absent live
    EXTRA = "EXTRA"                # live, undeclared
    TYPE_MISMATCH = "TYPE_MISMATCH"
    NULLABILITY_MISMATCH = "NULLABILITY_MISMATCH"


@dataclass(frozen=True)
class Drift:
    kind: DriftKind
    column: str
    expected: str = ""
    actual: str = ""

    def __str__(self) -> str:
        detail = f" expected={self.expected} actual={self.actual}" if self.expected else ""
        return f"{self.kind.value}: {self.column}{detail}"


def diff_schemas(declared: TableSchema, live: T.StructType,
                 check_nullability: bool = True) -> list[Drift]:
    """Compare the SSoT against a live StructType; [] means no drift."""
    live_fields = {f.name: f for f in live.fields}
    declared_names = set(declared.column_names)
    drifts: list[Drift] = []
    for col in declared.columns:
        f = live_fields.get(col.name)
        if f is None:
            if col.name in declared.partition_by:
                continue  # partition columns may be directory-encoded
            drifts.append(Drift(DriftKind.MISSING, col.name, col.spark_type, ""))
            continue
        if f.dataType != col.data_type:
            drifts.append(Drift(
                DriftKind.TYPE_MISMATCH, col.name,
                col.data_type.simpleString(), f.dataType.simpleString()))
        elif check_nullability and f.nullable != col.nullable:
            drifts.append(Drift(
                DriftKind.NULLABILITY_MISMATCH, col.name,
                f"nullable={col.nullable}", f"nullable={f.nullable}"))
    for name in live_fields:
        if name not in declared_names and name not in declared.partition_by:
            drifts.append(Drift(DriftKind.EXTRA, name, "",
                                live_fields[name].dataType.simpleString()))
    return drifts


def validate_table(spark: SparkSession, declared: TableSchema,
                   df: DataFrame | None = None) -> list[Drift]:
    """Drift-check a registered table (or an explicit DataFrame).

    Parquet reads are nullable-typed regardless of writer intent, so
    nullability is only enforced when the live side declares it
    (i.e. a catalog table with NOT NULL constraints).
    """
    if df is None:
        df = spark.table(declared.table)
    return diff_schemas(declared, df.schema, check_nullability=False)

"""Bindings: SURVEY §2 operators bound to the driver's testdata tables.

Each binding module exposes ``BINDINGS: list[tuple[name, fn, sql]]``
where ``fn(spark, sf_dir) -> DataFrame`` and ``sql`` is the DuckDB
oracle (or ``None`` for non-SQL-expressible operators -> rows-only
check).
"""

from __future__ import annotations

from gapless_deribit_clickhouse_spark.bindings import (
    analytics_ops,
    core_ops,
    extra_ops,
    features_ops,
    llm_ops,
)

ALL_BINDINGS = []
for _mod in (core_ops, features_ops, analytics_ops, extra_ops, llm_ops):
    ALL_BINDINGS.extend(_mod.BINDINGS)

_names = [n for n, _f, _s in ALL_BINDINGS]
assert len(_names) == len(set(_names)), "duplicate binding names"

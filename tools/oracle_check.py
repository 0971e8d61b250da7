"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf directory, then compares row count, column
names/ordering-insensitive schema, and values (floats rounded before
comparison; rows sorted by all columns).

Usage: python tools/oracle_check.py [--bare] [--determinism] [sf_dir] [query ...]

``--bare`` runs the queries on a SparkSession built WITHOUT our session
factory — no pre-set confs, exactly like the driver's harness. Round-1
shipped a bug only visible on a bare session; this flag is the gate
against that class of failure. Run the full registry with it before
every round ends.

``--determinism`` runs each selected query TWICE and diffs the sorted
collected rows instead of comparing to DuckDB — the probe for
shuffle-order-dependent results (run it at sf0.1, where inputs are
multi-partition, after touching dedup/resample/topk/window operators).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from gapless_deribit_clickhouse_spark.core.session import get_spark
from gapless_deribit_clickhouse_spark.core.tables import TABLES


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df, oracle_df: pd.DataFrame) -> tuple[bool, str]:
    sp = _normalize(spark_df.toPandas())
    du = _normalize(oracle_df)
    if len(sp) != len(du):
        return False, f"rowcount spark={len(sp)} duck={len(du)}"
    if list(sp.columns) != list(du.columns):
        return False, f"columns spark={list(sp.columns)} duck={list(du.columns)}"
    for c in sp.columns:
        a, b = sp[c], du[c]
        if str(a.dtype) != str(b.dtype):
            return False, f"dtype mismatch col={c}: spark={a.dtype} duck={b.dtype}"
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            ok = np.allclose(
                a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            )
        else:
            ok = a.astype(str).equals(b.astype(str))
        if not ok:
            bad = (a.astype(str) != b.astype(str)).to_numpy().nonzero()[0][:3]
            detail = [(c, i, a.iloc[i], b.iloc[i]) for i in bad]
            return False, f"value mismatch col={c}: {detail}"
    return True, f"OK rows={len(sp)}"


def _bare_spark():
    """A SparkSession with none of our factory confs — the driver's view."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    return (
        SparkSession.builder.appName("oracle-check-bare")
        .master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    argv = sys.argv[1:]
    bare = "--bare" in argv
    determinism = "--determinism" in argv
    argv = [a for a in argv if a not in ("--bare", "--determinism")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    spark = _bare_spark() if bare else get_spark()
    con = None if determinism else _duck_con(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if determinism:
                a = sorted(map(str, sdf.collect()))
                b = sorted(map(str, fn(spark, sf_dir).collect()))
                ok = a == b
                msg = f"deterministic rows={len(a)}" if ok else "RUNS DIFFER"
            elif name in oracles:
                ok, msg = compare(name, sdf, con.execute(oracles[name]).df())
            else:
                n = sdf.count()
                ok, msg = n >= 0, f"rows-only n={n}"
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXC {type(ex).__name__}: {ex}"
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name:34s} {time.time() - t0:6.2f}s  {msg}")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

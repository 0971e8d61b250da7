"""Oracle checks for the bindings demoted past the driver's first-50
correctness window.

The external harness verifies only the first 50 registry entries; the
demoted near-duplicate variants would otherwise lose ALL value-level
verification (their own oracle SQL included). This pins them in CI at
sf0.001 with the same compare the harness applies: row count, column
set, and values.

Also pins the one coupling the LSH oracles can't check themselves:
the DuckDB CTEs embed a dim=64 projection matrix at import time, so
the testdata's embedding width must stay 64 (a regenerated corpus
with a new width would silently diverge engine and oracle).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from gapless_deribit_clickhouse_spark.bindings import (
    ALL_BINDINGS,
    CHECKED_WINDOW,
    _DEMOTED,
)
from gapless_deribit_clickhouse_spark.core.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


# every binding past the driver's 50-entry window that HAS an oracle:
# the demoted near-duplicate variants plus tail-appended distinct
# operators (e.g. classifier_score) — all get the driver's compare
# here since the driver itself never reaches them
_DEMOTED_BINDINGS = [
    b for b in ALL_BINDINGS[CHECKED_WINDOW:] if b[2] is not None
]


def test_all_demoted_have_oracles():
    with_sql = {n for n, _f, s in ALL_BINDINGS if s is not None}
    assert set(_DEMOTED) <= with_sql, "demoted variants must keep their oracle"


@pytest.mark.parametrize(
    "name,fn,sql", _DEMOTED_BINDINGS, ids=[b[0] for b in _DEMOTED_BINDINGS]
)
def test_demoted_binding_matches_oracle(spark, duck, name, fn, sql):
    got = _normalize(fn(spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(sql).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    assert list(got.columns) == list(want.columns), name
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            assert np.allclose(
                a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            ), f"{name}.{c}"
        else:
            assert a.astype(str).equals(b.astype(str)), f"{name}.{c}"


def test_embedding_width_matches_lsh_oracle_assumption():
    con = duckdb.connect()
    widths = con.execute(
        f"SELECT DISTINCT len(embedding) FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    assert widths == [(64,)], (
        "LSH oracle CTEs are generated for dim=64; regenerate "
        "bindings/llm_ops._lsh_band_ctes for the new width"
    )


def test_embeddings_within_fit_sample_assumption():
    """r10 self-review: the clustering oracles unroll Lloyd over ALL
    usable rows, while the engine fits on the hash-smallest
    fit_sample_size=65,536 sample — equivalent ONLY while the
    embeddings corpus stays at or under 65,536 rows. Pin that
    assumption for every sf the compares run at, like the dim=64 pin
    above: a regenerated larger corpus must fail HERE, not as an
    inscrutable centroid mismatch. sf0.1 is included (ADVICE r10):
    oracle_check's docstring recommends it for determinism probes, so
    the assumption must hold there too."""
    import duckdb as _duck

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        n = _duck.connect().execute(
            f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
        assert n <= 65_536, (
            f"{sf_dir}: {n} embeddings exceed kmeans_fit's default "
            "fit_sample_size — the clustering oracles' full-corpus "
            "Lloyd unroll no longer matches the engine's sample fit"
        )

"""PII scrubbing: planted-PII behavior, null handling, and the
Java-regex/RE2 pattern-compatibility contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.pipelines.scrub import (
    PII_PATTERNS,
    scrub_documents,
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, "contact me at alice.smith+work@example.co.uk for details"),
        (2, "server at 192.168.1.254 timed out, retry 10.0.0.1"),
        (3, "call +44 20 7946 0958 or +1-555-867-5309 now"),
        (4, "clean prose with no identifiers at all"),
        (5, None),
        (6, "mixed: bob@x.io from 8.8.8.8 dialed +33 1 23 45 67 89"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_redacts_and_counts(planted):
    out = {r.doc_id: r for r in scrub_documents(planted).collect()}
    assert "<EMAIL>" in out[1].clean_text and "@" not in out[1].clean_text
    assert out[1].n_email == 1 and out[1].n_pii_total == 1
    assert out[2].clean_text.count("<IP>") == 2 and out[2].n_ipv4 == 2
    assert out[3].clean_text.count("<PHONE>") == 2 and out[3].n_phone == 2
    assert out[4].clean_text == planted.filter(F.col("doc_id") == 4).first().text
    assert out[4].n_pii_total == 0
    assert out[5].clean_text is None and out[5].n_pii_total == 0
    assert out[6].n_email == 1 and out[6].n_ipv4 == 1 and out[6].n_phone == 1
    assert out[6].n_pii_total == 3


def test_scrub_patterns_agree_with_duckdb_on_planted_pii(spark, planted):
    """The regex-compatibility contract the oracle depends on: every
    pattern must match identically in Spark (Java regex) and DuckDB
    (RE2) — checked on text that actually CONTAINS PII, not just the
    sf corpus (which is clean prose)."""
    got = (
        scrub_documents(planted)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pdf = planted.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    from gapless_deribit_clickhouse_spark.bindings.llm_ops import PII_SCRUB_SQL

    want = con.execute(PII_SCRUB_SQL).df().sort_values("doc_id").reset_index(drop=True)
    assert got.clean_text.fillna("@null@").tolist() == want.clean_text.fillna("@null@").tolist()
    for name, _p, _r in PII_PATTERNS:
        assert got[f"n_{name}"].tolist() == want[f"n_{name}"].tolist(), name

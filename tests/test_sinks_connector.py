"""Serving-layer connector seam: replay idempotency, streaming
delivery, and the offline-testable ClickHouse wire shape."""

from __future__ import annotations

import json
import os
import urllib.parse

import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.schema.loader import load_schema
from gapless_deribit_clickhouse_spark.sinks import (
    ClickHouseConnectorConfig,
    ClickHouseHTTPConnector,
    ParquetServingConnector,
    write_stream_to_connector,
)


def test_parquet_connector_replayed_batch_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "serving")
    conn = ParquetServingConnector(out)
    schema = load_schema("options_trades")
    conn.ensure_table(schema)
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    conn.write_batch(df, batch_id=0)
    conn.write_batch(df, batch_id=1)
    # crash-replay of epoch 1 must overwrite itself, not double-append
    conn.write_batch(df, batch_id=1)
    got = spark.read.parquet(out)
    assert got.count() == 200
    assert conn.written_batches() == [0, 1]
    per_batch = {
        r.batch_id: r.n
        for r in got.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_batch == {0: 100, 1: 100}


def test_stream_to_connector_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(50).select(
        F.col("id"), F.col("id").cast("double").alias("v")
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, v double").parquet(src)
    conn = ParquetServingConnector(str(tmp_path / "serving"))
    q = write_stream_to_connector(
        stream, conn, checkpoint_path=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    first = spark.read.parquet(conn.output_path).count()
    assert first == 50
    # restart from the same checkpoint with no new data: no re-delivery
    q2 = write_stream_to_connector(
        stream, conn, checkpoint_path=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(conn.output_path).count() == 50


def test_clickhouse_ddl_from_ssot():
    schema = load_schema("options_trades")
    ddl = ClickHouseHTTPConnector().ddl_statement(schema)
    assert "CREATE TABLE IF NOT EXISTS default.options_trades" in ddl
    engine_line = ddl.split("ReplacingMergeTree", 1)[1].split("\n")[0]
    if schema.dedup_version:
        # ClickHouse accepts ONE version column; a second arg means
        # is_deleted (must be UInt8) and would reject the DDL
        assert engine_line == f"({schema.dedup_version[0]})"
    for k in schema.dedup_key:
        assert k in ddl.split("ORDER BY", 1)[1]
    assert "timestamp DateTime64(6, 'UTC')" in ddl
    # derived partition columns must be declared or PARTITION BY fails
    for p in schema.partition_by:
        col_block = ddl.split("(", 1)[1].split(") ENGINE", 1)[0]
        assert f"  {p} " in col_block, p
    # nullable non-key columns must be Nullable so JSON nulls stay NULL
    key_cols = set(schema.dedup_key) | set(schema.partition_by)
    for c in schema.columns:
        if c.nullable and c.name not in schema.required and c.name not in key_cols:
            assert f"  {c.name} Nullable(" in ddl, c.name
        else:
            assert f"  {c.name} Nullable(" not in ddl, c.name


def test_jsoneachrow_serializes_dates_and_timestamps():
    import datetime as dt

    from pyspark.sql import Row

    from gapless_deribit_clickhouse_spark.sinks.connector import (
        rows_to_jsoneachrow,
    )

    rows = [
        Row(
            ts=dt.datetime(2024, 3, 7, 12, 30, 15, 123456),
            d=dt.date(2024, 3, 7),
            b=b"\x01\xff",
            x=None,
        )
    ]
    line = json.loads(rows_to_jsoneachrow(rows, ["ts", "d", "b", "x"]).decode())
    assert line["ts"] == "2024-03-07 12:30:15.123456"
    assert line["d"] == "2024-03-07"  # date.isoformat takes no sep
    assert line["x"] is None and len(line["b"]) == 2


def test_clickhouse_insert_url_carries_dedup_settings():
    conn = ClickHouseHTTPConnector(
        ClickHouseConnectorConfig(url="http://ch:8123", database="md")
    )
    url = conn.insert_url("options_trades")
    q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
    assert q["query"] == "INSERT INTO md.options_trades FORMAT JSONEachRow"
    assert q["insert_deduplicate"] == "1"


def _recording_transport(dirpath: str):
    """Transport closure that appends each POST body to a shared
    directory — cloudpickle ships it by value, so it works from
    executors in local mode (a test-module class would pickle by
    reference and fail to import on the worker)."""

    def transport(url: str, body: bytes, headers: dict) -> int:
        import hashlib
        import os as _os

        _os.makedirs(dirpath, exist_ok=True)
        fname = f"post_{hashlib.md5(body).hexdigest()}.ndjson"
        with open(_os.path.join(dirpath, fname), "wb") as f:
            f.write(body)
        return 200

    return transport


def test_clickhouse_write_batch_posts_all_rows(spark, tmp_path):
    rec_dir = str(tmp_path / "posts")
    conn = ClickHouseHTTPConnector(transport=_recording_transport(rec_dir))
    schema = load_schema("options_trades")
    conn.ensure_table(schema)  # posts the DDL too
    df = spark.range(20).select(
        F.col("id").alias("trade_id"),
        F.lit("BTC").alias("underlying"),
        (F.col("id") * 1.5).alias("price"),
        F.lit("2024-03-07 12:00:00").cast("timestamp").alias("timestamp"),
    )
    conn.write_batch(df, batch_id=0)
    rows = []
    for f in os.listdir(rec_dir):
        with open(os.path.join(rec_dir, f), "rb") as fh:
            content = fh.read().decode()
        if content.startswith("CREATE TABLE"):
            continue
        rows += [json.loads(line) for line in content.splitlines() if line]
    assert len(rows) == 20
    assert {r["trade_id"] for r in rows} == set(range(20))
    assert all(r["underlying"] == "BTC" for r in rows)
    # derived partition column rides along, matching the DDL
    assert all(r["trade_month"] == "202403" for r in rows)


def test_clickhouse_write_batch_rejects_underivable_partition(spark):
    """A projected batch with neither the partition column nor its
    derivation source must fail LOUDLY — a silent insert would land
    every row in the '' default partition (r4 review finding)."""
    conn = ClickHouseHTTPConnector(transport=lambda u, b, h: 200)
    conn.ensure_table(load_schema("options_trades"))
    df = spark.range(3).select(F.col("id").alias("trade_id"))
    with pytest.raises(ValueError, match="partition column"):
        conn.write_batch(df, batch_id=0)


def test_write_jsonl_shards_deterministic(spark, tmp_path):
    """Sharded JSONL export: row-count sizing, byte-identical shards
    across runs regardless of input partitioning, gzip files readable
    back with nothing lost."""
    import glob
    import gzip

    from gapless_deribit_clickhouse_spark.sinks import write_jsonl_shards

    df = spark.range(250).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    stats = write_jsonl_shards(df, out_a, "doc_id", rows_per_shard=100)
    assert stats == {"n_rows": 250, "n_shards": 3}
    write_jsonl_shards(df.repartition(17), out_b, "doc_id", rows_per_shard=100)

    def shard_bytes(root):
        shards = {}
        for f in sorted(glob.glob(f"{root}/shard=*/*.json.gz")):
            shard = f.split("shard=")[1].split("/")[0]
            shards.setdefault(shard, b"")
            with gzip.open(f, "rb") as fh:
                shards[shard] += fh.read()
        return shards

    a, b = shard_bytes(out_a), shard_bytes(out_b)
    assert set(a) == {"0", "1", "2"} and a == b
    back = spark.read.json(out_a)
    assert back.count() == 250
    assert back.select("doc_id").distinct().count() == 250
    with pytest.raises(ValueError):
        write_jsonl_shards(df, str(tmp_path / "c"), "doc_id", rows_per_shard=0)


def test_write_batch_requires_ensure_table(spark):
    conn = ClickHouseHTTPConnector(transport=lambda u, b, h: 200)
    with pytest.raises(RuntimeError):
        conn.write_batch(spark.range(1), batch_id=0)


# --- gated live e2e (VERDICT r4 #8): runs only when the environment
# grows a ClickHouse binary, skips cleanly otherwise — the reference's
# e2e conftest pattern (/root/reference/tests/e2e/conftest.py) ---
import shutil as _shutil

_CH_BIN = _shutil.which("clickhouse") or _shutil.which("clickhouse-server")


@pytest.mark.skipif(_CH_BIN is None, reason="no ClickHouse binary in environment")
def test_clickhouse_live_roundtrip(spark, tmp_path):
    """ensure_table + write_batch + replay dedup against a REAL local
    server: the DDL must be accepted, every row must land, and a
    replayed epoch (byte-identical single-partition block +
    insert_deduplicate) must be dropped server-side, not doubled."""
    import socket
    import subprocess
    import time
    import urllib.parse  # explicit: urlencode below must not rely on
    import urllib.request  # the request import's side effect (ADVICE r5)

    def free_port() -> int:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    http_port, tcp_port = free_port(), free_port()
    data = tmp_path / "ch"
    data.mkdir()
    argv0 = (
        [_CH_BIN]
        if _CH_BIN.endswith("clickhouse-server")
        else [_CH_BIN, "server"]
    )
    proc = subprocess.Popen(
        argv0
        + [
            "--",
            f"--path={data}/",
            f"--http_port={http_port}",
            f"--tcp_port={tcp_port}",
            "--listen_host=127.0.0.1",
        ],
        cwd=str(data),
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    url = f"http://127.0.0.1:{http_port}"
    try:
        for _ in range(120):
            try:
                with urllib.request.urlopen(f"{url}/ping", timeout=1) as r:
                    if r.status == 200:
                        break
            except Exception:  # noqa: BLE001 — still booting
                time.sleep(0.5)
        else:
            pytest.skip("ClickHouse server did not come up in 60s")

        conn = ClickHouseHTTPConnector(ClickHouseConnectorConfig(url=url))
        schema = load_schema("options_trades")
        conn.ensure_table(schema)
        df = (
            spark.range(20)
            .select(
                F.col("id").alias("trade_id"),
                F.lit("BTC").alias("underlying"),
                (F.col("id") * 1.5).alias("price"),
                F.lit("2024-03-07 12:00:00").cast("timestamp").alias("timestamp"),
            )
            # one deterministic sorted partition -> the replayed POST
            # body is byte-identical, which is exactly what the
            # insert_deduplicate block-checksum window keys on
            .repartition(1)
            .sortWithinPartitions("trade_id")
        )
        conn.write_batch(df, batch_id=0)
        conn.write_batch(df, batch_id=0)  # crash-replay of the epoch

        q = urllib.parse.urlencode(
            {
                "query": "SELECT count() FROM default.options_trades",
                "user": "default",
            }
        )
        with urllib.request.urlopen(f"{url}/?{q}", timeout=10) as r:
            n = int(r.read().decode().strip())
        assert n == 20, "replayed epoch must dedupe server-side, not double"
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()

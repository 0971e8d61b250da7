"""Collector (pagination/continuity/idempotency/resume) + Structured
Streaming (watermark dedup, windowed bars, exactly-once sink)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.exceptions import SourceError
from gapless_deribit_clickhouse_spark.sources.rest_collector import (
    SyntheticTradePages,
    batch_token,
    collect_trades,
    validate_page_continuity,
)
from gapless_deribit_clickhouse_spark.streaming.ingest import (
    dedup_stream,
    read_trade_stream,
    streaming_gap_monitor,
    streaming_ohlc,
    write_stream_idempotent,
)

HOUR_MS = 3600 * 1000
T0 = 1_700_000_000_000


# --- S3: continuity validation matrix (reference tests/unit/
#     test_pagination_validation.py:9-118) ---
def _page(ids_ts):
    return [{"trade_id": i, "timestamp": t} for i, t in ids_ts]


def test_continuity_ok():
    ok, w = validate_page_continuity(
        _page([("b", 2000), ("a", 1500)]), _page([("z", 1400), ("y", 900)])
    )
    assert ok and not w


def test_continuity_gap_flagged():
    ok, w = validate_page_continuity(
        _page([("b", 10_000)]), _page([("a", 1000)])
    )
    assert not ok and "gap" in w[0]


def test_continuity_duplicates_flagged():
    ok, w = validate_page_continuity(
        _page([("x", 2000)]), _page([("x", 1999)])
    )
    assert not ok and "duplicate" in w[0]


def test_continuity_custom_threshold():
    ok, _ = validate_page_continuity(
        _page([("b", 5000)]), _page([("a", 1000)]), gap_threshold_ms=10_000
    )
    assert ok


def test_continuity_empty_pages():
    assert validate_page_continuity([], _page([("a", 1)]))[0]


def test_batch_token_stable():
    assert batch_token("BTC", 1, 2, 3) == batch_token("BTC", 1, 2, 3)
    assert batch_token("BTC", 1, 2, 3) != batch_token("BTC", 1, 2, 4)
    assert len(batch_token("BTC", 1, 2, 3)) == 32


# --- S1/S2/S5/S7: cursor backfill, idempotent writes, resume ---
def test_collect_trades_complete_and_idempotent(spark, tmp_path):
    src = SyntheticTradePages(step_ms=1000)
    out = str(tmp_path / "trades")
    stats = collect_trades(
        spark, src, T0, T0 + 2 * HOUR_MS, out, checkpoint_dir=str(tmp_path / "ckpt"),
        batch_rows=3000, page_size=500,
    )
    n_expected = 2 * 3600 + 1  # one per second inclusive
    assert stats["total_collected"] == n_expected
    df = spark.read.parquet(out)
    assert df.count() == n_expected
    assert df.select("trade_id").distinct().count() == n_expected
    # replay the full job: partitions overwritten, no duplicates
    stats2 = collect_trades(
        spark, src, T0, T0 + 2 * HOUR_MS, out, checkpoint_dir=str(tmp_path / "ckpt"),
        batch_rows=3000, page_size=500,
    )
    assert spark.read.parquet(out).count() == n_expected
    assert stats2["total_collected"] == n_expected


def test_collect_trades_resume_after_crash(spark, tmp_path):
    src = SyntheticTradePages(step_ms=1000)
    out = str(tmp_path / "trades")
    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(SourceError):
        collect_trades(
            spark, src, T0, T0 + 2 * HOUR_MS, out, checkpoint_dir=ckpt,
            batch_rows=1000, page_size=500, max_pages=5,
        )
    # resume from checkpoint completes without duplicates
    collect_trades(
        spark, src, T0, T0 + 2 * HOUR_MS, out, checkpoint_dir=ckpt,
        batch_rows=1000, page_size=500,
    )
    df = spark.read.parquet(out)
    n_expected = 2 * 3600 + 1
    assert df.select("trade_id").distinct().count() == n_expected
    assert df.count() == n_expected


# --- §2.9: streaming with watermark dedup + idempotent sink ---
def _write_pages(spark, path, with_dup=False):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(240):
        rows.append(
            (f"T{i:05d}", base + dt.timedelta(seconds=30 * i), 0.5 + (i % 10) / 100.0, 1.0)
        )
    if with_dup:
        rows += rows[100:110]  # exact duplicate ids within watermark
    df = spark.createDataFrame(
        rows, "trade_id string, timestamp timestamp, iv double, amount double"
    )
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return df


def test_stream_dedup_and_idempotent_sink(spark, tmp_path):
    src_path = str(tmp_path / "pages")
    _write_pages(spark, src_path, with_dup=True)
    schema = spark.read.parquet(src_path).schema
    stream = read_trade_stream(spark, src_path, schema)
    deduped = dedup_stream(stream, watermark_delay="30 minutes")
    q = write_stream_idempotent(
        deduped, str(tmp_path / "out"), str(tmp_path / "sckpt")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 240  # duplicates dropped
    assert out.select("trade_id").distinct().count() == 240


def test_streaming_gap_monitor_stateful(spark, tmp_path):
    """Gaps are found both inside a micro-batch and ACROSS batches
    (state carries last_ts): two files forced into separate batches
    via maxFilesPerTrigger=1."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    mk = lambda secs, und: [  # noqa: E731
        (f"{und}{s}", und, base + dt.timedelta(seconds=s)) for s in secs
    ]
    ddl = "trade_id string, underlying string, timestamp timestamp"
    src = str(tmp_path / "gap_pages")
    # file 1: BTC steady except one 2h in-batch hole; ETH steady
    f1 = mk([0, 60, 120, 120 + 7200, 120 + 7260], "BTC") + mk(
        [0, 60, 120], "ETH"
    )
    # file 2: BTC resumes 3h after file 1's last event -> cross-batch gap
    last_btc = 120 + 7260
    f2 = mk([last_btc + 3 * 3600, last_btc + 3 * 3600 + 60], "BTC")
    spark.createDataFrame(f1, ddl).coalesce(1).write.parquet(src + "/p1")
    spark.createDataFrame(f2, ddl).coalesce(1).write.parquet(src + "/p2")

    stream = (
        spark.readStream.schema(spark.read.parquet(src + "/p1").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/p*")
    )
    gaps = streaming_gap_monitor(stream, threshold_hours=1.0)
    q = (
        gaps.writeStream.outputMode("append")
        .format("memory")
        .queryName("gaps_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT * FROM gaps_out ORDER BY underlying, gap_start"
    ).toPandas()
    assert list(got.underlying) == ["BTC", "BTC"]  # ETH has no gap
    assert got.gap_hours.round(3).tolist() == [2.0, 3.0]
    assert (got.gap_end > got.gap_start).all()


def test_streaming_ohlc_windows(spark, tmp_path):
    src_path = str(tmp_path / "pages2")
    _write_pages(spark, src_path)
    schema = spark.read.parquet(src_path).schema
    stream = read_trade_stream(spark, src_path, schema)
    bars = streaming_ohlc(stream, window="15 minutes", watermark_delay="1 minute")
    q = (
        bars.writeStream.outputMode("append")
        .format("memory")
        .queryName("bars_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM bars_out").toPandas()
    # 240×30s = 2h -> 8 windows; append emits only watermark-closed ones
    assert len(got) >= 7
    assert (got.high >= got.low).all()
    assert (got.n_obs == 30).all()


def test_streaming_ohlc_drops_data_later_than_watermark(spark, tmp_path):
    """Late-data contract: an event arriving AFTER the watermark passed
    its window must be dropped — the closed bar is never re-emitted or
    duplicated (append-mode correctness under out-of-order arrival)."""
    src = str(tmp_path / "late_src")
    base = dt.datetime(2024, 1, 1)
    schema = "timestamp timestamp, iv double, amount double"

    # batch 1: one full 15-min window (3 obs) + a sentinel 2h ahead
    # that drags the watermark far past the window's end
    rows1 = [
        (base + dt.timedelta(minutes=m), 0.5 + m / 100, 1.0) for m in (1, 5, 9)
    ] + [(base + dt.timedelta(hours=2), 0.9, 1.0)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    bars = streaming_ohlc(
        stream, ts_col="timestamp", window="15 minutes", watermark_delay="1 minute"
    )
    q = (
        bars.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("SELECT * FROM late_out").toPandas()
        closed = first[first.bucket_ts == base]
        assert len(closed) == 1 and closed.n_obs.iloc[0] == 3

        # batch 2: an event inside the ALREADY-CLOSED first window —
        # hours older than the current watermark
        rows2 = [(base + dt.timedelta(minutes=3), 0.99, 1.0)]
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        second = spark.sql("SELECT * FROM late_out").toPandas()
    finally:
        q.stop()

    # the late row must not resurrect the closed window: no duplicate
    # bar for it, original n_obs stands
    closed2 = second[second.bucket_ts == base]
    assert len(closed2) == 1 and closed2.n_obs.iloc[0] == 3


def test_streaming_sessionize_merging_windows(spark, tmp_path):
    import datetime as dt

    from gapless_deribit_clickhouse_spark.operators.sessionize import (
        streaming_sessionize,
    )

    src_path = str(tmp_path / "events_src")
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: burst, 40-min silence, second burst; user 2: one burst
        *[(1, base + dt.timedelta(minutes=m)) for m in (0, 5, 10)],
        *[(1, base + dt.timedelta(minutes=m)) for m in (50, 55)],
        *[(2, base + dt.timedelta(minutes=m)) for m in (0, 20)],
        # late sentinel far ahead so the watermark closes all sessions
        (99, base + dt.timedelta(hours=6)),
    ]
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1).write.parquet(src_path)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp").parquet(src_path)
    )
    sessions = streaming_sessionize(
        stream, gap="30 minutes", watermark_delay="1 minute"
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM sess_out")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    u1 = got[got.user_id == 1]
    assert u1.n_events.tolist() == [3, 2]  # gap split the stream
    assert got[got.user_id == 2].n_events.tolist() == [2]


def test_streaming_enrich_spot_stream_static_parity(spark, trades_df, spot_pdf, tmp_path):
    """Stream-static broadcast enrichment: because enrich_with_spot is
    pure DataFrame algebra, the SAME operator runs unchanged over a
    readStream source — Structured Streaming plans the broadcast spot
    dimension as a stream-static left join per micro-batch. The
    streaming output must equal the batch output row-for-row (the
    declarative-plan reuse the Spark-first design buys; reference
    spot_provider.py performs this lookup only in batch)."""
    from gapless_deribit_clickhouse_spark.features.spot_provider import (
        enrich_with_spot,
    )

    src = str(tmp_path / "enrich_src")
    trades_df.write.parquet(src)
    spot = spark.createDataFrame(spot_pdf)

    batch = enrich_with_spot(spark.read.parquet(src), spot)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    q = (
        enrich_with_spot(stream, spot)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cols = ["trade_id", "binance_spot", "spot_price", "moneyness"]
    got = (
        spark.sql("SELECT * FROM enrich_out")
        .select(*cols)
        .toPandas()
        .sort_values("trade_id")
        .reset_index(drop=True)
    )
    want = batch.select(*cols).toPandas().sort_values("trade_id").reset_index(drop=True)
    assert len(got) == len(want) == trades_df.count()
    pd.testing.assert_frame_equal(got, want)


def test_stream_dedup_ingest_cross_batch(spark, tmp_path):
    """Streaming corpus ingest against the persisted dedup index:
    batch 1's survivors are appended to the index before batch 2 runs,
    so a batch-2 near-duplicate of a batch-1 document is dropped —
    cross-batch dedup with zero corpus text touched per batch."""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        build_dedup_index,
    )
    from gapless_deribit_clickhouse_spark.streaming.corpus_ingest import (
        stream_dedup_ingest,
    )

    def sent(tag: str) -> str:
        return " ".join(f"{tag}tok{j}" for j in range(12))

    corpus = spark.createDataFrame(
        [(i, sent(f"corp{i}")) for i in range(5)], ["doc_id", "text"]
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, threshold=0.8)

    # two source files -> two serial micro-batches (maxFilesPerTrigger=1)
    src = str(tmp_path / "src")
    b1 = [(100, sent("newA")), (101, sent("corp2"))]           # 101 = corpus dup
    b2 = [(200, sent("newA") + " tail"), (201, sent("newB"))]  # 200 = near-dup of 100
    spark.createDataFrame(b1, ["doc_id", "text"]).coalesce(1).write.parquet(
        src + "/f1"
    )
    spark.createDataFrame(b2, ["doc_id", "text"]).coalesce(1).write.parquet(
        src + "/f2"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = str(tmp_path / "out")
    q = stream_dedup_ingest(
        stream, idx, out, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)

    landed = spark.read.parquet(out).toPandas()
    assert set(landed.doc_id) == {100, 201}
    # exactly one copy each, in distinct batch partitions
    assert landed.doc_id.nunique() == len(landed) == 2
    # the index grew by the survivors: re-streaming the same data in
    # a fresh query drops everything (every doc now indexed)
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out2 = str(tmp_path / "out2")
    q2 = stream_dedup_ingest(
        stream2, idx, out2, str(tmp_path / "ckpt2"), trigger_once=True
    )
    q2.awaitTermination(120)
    import os

    survivors2 = (
        spark.read.parquet(out2).toPandas()
        if any(f.endswith(".parquet") for _r, _d, fs in os.walk(out2) for f in fs)
        else []
    )
    assert len(survivors2) == 0


def test_streaming_mergeable_rollup_state_versions(spark, tmp_path):
    """Materialized-view loop: per-batch partial rollup merged into a
    versioned state table. The newest finalized version must equal the
    one-pass batch recompute, and replaying an epoch's sink call must
    reproduce (not double-count) its version — the exactly-once
    contract versioned state buys on plain parquet."""
    import numpy as np

    from gapless_deribit_clickhouse_spark.operators.merge_rollup import (
        finalize_rollup,
        partial_rollup,
    )
    from gapless_deribit_clickhouse_spark.streaming.materialized import (
        read_rollup_state,
        rollup_state_sink,
        streaming_mergeable_rollup,
    )

    rng = np.random.RandomState(7)
    mk = lambda n, seed_off: [  # noqa: E731
        (["a", "b", "c"][i % 3], float(rng.uniform(0, 100)) + seed_off)
        for i in range(n)
    ]
    ddl = "k string, v double"
    src = str(tmp_path / "mv_src")
    rows1, rows2 = mk(60, 0.0), mk(45, 5.0)
    spark.createDataFrame(rows1, ddl).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(rows2, ddl).coalesce(1).write.parquet(src + "/f2")

    state = str(tmp_path / "mv_state")
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    q = streaming_mergeable_rollup(
        stream, ["k"], "v", state, str(tmp_path / "mv_ckpt")
    )
    q.awaitTermination(120)

    # two state versions landed; the newest equals the batch recompute
    versions = sorted(
        spark.read.parquet(state).select("batch_id").distinct().toPandas().batch_id
    )
    assert versions == [0, 1]
    got = (
        read_rollup_state(spark, state, ["k"])
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    whole = spark.createDataFrame(rows1 + rows2, ddl)
    want = (
        finalize_rollup(partial_rollup(whole, ["k"], "v"), ["k"])
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # replay epoch 1: the sink re-reads version 0 (not its own output)
    # and overwrites version 1 with identical content
    rollup_state_sink(["k"], "v", state)(
        spark.createDataFrame(rows2, ddl), 1
    )
    again = (
        read_rollup_state(spark, state, ["k"])
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(again, want)


def test_streaming_dedup_then_ohlc_chained(spark, tmp_path):
    """TWO stateful operators in ONE streaming query — watermarked
    dedup feeding the watermarked tumbling-window OHLC — the chained
    shape a production pipeline runs (dedup at ingest, bars on the
    deduped feed) instead of landing an intermediate table. The
    duplicate rows must NOT inflate n_obs or volume in any bar."""
    src_path = str(tmp_path / "chain_src")
    _write_pages(spark, src_path, with_dup=True)
    schema = spark.read.parquet(src_path).schema
    stream = read_trade_stream(spark, src_path, schema)
    deduped = dedup_stream(stream, watermark_delay="30 minutes")
    bars = streaming_ohlc(deduped, window="15 minutes", watermark_delay=None)
    q = (
        bars.writeStream.outputMode("append")
        .format("memory")
        .queryName("chain_bars")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM chain_bars").toPandas()
    # 240 unique obs over 2h at 30s cadence -> closed 15-min bars
    # carry exactly 30 obs each despite the 10 duplicated trade_ids
    assert len(got) >= 4
    assert (got.n_obs == 30).all()
    assert (got.volume == 30.0).all()


def test_streaming_ewma_state_carries_across_batches(spark, tmp_path):
    """Streaming EWMA == batch fold over the concatenated series: the
    first batch seeds and folds, the second folds ON TOP of the stored
    state, and an out-of-order row at/behind the high-water mark is
    counted late and excluded from the recurrence."""
    import datetime as dtm

    from gapless_deribit_clickhouse_spark.streaming.ingest import streaming_ewma

    def ts(s):
        return dtm.datetime(2024, 1, 1, 12, 0, 0) + dtm.timedelta(seconds=s)

    schema = "user_id long, ts timestamp, value double"
    src = str(tmp_path / "ewma_src")
    b1 = [(1, ts(0), 10.0), (1, ts(30), 20.0), (2, ts(0), 5.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_ewma(stream, decay=0.9)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_live")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one new obs per user + one LATE duplicate timestamp
        b2 = [(1, ts(60), 30.0), (1, ts(30), 999.0), (2, ts(45), 7.0)]
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        got = spark.sql(
            "SELECT * FROM ewma_live"
        ).toPandas()
    finally:
        q.stop()

    # last update per user is the final state
    last = got.groupby("user_id").last()
    # user 1: seed 10 -> 10*.9+20*.1 = 11 -> 11*.9+30*.1 = 12.9
    assert last.loc[1, "ewma_value"] == pytest.approx(12.9)
    assert last.loc[1, "n_events"] == 3
    assert last.loc[1, "n_late"] == 1  # the ts(30) replay
    # user 2: seed 5 -> 5*.9 + 7*.1 = 5.2
    assert last.loc[2, "ewma_value"] == pytest.approx(5.2)
    assert last.loc[2, "n_events"] == 2


def test_streaming_ewma_key_type_follows_input(spark, tmp_path):
    """ADVICE r6: the output key field carries the INPUT key type (the
    old code hardcoded LongType, breaking string/symbol keys). Plan
    construction only — no query start needed to check the schema."""
    from pyspark.sql import types as T

    from gapless_deribit_clickhouse_spark.streaming.ingest import streaming_ewma

    schema = "user_id string, ts timestamp, value double"
    src = str(tmp_path / "ewma_str_src")
    spark.createDataFrame(
        [("BTC", dt.datetime(2024, 1, 1), 1.0)], schema
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_ewma(stream)
    assert out.schema["user_id"].dataType == T.StringType()


def test_streaming_ewma_string_key_end_to_end(spark, tmp_path):
    """The string-key fold actually runs (the old hardcoded schema
    produced nulls/Arrow errors at runtime for non-long keys)."""
    from gapless_deribit_clickhouse_spark.streaming.ingest import streaming_ewma

    schema = "user_id string, ts timestamp, value double"
    src = str(tmp_path / "ewma_str_e2e")
    rows = [
        ("BTC", dt.datetime(2024, 1, 1, 12, 0, 0), 10.0),
        ("BTC", dt.datetime(2024, 1, 1, 12, 0, 30), 20.0),
        ("ETH", dt.datetime(2024, 1, 1, 12, 0, 0), 5.0),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_ewma(stream, decay=0.9)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_str_live")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: r
            for r in spark.sql("SELECT * FROM ewma_str_live").collect()
        }
    finally:
        q.stop()
    assert got["BTC"]["ewma_value"] == pytest.approx(10.0 * 0.9 + 20.0 * 0.1)
    assert got["ETH"]["ewma_value"] == pytest.approx(5.0)


def test_rollup_state_corrupt_state_fails_not_truncates(spark, tmp_path):
    """ADVICE r6: only a MISSING state directory means 'first batch'.
    Any other read error must raise (fail the micro-batch for retry),
    never silently rebuild state from the current batch alone."""
    from pyspark.errors import AnalysisException

    from gapless_deribit_clickhouse_spark.streaming.materialized import (
        _latest_version_before,
    )

    missing = str(tmp_path / "nope")
    assert _latest_version_before(spark, missing, batch_id=3) is None

    # a directory that EXISTS but holds no readable parquet -> the
    # reader raises (a JVM RuntimeException here, AnalysisException
    # for schema-inference failures elsewhere) and the sink must let
    # it propagate rather than return None ("first batch")
    corrupt = tmp_path / "corrupt_state"
    corrupt.mkdir()
    (corrupt / "garbage.txt").write_text("not parquet")
    with pytest.raises(Exception) as exc_info:
        _latest_version_before(spark, str(corrupt), batch_id=3)
    assert exc_info.value is not None

    # the classifier itself: only missing-path AnalysisExceptions are
    # treated as first-batch
    from gapless_deribit_clickhouse_spark.streaming.materialized import (
        _is_missing_path,
    )

    assert _is_missing_path(AnalysisException("[PATH_NOT_FOUND] Path does not exist: /x"))
    assert not _is_missing_path(AnalysisException("[UNABLE_TO_INFER_SCHEMA] bad"))

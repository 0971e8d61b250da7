"""Remaining-surface bindings: portfolio/bucket Greeks (A13/A14),
smile metrics, spot coverage (A16), EGARCH grouped fit (rows-only —
iterative MLE is not SQL-expressible), and the multimodal
``mapInPandas`` feature extraction exercised over ``documents`` text
payloads (oracle-checked on the byte-level columns DuckDB can also
compute: payload size + sha256 prefix)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.bindings.common import (
    SPOT_CTE,
    TRADES_CTE,
    bucket_sql,
    spot_view,
    trades_view,
)
from gapless_deribit_clickhouse_spark.bindings.features_ops import (
    MONEYNESS_PIVOT_SQL,
    _with_moneyness,
)
from gapless_deribit_clickhouse_spark.core.tables import load_table
from gapless_deribit_clickhouse_spark.features.egarch import egarch_params_by_group
from gapless_deribit_clickhouse_spark.features.moneyness import (
    aggregate_by_moneyness,
    compute_smile_metrics,
    moneyness_bucket_col,
)
from gapless_deribit_clickhouse_spark.features.spot_provider import (
    enrich_with_spot,
    spot_coverage,
)
from gapless_deribit_clickhouse_spark.functions.blackscholes import (
    greeks_by_bucket,
    greeks_sql_exprs,
    portfolio_greeks,
    with_greeks,
)
from gapless_deribit_clickhouse_spark.pipelines.multimodal import fake_feature_extract

YEAR_SECONDS = 365.25 * 24 * 3600.0


def _greeked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallel=True: the CDF expression trees are the dominant per-row
    # cost; a single-split scan runs them on one core (optimization r12)
    return with_greeks(
        trades_view(spark, sf_dir, parallel=True),
        spot_col="index_price",
        strike_col="strike",
        ts_col="timestamp",
        expiry_col="expiry",
        iv_col="iv",
        price_col="price",
        option_type_col="option_type",
    )


_GREEKS_BASE = f"""
trades AS ({TRADES_CTE}),
base AS (
  SELECT *,
         ((epoch(CAST(expiry AS TIMESTAMP)) - epoch("timestamp")) / {YEAR_SECONDS!r}) AS t_years
  FROM trades)
"""


def _greek_cols_sql() -> str:
    exprs = greeks_sql_exprs(
        spot="index_price", strike="strike", t_years="t_years",
        iv="iv", price="price", option_type="option_type",
    )
    return ",\n       ".join(f"{sql} AS {name}" for name, sql in exprs.items())


# --- A13: portfolio Greeks per underlying ---
def portfolio_greeks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return portfolio_greeks(
        _greeked(spark, sf_dir),
        amount_col="amount",
        spot_col="index_price",
        group_cols=("underlying",),
    ).withColumnRenamed("underlying", "grp")


PORTFOLIO_GREEKS_SQL = f"""
WITH {_GREEKS_BASE},
g AS (SELECT underlying AS grp, amount, index_price, {_greek_cols_sql()} FROM base)
SELECT grp,
       sum(adjusted_delta * amount) AS portfolio_delta,
       sum(gamma * amount) AS portfolio_gamma,
       sum(vega * amount) AS portfolio_vega,
       sum(theta * amount) AS portfolio_theta,
       quantile_cont(index_price, 0.5) AS median_spot
FROM g GROUP BY grp
"""


# --- A14: Greek stats per moneyness bucket ---
def greeks_by_bucket_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _greeked(spark, sf_dir).filter(F.col("index_price").isNotNull())
    df = df.withColumn(
        "bucket", moneyness_bucket_col(F.col("strike") / F.col("index_price"))
    )
    return greeks_by_bucket(df, "bucket")


_BUCKET_CASE = """
CASE WHEN strike / index_price < 0.90 THEN 'deep_otm_put'
     WHEN strike / index_price < 0.95 THEN 'otm_put'
     WHEN strike / index_price < 1.05 THEN 'atm'
     WHEN strike / index_price < 1.10 THEN 'otm_call'
     ELSE 'deep_otm_call' END
"""

GREEKS_BY_BUCKET_SQL = f"""
WITH {_GREEKS_BASE},
g AS (
  SELECT {_BUCKET_CASE} AS bucket, {_greek_cols_sql()}
  FROM base WHERE index_price IS NOT NULL)
SELECT bucket,
       avg(delta) AS delta_mean, stddev_pop(delta) AS delta_std, count(delta) AS delta_count,
       avg(gamma) AS gamma_mean, stddev_pop(gamma) AS gamma_std, count(gamma) AS gamma_count,
       avg(vega) AS vega_mean, stddev_pop(vega) AS vega_std, count(vega) AS vega_count,
       avg(theta) AS theta_mean, stddev_pop(theta) AS theta_std, count(theta) AS theta_count,
       avg(adjusted_delta) AS adjusted_delta_mean,
       stddev_pop(adjusted_delta) AS adjusted_delta_std,
       count(adjusted_delta) AS adjusted_delta_count
FROM g GROUP BY bucket
"""


# --- smile metrics from the pivoted moneyness frame ---
def smile_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = aggregate_by_moneyness(_with_moneyness(spark, sf_dir), pivot=True)
    return compute_smile_metrics(wide)


SMILE_METRICS_SQL = f"""
WITH pivoted AS ({MONEYNESS_PIVOT_SQL})
SELECT ts, put_call_skew, smile_curvature, wing_ratio,
       atm_iv_std / nullif(atm_iv, 0) AS atm_iv_cv
FROM pivoted
"""


# --- A16: spot coverage rates after enrichment ---
def spot_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    enriched = enrich_with_spot(trades_view(spark, sf_dir), spot_view(spark, sf_dir))
    return spot_coverage(enriched, index_price_col="index_price")


SPOT_COVERAGE_SQL = f"""
WITH trades AS ({TRADES_CTE}),
spot AS ({SPOT_CTE}),
e AS (
  SELECT t.index_price, s.close AS binance_spot,
         coalesce(t.index_price, s.close) AS spot_price
  FROM trades t
  LEFT JOIN spot s
    ON s.symbol = t.underlying || 'USDT'
   AND s."timestamp" = {bucket_sql('t."timestamp"')})
SELECT count(*) AS total_rows,
       CAST(count(CASE WHEN index_price IS NOT NULL THEN 1 END) AS DOUBLE) / count(*) AS index_price_rate,
       CAST(count(CASE WHEN index_price IS NULL AND binance_spot IS NOT NULL THEN 1 END) AS DOUBLE) / count(*) AS fallback_rate,
       CAST(count(CASE WHEN spot_price IS NOT NULL THEN 1 END) AS DOUBLE) / count(*) AS spot_coverage_rate
FROM e
"""


# --- EGARCH grouped fit: rows-only (iterative MLE, SURVEY §2.8) ---
def egarch_params_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type EGARCH(1,1) on an hourly count series re-indexed
    to a strict grid (rank * 1h), so the regular-spacing guard holds
    regardless of gaps in the raw events."""
    from gapless_deribit_clickhouse_spark.functions.timeutils import time_bucket

    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type", time_bucket(F.col("ts"), 3600).alias("bts")
    ).agg((F.count(F.lit(1)) + F.col("event_type").isNotNull().cast("int")).cast("double").alias("v"))
    w = Window.partitionBy("event_type").orderBy("bts")
    series = series.withColumn(
        "ts", F.timestamp_seconds(F.row_number().over(w).cast("long") * 3600)
    )
    return egarch_params_by_group(
        series, keys=["event_type"], ts_col="ts", value_col="v"
    )


# --- EGARCH input series: the SQL-expressible half of the fit ---
def egarch_inputs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact log-return series ``fit_egarch`` consumes — hourly
    count series (+1 laplace bump), strict re-indexed grid, r =
    100 * diff(ln v) — as an oracle-checked projection.  This moves
    the one remaining rows-only component's boundary: everything up
    to the iterative MLE (grid construction, re-indexing, the return
    transform) is now value-checked cross-engine; only the
    Nelder-Mead optimization itself stays pinned by the committed
    golden fixtures (the power-of-10 rescale rides with it: its
    while-loop boundary semantics on floats have no safe SQL twin).
    Plan: one aggregation + one lag window sharing the group-key
    shuffle."""
    from gapless_deribit_clickhouse_spark.functions.timeutils import time_bucket

    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type", time_bucket(F.col("ts"), 3600).alias("bts")
    ).agg((F.count(F.lit(1)) + 1).cast("double").alias("v"))
    w = Window.partitionBy("event_type").orderBy("bts")
    r100 = 100.0 * (F.log("v") - F.log(F.lag("v").over(w)))
    return (
        series.withColumn("idx", F.row_number().over(w) - 1)
        .withColumn("r100", r100)
        .filter(F.col("r100").isNotNull())
        .select("event_type", "idx", "r100")
        .orderBy("event_type", "idx")
    )


EGARCH_INPUTS_SQL = f"""
WITH series AS (
  SELECT event_type, {bucket_sql('ts', 3600)} AS bts,
         CAST(count(*) + 1 AS DOUBLE) AS v
  FROM events GROUP BY event_type, {bucket_sql('ts', 3600)}),
lagged AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY bts) - 1 AS idx,
         100.0 * (ln(v) - ln(lag(v) OVER (PARTITION BY event_type ORDER BY bts))) AS r100
  FROM series)
SELECT event_type, CAST(idx AS INT) AS idx, r100
FROM lagged WHERE r100 IS NOT NULL
ORDER BY event_type, idx
"""


# --- multimodal: mapInPandas feature extraction over text payloads ---
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    out = fake_feature_extract(media)
    # restrict to the byte-level columns the SQL oracle can also
    # compute; mean_byte/feature stay covered by unit tests
    return out.select("media_id", "n_bytes", "payload_sha")


MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       substr(sha256(text), 1, 16) AS payload_sha
FROM documents
"""


# --- multimodal: REAL image decode (pure-stdlib PGM/PNG kernel) ---
def image_decode_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level oracle for the real decode path: each ASCII document
    is wrapped into a valid binary PGM (16x4 gray = first 64 chars,
    space-padded), decoded by the stdlib image kernel, and reduced to
    (shape, mean pixel). Because PGM pixels ARE the text bytes, DuckDB
    can compute the same mean from character codes — a hash-checkable
    oracle for an operator SQL cannot normally express. ASCII filter
    (octet_length == char_length) keeps bytes == code points on both
    sides."""
    from gapless_deribit_clickhouse_spark.pipelines.multimodal import (
        image_feature_extract,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.col("text")) == F.length(F.col("text"))
    )
    padded = F.rpad(F.substring(F.col("text"), 1, 64), 64, " ")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit(b"P5 16 4 255\n"), F.encode(padded, "UTF-8")).alias(
            "payload"
        ),
    )
    return image_feature_extract(media).select(
        "media_id", "height", "width", "channels", "mean_pixel"
    )


IMAGE_DECODE_SQL = """
SELECT doc_id AS media_id,
       4 AS height, 16 AS width, 1 AS channels,
       list_avg(list_transform(range(1, 65),
                i -> ascii(substr(rpad(substr(text, 1, 64), 64, ' '), i, 1))))
           AS mean_pixel
FROM documents
WHERE octet_length(encode(text)) = length(text)
"""


# --- multimodal: REAL audio decode (stdlib PCM-WAV kernel) ---
def audio_decode_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of ``image_decode_features_q``: each ASCII document
    becomes a valid 8-bit PCM WAV (8 kHz mono, first 64 chars as
    samples), decoded by the stdlib RIFF kernel and reduced to
    duration/RMS/zero-crossing-rate. WAV samples ARE the text bytes
    ((code-128)/128), so DuckDB recomputes the same statistics from
    character codes — a value-level oracle for audio decode."""
    import struct

    from gapless_deribit_clickhouse_spark.pipelines.multimodal import (
        audio_feature_extract,
    )

    header = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 64)
    )
    docs = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.col("text")) == F.length(F.col("text"))
    )
    padded = F.rpad(F.substring(F.col("text"), 1, 64), 64, " ")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit(header), F.encode(padded, "UTF-8")).alias("payload"),
    )
    return audio_feature_extract(media).select(
        "media_id", "n_frames", "channels", "sample_rate",
        "duration_ms", "rms", "zero_crossing_rate",
    )


AUDIO_DECODE_SQL = """
WITH base AS (
  SELECT doc_id,
         list_transform(range(1, 65),
             i -> (ascii(substr(rpad(substr(text, 1, 64), 64, ' '), i, 1))
                   - 128.0) / 128.0) AS v
  FROM documents
  WHERE octet_length(encode(text)) = length(text)
)
SELECT doc_id AS media_id,
       CAST(64 AS BIGINT) AS n_frames, 1 AS channels, 8000 AS sample_rate,
       8.0 AS duration_ms,
       sqrt(list_avg(list_transform(v, x -> x * x))) AS rms,
       list_avg(list_transform(range(2, 65),
           i -> CASE WHEN (v[i] < 0) <> (v[i - 1] < 0)
                     THEN 1.0 ELSE 0.0 END)) AS zero_crossing_rate
FROM base
"""


# --- multimodal: REAL video decode (FPK1 framepack, PNG frames) ---
def video_decode_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video twin of ``image_decode_features_q``: each ASCII document
    becomes a 2-frame FPK1 framepack (16x4 gray frames from chars
    1-64 and 65-128, PNG-encoded in an Arrow build stage), then the
    real per-frame decode explodes it to one row per frame. PNG is
    LOSSLESS, so each frame's mean pixel equals the mean of the
    source character codes — DuckDB recomputes it without ever
    touching a codec, a value-level oracle for video decode."""
    import numpy as np
    import pandas as pd

    from gapless_deribit_clickhouse_spark.pipelines.multimodal import (
        encode_framepack,
        video_frame_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.col("text")) == F.length(F.col("text"))
    )
    padded = F.rpad(F.substring(F.col("text"), 1, 128), 128, " ")
    src = docs.select(
        F.col("doc_id").alias("media_id"), F.encode(padded, "UTF-8").alias("txt")
    )

    def build(it):
        for pdf in it:
            if not len(pdf):
                continue
            payloads = [
                encode_framepack(
                    list(
                        np.frombuffer(bytes(b), dtype=np.uint8).reshape(2, 4, 16, 1)
                    ),
                    fps=10.0,
                )
                for b in pdf["txt"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    media = src.mapInPandas(build, schema="media_id long, payload binary")
    return video_frame_features(media, every_n=1).select(
        "media_id", "frame_idx", "frame_ts_ms",
        "height", "width", "channels", "mean_pixel",
    )


VIDEO_DECODE_SQL = """
WITH base AS (
  SELECT doc_id AS media_id, rpad(substr(text, 1, 128), 128, ' ') AS txt
  FROM documents
  WHERE octet_length(encode(text)) = length(text)
)
SELECT media_id, f AS frame_idx, f * 100.0 AS frame_ts_ms,
       4 AS height, 16 AS width, 1 AS channels,
       list_avg(list_transform(range(1 + 64 * f, 65 + 64 * f),
                i -> ascii(substr(txt, i, 1)))) AS mean_pixel
FROM base, (SELECT unnest([0, 1]) AS f) frames
"""


# --- §2.8 string tier: instrument format -> parse roundtrip ---
def instrument_parse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.functions.instrument import (
        format_instrument_col,
        parse_instrument_cols,
    )

    t = trades_view(spark, sf_dir, parallel=True)
    named = t.select(
        "trade_id",
        format_instrument_col(
            F.col("underlying"), F.col("expiry"), F.col("strike"), F.col("option_type")
        ).alias("deribit_name"),
    )
    parsed = parse_instrument_cols(F.col("deribit_name"))
    return named.select(
        "trade_id",
        "deribit_name",
        parsed["underlying"].alias("underlying_p"),
        parsed["expiry"].cast("timestamp").alias("expiry_p"),
        parsed["strike"].alias("strike_p"),
        parsed["option_type"].alias("option_type_p"),
    )


_MONTH_CASE = (
    "CASE month(expiry) "
    + " ".join(
        f"WHEN {i + 1} THEN '{m}'"
        for i, m in enumerate(
            ["JAN", "FEB", "MAR", "APR", "MAY", "JUN",
             "JUL", "AUG", "SEP", "OCT", "NOV", "DEC"]
        )
    )
    + " END"
)

_MONTH_NUM_CASE = (
    "CASE mon "
    + " ".join(
        f"WHEN '{m}' THEN {i + 1}"
        for i, m in enumerate(
            ["JAN", "FEB", "MAR", "APR", "MAY", "JUN",
             "JUL", "AUG", "SEP", "OCT", "NOV", "DEC"]
        )
    )
    + " END"
)

INSTRUMENT_PARSE_SQL = f"""
WITH trades AS ({TRADES_CTE}),
named AS (
  SELECT trade_id,
         underlying || '-' || CAST(day(expiry) AS VARCHAR) || ({_MONTH_CASE})
           || lpad(CAST(year(expiry) % 100 AS VARCHAR), 2, '0')
           || '-' || CAST(CAST(strike AS BIGINT) AS VARCHAR) || '-' || option_type
           AS deribit_name
  FROM trades),
rex AS (
  SELECT trade_id, deribit_name,
         regexp_extract(deribit_name, '^([A-Z]+)-(\\d{{1,2}})([A-Z]{{3}})(\\d{{2}})-(\\d+)-([CP])$', 1) AS und,
         regexp_extract(deribit_name, '^([A-Z]+)-(\\d{{1,2}})([A-Z]{{3}})(\\d{{2}})-(\\d+)-([CP])$', 2) AS dd,
         regexp_extract(deribit_name, '^([A-Z]+)-(\\d{{1,2}})([A-Z]{{3}})(\\d{{2}})-(\\d+)-([CP])$', 3) AS mon,
         regexp_extract(deribit_name, '^([A-Z]+)-(\\d{{1,2}})([A-Z]{{3}})(\\d{{2}})-(\\d+)-([CP])$', 4) AS yy,
         regexp_extract(deribit_name, '^([A-Z]+)-(\\d{{1,2}})([A-Z]{{3}})(\\d{{2}})-(\\d+)-([CP])$', 5) AS stk,
         regexp_extract(deribit_name, '^([A-Z]+)-(\\d{{1,2}})([A-Z]{{3}})(\\d{{2}})-(\\d+)-([CP])$', 6) AS ot
  FROM named)
SELECT trade_id, deribit_name,
       CASE WHEN und <> '' THEN und END AS underlying_p,
       CASE WHEN und <> '' THEN CAST(make_date(2000 + CAST(yy AS INT), {_MONTH_NUM_CASE}, CAST(dd AS INT)) AS TIMESTAMP) END AS expiry_p,
       CASE WHEN und <> '' THEN CAST(stk AS DOUBLE) END AS strike_p,
       CASE WHEN und <> '' THEN ot END AS option_type_p
FROM rex
"""


# --- event-time as-of join (exact version of the reference's
# truncate-to-15-min spot lookup; DuckDB ASOF JOIN is the oracle) ---
def asof_spot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.operators.asof import asof_join

    t = trades_view(spark, sf_dir).withColumn(
        "sym", F.concat(F.col("underlying"), F.lit("USDT"))
    ).select("trade_id", "sym", "timestamp", "price")
    s = spot_view(spark, sf_dir)
    out = asof_join(
        t,
        s.withColumnRenamed("symbol", "sym"),
        on=["sym"],
        left_ts="timestamp",
        right_ts="timestamp",
        value_cols=["close"],
    )
    return out.select("trade_id", "sym", "timestamp", "price", "close_asof")


ASOF_SPOT_SQL = f"""
WITH trades AS ({TRADES_CTE}),
spot AS ({SPOT_CTE}),
t AS (SELECT trade_id, underlying || 'USDT' AS sym, "timestamp", price FROM trades)
SELECT t.trade_id, t.sym, t."timestamp", t.price, s.close AS close_asof
FROM t ASOF LEFT JOIN spot s
  ON t.sym = s.symbol AND t."timestamp" >= s."timestamp"
"""


# --- sessionization: inactivity-gap sessions over the event stream ---
def sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.operators.sessionize import session_stats

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return session_stats(ev, user_col="user_id", ts_col="ts", gap_seconds=1800)


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM (SELECT user_id, ts FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM marked)
SELECT user_id, session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       max(epoch(ts)) - min(epoch(ts)) AS duration_s
FROM s GROUP BY user_id, session_seq
"""


# --- interval (range) join: events matched to their containing
# session interval via the bucketed equi-join formulation ---
def interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.operators.range_join import interval_join
    from gapless_deribit_clickhouse_spark.operators.sessionize import session_stats

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    sess = session_stats(
        ev.select("user_id", "ts"), user_col="user_id", ts_col="ts", gap_seconds=1800
    ).select("user_id", "session_seq", "session_start", "session_end")
    out = interval_join(
        ev, sess, "ts", "session_start", "session_end",
        on=["user_id"], bucket_seconds=1800,
    )
    return out.select("event_id", "user_id", "session_seq")


INTERVAL_JOIN_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM (SELECT user_id, ts FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM marked),
iv AS (
  SELECT user_id, session_seq,
         min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, session_seq)
SELECT e.event_id, e.user_id, iv.session_seq
FROM events e JOIN iv
  ON e.user_id = iv.user_id
 AND e.ts BETWEEN iv.session_start AND iv.session_end
"""


# --- sequenceCount('(?1).*(?2)') parity: greedy non-overlapping pairs ---
def sequence_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> purchase greedy non-overlapping sequence count per user
    (ClickHouse sequenceCount parity). The engine counts via the
    run-boundary window-lag plan; the oracle mirrors the same
    characterization in DuckDB window SQL, and the equivalence to the
    scanning automaton itself is pinned by a brute-force property test
    (tests/test_funnel.py) — same split of duties as window_funnel's
    fold/exists-chain pair."""
    from gapless_deribit_clickhouse_spark.operators.funnel import sequence_count

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return sequence_count(
        ev,
        first=F.col("event_type") == "view",
        then=F.col("event_type") == "purchase",
    )


SEQUENCE_COUNT_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE event_type WHEN 'view' THEN 1 WHEN 'purchase' THEN 2 END AS s
  FROM events
  WHERE event_type IN ('view', 'purchase')),
d AS (
  SELECT user_id, s,
         lag(s) OVER (PARTITION BY user_id ORDER BY t, s) AS prev_s
  FROM e)
SELECT user_id,
       CAST(sum(CASE WHEN s = 2 AND prev_s = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS sequence_count
FROM d
GROUP BY user_id
"""


# --- semi-structured JSON projection + rollup (SURVEY §2.8 JSON
# group: the reference round-trips JSON at its API/checkpoint edges;
# here the engine-side equivalent — typed extraction with from_json
# inside codegen, then a plain aggregate) ---
def json_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.avg("k").alias("avg_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("bigint").alias("n_high"),
        )
    )


JSON_EXTRACT_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       avg(CAST(json_extract(props, '$.k') AS INT)) AS avg_k,
       CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS INT) > 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM events GROUP BY event_type
"""


BINDINGS = [
    ("sessionize", sessionize_q, SESSIONIZE_SQL),
    ("interval_join_sessions", interval_join_q, INTERVAL_JOIN_SQL),
    ("events_json_rollup", json_extract_q, JSON_EXTRACT_SQL),
    ("asof_join_spot", asof_spot_q, ASOF_SPOT_SQL),
    ("instrument_parse", instrument_parse_q, INSTRUMENT_PARSE_SQL),
    ("portfolio_greeks", portfolio_greeks_q, PORTFOLIO_GREEKS_SQL),
    ("greeks_by_bucket", greeks_by_bucket_q, GREEKS_BY_BUCKET_SQL),
    ("smile_metrics", smile_metrics_q, SMILE_METRICS_SQL),
    ("spot_coverage", spot_coverage_q, SPOT_COVERAGE_SQL),
    ("egarch_params", egarch_params_q, None),
    # real-decode binding holds the driver-window multimodal slot; the
    # fake-kernel byte-feature variant is demoted to the CI-oracle tail
    ("image_decode_features", image_decode_features_q, IMAGE_DECODE_SQL),
    ("multimodal_features", multimodal_features_q, MULTIMODAL_SQL),
    ("audio_decode_features", audio_decode_features_q, AUDIO_DECODE_SQL),
    ("video_decode_features", video_decode_features_q, VIDEO_DECODE_SQL),
]


# --- behavioral analytics: windowFunnel / retention parity ---
def window_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel within 24h of the first view
    (ClickHouse windowFunnel parity): one shuffle on user_id, one
    sorted per-user fold carrying per-level chain-start times."""
    from gapless_deribit_clickhouse_spark.operators.funnel import window_funnel

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return window_funnel(
        ev,
        steps=[
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        window="24 hours",
    )


# exists-chain formulation: level k iff a chain of step-1..k events
# exists with non-decreasing times all within the window of the chain's
# FIRST event — provably what the engine's greedy fold computes (the
# latest-chain-start dominance argument in operators/funnel.py)
WINDOW_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                         WHEN 'purchase' THEN 3 END AS s
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')),
l2 AS (
  SELECT DISTINCT a.user_id
  FROM e a JOIN e b ON b.user_id = a.user_id
  WHERE a.s = 1 AND b.s = 2 AND b.t >= a.t
    AND b.t - a.t <= 86400000000),
l3 AS (
  SELECT DISTINCT a.user_id
  FROM e a
  JOIN e b ON b.user_id = a.user_id
  JOIN e c ON c.user_id = a.user_id
  WHERE a.s = 1 AND b.s = 2 AND c.s = 3
    AND b.t >= a.t AND c.t >= b.t
    AND c.t - a.t <= 86400000000),
l1 AS (SELECT DISTINCT user_id FROM e WHERE s = 1)
SELECT u.user_id,
       CAST(CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                 WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                 WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
                 ELSE 0 END AS INT) AS funnel_level
FROM (SELECT DISTINCT user_id FROM e) u
"""


def retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (ClickHouse retention parity): of users who
    signed up, who also clicked / purchased — one conditional
    aggregation, no joins."""
    from gapless_deribit_clickhouse_spark.operators.funnel import retention

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    return retention(
        ev,
        conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
    )


RETENTION_SQL = """
SELECT user_id,
       max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
       max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS r2,
       max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r3
FROM events GROUP BY user_id
"""


# --- EGARCH forecast recursion: the deterministic-fold half of the
# forecast (VERDICT r6 #5) ---
_FC_OMEGA, _FC_BETA, _FC_HORIZON = -0.1, 0.92, 12


def egarch_forecast_path_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h-step analytic variance-forecast path per event_type: seeds
    ``ln h_t = ln(var_samp(r100))`` from the oracle-checked EGARCH
    input series, then folds ``omega + beta * prev`` for 12 steps with
    fitted params as literals (features/egarch.py:forecast_path — the
    recursion of reference egarch.py:211-244). With this bound, the
    Nelder-Mead optimizer is the only unoracled arithmetic in the
    EGARCH tier: inputs (egarch_inputs) and forecast recursion both
    carry full cross-engine value checks."""
    from gapless_deribit_clickhouse_spark.features.egarch import forecast_path

    inputs = egarch_inputs_q(spark, sf_dir)
    seeds = inputs.groupBy("event_type").agg(
        F.log(F.var_samp("r100")).alias("lh0")
    )
    return forecast_path(
        seeds,
        ["event_type"],
        "lh0",
        omega=_FC_OMEGA,
        beta=_FC_BETA,
        horizon=_FC_HORIZON,
    ).orderBy("event_type", "step")


EGARCH_FORECAST_PATH_SQL = f"""
WITH RECURSIVE series AS (
  SELECT event_type, {bucket_sql('ts', 3600)} AS bts,
         CAST(count(*) + 1 AS DOUBLE) AS v
  FROM events GROUP BY event_type, {bucket_sql('ts', 3600)}),
lagged AS (
  SELECT event_type,
         100.0 * (ln(v) - ln(lag(v) OVER (PARTITION BY event_type ORDER BY bts))) AS r100
  FROM series),
seeds AS (
  SELECT event_type, ln(var_samp(r100)) AS lh0
  FROM lagged WHERE r100 IS NOT NULL GROUP BY event_type),
path(event_type, step, ln_h) AS (
  SELECT event_type, 1, ({_FC_OMEGA}) + ({_FC_BETA}) * lh0 FROM seeds
  UNION ALL
  SELECT event_type, step + 1, ({_FC_OMEGA}) + ({_FC_BETA}) * ln_h
  FROM path WHERE step < {_FC_HORIZON})
SELECT event_type, CAST(step AS INT) AS step, ln_h,
       exp(0.5 * ln_h) AS sigma
FROM path ORDER BY event_type, step
"""


# --- EGARCH log-likelihood at FIXED params: the optimizer's objective
# function under a full cross-engine oracle (VERDICT r8 #5) ---
_LL_MU, _LL_OMEGA, _LL_ALPHA, _LL_GAMMA, _LL_BETA = 0.05, -0.1, 0.15, -0.05, 0.92
# second parameter point PAST the stationarity guard (VERDICT r9 #5):
# sum|beta| >= 0.999 short-circuits _neg_loglik to 1e12 — the oracle
# must reproduce the guard branch, not just the smooth recursion
_LL_BETA_GUARD = 0.9995


def egarch_loglik_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type EGARCH(1,1) negative log-likelihood at literal
    (mu, omega, alpha, gamma, beta) over the oracle-checked input
    series — evaluates the EXACT ``_neg_loglik`` kernel the Nelder-Mead
    loop calls (features/egarch.py; the reference delegates the same
    objective to scipy, egarch.py:118-189). The variance recursion +
    Gaussian log-density fold is the same sequential shape as
    ``egarch_forecast_path`` and gets the same ``WITH RECURSIVE``
    DuckDB twin, so the only unoracled EGARCH arithmetic left is the
    argmin search itself.

    Two parameter points per group (one Arrow crossing): ``smooth``
    walks the full recursion; ``guard`` sits past the ``sum|beta| >=
    0.999`` stationarity guard, pinning the early-return branch
    (1e12) cross-engine as well (VERDICT r9 #5)."""
    from gapless_deribit_clickhouse_spark.features.egarch import loglik_by_group

    inputs = egarch_inputs_q(spark, sf_dir)
    return loglik_by_group(
        inputs,
        keys=["event_type"],
        order_col="idx",
        value_col="r100",
        param_sets={
            "smooth": (_LL_MU, _LL_OMEGA, _LL_ALPHA, _LL_GAMMA, _LL_BETA),
            "guard": (_LL_MU, _LL_OMEGA, _LL_ALPHA, _LL_GAMMA, _LL_BETA_GUARD),
        },
    ).orderBy("event_type", "param_set")


# the clamped log-variance step, inlined at each use site (a single
# DuckDB statement has no macro facility; r = prior state row)
_LL_VAL = (
    f"least(greatest(({_LL_OMEGA}) + ({_LL_ALPHA}) * (abs(r.z) - sqrt(2.0/pi()))"
    f" + ({_LL_GAMMA}) * r.z + ({_LL_BETA}) * r.lh, -50.0), 50.0)"
)

# seed state = (z=0, lh=ln(var_pop(e)+1e-12), acc=0) BEFORE the first
# element; each step consumes inputs row idx+1 and folds the Gaussian
# log-density term. Final neg-loglik = 0.5 * acc at max idx (ll =
# -0.5*acc in the kernel; the binding returns -ll).
EGARCH_LOGLIK_SQL = f"""
WITH RECURSIVE series AS (
  SELECT event_type, {bucket_sql('ts', 3600)} AS bts,
         CAST(count(*) + 1 AS DOUBLE) AS v
  FROM events GROUP BY event_type, {bucket_sql('ts', 3600)}),
lagged AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY bts) - 1 AS idx,
         100.0 * (ln(v) - ln(lag(v) OVER (PARTITION BY event_type ORDER BY bts))) AS r100
  FROM series),
inputs AS MATERIALIZED (
  -- MATERIALIZED: the recursive step joins inputs EVERY iteration;
  -- inlined, DuckDB re-runs the events scan+window per step (26 s ->
  -- 0.6 s at sf0.01)
  SELECT event_type, idx, r100 - ({_LL_MU}) AS e
  FROM lagged WHERE r100 IS NOT NULL),
rec(event_type, idx, z, lh, acc) AS (
  SELECT event_type, min(idx) - 1, CAST(0.0 AS DOUBLE),
         ln(var_pop(e) + 1e-12), CAST(0.0 AS DOUBLE)
  FROM inputs GROUP BY event_type
  UNION ALL
  SELECT r.event_type, i.idx,
         i.e / exp(0.5 * {_LL_VAL}),
         {_LL_VAL},
         r.acc + ln(2 * pi()) + {_LL_VAL} + i.e * i.e / exp({_LL_VAL})
  FROM rec r JOIN inputs i
    ON i.event_type = r.event_type AND i.idx = r.idx + 1)
SELECT event_type, 'smooth' AS param_set,
       0.5 * max_by(acc, idx) AS neg_loglik,
       CAST(count(*) - 1 AS BIGINT) AS n_obs
FROM rec GROUP BY event_type
UNION ALL
-- the stationarity-guard branch (VERDICT r9 #5): at beta = 0.9995 the
-- kernel short-circuits BEFORE the recursion (sum|beta| >= 0.999 ->
-- 1e12, features/egarch.py:_neg_loglik); the CASE keeps the guard
-- formula in the oracle rather than a bare constant
SELECT event_type, 'guard' AS param_set,
       CASE WHEN abs({_LL_BETA_GUARD}) >= 0.999 THEN 1e12 END AS neg_loglik,
       CAST(count(*) AS BIGINT) AS n_obs
FROM inputs GROUP BY event_type
ORDER BY event_type, param_set
"""


# --- ONE Nelder-Mead iteration at a fixed literal simplex (VERDICT
# r9 #4): the last unchecked kernel the egarch_params MLE runs.
# With the simplex literal the step is loop-free — stable sort by f,
# centroid of the best n, reflect/expand/contract points, the
# standard acceptance rule — and every f-value is the same
# _neg_loglik recursion egarch_loglik already oracles. The default
# simplex's beta-perturbed vertex (0.92 -> 1.032) trips the
# sum|beta| >= 0.999 stationarity guard, so the oracle exercises the
# early-return branch inside the sort as well. ---
from gapless_deribit_clickhouse_spark.features.egarch import (  # noqa: E402
    build_initial_simplex,
)

_NM_SIMPLEX = build_initial_simplex(
    (_LL_MU, _LL_OMEGA, _LL_ALPHA, _LL_GAMMA, _LL_BETA)
)


def egarch_nm_step_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Nelder-Mead reflect/expand/contract/shrink decision per
    event_type at the literal simplex seeded from the egarch_loglik
    parameter point (features/egarch.py:nelder_mead_step_by_group;
    the optimizer whose loop body this pins is _nelder_mead, the
    engine's stand-in for the scipy solver the reference delegates to
    at egarch.py:118-189)."""
    from gapless_deribit_clickhouse_spark.features.egarch import (
        nelder_mead_step_by_group,
    )

    inputs = egarch_inputs_q(spark, sf_dir)
    return nelder_mead_step_by_group(
        inputs,
        keys=["event_type"],
        order_col="idx",
        value_col="r100",
        simplex=_NM_SIMPLEX,
    ).orderBy("event_type")


_NM_PARAMS = ("mu", "omega", "alpha", "gamma", "beta")
_NM_OUT = {"mu": "new_mu", "omega": "new_omega", "alpha": "new_alpha1",
           "gamma": "new_gamma1", "beta": "new_beta1"}
_NM_N = len(_NM_PARAMS)  # 5 params -> 6 vertices, best-n centroid = 5
_NM_VERTS = ",\n    ".join(
    f"({vid}, {', '.join(repr(float(c)) for c in v)})"
    for vid, v in enumerate(_NM_SIMPLEX)
)
# the clamped log-variance step with params carried in the recursion
# state (r = prior state row)
_NM_VAL = (
    "least(greatest(r.omega + r.alpha * (abs(r.z) - sqrt(2.0/pi()))"
    " + r.gamma * r.z + r.beta * r.lh, -50.0), 50.0)"
)
_NM_CENT = ",\n         ".join(
    f"avg(CASE WHEN rk <= {_NM_N} THEN {c} END) AS c_{c},"
    f" max(CASE WHEN rk = {_NM_N + 1} THEN {c} END) AS w_{c}"
    for c in _NM_PARAMS
)
_NM_REFLECT = ", ".join(f"2 * c_{c} - w_{c} AS {c}" for c in _NM_PARAMS)
_NM_EXPAND = ", ".join(f"3 * c_{c} - 2 * w_{c} AS {c}" for c in _NM_PARAMS)
_NM_CONTRACT = ", ".join(f"0.5 * c_{c} + 0.5 * w_{c} AS {c}" for c in _NM_PARAMS)
_NM_WIDE_COORDS = ",\n         ".join(
    f"pr.{c} AS r_{c}, pe.{c} AS e_{c}, pc.{c} AS k_{c}" for c in _NM_PARAMS
)
_NM_NEW_COLS = ",\n       ".join(
    f"CASE action WHEN 'expand' THEN e_{c} WHEN 'reflect' THEN r_{c}"
    f" WHEN 'contract' THEN k_{c} END AS {_NM_OUT[c]}"
    for c in _NM_PARAMS
)

EGARCH_NM_STEP_SQL = f"""
WITH RECURSIVE series AS (
  SELECT event_type, {bucket_sql('ts', 3600)} AS bts,
         CAST(count(*) + 1 AS DOUBLE) AS v
  FROM events GROUP BY event_type, {bucket_sql('ts', 3600)}),
lagged AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY bts) - 1 AS idx,
         100.0 * (ln(v) - ln(lag(v) OVER (PARTITION BY event_type ORDER BY bts))) AS r100
  FROM series),
inputs AS MATERIALIZED (
  -- MATERIALIZED: both recursions join inputs every iteration
  SELECT event_type, idx, r100 FROM lagged WHERE r100 IS NOT NULL),
verts(vid, mu, omega, alpha, gamma, beta) AS (VALUES
    {_NM_VERTS}),
-- f at each non-guard vertex: the egarch_loglik recursion with the
-- vertex params carried in the recursion state
vrec(event_type, vid, mu, omega, alpha, gamma, beta, idx, z, lh, acc) AS (
  SELECT i.event_type, v.vid, v.mu, v.omega, v.alpha, v.gamma, v.beta,
         min(i.idx) - 1, CAST(0.0 AS DOUBLE),
         ln(var_pop(i.r100 - v.mu) + 1e-12), CAST(0.0 AS DOUBLE)
  FROM inputs i CROSS JOIN verts v
  WHERE abs(v.beta) < 0.999
  GROUP BY i.event_type, v.vid, v.mu, v.omega, v.alpha, v.gamma, v.beta
  UNION ALL
  SELECT r.event_type, r.vid, r.mu, r.omega, r.alpha, r.gamma, r.beta, i.idx,
         (i.r100 - r.mu) / exp(0.5 * {_NM_VAL}),
         {_NM_VAL},
         r.acc + ln(2 * pi()) + {_NM_VAL}
           + (i.r100 - r.mu) * (i.r100 - r.mu) / exp({_NM_VAL})
  FROM vrec r JOIN inputs i
    ON i.event_type = r.event_type AND i.idx = r.idx + 1),
fv AS (
  SELECT event_type, vid, 0.5 * max_by(acc, idx) AS f
  FROM vrec GROUP BY event_type, vid
  UNION ALL
  -- the stationarity-guard vertices short-circuit to 1e12 BEFORE the
  -- recursion (features/egarch.py:_neg_loglik)
  SELECT g.event_type, v.vid, 1e12 AS f
  FROM (SELECT DISTINCT event_type FROM inputs) g CROSS JOIN verts v
  WHERE abs(v.beta) >= 0.999),
-- stable sort: numpy argsort(kind='stable') == ORDER BY f, vid
ranked AS (
  SELECT fv.event_type, fv.f, v.mu, v.omega, v.alpha, v.gamma, v.beta,
         row_number() OVER (PARTITION BY fv.event_type ORDER BY fv.f, fv.vid) AS rk
  FROM fv JOIN verts v USING (vid)),
geom AS (
  SELECT event_type,
         {_NM_CENT},
         min(f) AS f_best,
         max(CASE WHEN rk = {_NM_N} THEN f END) AS f_second_worst,
         max(CASE WHEN rk = {_NM_N + 1} THEN f END) AS f_worst
  FROM ranked GROUP BY event_type),
probes AS MATERIALIZED (
  -- MATERIALIZED: probes embeds the ENTIRE vertex recursion (via
  -- geom); inlined, the prec recursion would re-run vrec once per
  -- iteration — hours, not seconds
  SELECT event_type, 'reflect' AS plabel, {_NM_REFLECT} FROM geom
  UNION ALL
  SELECT event_type, 'expand' AS plabel, {_NM_EXPAND} FROM geom
  UNION ALL
  SELECT event_type, 'contract' AS plabel, {_NM_CONTRACT} FROM geom),
prec(event_type, plabel, mu, omega, alpha, gamma, beta, idx, z, lh, acc) AS (
  SELECT i.event_type, p.plabel, p.mu, p.omega, p.alpha, p.gamma, p.beta,
         min(i.idx) - 1, CAST(0.0 AS DOUBLE),
         ln(var_pop(i.r100 - p.mu) + 1e-12), CAST(0.0 AS DOUBLE)
  FROM inputs i JOIN probes p ON p.event_type = i.event_type
  WHERE abs(p.beta) < 0.999
  GROUP BY i.event_type, p.plabel, p.mu, p.omega, p.alpha, p.gamma, p.beta
  UNION ALL
  SELECT r.event_type, r.plabel, r.mu, r.omega, r.alpha, r.gamma, r.beta, i.idx,
         (i.r100 - r.mu) / exp(0.5 * {_NM_VAL}),
         {_NM_VAL},
         r.acc + ln(2 * pi()) + {_NM_VAL}
           + (i.r100 - r.mu) * (i.r100 - r.mu) / exp({_NM_VAL})
  FROM prec r JOIN inputs i
    ON i.event_type = r.event_type AND i.idx = r.idx + 1),
pf AS (
  SELECT event_type, plabel, 0.5 * max_by(acc, idx) AS f
  FROM prec GROUP BY event_type, plabel
  UNION ALL
  SELECT event_type, plabel, 1e12 AS f
  FROM probes WHERE abs(beta) >= 0.999),
wide AS (
  SELECT g.event_type, g.f_best, g.f_second_worst, g.f_worst,
         fr.f AS f_reflect, fe.f AS f_expand, fc.f AS f_contract,
         {_NM_WIDE_COORDS}
  FROM geom g
  JOIN pf fr ON fr.event_type = g.event_type AND fr.plabel = 'reflect'
  JOIN pf fe ON fe.event_type = g.event_type AND fe.plabel = 'expand'
  JOIN pf fc ON fc.event_type = g.event_type AND fc.plabel = 'contract'
  JOIN probes pr ON pr.event_type = g.event_type AND pr.plabel = 'reflect'
  JOIN probes pe ON pe.event_type = g.event_type AND pe.plabel = 'expand'
  JOIN probes pc ON pc.event_type = g.event_type AND pc.plabel = 'contract'),
act AS (
  SELECT *,
    CASE WHEN f_reflect < f_best THEN
           (CASE WHEN f_expand < f_reflect THEN 'expand' ELSE 'reflect' END)
         WHEN f_reflect < f_second_worst THEN 'reflect'
         WHEN f_contract < f_worst THEN 'contract'
         ELSE 'shrink' END AS action
  FROM wide)
SELECT event_type, action, f_best, f_second_worst, f_worst,
       f_reflect, f_expand, f_contract,
       {_NM_NEW_COLS}
FROM act ORDER BY event_type
"""


# behavioral-analytics additions (round 5), past the stable window
LATE_BINDINGS = [
    ("egarch_inputs", egarch_inputs_q, EGARCH_INPUTS_SQL),
    ("egarch_forecast_path", egarch_forecast_path_q, EGARCH_FORECAST_PATH_SQL),
    ("egarch_loglik", egarch_loglik_q, EGARCH_LOGLIK_SQL),
    ("egarch_nm_step", egarch_nm_step_q, EGARCH_NM_STEP_SQL),
    ("window_funnel", window_funnel_q, WINDOW_FUNNEL_SQL),
    ("sequence_count", sequence_count_q, SEQUENCE_COUNT_SQL),
    ("retention", retention_q, RETENTION_SQL),
]


# --- as-of join, forward and nearest directions (merge_asof parity) ---
def asof_forward_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each trade takes the EARLIEST spot quote at or
    after its timestamp — the same single-shuffle bucketed-union plan
    as the backward binding run on mirrored time
    (operators/asof.py:asof_join direction="forward"); the DuckDB
    oracle flips the ASOF inequality."""
    from gapless_deribit_clickhouse_spark.operators.asof import asof_join

    t = trades_view(spark, sf_dir).withColumn(
        "sym", F.concat(F.col("underlying"), F.lit("USDT"))
    ).select("trade_id", "sym", "timestamp", "price")
    s = spot_view(spark, sf_dir)
    out = asof_join(
        t,
        s.withColumnRenamed("symbol", "sym"),
        on=["sym"],
        left_ts="timestamp",
        right_ts="timestamp",
        value_cols=["close"],
        direction="forward",
    )
    return out.select("trade_id", "sym", "timestamp", "price", "close_asof")


ASOF_FORWARD_SQL = f"""
WITH trades AS ({TRADES_CTE}),
spot AS ({SPOT_CTE}),
t AS (SELECT trade_id, underlying || 'USDT' AS sym, "timestamp", price FROM trades)
SELECT t.trade_id, t.sym, t."timestamp", t.price, s.close AS close_asof
FROM t ASOF LEFT JOIN spot s
  ON t.sym = s.symbol AND t."timestamp" <= s."timestamp"
"""


def asof_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: the closer of the backward/forward candidates
    per trade, ties backward (operators/asof.py:_asof_nearest — a
    backward pass composed with a forward pass over its output). The
    oracle reproduces the pick from two DuckDB ASOF joins and the
    same tie rule."""
    from gapless_deribit_clickhouse_spark.operators.asof import asof_join

    t = trades_view(spark, sf_dir).withColumn(
        "sym", F.concat(F.col("underlying"), F.lit("USDT"))
    ).select("trade_id", "sym", "timestamp", "price")
    s = spot_view(spark, sf_dir)
    out = asof_join(
        t,
        s.withColumnRenamed("symbol", "sym"),
        on=["sym"],
        left_ts="timestamp",
        right_ts="timestamp",
        value_cols=["close"],
        direction="nearest",
    )
    return out.select("trade_id", "sym", "timestamp", "price", "close_asof")


ASOF_NEAREST_SQL = f"""
WITH trades AS ({TRADES_CTE}),
spot AS ({SPOT_CTE}),
t AS (SELECT trade_id, underlying || 'USDT' AS sym, "timestamp", price FROM trades),
b AS (
  SELECT t.trade_id, s.close AS c, s."timestamp" AS rts
  FROM t ASOF LEFT JOIN spot s
    ON t.sym = s.symbol AND t."timestamp" >= s."timestamp"),
f AS (
  SELECT t.trade_id, s.close AS c, s."timestamp" AS rts
  FROM t ASOF LEFT JOIN spot s
    ON t.sym = s.symbol AND t."timestamp" <= s."timestamp")
SELECT t.trade_id, t.sym, t."timestamp", t.price,
       CASE WHEN f.rts IS NULL
              OR (b.rts IS NOT NULL
                  AND epoch(t."timestamp") - epoch(b.rts)
                      <= epoch(f.rts) - epoch(t."timestamp"))
            THEN b.c ELSE f.c END AS close_asof
FROM t JOIN b USING (trade_id) JOIN f USING (trade_id)
"""


LATE_BINDINGS += [
    ("asof_join_forward", asof_forward_q, ASOF_FORWARD_SQL),
    ("asof_join_nearest", asof_nearest_q, ASOF_NEAREST_SQL),
]


# --- interval-interval overlap join: sessions x hot hours ---
def overlap_hot_hours_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (user session, hot hour) overlap pair: sessions from the
    30-min-gap sessionizer, hot hours = clock hours whose event count
    exceeds 1.2x the hourly average (a 1-row scalar broadcast, the q22
    pattern). Runs operators/range_join.py:overlap_join — both sides
    bucket onto the hour grid, one hash equi-join, and each pair is
    kept only in the bucket containing the overlap's first instant
    (greatest of the two starts), so no distinct() dedup pass exists
    anywhere in the plan. The oracle is the plain range-predicate
    join, feasible at oracle scale."""
    from gapless_deribit_clickhouse_spark.operators.range_join import overlap_join
    from gapless_deribit_clickhouse_spark.operators.sessionize import session_stats

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    hours = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_start")).agg(
        F.count(F.lit(1)).alias("hour_events")
    )
    avg_he = hours.agg(F.avg("hour_events").alias("__avg_he"))
    hot = (
        hours.join(F.broadcast(avg_he))
        .filter(F.col("hour_events") > F.col("__avg_he") * 1.2)
        .withColumn("hour_end", F.col("hour_start") + F.expr("INTERVAL 3599 SECONDS"))
        .drop("__avg_he")
    )
    sess = session_stats(ev, user_col="user_id", ts_col="ts", gap_seconds=1800)
    return overlap_join(
        sess, hot,
        "session_start", "session_end", "hour_start", "hour_end",
        on=[], bucket_seconds=3600,
    ).select(
        "user_id", "session_seq", "session_start", "session_end",
        "hour_start", "hour_events",
    )


OVERLAP_HOT_HOURS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM (SELECT user_id, ts FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM marked),
sess AS (
  SELECT user_id, session_seq,
         min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, session_seq),
hours AS (
  SELECT date_trunc('hour', ts) AS hour_start, count(*) AS hour_events
  FROM events GROUP BY 1),
hot AS (
  SELECT hour_start, hour_events,
         hour_start + INTERVAL 3599 SECOND AS hour_end
  FROM hours
  WHERE hour_events > 1.2 * (SELECT avg(hour_events) FROM hours))
SELECT sess.user_id, sess.session_seq, sess.session_start,
       sess.session_end, hot.hour_start, hot.hour_events
FROM sess JOIN hot
  ON sess.session_start <= hot.hour_end
 AND hot.hour_start <= sess.session_end
"""

LATE_BINDINGS.append(
    ("overlap_hot_hours", overlap_hot_hours_q, OVERLAP_HOT_HOURS_SQL)
)

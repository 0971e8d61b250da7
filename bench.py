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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as e

    spark = get_spark(app_name="bench")
    qs = e.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE and n not in EXCLUDE
    ]

    # warm the session + each query shape once (untimed)
    spark.range(1000).count()
    for name in names:
        _run(qs[name], spark, sf_dir)

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _run(qs[name], spark, sf_dir)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

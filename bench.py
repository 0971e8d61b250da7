"""Benchmark harness (driver protocol).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (no driver
collect, no pandas conversion) — measures the Spark plan, not the
transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gapless_deribit_clickhouse_spark.core.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "scan_topn",
    "dedup_latest",
    "ohlc_15m",
    "top1_min_value",
    "moneyness_pivot",
    "pcr_by_tenor",
    "term_structure",
    "dte_bucket_agg",
    "front_month_select",
    "contract_chain_select",
    "enrich_with_spot",
    "quality_metrics",
    "gap_analysis",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as e

    spark = get_spark(app_name="bench")
    qs = e.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE and n.startswith("bench_")
    ]

    # warm the session (JVM/codegen) outside the timed region
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

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

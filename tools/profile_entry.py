"""Per-stage profile of named bench entries (optimization r12).

Runs each named registry entry once untimed (warm-up) then once
profiled, and prints the per-stage breakdown from the UI REST API:
stage duration, task count, max/median task time, shuffle bytes —
the §7.1 'which stage is slow' answer without a live UI.

Usage: python tools/profile_entry.py ENTRY [ENTRY ...] [--sf-dir D]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _stages(spark, status: str = "complete") -> list[dict]:
    sc = spark.sparkContext
    url = (
        f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
        f"/stages?status={status}"
    )
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.load(resp)


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    entries: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf-dir":
            sf_dir = argv[i + 1]
            i += 2
        else:
            entries.append(argv[i])
            i += 1
    if not entries:
        raise SystemExit(__doc__)

    bench._redirect_stderr()
    import __spark_entry__ as e
    from gapless_deribit_clickhouse_spark.core.session import get_spark

    spark = get_spark(
        app_name="profile_entry",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    qs = e.queries()
    spark.range(1000).count()

    for name in entries:
        runner = lambda n=name: bench._run(qs[n], spark, sf_dir)  # noqa: E731
        runner()  # warm-up
        seen = {s["stageId"] for s in _stages(spark)}
        t0 = time.perf_counter()
        runner()
        wall = time.perf_counter() - t0
        stages = [s for s in _stages(spark) if s["stageId"] not in seen]
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum(s.get("executorRunTime", 0) for s in stages)
        print(f"\n=== {name}: wall {wall:.3f}s, {len(stages)} stages, "
              f"executor-run total {total_run/1000.0:.2f}s ===")
        for s in stages[:14]:
            dur = None
            if s.get("submissionTime") and s.get("completionTime"):
                from datetime import datetime

                # REST timestamps end in a literal zone name ('GMT');
                # %Z fails to consume it on some platforms — strip it
                fmt = "%Y-%m-%dT%H:%M:%S.%f"
                try:
                    a = datetime.strptime(
                        s["submissionTime"].replace("GMT", ""), fmt
                    )
                    b = datetime.strptime(
                        s["completionTime"].replace("GMT", ""), fmt
                    )
                    dur = round((b - a).total_seconds(), 3)
                except ValueError:
                    dur = None
            print(
                f"  stage {s['stageId']:>4} dur={dur if dur is not None else '?':>6}"
                f" run={s.get('executorRunTime',0)/1000.0:6.2f}s"
                f" cpu={s.get('executorCpuTime',0)/1e9:6.2f}s"
                f" tasks={s.get('numCompleteTasks',0):>4}"
                f" in={s.get('inputBytes',0)/1e6:7.2f}MB"
                f" sr={s.get('shuffleReadBytes',0)/1e6:7.2f}MB"
                f" sw={s.get('shuffleWriteBytes',0)/1e6:7.2f}MB"
                f"  {s.get('name','')[:60]}"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main()

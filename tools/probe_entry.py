"""Stamped quiet probe of named bench entries (VERDICT r11 #3).

Times each named registry entry with bench.py's exact protocol
(untimed warm-up, then N min-of-2 pairs) and stamps every pair with
the de-confounded ``other_cores`` reading plus the calibration-trio
box-speed bracket, so an envelope question ("does the committed min
still reproduce?") gets answered with evidence instead of narrative.

Usage:
  python tools/probe_entry.py ENTRY [ENTRY ...] [--pairs N] [--sf-dir D]

Prints one JSON object per entry (all pairs + stamps + the min) and a
final summary line. Intended to run on a verified-quiet box; the
stamps prove whether it actually was.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    pairs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    entries: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--pairs":
            pairs = int(argv[i + 1])
            i += 2
        elif argv[i] == "--sf-dir":
            sf_dir = argv[i + 1]
            i += 2
        else:
            entries.append(argv[i])
            i += 1
    if not entries:
        raise SystemExit(__doc__)

    bench._redirect_stderr()
    gate = bench._wait_for_quiet()
    import __spark_entry__ as e
    from gapless_deribit_clickhouse_spark.core.session import get_spark

    spark = get_spark(app_name="probe_entry")
    qs = e.queries()
    spark.range(1000).count()

    cal_first = bench._calibrate(spark, qs, sf_dir)
    out: dict[str, dict] = {}
    for name in entries:
        runner = lambda n=name: bench._run(qs[n], spark, sf_dir)  # noqa: E731
        runner()  # warm-up, untimed
        recs = []
        for _ in range(pairs):
            pre = bench._cpu_snap()
            t, _delta = bench._timed_runs(spark, runner)
            post = bench._cpu_snap()
            recs.append(
                {"sec": round(t, 4), "other_cores": bench._other_cores(pre, post)}
            )
        out[name] = {
            "pairs": recs,
            "min_sec": round(min(r["sec"] for r in recs), 4),
            "max_other_cores": max(
                (r["other_cores"] for r in recs if r["other_cores"] is not None),
                default=None,
            ),
            "n_unstamped": sum(1 for r in recs if r["other_cores"] is None),
        }
        print(json.dumps({name: out[name]}), flush=True)
    cal_last = bench._calibrate(spark, qs, sf_dir)
    spark.stop()
    print(
        json.dumps(
            {
                "probe_summary": {k: v["min_sec"] for k, v in out.items()},
                "quiet_gate": gate,
                "calibration_first_sec": round(cal_first, 3) if cal_first else None,
                "calibration_last_sec": round(cal_last, 3) if cal_last else None,
                "calibration_ref_sec": bench.CALIBRATION_REF_SEC,
                "sf_dir": sf_dir,
                "pairs_per_entry": pairs,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

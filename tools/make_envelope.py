"""Regenerate ENVELOPE.json — the committed per-entry quiet envelope
``bench.py``'s burst re-time pass reads (VERDICT r10 #5).

The envelope is the per-entry MIN over verified-quiet committed bench
runs (BENCH_HEADLINE-format ``queries`` dicts), optionally overridden
for entries with direct quiet-stamped evidence that the historical
min no longer reproduces (e.g. ``coverage_by_underlying`` after r11's
re-time at other_cores 0.0-0.01).

Usage:
  python tools/make_envelope.py RUN [RUN ...] \
      [--override name=sec ...] [--source "provenance text"]

Each RUN is either a file path or a git ref:path spec
(e.g. ``17b9416:BENCH_HEADLINE.json``). Entries missing from some
runs take the min over the runs that have them. Writes ENVELOPE.json
at the repo root and prints the total.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_run(spec: str) -> dict[str, float]:
    if os.path.exists(spec):
        with open(spec) as f:
            head = json.load(f)
    else:
        out = subprocess.run(
            ["git", "-C", ROOT, "show", spec],
            capture_output=True,
            text=True,
            check=True,
        )
        head = json.loads(out.stdout)
    if head.get("sf") != 0.1:
        raise SystemExit(f"{spec}: sf={head.get('sf')} != 0.1")
    return {k: float(v) for k, v in head["queries"].items()}


def main() -> None:
    argv = sys.argv[1:]
    overrides: dict[str, float] = {}
    source = None
    runs: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--override":
            name, _, sec = argv[i + 1].partition("=")
            overrides[name] = float(sec)
            i += 2
        elif argv[i] == "--source":
            source = argv[i + 1]
            i += 2
        else:
            runs.append(argv[i])
            i += 1
    if not runs:
        raise SystemExit(__doc__)
    loaded = [(spec, _load_run(spec)) for spec in runs]
    names = sorted({k for _, q in loaded for k in q})
    sec = {
        k: round(min(q[k] for _, q in loaded if k in q), 3) for k in names
    }
    sec.update({k: round(v, 3) for k, v in overrides.items()})
    out = {
        "sf": 0.1,
        "source": source
        or (
            "per-entry min over: "
            + ", ".join(spec for spec, _ in loaded)
            + (
                "; overrides (quiet-stamped evidence): "
                + ", ".join(f"{k}={v}" for k, v in overrides.items())
                if overrides
                else ""
            )
        ),
        "sec": sec,
    }
    path = os.path.join(ROOT, "ENVELOPE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                "entries": len(sec),
                "total_sec": round(sum(sec.values()), 2),
                "path": path,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Regenerate ENVELOPE.json — the committed per-entry quiet envelope
``bench.py``'s burst re-time pass reads (VERDICT r10 #5).

The envelope is the per-entry MIN over verified-quiet committed bench
runs (BENCH_HEADLINE-format ``queries`` dicts), optionally overridden
for entries whose WORK changed between runs (a historical min that
measured different semantics must not gate the current code; e.g.
``egarch_loglik`` evaluated one parameter point per group before r10
and two after).

Staleness rule (VERDICT r11 #7): each entry records which run its min
came from (``src``); an entry is flagged ``stale`` when its min comes
from a run outside the most recent ``--recent N`` specs AND no recent
run came within ``STALE_FACTOR`` (1.3x) of it — i.e. the old minimum
has stopped reproducing and should be re-verified in the next quiet
run. bench.py copies the flags into BENCH_TELEMETRY so they travel
with every artifact.

Usage:
  python tools/make_envelope.py RUN [RUN ...] \
      [--override name=sec ...] [--source "provenance text"] \
      [--recent N]

Each RUN is either a file path or a git ref:path spec
(e.g. ``17b9416:BENCH_HEADLINE.json``), oldest first; the last
``--recent N`` (default 1) specs count as recent for the staleness
rule. Entries missing from some runs take the min over the runs that
have them. Writes ENVELOPE.json at the repo root and prints the total.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STALE_FACTOR = 1.3


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


def build(
    loaded: list[tuple[str, dict[str, float]]],
    overrides: dict[str, float],
    recent: int = 1,
) -> tuple[dict[str, float], dict[str, str], list[str]]:
    """(sec, src, stale) from oldest-first runs + overrides.

    ``src`` is the spec whose value IS the min (first spec to attain
    it; ``override`` for overridden entries). ``stale`` lists entries
    whose min comes from a non-recent run and which no recent run has
    come within STALE_FACTOR of.
    """
    names = sorted({k for _, q in loaded for k in q})
    recent_specs = {spec for spec, _ in loaded[-recent:]} if recent > 0 else set()
    sec: dict[str, float] = {}
    src: dict[str, str] = {}
    stale: list[str] = []
    for k in names:
        vals = [(q[k], spec) for spec, q in loaded if k in q]
        m = min(v for v, _ in vals)
        sec[k] = round(m, 3)
        src[k] = next(spec for v, spec in vals if v == m)
        if src[k] not in recent_specs:
            recent_vals = [v for v, spec in vals if spec in recent_specs]
            if recent_vals and min(recent_vals) > STALE_FACTOR * m:
                stale.append(k)
    for k, v in overrides.items():
        sec[k] = round(v, 3)
        src[k] = "override"
        if k in stale:
            stale.remove(k)
    return sec, src, stale


def main() -> None:
    argv = sys.argv[1:]
    overrides: dict[str, float] = {}
    source = None
    recent = 1
    runs: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--override":
            name, _, sec_s = argv[i + 1].partition("=")
            overrides[name] = float(sec_s)
            i += 2
        elif argv[i] == "--source":
            source = argv[i + 1]
            i += 2
        elif argv[i] == "--recent":
            recent = int(argv[i + 1])
            i += 2
        else:
            runs.append(argv[i])
            i += 1
    if not runs:
        raise SystemExit(__doc__)
    loaded = [(spec, _load_run(spec)) for spec in runs]
    sec, src, stale = build(loaded, overrides, recent)
    out = {
        "sf": 0.1,
        "source": source
        or (
            "per-entry min over: "
            + ", ".join(spec for spec, _ in loaded)
            + (
                "; overrides (changed-work semantics): "
                + ", ".join(f"{k}={v}" for k, v in overrides.items())
                if overrides
                else ""
            )
        ),
        "sec": sec,
        "src": src,
        "stale": stale,
    }
    path = os.path.join(ROOT, "ENVELOPE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                "entries": len(sec),
                "total_sec": round(sum(sec.values()), 2),
                "stale": stale,
                "path": path,
            }
        )
    )


if __name__ == "__main__":
    main()

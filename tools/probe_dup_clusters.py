"""Attribute dup_clusters' scaling growth (VERDICT r11 #5).

SCALING.md's steepest row is dup_clusters at ~7.8x wall-clock for 16x
input. This probe decides between the two candidate causes — planted
near-dup PAIR-count growth (inherent: the answer itself grows) vs
connected-components ROUND-count growth (fixable with a smarter star
step) — by timing the binding's two phases separately per factor and
reading the operator's own stats out-param:

  phase A: embedding_near_dup pair generation (banded SRP-LSH
           candidates + exact-cosine verify), timed to a count();
  phase B: connected_components over those pairs (+ the canonical
           mapping), with {input_edges, rounds, local_tier}.

Uses tools/scale_probe.py's amplification (sign-flipped embedding
copies — cross-copy cosine ~0, near-dup structure replicates
linearly) so the factors match SCALING.md like-for-like.

Usage: python tools/probe_dup_clusters.py [--factors 1,4,16]
Prints one JSON line per factor + a summary attribution line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_snap, _other_cores  # noqa: E402


def main() -> None:
    factors = [1, 4, 16]
    args = sys.argv[1:]
    if len(args) >= 2 and args[0] == "--factors":
        factors = [int(x) for x in args[1].split(",")]

    import tempfile

    from tools.scale_probe import amplify

    from gapless_deribit_clickhouse_spark.bindings.llm_ops import (
        _emb,
        embedding_near_dup_pairs,
    )
    from gapless_deribit_clickhouse_spark.core.session import get_spark
    from gapless_deribit_clickhouse_spark.operators.connected_components import (
        connected_components,
    )

    spark = get_spark(app_name="probe_dup_clusters")
    scratch = tempfile.mkdtemp(prefix="dupc_probe_")
    results = []
    for factor in factors:
        sf_dir = amplify(spark, factor, scratch)
        emb = _emb(spark, sf_dir)

        # warm-up per (phase, factor) — one-time codegen otherwise
        # fakes super-linear growth (scale_probe's own trap #1)
        embedding_near_dup_pairs(emb, threshold=0.35).count()

        pre = _cpu_snap()
        t0 = time.perf_counter()
        pairs = embedding_near_dup_pairs(emb, threshold=0.35)
        n_pairs = pairs.count()
        pairs_sec = time.perf_counter() - t0

        stats: dict = {}
        t0 = time.perf_counter()
        comp = connected_components(pairs, stats=stats)
        n_nodes = comp.count()
        cc_sec = time.perf_counter() - t0
        post = _cpu_snap()

        rec = {
            "factor": factor,
            "n_pairs": n_pairs,
            "n_clustered_nodes": n_nodes,
            "pairs_sec": round(pairs_sec, 3),
            "cc_sec": round(cc_sec, 3),
            "cc_stats": stats,
            "other_cores": _other_cores(pre, post),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    base = results[0]
    summary = {
        "pair_growth": [
            round(r["n_pairs"] / max(base["n_pairs"], 1), 2) for r in results
        ],
        "pairs_sec_growth": [
            round(r["pairs_sec"] / base["pairs_sec"], 2) for r in results
        ],
        "cc_sec_growth": [
            round(r["cc_sec"] / base["cc_sec"], 2) for r in results
        ],
        "rounds": [r["cc_stats"].get("rounds") for r in results],
        "local_tier": [r["cc_stats"].get("local_tier") for r in results],
        "factors": factors,
    }
    print(json.dumps({"summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

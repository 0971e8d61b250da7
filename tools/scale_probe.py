"""Scaling probe: measure how the LLM-tier operators scale with corpus
size — the local stand-in for the "would this survive 100x?" question.

Amplifies the sf0.1 documents/embeddings tables by the given factors
into /tmp scratch sf-dirs (each copy gets a fresh id, per-copy token
salting and a per-copy sign-flipped vector, so duplicate-structure
density stays constant instead of exploding into f-sized cliques),
then times
one materialization of each probed binding per factor and reports the
time ratio against the amplification ratio. A shuffle-bound or
quadratic operator shows super-linear growth here long before it
melts a 1000-executor cluster.

Usage: python tools/scale_probe.py [--factors 1,4,16] > SCALING.md
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.core.session import get_spark

BASE = "/root/testdata/sf0.1"

# bindings to probe: the LLM-pipeline tier (scan-bound ops scale with
# input; pair-generating ops are the ones that could go quadratic)
PROBES = [
    "dedup_exact",
    "text_quality",
    "token_counts",
    "classifier_score",
    "doc_fingerprint",
    "pii_scrub",
    "mixture_sample",
    "sequence_packing",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "dup_clusters",
    "tfidf_top_terms",
    "contamination",
    "curate_corpus",
    "embedding_near_dup",
    "ivf_topk",
    "cosine_topk",
    "semantic_dedup",
]


def amplify(spark, factor: int, scratch: str) -> str:
    """Build a synthetic sf-dir with documents/embeddings amplified
    ``factor``x; every other table is symlinked from sf0.1."""
    out = os.path.join(scratch, f"sfx{factor}")
    os.makedirs(out, exist_ok=True)
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__c")

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    # EVERY token carries the copy number: copy c of doc A shares no
    # shingles/minhashes with copy c' of anything, so the base
    # corpus's near-dup structure replicates f times (linear) instead
    # of forming f-cliques (quadratic). The first probe version used a
    # per-copy SUFFIX and measured exactly that clique blowup:
    # ngram_jaccard_pairs went 122x for 16x input because the true
    # answer itself grew quadratically.
    salted = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("~"), F.col("__c")),
        ),
    )
    (
        docs.select("*", copies)
        .select(
            (F.col("doc_id") * factor + F.col("__c")).alias("doc_id"),
            salted.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)  # real corpora arrive multi-file; a 1-file
        # scan would serialize the map stages and understate scaling
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )

    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    # Copies get a deterministic pseudo-random per-element SIGN flip
    # (positive rescaling would leave cross-copy cosine ~0.8 — still
    # high enough to flood the LSH candidate stage): sign patterns of
    # different copies are uncorrelated, so cross-copy cosine ~0 and
    # the base corpus's neighbor structure replicates linearly instead
    # of every copy-family forming a mutual high-cosine clique (the
    # first probe measured embedding_near_dup at 31x for 16x input for
    # exactly that reason). Norms are preserved exactly; every
    # factor's corpus gets the SAME treatment, so ratios compare like
    # with like.
    distorted = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            * F.signum(
                F.sin(
                    F.col("__c").cast("double") * 7.0
                    + (i.cast("double") + 1.0) * 2.39996
                    + 0.5
                )
            )
        ).cast("float"),
    )
    (
        emb.select("*", copies)
        .select(
            (F.col("vec_id") * factor + F.col("__c")).alias("vec_id"),
            distorted.alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet"))
    )

    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
    ):
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    import __spark_entry__ as e

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    scratch = tempfile.mkdtemp(prefix="scale_probe_")
    dirs = {f: amplify(spark, f, scratch) for f in factors}

    try:
        load1, _l5, _ = os.getloadavg()
    except OSError:
        load1 = None

    results: dict[str, dict[int, float]] = {}
    try:
        _probe(qs, spark, dirs, factors, results)
    finally:  # a failed probe must not leak 16x corpora in /tmp
        shutil.rmtree(scratch, ignore_errors=True)

    lo, hi = factors[0], factors[-1]
    amp = hi / lo
    _report(factors, results, lo, hi, amp, load1)


def _probe(qs, spark, dirs, factors, results) -> None:
    for name in PROBES:
        fn = qs[name]
        results[name] = {}
        for f in factors:
            sf_dir = dirs[f]
            # warm-up per (op, factor): the first execution of a cell
            # pays one-time costs (codegen, file listing, worker
            # spin-up) that otherwise land only on the larger factors
            # and fake super-linear growth — the first probe version
            # measured pii_scrub at 33x for 16x input for exactly
            # that reason (6.8x with per-cell warm-up)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[name][f] = round(time.perf_counter() - t0, 3)
        print(f"done {name}: {results[name]}", file=sys.stderr)


def _report(factors, results, lo, hi, amp, load1) -> None:
    print("# SCALING — operator wall-clock vs corpus amplification")
    print()
    print(
        f"Generated by `tools/scale_probe.py` from sf0.1 (5k docs / 2k\n"
        f"vectors) amplified {factors}x with constant duplicate density\n"
        f"(per-copy token salting / per-copy sign-flipped vectors, so\n"
        f"copies of a document are NOT near-duplicates of each other\n"
        f"and the true dup/neighbor structure grows linearly). local[32],\n"
        f"load_avg_1m at start: {load1}. `xN` columns are seconds;\n"
        f"`growth` is t({hi}x)/t({lo}x) against an input ratio of\n"
        f"{amp:.0f} — growth well under the input ratio means fixed\n"
        f"per-job overhead still dominates at this scale; growth near\n"
        f"or above it on a pair-generating operator would flag a\n"
        f"quadratic blowup. Pair counts grow with the planted-dup\n"
        f"count (linear in the corpus), so linear growth is the\n"
        f"correct target for every probed operator."
    )
    print()
    cols = " | ".join(f"x{f}" for f in factors)
    print(f"| operator | {cols} | growth (ideal <= {amp:.0f}) |")
    print("|---" * (len(factors) + 2) + "|")
    for name, r in results.items():
        row = " | ".join(f"{r[f]:.2f}" for f in factors)
        growth = r[hi] / r[lo] if r[lo] > 0 else float("nan")
        print(f"| {name} | {row} | {growth:.1f}x |")


if __name__ == "__main__":
    main()


# Analysis notes appended to the committed SCALING.md (kept in sync
# manually): pair-emitting operators are inherently quadratic in
# near-dup CLIQUE size (any pair output is Omega(answer)) — run
# exact_dedup first, keep posting-list caps on, prefer cluster-level
# outputs when cliques are expected. Probe methodology: warm-up per
# (operator, factor) and multi-file amplified corpora, or one-time
# costs / scan serialization fake super-linear growth.

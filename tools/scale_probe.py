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

Round 5 adds (VERDICT r4 next-round #3/#5):

- the ANALYTICS tier (as-of join, bucketed rolling percentile, the
  composed feature pipeline, and the training_set flagship) — events
  amplification gives each copy a disjoint time range (a large
  per-copy timestamp shift) and an event_id namespace offset, so
  every window, as-of lookback, and session stays within its copy and
  the true answer grows linearly, the analytics analogue of the
  token-salting rule;
- a >= 1e5-row synthetic-corpus RECALL probe for the auto-sizing
  paths (minhash_params / lsh_params): planted near-duplicate pairs,
  operators run with params=None (auto), measured recall printed into
  SCALING.md — the floors pinned at 1e3 in pytest, measured at 1e5
  here.

Usage: python tools/scale_probe.py [--factors 1,4,16] [--skip-recall] > SCALING.md
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

from gapless_deribit_clickhouse_spark.core.barrier import BARRIER_STORAGE
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
    "near_dedup_docs",
    "split_assign",
    "interdoc_repetition",
    "incremental_dedup",
    "embedding_project",
    # corpus bigram LM: token salting makes each copy's vocabulary
    # disjoint, so the count tables grow ~linearly with the corpus —
    # exactly the growth the probe should confirm (a quadratic row
    # here would mean the pairs->counts joins are exploding)
    "lm_score",
    # round-8 additions (VERDICT r7 #2): the deterministic global
    # training-order rank — must stay ~linear (the shard-offset
    # derivation replaces the single-partition global sort; a
    # super-linear row here would mean the offsets funnel), and the
    # oracled Lloyd's step (assign map + one slim (cluster, dim)
    # shuffle; centroids are fixed-k so cost is pure assign scan)
    "epoch_shuffle",
    "kmeans_assign_step",
    # pair-generating like ngram_jaccard_pairs (same intersection
    # core, asymmetric formula) — must track its sibling's growth
    "containment_pairs",
    "quality_gate",  # composed heuristics x LM gate over the same scan
    # round-6 retrieval/quantization tier. Token salting makes the
    # bm25 query terms match NOTHING in amplified copies — which is
    # the honest probe anyway: the cost is the corpus tokenize+tf
    # pass, and the matched-postings side is query-bounded.
    "bm25_topk",
    "frequent_tokens",  # Misra-Gries pass; salted vocab grows ~linearly
    "substring_dup_fraction",
    "segment_dedup",  # token salting keeps cross-copy segments
    # disjoint, so segment groups (and survivors) grow linearly
    "temperature_sample",
    "embedding_quantize",
    "quantized_topk",
]

# analytics-tier probes (VERDICT r4 #3): the union-window as-of join,
# the bucket-parallel rolling kernel, the composed feature pipeline,
# and the training-set flagship — the plans whose growth should be
# measured, not argued
PROBES_ANALYTICS = [
    "asof_join_spot",
    "window_funnel",
    "rolling_percentile",
    "feature_pipeline",
    "training_set",
    # round-5 events-tier additions (time-disjoint copies keep their
    # answers linear: sequence_count can chain at most one extra
    # match per copy boundary per user; twap/rollup group on
    # per-copy-disjoint time buckets; limit_by's WindowGroupLimit
    # caps per-task output at n per group regardless of input size)
    "sequence_count",
    "twap_vwap",
    "mergeable_rollup",
    "limit_by_topn",
    # round-6 series/history tier (time-disjoint copies keep every
    # windowed answer linear; scan_keyset must stay ~FLAT — constant
    # cost per page is the point of keyset pagination)
    "drawdown_stats",
    "realized_vol_daily",
    "ewma_by_user",
    "collapsing_merge",
    "scd2_history",
    "pit_enrich",
    "approx_distinct_rollup",
    "quantile_sketch_rollup",
    "scan_keyset",
    "event_cooccurrence",  # user/type keys are SHARED across copies:
    # the distinct (group, item) projection stays constant-size while
    # raw events grow f x — cost is the one event-scale distinct,
    # which should grow ~linearly
    # round-8 additions (VERDICT r7 #2): the round-7 join/CDC tier.
    # Time-disjoint copies keep every answer linear: as-of
    # forward/nearest lookups never cross copies; overlap_hot_hours is
    # PAIR-GENERATING — the exactly-once bucket-grid guard must keep
    # it linear (pairs only form within a copy's time range), which is
    # precisely the class this probe exists for; snapshot_diff's two
    # snapshots both grow f x with per-copy-disjoint keys;
    # cumulative_unique_users reduces to first-appearance rows (users
    # are SHARED across copies, so first appearances stay in the
    # earliest copy and the reduction input grows f x while output
    # buckets grow linearly)
    "asof_join_forward",
    "asof_join_nearest",
    "overlap_hot_hours",
    "snapshot_diff",
    "cumulative_unique_users",
]

# gapfill family (VERDICT r8 #3): probed against a SEPARATE events
# amplification with CONTIGUOUS 30-day copy shifts (the base span,
# step-aligned) instead of the analytics tier's 3650-day disjoint
# shifts — WITH FILL densifies the full min..max range per key, so
# disjoint shifts would make the probe measure 120x grid inflation
# (the inter-copy gaps), not the operator. With contiguous copies the
# true grid grows ~linearly with the factor.
PROBES_GAPFILL = ["ohlc_15m_gapless", "ohlc_gapless_interp"]

# per-row analysis notes rendered under the factor table for every
# row whose growth exceeds ~3x (VERDICT r7 #2 / r8 #3): each says
# whether the curve is answer growth (pairs/grid), scan growth
# (linear work tracking input), or fixed-overhead amortization ending
NOTES = {
    "ngram_jaccard_pairs": (
        "answer/pair growth: banded-LSH candidates grow with the "
        "(linear) planted-dup structure and the exact-Jaccard verify "
        "recomputes shingle intersections per candidate pair — "
        "seconds track the pair count, never corpus^2 (salted copies "
        "share no shingles)"
    ),
    "containment_pairs": (
        "same banded candidate core as ngram_jaccard_pairs with the "
        "min-size containment denominator; pair count grows linearly "
        "(salted copies), verify is per-candidate"
    ),
    "simhash_near_pairs": (
        "pair growth: chunk-bucket candidates grow with the planted "
        "structure; the Hamming verify and the first-zero-XOR-chunk "
        "pair dedup (r11, replaced the distinct() shuffle) are "
        "per-candidate filters behind the checkpointed signature "
        "table (zero post-checkpoint shuffles)"
    ),
    "minhash_lsh_pairs": (
        "candidate growth: band buckets grow linearly with the "
        "corpus; exact-Jaccard verification is per-candidate over "
        "the shared hashed-shingle table"
    ),
    "token_counts": (
        "scan growth: tokenize + count column algebra tracking "
        "input; the sub-second x1 cell is overhead-dominated, so the "
        "ratio measures overhead amortizing out"
    ),
    "classifier_score": (
        "scan growth: feature projection + broadcast-weights dot "
        "product, one pass over documents; tracks input"
    ),
    "sequence_packing": (
        "kernel growth: chunk count grows linearly and the per-shard "
        "FFD pass is near-linear in its shard's items (fixed shard "
        "count -> items per shard grow f x); the Arrow crossing is "
        "once per shard"
    ),
    "semantic_dedup": (
        "iterative growth: fixed Lloyd's iteration count over a "
        "linearly-growing corpus plus per-cluster chunked greedy "
        "prune whose chunk count tracks cluster size — linear work, "
        "k stays constant"
    ),
    "embedding_near_dup": (
        "ANSWER growth, measured (tools/probe_dup_clusters.py r12): "
        "sign-flipped copies keep cross-copy cosine ~0 in EXPECTATION "
        "but the +-1/sqrt(d) noise tail crosses the binding's 0.35 "
        "threshold, so the true pair count grows super-linearly "
        "(889 -> 17,267 -> 274,596 for 1/4/16x — 309x at 16x) while "
        "wall time grows only 7.5x: per-pair cost FALLS ~40x with "
        "scale; bucketed end to end, no clique blowup in the plan"
    ),
    "text_quality": (
        "scan growth: pure column-algebra map over documents — "
        "seconds track input because per-job overhead stops "
        "dominating past ~x4; growth below the input ratio = linear"
    ),
    "quality_gate": (
        "scan growth: the composed heuristics x corpus-LM gate is "
        "two passes over documents plus broadcast count tables; "
        "tracks input, stays under the input ratio"
    ),
    "curate_corpus": (
        "scan growth: language/quality filter map over documents; "
        "the sub-second x1 cell is overhead-dominated, so the ratio "
        "mostly measures overhead amortizing out — per-row cost "
        "falls with the factor"
    ),
    "dup_clusters": (
        "ANSWER growth, measured (tools/probe_dup_clusters.py r12, "
        "VERDICT r11 #5): the embedding pair graph it closes grows "
        "309x at 16x (cross-copy cosine-noise tail above the 0.35 "
        "threshold — an amplification artifact, see "
        "embedding_near_dup), while connected components runs ZERO "
        "distributed star rounds at every factor (the edge set stays "
        "under the 2M local-tier bound and finishes in the bounded "
        "union-find) — pair-gen 7.5x / closure 4.7x wall growth for "
        "a 309x answer, so per-pair cost falls with scale and "
        "round-count growth is ruled out as the cause"
    ),
    "lm_score": (
        "scan + vocab growth: salted copies make each copy's "
        "vocabulary disjoint, so the bigram count tables (and the "
        "broadcast context join) grow linearly with the corpus — "
        "the expected shape for a corpus-LM scorer"
    ),
    "substring_dup_fraction": (
        "scan growth: rolling-hash segment table grows linearly "
        "(salted copies keep cross-copy segments disjoint); group "
        "cardinality tracks input"
    ),
    "segment_dedup": (
        "scan growth: same disjoint-segment argument as "
        "substring_dup_fraction; survivor set grows linearly"
    ),
    "incremental_dedup": (
        "batch growth: both corpus and batch grow f x here, so the "
        "batch-side shingle/hash work and the batch x corpus "
        "candidate set grow linearly; the steady-state (fixed-batch) "
        "shape is the append curve below, which is ~flat"
    ),
    "incremental_dedup_indexed": (
        "batch growth, same argument: the factor table grows the "
        "BATCH f x alongside the index (batch is 40% of the corpus "
        "at every factor), so per-batch work tracks the batch; the "
        "fixed-batch steady state is the append curve below — "
        "per-batch cost ~flat while recompute grows"
    ),
    "twap_vwap": (
        "scan growth: per-bucket weighted aggregation over the "
        "amplified events; time-disjoint copies multiply the bucket "
        "count f x, so work tracks input (the sub-second x1 cell is "
        "overhead-dominated)"
    ),
    "near_dedup_docs": (
        "answer growth: re-runs exact tier + LSH pairs + connected "
        "components over the full corpus; token-salted copies share "
        "no shingles so the TEXT pair graph grows linearly (unlike "
        "the embedding tier's noise tail), and at probe scale the "
        "component closure finishes in the bounded local union-find "
        "tier (zero distributed star rounds — the r12 probe's "
        "finding for the sibling graph applies a fortiori to this "
        "smaller one)"
    ),
    "training_set": (
        "composed growth: the dedup tier (LSH + components) is the "
        "floor (see stage attribution below); its growth follows "
        "near_dedup_docs, the rest is sub-second scans"
    ),
    "training_set_chunks": "same composition as training_set",
    "ohlc_15m_gapless": (
        "grid growth (contiguous-shift amplification): the densified "
        "per-key grid IS the answer and grows linearly with the time "
        "span; forward fill is one trailing running-last per key — "
        "O(n) per partition"
    ),
    "ohlc_gapless_interp": (
        "grid growth, same scheme: r9 replaced the leading "
        "(currentRow, unboundedFollowing) anchor frame with a "
        "mirror-sort trailing running-last (operators/gapfill.py) — "
        "O(n) per partition instead of O(n^2); sf0.1 single-run time "
        "went 1.34s -> 0.71s and growth now tracks the grid, not its "
        "square"
    ),
    "mergeable_rollup": (
        "scan growth: per-copy-disjoint time buckets make the rollup "
        "state grow linearly; cost is the one bucket-key shuffle"
    ),
    "feature_pipeline": (
        "scan growth: the composed parse->filter->enrich->agg chain "
        "is one pass over the amplified events plus metadata-scale "
        "joins; tracks input"
    ),
    "epoch_shuffle": (
        "scan growth: shard-offset rank derivation is two passes "
        "over the (linear) input with metadata-scale shard tables; "
        "no global sort to funnel"
    ),
}


def _amplify_events(spark, factor: int, out: str, shift_days: int) -> None:
    """Shared events amplifier: copy c shifts ``c * shift_days`` days
    into the future and moves event_id into a per-copy namespace
    (c * 10^12 — large power of 10, so the small moduli the trades
    view derives from event_id keep their structure up to a per-copy
    rotation). user_id / event_type stay: series KEYS are shared,
    series CONTENT is disjoint (or contiguous) in time depending on
    the shift. One definition serves both the analytics tier
    (3650-day TIME-DISJOINT copies) and the gapfill tier (30-day
    CONTIGUOUS copies), so the two probes can never drift apart in
    table shape (r9 self-review)."""
    from gapless_deribit_clickhouse_spark.core.tables import load_table

    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__c")
    ev = load_table(spark, BASE, "events")
    (
        ev.select("*", copies)
        .select(
            (F.col("event_id") + F.col("__c").cast("long") * F.lit(10**12)).alias(
                "event_id"
            ),
            (
                F.col("ts")
                + F.make_interval(days=F.col("__c") * F.lit(shift_days))
            ).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )


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

    # events amplification for the analytics tier: TIME-DISJOINT
    # copies (c * 3650-day shifts), so a 7-day rolling lookback, a
    # 15-min as-of window, or a session gap never crosses copies and
    # the true answer grows linearly — the analytics analogue of
    # token salting (shared shape: _amplify_events).
    _amplify_events(spark, factor, out, shift_days=3650)

    # orders amplification for the CDC tier: snapshot_diff derives its
    # two snapshots from orders keys, so the probed input must grow
    # with the factor (an earlier probe symlinked orders and recorded
    # constant-input 'growth' — fake linear evidence). Copy c moves
    # keys into a disjoint namespace (c * 10^12; the binding's % 7/5/3
    # residue structure rotates per copy but keeps constant density),
    # so the true diff answer grows linearly.
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    (
        orders.select("*", copies)
        .select(
            (
                F.col("o_orderkey") + F.col("__c").cast("long") * F.lit(10**12)
            ).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "orders.parquet"))
    )

    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "lineitem",
    ):
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
    return out


def amplify_gapfill(spark, factor: int, scratch: str) -> str:
    """Events amplified with CONTIGUOUS copy shifts for the gapfill
    probes: copy c is shifted c * 30 days (the base span, a multiple
    of the 900 s grid step), so the densified min..max grid per key
    grows ~linearly with the factor instead of inflating across
    3650-day inter-copy gaps. Only events differs from ``amplify``;
    other tables are symlinked."""
    out = os.path.join(scratch, f"gf{factor}")
    os.makedirs(out, exist_ok=True)
    _amplify_events(spark, factor, out, shift_days=30)
    for t in (
        "region", "nation", "customer", "supplier", "part", "lineitem",
        "orders", "documents", "embeddings",
    ):
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
    return out


def _probe_gapfill(qs, spark, factors, results, scratch) -> None:
    """Gapfill family rows (VERDICT r8 #3) on the contiguous-shift
    amplification; same per-(op, factor) warm-up rule as ``_probe``."""
    dirs = {f: amplify_gapfill(spark, f, scratch) for f in factors}
    _probe(qs, spark, dirs, factors, results, names=PROBES_GAPFILL)


def _probe_snapshot_density(spark, dirs, hi) -> dict[str, float]:
    """CDC cost vs change density (VERDICT r8 #6): the committed
    snapshot_diff factor row uses the binding's fixed %7/%5/%3
    scenario (~13% of keys changed); this probes the SAME operator on
    the hi-factor orders table at 10% and 50% updated keys (identical
    input sizes — only the post-join filter selectivity and the
    output size vary). The slim-before-join design means the full
    outer join over (keys, fingerprint) dominates and the density
    rows should be ~equal; a large gap would mean per-changed-row
    work leaked above the filter."""
    from gapless_deribit_clickhouse_spark.operators.diff import snapshot_diff

    _release_leftovers(spark)
    base = spark.read.parquet(os.path.join(dirs[hi], "orders.parquet")).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    out: dict[str, float] = {}
    for label, mod in (("10pct", 10), ("50pct", 2)):
        new = base.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % mod == 0, F.col("o_totalprice") + 10.0
            ).otherwise(F.col("o_totalprice")),
        )

        def run() -> None:
            snapshot_diff(
                base, new, keys=["o_orderkey"],
                compare_cols=["o_totalprice", "o_orderstatus"],
            ).write.format("noop").mode("overwrite").save()

        run()  # warm-up, per-cell rule
        t0 = time.perf_counter()
        run()
        out[label] = round(time.perf_counter() - t0, 3)
    print(f"done snapshot density: {out}", file=sys.stderr)
    return out


def _synthetic_text_corpus(spark, n_docs: int, dup_frac: float = 0.05):
    """(docs, planted) — ``n_docs`` deterministic 40-token documents
    plus near-duplicates of a ``dup_frac`` subset (one token swapped:
    trigram Jaccard ~ 35/41 = 0.85, above the 0.8 threshold). Pure
    column algebra — the generator itself must not be the bottleneck
    at 1e5 rows."""
    tok = (
        "transform(sequence(0, 39), i -> concat('w', pmod(xxhash64("
        "concat(cast(id as string), ':', cast(i as string))), 50000)))"
    )
    base = spark.range(n_docs).selectExpr(
        "id AS doc_id", f"concat_ws(' ', {tok}) AS text"
    )
    n_dup = int(n_docs * dup_frac)
    # duplicate of doc d gets id d + n_docs and token at a
    # doc-deterministic position replaced
    dup_tok = (
        "transform(sequence(0, 39), i -> CASE WHEN i = pmod(xxhash64("
        f"cast(id as string)), 40) THEN 'zz' ELSE concat('w', pmod(xxhash64("
        "concat(cast(id as string), ':', cast(i as string))), 50000)) END)"
    )
    dups = spark.range(n_dup).selectExpr(
        f"id + {n_docs} AS doc_id", f"concat_ws(' ', {dup_tok}) AS text"
    )
    planted = [(i, i + n_docs) for i in range(n_dup)]
    return base.unionByName(dups), planted


def _synthetic_vec_corpus(spark, n_vecs: int, dim: int = 64, dup_frac: float = 0.05):
    """(vectors, planted) — deterministic uniform[-1,1] vectors plus
    small-perturbation near-duplicates (cosine ~ 0.995, above the
    0.95 threshold)."""
    comp = (
        "transform(sequence(0, {d}), i -> (pmod(xxhash64(concat("
        "cast({ident} as string), ':', cast(i as string))), 2001) - 1000) / 1000.0)"
    )
    base = spark.range(n_vecs).selectExpr(
        "id AS vec_id", comp.format(d=dim - 1, ident="id") + " AS embedding"
    )
    n_dup = int(n_vecs * dup_frac)
    pert = (
        "transform(sequence(0, {d}), i -> "
        "(pmod(xxhash64(concat(cast(id as string), ':', cast(i as string))), 2001) - 1000) / 1000.0"
        " + 0.1 * (pmod(xxhash64(concat('p:', cast(id as string), ':', cast(i as string))), 2001) - 1000) / 1000.0)"
    )
    dups = spark.range(n_dup).selectExpr(
        f"id + {n_vecs} AS vec_id", pert.format(d=dim - 1) + " AS embedding"
    )
    planted = [(i, i + n_vecs) for i in range(n_dup)]
    return base.unionByName(dups), planted


def recall_probe(spark, n: int = 100_000) -> dict[str, dict]:
    """Measured recall of the AUTO-SIZED candidate stages at >= 1e5
    rows (VERDICT r4 #5): the pytest floors pin recall at the
    1e3-corpus scale; this runs the same operators with params=None
    (auto-derived from threshold / corpus size) on a 1e5 synthetic
    corpus with planted near-duplicates and reports the fraction
    recovered."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        embedding_near_dup_pairs,
    )
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        minhash_lsh_pairs,
        minhash_params,
    )

    out: dict[str, dict] = {}

    docs, planted_t = _synthetic_text_corpus(spark, n)
    t0 = time.perf_counter()
    # xxhash64 base: the scale path (the md5 default exists for oracle
    # bit-reproducibility, which recall measurement does not need)
    pairs = (
        minhash_lsh_pairs(
            docs, num_hashes=None, bands=None, threshold=0.8,
            base_hash="xxhash64",
        )
        .select("id_a", "id_b")
        .collect()
    )
    found = {(r.id_a, r.id_b) for r in pairs}
    hit = sum(1 for p in planted_t if p in found)
    nh, nb = minhash_params(0.8)
    out["minhash_auto"] = {
        "corpus": n + len(planted_t),
        "params": f"num_hashes={nh} bands={nb}",
        "planted": len(planted_t),
        "recall": round(hit / len(planted_t), 4),
        "sec": round(time.perf_counter() - t0, 1),
    }
    print(f"recall minhash_auto: {out['minhash_auto']}", file=sys.stderr)

    vecs, planted_v = _synthetic_vec_corpus(spark, n)
    t0 = time.perf_counter()
    vpairs = (
        embedding_near_dup_pairs(
            vecs, threshold=0.95, n_bits=None, band_bits=None,
            corpus_size=n + len(planted_v),
        )
        .select("id_a", "id_b")
        .collect()
    )
    vfound = {(r.id_a, r.id_b) for r in vpairs}
    vhit = sum(1 for p in planted_v if p in vfound)
    out["srp_lsh_auto"] = {
        "corpus": n + len(planted_v),
        "planted": len(planted_v),
        "recall": round(vhit / len(planted_v), 4),
        "sec": round(time.perf_counter() - t0, 1),
    }
    print(f"recall srp_lsh_auto: {out['srp_lsh_auto']}", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--skip-recall", action="store_true")
    ap.add_argument("--skip-append-curve", action="store_true")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    import __spark_entry__ as e

    # quiet-box gate (VERDICT r8 #3: the r8 probe started at load
    # 2.09, leaving its top growth rows possibly load-inflated) —
    # same bounded wait as bench.py, BEFORE the JVM starts
    from bench import _wait_for_quiet

    gate = _wait_for_quiet(notify_stream=sys.stderr)
    if gate:
        print(f"quiet gate: {gate}", file=sys.stderr)

    # the start-of-run load stamp is taken BEFORE the probe's own
    # amplify jobs add load (post-gate, pre-JVM) — r9's first run
    # stamped it after amplify and recorded the probe's own work
    try:
        load1, _l5, _ = os.getloadavg()
    except OSError:
        load1 = None

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    scratch = tempfile.mkdtemp(prefix="scale_probe_")
    dirs = {f: amplify(spark, f, scratch) for f in factors}

    results: dict[str, dict[int, float]] = {}
    curve = None
    stages = None
    density = None
    try:
        _probe(qs, spark, dirs, factors, results)
        _probe_gapfill(qs, spark, factors, results, scratch)
        _probe_indexed_dedup(spark, dirs, factors, results, scratch)
        density = _probe_snapshot_density(spark, dirs, factors[-1])
        if not args.skip_append_curve:
            curve = _probe_append_curve(spark, scratch)
        stages = _probe_training_stages(spark, qs)
    finally:  # a failed probe must not leak 16x corpora in /tmp
        shutil.rmtree(scratch, ignore_errors=True)

    recall = None if args.skip_recall else recall_probe(spark)

    lo, hi = factors[0], factors[-1]
    amp = hi / lo
    _report(
        factors, results, lo, hi, amp, load1, recall, curve, stages,
        density=density, gate=gate,
    )


def _probe_append_curve(spark, scratch) -> dict:
    """Steady-state evidence for the persisted dedup index (VERDICT r6
    #8): build ONCE on a 50% corpus, then feed four successive 10%
    batches, timing each batch under two regimes — (a) indexed:
    ``incremental_dedup_indexed`` against the parquet index plus the
    ``append_dedup_index`` maintenance write that folds the batch's
    survivors in, and (b) recompute: ``incremental_dedup`` against the
    GROWING corpus-so-far (corpus + previously accepted batches),
    re-shingling/hashing it every time. The recompute cost grows with
    the corpus; the indexed per-batch cost must not — that difference
    is the index's whole reason to exist."""
    from gapless_deribit_clickhouse_spark.bindings.llm_ops import (
        _DEDUP_THRESHOLD,
        _docs,
    )
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        append_dedup_index,
        build_dedup_index,
        incremental_dedup,
        incremental_dedup_indexed,
    )

    # run on a 64x-amplified corpus (beyond the factor table's 16x):
    # at small corpora the recompute regime's corpus-side re-hash is
    # too cheap to separate from the indexed regime — the curve's
    # point is the regime gap once the corpus dwarfs the batch
    docs = _docs(spark, amplify(spark, 64, scratch))
    # steady-state ratio: a LARGE corpus (80%) against SMALL batches
    # (5% each) — the regime the index exists for. Within-batch
    # near-dedup cost is then minor and the regimes differ by their
    # corpus-side term: a flat parquet index read vs re-shingling/
    # re-hashing the whole growing corpus every batch
    corpus = docs.filter(F.col("doc_id") % 20 < 16)
    batches = [docs.filter(F.col("doc_id") % 20 == 16 + i) for i in range(4)]
    idx = os.path.join(scratch, "append_curve_idx")

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # one warm-up pass so first-use codegen/scan costs don't land on
    # the indexed path only (it runs first)
    _noop(incremental_dedup(batches[0].limit(50), corpus.limit(200),
                            threshold=_DEDUP_THRESHOLD))

    out: dict[str, object] = {"indexed_query": [], "append": [], "recompute": []}
    t0 = time.perf_counter()
    build_dedup_index(corpus, idx, threshold=_DEDUP_THRESHOLD)
    out["build_s"] = round(time.perf_counter() - t0, 2)
    for b in batches:
        t0 = time.perf_counter()
        kept = incremental_dedup_indexed(b, idx).localCheckpoint(
            eager=True, storageLevel=BARRIER_STORAGE
        )
        _noop(kept)
        out["indexed_query"].append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        append_dedup_index(kept, idx)
        out["append"].append(round(time.perf_counter() - t0, 2))
    for i, b in enumerate(batches):
        # the recompute regime's corpus grows with every ingested batch
        prior = docs.filter(F.col("doc_id") % 20 < 16 + i)
        t0 = time.perf_counter()
        _noop(incremental_dedup(b, prior, threshold=_DEDUP_THRESHOLD))
        out["recompute"].append(round(time.perf_counter() - t0, 2))
    print(f"done append curve: {out}", file=sys.stderr)
    return out


def _probe_training_stages(spark, qs) -> dict[str, float]:
    """Stage-time attribution of the ``training_set`` flagship at the
    BASE (x1) corpus (VERDICT r7 #3): materialize each composed stage
    behind its own barrier and time it, so the committed artifact
    records WHERE the flagship's seconds go. The lazy e2e binding
    overlaps/elides some of this (no per-stage counts), so it runs
    faster than the stage sum — the breakdown's job is the floor
    argument, not the headline number.

    Stage parameters mirror the FLAGSHIP BINDING exactly
    (``bindings/llm_ops.py:training_set_q`` -> ``build_training_set``:
    lang=en, min_quality=0.3, dedup threshold=0.8 with AUTO minhash
    params, chunk max_tokens=128 / overlap=16, pack shards=16) — an
    attribution timed at pipeline defaults would describe a pipeline
    the flagship never runs (ADVICE-class finding caught in r8
    self-review: defaults use 32 hashes vs the flagship's auto-sized
    210, and 2048-token chunks vs 128)."""
    from gapless_deribit_clickhouse_spark.core.tables import load_table
    from gapless_deribit_clickhouse_spark.operators.connected_components import (
        connected_components,
    )
    from gapless_deribit_clickhouse_spark.pipelines.curation import curate_corpus
    from gapless_deribit_clickhouse_spark.pipelines.packing import (
        chunk_documents,
        pack_sequences,
    )
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        exact_dedup,
        minhash_lsh_pairs,
    )

    # warm pass: the composed binding itself (codegen + pandas worker
    # spin-up land here, same per-cell rule as _probe)
    qs["training_set"](spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()
    docs = load_table(spark, BASE, "documents")
    out: dict[str, float] = {}

    def t(label, fn) -> None:
        t0 = time.perf_counter()
        fn()
        out[label] = round(time.perf_counter() - t0, 2)

    survivors = docs.join(
        curate_corpus(docs, lang="en", min_quality=0.3).select("doc_id"),
        "doc_id",
        "semi",
    ).localCheckpoint(eager=False, storageLevel=BARRIER_STORAGE)
    t("curate + semi-join", survivors.count)
    winners = exact_dedup(survivors, keep="min").select("doc_id")
    sv2 = survivors.join(winners, "doc_id", "semi").localCheckpoint(eager=False, storageLevel=BARRIER_STORAGE)
    t("exact-dedup tier", sv2.count)
    pairs = minhash_lsh_pairs(
        sv2, threshold=0.8, num_hashes=None, bands=None
    )
    t("minhash-LSH pairs (auto params)", pairs.count)
    comp = connected_components(pairs)
    t("connected components", comp.count)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    deduped = sv2.join(losers, "doc_id", "left_anti")
    t("loser anti-join", deduped.count)
    chunks = chunk_documents(
        deduped, id_col="doc_id", text_col="text", max_tokens=128, overlap=16
    ).localCheckpoint(eager=False, storageLevel=BARRIER_STORAGE)
    t("chunking", chunks.count)
    packed = pack_sequences(
        chunks, id_col="chunk_uid", text_col="chunk_text",
        max_tokens=128, num_shards=16,
    )
    final = packed.join(
        chunks.select("chunk_uid", "doc_id", "chunk_idx", "chunk_text"),
        "chunk_uid",
    )
    t(
        "FFD pack + broadcast join",
        lambda: final.write.format("noop").mode("overwrite").save(),
    )
    print(f"done training stages: {out}", file=sys.stderr)
    return out


def _release_leftovers(spark) -> None:
    """Unpersist every RDD block left behind by the previous
    operator's lazy ``localCheckpoint``s. The probe session runs ~70
    operators x 3 factors in one 16 GiB JVM; without this, checkpoint
    blocks accumulate in storage memory until the heavy pair
    operators GC-thrash — the same x16 ngram_jaccard cell measured
    5 s on a fresh session and 82 s late in an accumulated run. A
    resident engine does not carry query A's checkpoint blocks into
    query B's memory budget, so releasing between cells is the
    faithful measurement, not a cheat."""
    sc = spark.sparkContext._jsc.sc()
    it = sc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(False)


def _probe(qs, spark, dirs, factors, results, names=None) -> None:
    for name in (PROBES + PROBES_ANALYTICS) if names is None else names:
        fn = qs[name]
        results[name] = {}
        for f in factors:
            sf_dir = dirs[f]
            _release_leftovers(spark)
            # warm-up per (op, factor): the first execution of a cell
            # pays one-time costs (codegen, file listing, worker
            # spin-up) that otherwise land only on the larger factors
            # and fake super-linear growth — the first probe version
            # measured pii_scrub at 33x for 16x input for exactly
            # that reason (6.8x with per-cell warm-up)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(2):  # min-of-2 (bench protocol): one
                # straggler burst must not fake a super-linear row
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name][f] = round(best, 3)
        print(f"done {name}: {results[name]}", file=sys.stderr)


def _probe_indexed_dedup(spark, dirs, factors, results, scratch) -> None:
    """Persisted-index dedup (VERDICT r5 #5): same corpus/batch split
    as the ``incremental_dedup`` binding, but the corpus artifacts are
    built ONCE per factor (``build_dedup_index``, reported as its own
    one-time row) and each batch runs ``incremental_dedup_indexed``
    against the parquet index — the steady-state shape whose per-batch
    cost must not grow with corpus passes. Compare its row against
    ``incremental_dedup`` (which recomputes the corpus side per
    batch)."""
    from gapless_deribit_clickhouse_spark.bindings.llm_ops import (
        _DEDUP_THRESHOLD,
        _docs,
    )
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        build_dedup_index,
        incremental_dedup_indexed,
    )

    results["build_dedup_index"] = {}
    results["incremental_dedup_indexed"] = {}
    for f in factors:
        _release_leftovers(spark)
        docs = _docs(spark, dirs[f])
        corpus = docs.filter(F.col("doc_id") % 5 < 3)
        batch = docs.filter(F.col("doc_id") % 5 >= 3)
        idx = os.path.join(scratch, f"dedup_index_x{f}")

        def build() -> None:
            build_dedup_index(corpus, idx, threshold=_DEDUP_THRESHOLD)

        build()  # warm-up (same per-cell rule as _probe)
        t0 = time.perf_counter()
        build()
        results["build_dedup_index"][f] = round(time.perf_counter() - t0, 3)

        def run() -> None:
            incremental_dedup_indexed(batch, idx).select(
                "doc_id", "lang", "source"
            ).write.format("noop").mode("overwrite").save()

        run()
        t0 = time.perf_counter()
        run()
        results["incremental_dedup_indexed"][f] = round(
            time.perf_counter() - t0, 3
        )
    print(
        f"done indexed dedup: build={results['build_dedup_index']} "
        f"batch={results['incremental_dedup_indexed']}",
        file=sys.stderr,
    )


def _report(
    factors, results, lo, hi, amp, load1, recall=None, curve=None,
    stages=None, density=None, gate=None,
) -> None:
    print("# SCALING — operator wall-clock vs corpus amplification")
    print()
    print(
        f"Generated by `tools/scale_probe.py` from sf0.1 (5k docs / 2k\n"
        f"vectors) amplified {factors}x with constant duplicate density\n"
        f"(per-copy token salting / per-copy sign-flipped vectors, so\n"
        f"copies of a document are NOT near-duplicates of each other\n"
        f"and the true dup/neighbor structure grows linearly). local[32],\n"
        f"load_avg_1m at start: {load1}. `xN` columns are seconds\n(min of 2 timed runs after a per-cell warm-up, leftover\ncheckpoint blocks released between cells);\n"
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
        tier = (
            " (analytics)"
            if name in PROBES_ANALYTICS
            else " (gapfill)" if name in PROBES_GAPFILL else ""
        )
        print(f"| {name}{tier} | {row} | {growth:.1f}x |")
    print()
    # a no-getloadavg platform returns a stamped wait-0 dict with no
    # load keys — skip the report line rather than printing "load at
    # entry None" (r10 self-review)
    if gate.get("quiet_gate_load_at_entry") is not None:
        print(
            f"Quiet-box gate before the run: load at entry"
            f" {gate.get('quiet_gate_load_at_entry')}, waited"
            f" {gate.get('quiet_gate_wait_sec')} s."
        )
        print()
    print(
        "Analytics rows use time-disjoint events amplification (per-\n"
        "copy timestamp shift + event_id namespace), so windows,\n"
        "as-of lookbacks and sessions never cross copies and the true\n"
        "answer grows linearly — the analytics analogue of token\n"
        "salting. Gapfill rows use CONTIGUOUS 30-day copy shifts\n"
        "instead (WITH FILL densifies min..max per key, so disjoint\n"
        "shifts would measure 120x grid inflation across the\n"
        "inter-copy gaps, not the operator)."
    )
    noted = [
        (n, r[hi] / r[lo])
        for n, r in results.items()
        if r.get(lo, 0) > 0 and r[hi] / r[lo] > 3.0
    ]
    if noted:
        print()
        print("## Row notes (growth > 3x)")
        print()
        print(
            "Per-row attribution for every row above ~3x growth\n"
            "(VERDICT r7 #2 / r8 #3): whether the curve is answer\n"
            "growth (pairs/grid — the output itself grows), scan\n"
            "growth (linear work tracking input once fixed per-job\n"
            "overhead stops dominating), or measurement noise. All\n"
            "growth ratios are against an input ratio of "
            f"{amp:.0f}x — a ratio UNDER {amp:.0f} is sub-linear.\n"
        )
        for n, g in sorted(noted, key=lambda t: -t[1]):
            print(f"- **{n}** ({g:.1f}x): {NOTES.get(n, 'UNANNOTATED')}")
    if density is not None:
        print()
        print("## snapshot_diff vs change density (x" + str(hi) + " orders)")
        print()
        print(
            "Same operator, same input size (the x"
            f"{hi} orders amplification, both sides"
            " full), update fraction varied by key modulus — isolates\n"
            "the CDC cost driver (VERDICT r8 #6). The slim-to-\n"
            "(keys, fingerprint) design makes the FULL OUTER join the\n"
            "dominant term, so the densities should time ~equal; a\n"
            "large gap would mean per-changed-row work sits above the\n"
            "unchanged-row filter."
        )
        print()
        print("| updated keys | seconds |")
        print("|---|---|")
        for k, v in density.items():
            print(f"| {k} | {v:.2f} |")
    if curve is not None:
        print()
        print("## Persisted-index append curve (64x corpus, 4 successive batches)")
        print()
        print(
            "Steady-state evidence for the dedup index (VERDICT r6 #8),\n"
            "run on a 64x-amplified corpus (320k docs): build ONCE on its\n"
            "80% slice, then ingest four successive 5% batches.\n"
            "`indexed` = incremental_dedup_indexed against the parquet\n"
            "index + the append_dedup_index maintenance write folding the\n"
            "batch's survivors in; `recompute` = incremental_dedup against\n"
            "the GROWING corpus-so-far, re-shingling/hashing it per batch.\n"
            "Recompute cost grows with the corpus; indexed per-batch cost\n"
            "must stay ~flat — cumulative includes the one-time build."
        )
        print()
        print(f"one-time index build: {curve['build_s']} s")
        print()
        print(
            "| batch | indexed query s | append s | recompute s"
            " | indexed cum | recompute cum |"
        )
        print("|---|---|---|---|---|---|")
        ic = curve["build_s"]
        rc = 0.0
        rows_iter = zip(curve["indexed_query"], curve["append"], curve["recompute"])
        for i, (a, ap, b) in enumerate(rows_iter, 1):
            ic += a + ap
            rc += b
            print(f"| {i} | {a:.2f} | {ap:.2f} | {b:.2f} | {ic:.2f} | {rc:.2f} |")
    if recall is not None:
        print()
        print("## Auto-sizing recall at 1e5 rows (planted near-dups)")
        print()
        print(
            "Operators run with params=None — num_hashes/bands and\n"
            "n_bits/band_bits derived by minhash_params / lsh_params\n"
            "from the threshold and corpus size. The pytest floors pin\n"
            "recall >= 0.9 at the 1e3 scale; this measures the same\n"
            "auto-derivation at 1e5 (VERDICT r4 #5)."
        )
        print()
        print("| stage | corpus | planted | recall | sec | params |")
        print("|---|---|---|---|---|---|")
        for k, v in recall.items():
            print(
                f"| {k} | {v['corpus']} | {v['planted']} | {v['recall']}"
                f" | {v['sec']} | {v.get('params', 'auto')} |"
            )
    if stages is not None:
        print()
        print("## training_set stage attribution at x1 (VERDICT r7 #3)")
        print()
        print(
            "Each composed stage of the flagship, materialized behind\n"
            "its own barrier and timed (warm session). The lazy e2e\n"
            "binding schedules differently (no per-stage counts, its\n"
            "own barrier placement), so its committed quiet time need\n"
            "not equal the stage sum — this table is the floor\n"
            "argument: the flagship's residual seconds are\n"
            "the measured near-dedup tier (LSH pair generation +\n"
            "connected components — iterative by nature, shared\n"
            "verbatim with the standalone near_dedup_docs entry) plus\n"
            "the Arrow FFD pack kernel, not a missing reuse. The r6\n"
            "\"<= 3.5 s quiet\" target is retired on this evidence:\n"
            "curate/exact/chunk/join are already sub-second, the\n"
            "single-hash LSH fix (r8) took the tier to its floor, and\n"
            "what remains IS the dedup tier's honest cost at sf0.1\n"
            "stage-count granularity (at 100 TB these per-stage\n"
            "latencies are overhead-dominated and amortize away — see\n"
            "the growth column above: every stage's operator is at or\n"
            "below ~4x at 16x input)."
        )
        print()
        print("| stage | seconds |")
        print("|---|---|")
        for k, v in stages.items():
            print(f"| {k} | {v:.2f} |")
        print(f"| **stage sum** | **{sum(stages.values()):.2f}** |")


if __name__ == "__main__":
    main()


# Analysis notes appended to the committed SCALING.md (kept in sync
# manually): pair-emitting operators are inherently quadratic in
# near-dup CLIQUE size (any pair output is Omega(answer)) — run
# exact_dedup first, keep posting-list caps on, prefer cluster-level
# outputs when cliques are expected. Probe methodology: warm-up per
# (operator, factor) and multi-file amplified corpora, or one-time
# costs / scan serialization fake super-linear growth.

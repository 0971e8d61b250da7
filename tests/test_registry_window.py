"""Registry-window invariant (VERDICT r3 #8).

The external harness value-checks only the first 50 registry entries;
bindings/__init__.py demotes near-duplicate variants past that window
so every distinct operator is driver-checked. This test pins the
layout so a refactor cannot silently push a distinct operator out of
the window (the r2 failure mode: 5 tail bindings were never checked).
"""

from __future__ import annotations

from gapless_deribit_clickhouse_spark.bindings import (
    ALL_BINDINGS,
    CHECKED_WINDOW,
    _DEMOTED,
)

WINDOW = CHECKED_WINDOW

# every demoted binding's operator must stay represented inside the
# window by these siblings (documented in COVERAGE.md)
SIBLINGS = {
    "moneyness_long": ["moneyness_pivot"],
    "smile_metrics": ["moneyness_pivot"],
    "pcr_aggregate": ["pcr_by_tenor"],
    "resample_by_dte_bucket": ["ohlc_15m", "dte_bucket_agg"],
    "greeks_by_bucket": ["greeks", "portfolio_greeks"],
    "token_topk": ["tfidf_top_terms"],
    "dte_distribution": ["dte_bucket_agg", "contract_chain_select"],
    "multimodal_features": ["image_decode_features"],
    "audio_decode_features": ["image_decode_features"],
    "pii_scrub": ["text_quality"],
    "hash_sample": ["mixture_sample"],
    "video_decode_features": ["image_decode_features"],
    "q5_local_supplier_volume": ["q3_shipping_priority", "q10_returned_revenue"],
    "q14_promo_revenue": ["q1_pricing_summary", "q3_shipping_priority"],
    "q19_discounted_revenue": ["q3_shipping_priority", "q10_returned_revenue"],
    # round-6 rotation (VERDICT r5 #7)
    "sample_per_group": ["mixture_sample"],
    "doc_fingerprint": ["dedup_exact", "tfidf_top_terms"],
    # round-7 rotation (VERDICT r6 #7)
    "repetition_stats": ["corpus_profile"],
    "token_counts": ["tfidf_top_terms", "text_quality"],
    # round-8 rotation (VERDICT r7 #6)
    "rolling_minmax_rank": ["rolling_percentile"],
    "ngram_jaccard_pairs": ["minhash_lsh_pairs", "dedup_exact"],
    # round-9 rotation (VERDICT r8 #4)
    "front_month_select": ["contract_chain_select", "top1_min_value"],
    "q10_returned_revenue": ["q3_shipping_priority"],
    # round-10 rotation (VERDICT r9 #3)
    "top1_min_value": ["contract_chain_select"],
    "cosine_topk": ["ivf_topk", "embedding_near_dup"],
    # round-11 rotation (VERDICT r10 #3)
    "curate_corpus": ["training_set"],
    "egarch_loglik": ["egarch_nm_step"],
    # round-12 rotation (VERDICT r11 #2): semantic_dedup composes the
    # same broadcast-centroid Lloyd step eight times inside its fit;
    # training_set's curation gate computes the same
    # min-id-over-md5(normalized_text) exact-duplicate winner rule
    "kmeans_assign_step": ["semantic_dedup"],
    "dedup_exact": ["training_set"],
}

# rotated INTO the window — operator families the window never
# exercised (r6: gapfill+interpolation, decorrelated EXISTS/NOT
# EXISTS; r7: distributed BM25 retrieval, episode-reset first-touch
# attribution; r8: CDC full-outer fingerprint diff, interval-interval
# overlap join; r9: the oracled single Lloyd's iteration, asymmetric
# containment dedup; r10: the WITH RECURSIVE-oracled EGARCH objective
# incl. its stationarity-guard branch, ClickHouse windowFunnel
# sequence matching; r11: the fully-oracled training_set flagship and
# the oracled single Nelder-Mead iteration — egarch_loglik rotated
# back out to the tail, superseded in-window by the strictly-harder
# egarch_nm_step; r12: the last two never-driver-checked oracled
# heavyweights, semantic_dedup and sequence_packing —
# kmeans_assign_step rotated back out, superseded in-window by
# semantic_dedup's eight composed Lloyd steps, and dedup_exact rotated
# out, superseded by training_set's composed curation gate); every
# promotion carried a CI value-oracle beforehand
PROMOTED = (
    "ohlc_gapless_interp",
    "q21_waiting_supplier",
    "bm25_topk",
    "attribution_first_touch",
    "snapshot_diff",
    "overlap_hot_hours",
    "containment_pairs",
    "window_funnel",
    "training_set",
    "egarch_nm_step",
    "semantic_dedup",
    "sequence_packing",
)


def test_promoted_bindings_occupy_checked_slots():
    from gapless_deribit_clickhouse_spark.bindings import _PROMOTED

    assert set(_PROMOTED) == set(PROMOTED)
    names = [n for n, _f, _s in ALL_BINDINGS]
    for p in PROMOTED:
        assert p in names[:WINDOW], f"{p} not inside the checked window"


def test_demoted_set_matches_sibling_map():
    assert set(_DEMOTED) == set(SIBLINGS)


def test_first_window_holds_only_distinct_operators():
    names = [n for n, _f, _s in ALL_BINDINGS]
    window = names[:WINDOW]
    assert len(window) == len(set(window))
    # no demoted (variant) binding occupies a checked slot
    assert not set(window) & set(_DEMOTED)
    # and everything demoted actually sits past the window
    for d in _DEMOTED:
        assert d in names[WINDOW:], f"{d} missing from the registry tail"


def test_every_demoted_operator_has_in_window_sibling():
    names = [n for n, _f, _s in ALL_BINDINGS]
    window = set(names[:WINDOW])
    for demoted, sibs in SIBLINGS.items():
        assert window & set(sibs), f"{demoted}: no sibling inside the window"


def test_window_is_exactly_filled():
    """The registry must keep >= 50 entries (a shrink would waste
    checked slots) and the window must hold every non-demoted binding
    that fits."""
    names = [n for n, _f, _s in ALL_BINDINGS]
    assert len(names) >= WINDOW
    non_demoted = [n for n in names if n not in _DEMOTED]
    assert names[:WINDOW] == non_demoted[:WINDOW]

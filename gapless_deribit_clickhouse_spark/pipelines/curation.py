"""Corpus curation: the composed end-to-end pretraining filter —
exact-dedup winner ∧ target language ∧ quality floor ∧ token-length
band. This is the pipeline a user actually runs over raw crawl data;
the individual operators (text_stats, text_dedup) are its stages.

Scale design: every signal except dedup is a pure column expression
(whole-stage codegen, no joins between feature frames — the
expression builders from text_stats are inlined into ONE projection).
Exact-dedup membership is a min-over-window keyed by the content
hash: a single shuffle of (hash, id) width, after which the filter
applies before any downstream stage sees the data. Nothing here
prevents predicate pushdown on the source columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.core.partitioning import ensure_parallelism
from gapless_deribit_clickhouse_spark.pipelines.text_dedup import normalized_text, shingles
from gapless_deribit_clickhouse_spark.pipelines.text_stats import (
    lang_exprs,
    quality_exprs,
)


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Documents that survive the full curation gauntlet, with their
    audit columns (predicted language, token count, quality score).
    Winner of each exact-duplicate group = min id."""
    raw = F.col(text_col)
    q = quality_exprs(raw)
    _, pred = lang_exprs(raw)
    w = Window.partitionBy(F.md5(normalized_text(raw)))
    base = ensure_parallelism(df).select(
        F.col(id_col),
        pred.alias("lang_pred"),
        q["n_tokens"].alias("n_tokens"),
        q["quality_score"].alias("quality_score"),
        (F.min(id_col).over(w) == F.col(id_col)).alias("is_canonical"),
    )
    return base.filter(
        F.col("is_canonical")
        & (F.col("lang_pred") == lang)
        & (F.col("quality_score") >= min_quality)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    ).select(id_col, "lang_pred", "n_tokens", "quality_score")


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """Train/test contamination scan: training documents that share
    word ``n``-grams with a held-out benchmark set. Returns one row per
    contaminated doc: ``doc_id``, ``n_grams`` (distinct n-grams in the
    doc), ``n_matched`` (how many appear in the benchmark), and
    ``contamination_frac`` — the standard n-gram-overlap decontamination
    gate run before pretraining (filter or flag docs above a fraction).

    Scale design: the benchmark is tiny next to the corpus, so its
    distinct n-gram set is **broadcast**; corpus n-grams probe it with
    a broadcast hash join — the 100-TB side is never shuffled for the
    match. Per-doc totals (``n_grams``) are computed row-wise *before*
    the explode, so the only aggregation shuffle carries matched grams
    (a trickle). ``min_overlap`` keeps clean docs out of the output —
    the result is a blocklist, joined back or anti-joined by the
    caller.
    """
    bench_grams = (
        benchmark.select(
            F.explode(shingles(F.col(bench_text_col), n)).alias("gram")
        ).distinct()
    )
    # materialize the gram array once per row (a projection boundary),
    # then derive size + explode from the bound column — shingling is
    # the dominant row cost and must not run twice
    doc_grams = (
        ensure_parallelism(docs)
        .select(F.col(id_col), shingles(F.col(text_col), n).alias("__grams"))
        .select(
            F.col(id_col),
            F.size("__grams").alias("n_grams"),
            F.explode("__grams").alias("gram"),
        )
    )
    matched = doc_grams.join(F.broadcast(bench_grams), "gram")
    return (
        matched.groupBy(id_col)
        # shingles() output is already distinct per doc, so count(*)
        # counts distinct matched grams
        .agg(
            F.first("n_grams").cast("bigint").alias("n_grams"),
            F.count(F.lit(1)).alias("n_matched"),
        )
        .withColumn(
            "contamination_frac", F.col("n_matched").cast("double") / F.col("n_grams")
        )
        .filter(F.col("n_matched") >= min_overlap)
    )

"""Document deduplication: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the whole point — these run over billions of docs):

- exact_dedup: hash-groupBy on a text digest. One shuffle on the
  digest (uniform key -> no skew); keeps min doc_id per group.
- ngram_jaccard_pairs: shingle -> explode -> equi-join on the shingle,
  count co-occurrences, normalize by set sizes. Never all-pairs: the
  join key is the shingle, and frequent shingles can be capped
  (``max_shingle_freq``) like stop-word removal in published
  dedup pipelines.
- minhash_lsh_pairs: k md5-derived min-hashes -> b bands of r rows ->
  band-hash bucket join -> candidate pairs -> exact Jaccard verify.
  Shuffle is on band buckets — the standard sub-quadratic LSH shape.
- simhash64: 64-bit weighted-bit fingerprint from token md5s; near-dup
  = hamming distance <= k, bucketed by 4×16-bit chunks (pigeonhole:
  hamming<=3 over 4 chunks guarantees one exact chunk match).

Everything is built from md5 (deterministic, available in Spark,
DuckDB, and Python) — no engine-specific hash functions, so oracles
and tests can reproduce values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(col: Column) -> Column:
    """Lowercase, collapse whitespace — the canonical form all dedup
    operators hash."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """One row per distinct normalized text: the min (or max) id wins.
    Adds ``dup_count`` (group size)."""
    digest = F.md5(normalized_text(F.col(text_col)))
    keeper = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.groupBy(digest.alias("text_hash"))
        .agg(keeper.alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) of the normalized text."""
    toks = F.split(normalized_text(col), " ")
    if n == 1:
        return F.array_distinct(toks)
    # sliding window over token indices; sequence is 0-based inclusive
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs with exact n-gram Jaccard >= threshold.

    |A∩B| via shingle equi-join; |A∪B| = |A|+|B|−|A∩B|. Output:
    id_a < id_b, jaccard. ``max_shingle_freq`` drops shingles shared
    by more than that many docs (stop-shingle skew guard at scale).
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__f"))
        sh = sh.join(F.broadcast(freq.filter(F.col("__f") <= max_shingle_freq)), "shingle").drop(
            "__f"
        )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


def _md5_hash64(col: Column, seed: int) -> Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5(seed||x)
    parsed base-16. Reproducible everywhere (DuckDB oracle re-derives
    the same bits from the hex digits)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(seed) + ":"), col)), 1, 15), 16, 10).cast(
        "long"
    )


def _md5_hash_str(col: Column, seed: int) -> Column:
    """Deterministic string hash for min-hash: lexicographic min over
    md5 hex digests is uniform and needs no hex->int conversion, so
    the identical computation runs in Spark, DuckDB, and Python."""
    return F.md5(F.concat(F.lit(str(seed) + ":"), col))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Per doc: array of ``num_hashes`` string min-hash values over its
    shingle set — one explode + one groupBy (map-side partial min)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    mins = [F.min(_md5_hash_str(F.col("shingle"), i)).alias(f"h{i}") for i in range(num_hashes)]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with exact Jaccard.

    rows-per-band r = num_hashes//bands; candidate iff some band's
    sub-signature matches exactly (bucket equi-join on the band hash —
    sub-quadratic, shuffle keyed by (band, hash)). Verification joins
    candidates back to shingle sets and keeps jaccard >= threshold.
    """
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    band_arr = F.array(
        *[
            F.md5(F.concat_ws(",", *[F.col("signature")[b * r + i] for i in range(r)])).alias(
                f"b{b}"
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "id", F.posexplode(band_arr).alias("band", "band_hash")
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "band_hash"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "shingle": "s"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingle": "s"}), ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """60-bit SimHash over unigram tokens: for each bit, sum(+1/−1 by
    token-hash bit) > 0. Pure column algebra: explode tokens, md5 ->
    60-bit int, per-bit vote via groupBy sum — one shuffle."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(normalized_text(F.col(text_col)), " "))).alias("tok"),
    )
    h = _md5_hash64(F.col("tok"), 0)
    votes = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(60)
    ]
    agg = toks.groupBy("id").agg(*votes)
    bits = [
        F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(60)
    ]
    total = bits[0]
    for bcol in bits[1:]:
        total = total + bcol
    return agg.select("id", total.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= k, found by bucketing
    on 15-bit chunks (pigeonhole over 4 chunks covers k <= 3)."""
    sig = simhash64(df, text_col, id_col)
    chunks = F.array(*[
        F.shiftright(F.col("simhash"), c * 15).bitwiseAND(F.lit(0x7FFF)).alias(f"c{c}")
        for c in range(4)
    ])
    b = sig.select("id", "simhash", F.posexplode(chunks).alias("chunk", "chunk_val"))
    cand = (
        b.alias("x")
        .join(b.alias("y"), on=["chunk", "chunk_val"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )

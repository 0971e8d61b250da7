"""LLM-data-pipeline bindings: dedup (exact / n-gram Jaccard /
MinHash-LSH / SimHash), embedding similarity (brute-force + IVF +
near-dup), and text analysis — each with a DuckDB oracle built from
the SAME deterministic md5/arithmetic primitives."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.core.tables import load_table
from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
)
from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from gapless_deribit_clickhouse_spark.pipelines.curation import contamination_check
from gapless_deribit_clickhouse_spark.pipelines.text_stats import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    repetition_stats,
    token_count,
)

# One source of truth for the near-dedup Jaccard cutoff: the Spark
# calls (near_dedup_docs_q, the two training_set bindings) and the
# generated DuckDB CTE chain (_lsh_cc_kept_ctes) all read this, so the
# engine and oracle cannot desync on threshold / minhash_params sizing.
_DEDUP_THRESHOLD = 0.8

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents"
_GRAMS3 = (
    "SELECT doc_id, unnest(list_distinct("
    "CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) "
    "ELSE [array_to_string(t, ' ')] END)) AS shingle FROM toks"
)


def _md5_bucket_sql(key_expr: str, salt: str = "", buckets: int = 10_000) -> str:
    """DuckDB mirror of ``sampling.hash_bucket``: first 8 md5 hex
    chars of (salt || key) parsed base-16 (Horner over the hex
    digits), mod ``buckets``. The ONE generator for every oracle that
    buckets on md5 (hash_sample / mixture_sample / split_assign) —
    change ``hash_u32`` and update this mirror, nowhere else."""
    key = f"CAST({key_expr} AS VARCHAR)"
    if salt:
        key = f"'{salt}' || {key}"
    return (
        "list_reduce(list_transform(range(1, 9), i ->\n"
        f"           CAST(strpos('0123456789abcdef', substr(md5({key}), i, 1)) - 1 AS BIGINT)),\n"
        f"           (acc, d) -> acc * 16 + d) % {buckets}"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- exact dedup (hash groupBy) ---
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_docs(spark, sf_dir))


DEDUP_EXACT_SQL = f"""
SELECT md5({_NORM}) AS text_hash, min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY 1
"""


# --- exact n-gram Jaccard near-dup pairs ---
def ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.5)


NGRAM_JACCARD_SQL = f"""
WITH toks AS ({_TOKS}),
grams AS ({_GRAMS3}),
sz AS (SELECT doc_id, count(*) AS c FROM grams GROUP BY doc_id),
j AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, inter / (sa.c + sb.c - inter) AS jaccard
FROM j JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE inter / (sa.c + sb.c - inter) >= 0.5
"""


# --- MinHash-LSH near-dup pairs (banded bucket join + verify) ---
_NUM_HASHES, _BANDS, _R = 32, 8, 4


def minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), n=3, num_hashes=_NUM_HASHES, bands=_BANDS, threshold=0.5
    )


def _minhash_sql() -> str:
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        MINHASH_PRIME as _P,
        minhash_affine_params,
    )

    # base hash: first 15 hex chars of md5('0:' || shingle) parsed via
    # Horner-with-mod (stays in int64; a naive 16^k sum would round in
    # doubles), then the same (a*h + b) % p family as the Spark side
    base = (
        "list_reduce(list_transform(range(1, 16), i -> "
        "CAST(strpos('0123456789abcdef', substr(md5('0:' || shingle), i, 1)) - 1 AS BIGINT)), "
        f"(acc, d) -> (acc * 16 + d) % {_P})"
    )
    mins = ",\n         ".join(
        f"min((h * CAST({a} AS BIGINT) + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_affine_params(_NUM_HASHES))
    )
    band_eq = " OR ".join(
        "("
        + " AND ".join(f"a.h{b * _R + i} = b.h{b * _R + i}" for i in range(_R))
        + ")"
        for b in range(_BANDS)
    )
    return f"""
WITH toks AS ({_TOKS}),
grams AS ({_GRAMS3}),
hg AS (SELECT doc_id, {base} AS h FROM grams),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hg GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE {band_eq}),
sz AS (SELECT doc_id, count(*) AS c FROM grams GROUP BY doc_id),
j AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.id_a
  JOIN grams gb ON gb.doc_id = c.id_b AND gb.shingle = ga.shingle
  GROUP BY 1, 2)
SELECT id_a, id_b, inter / (sa.c + sb.c - inter) AS jaccard
FROM j JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE inter / (sa.c + sb.c - inter) >= 0.5
"""


MINHASH_LSH_SQL = _minhash_sql()


# --- SimHash near-dup pairs (15-bit chunk buckets, hamming <= 3) ---
def simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)


def _simhash_sql() -> str:
    # bit b of the 60-bit value parsed from the first 15 hex chars of
    # md5('0:' || tok): hex digit (from the right) jr = b//4 lives at
    # string position 15 - jr; bit (b % 4) of that digit.
    votes = []
    for b in range(60):
        pos = 15 - b // 4
        shift = b % 4
        bit = (
            f"((strpos('0123456789abcdef', substr(md5('0:' || tok), {pos}, 1)) - 1) >> {shift}) & 1"
        )
        votes.append(f"sum(CASE WHEN ({bit}) = 1 THEN 1 ELSE -1 END) AS v{b}")
    votes_sql = ",\n         ".join(votes)
    sh = " + ".join(f"(CASE WHEN v{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)" for b in range(60))
    chunk_eq = " OR ".join(
        f"(((a.simhash >> {c * 15}) & 32767) = ((b.simhash >> {c * 15}) & 32767))" for c in range(4)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split({_NORM}, ' '))) AS tok
  FROM documents),
votes AS (
  SELECT doc_id,
         {votes_sql}
  FROM toks GROUP BY doc_id),
sig AS (SELECT doc_id, {sh} AS simhash FROM votes)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE ({chunk_eq}) AND bit_count(xor(a.simhash, b.simhash)) <= 3
"""


SIMHASH_SQL = _simhash_sql()


# --- embedding cosine top-k (brute force, exact) ---
_COS = (
    "list_sum(list_transform(range(1, len(e.embedding) + 1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


def cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk(emb, queries, k=10)


COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS cosine_sim
  FROM embeddings e CROSS JOIN q),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, rank, cosine_sim FROM r WHERE rank <= 10
"""


# --- embedding near-dup pairs (banded sign-LSH candidates) ---
def emb_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(_emb(spark, sf_dir), threshold=0.35)


def _lsh_band_ctes(band_bits: int, dim: int = 64) -> str:
    """CTE fragment replicating pipelines/embeddings.band_hashes in
    DuckDB: same seeded projection matrix (literals round-trip
    exactly through repr), same sign rule, same band packing."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        DEFAULT_N_BITS,
        random_projections,
    )

    proj = random_projections(dim, DEFAULT_N_BITS)
    values = ",\n".join(
        f"({i}, [{', '.join(repr(w) for w in row)}]::DOUBLE[])"
        for i, row in enumerate(proj)
    )
    r = band_bits
    return f"""proj AS (SELECT * FROM (VALUES {values}) AS t(bit, w)),
bits AS (
  SELECT e.vec_id, p.bit,
         CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
              d -> CAST(e.embedding[d] AS DOUBLE) * p.w[d])) > 0 THEN 1 ELSE 0 END AS bv
  FROM embeddings e CROSS JOIN proj p),
bands AS (
  SELECT vec_id, CAST(bit // {r} AS INTEGER) AS band,
         CAST(sum(bv * CAST(power(2, bit % {r}) AS INTEGER)) AS INTEGER) AS h
  FROM bits GROUP BY 1, 2)"""


def _lsh_ctes_topk() -> str:
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import DEFAULT_BAND_BITS

    return _lsh_band_ctes(DEFAULT_BAND_BITS)


def _lsh_ctes_near_dup() -> str:
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import NEAR_DUP_BAND_BITS

    return _lsh_band_ctes(NEAR_DUP_BAND_BITS)


_LSH_CTES = _lsh_ctes_near_dup()
_LSH_CTES_TOPK = _lsh_ctes_topk()

_COS_XY = (
    "list_sum(list_transform(range(1, len(x.embedding) + 1), i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))"
)

EMB_NEAR_DUP_SQL = f"""
WITH {_LSH_CTES},
cand AS (
  SELECT DISTINCT bx.vec_id AS id_a, bb.vec_id AS id_b
  FROM bands bx JOIN bands bb
    ON bx.band = bb.band AND bx.h = bb.h AND bx.vec_id < bb.vec_id)
SELECT cand.id_a, cand.id_b, {_COS_XY} AS cosine_sim
FROM cand
JOIN embeddings x ON cand.id_a = x.vec_id
JOIN embeddings y ON cand.id_b = y.vec_id
WHERE {_COS_XY} >= 0.35
"""


# --- IVF ANN (approximate; recall pinned by tests, rows-only here) ---
def ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk(emb, queries, k=10)


IVF_TOPK_SQL = f"""
WITH {_LSH_CTES_TOPK},
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id
  FROM bands cb JOIN bands qb ON cb.band = qb.band AND cb.h = qb.h
  WHERE qb.vec_id < 5),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT cand.query_id, cand.vec_id, {_COS} AS cosine_sim
  FROM cand
  JOIN embeddings e ON cand.vec_id = e.vec_id
  JOIN q ON cand.query_id = q.query_id),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, rank, cosine_sim FROM r WHERE rank <= 10
"""


# --- text analysis ---
def quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_docs(spark, sf_dir))


_NT = f"CASE WHEN length({_NORM}) = 0 THEN 0 ELSE len(string_split({_NORM}, ' ')) END"
_STOP_HITS = " + ".join(
    f"len(list_filter(string_split({_NORM}, ' '), x -> x = '{w}'))"
    for w in ("the", "and", "of", "to", "in")
)

QUALITY_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS char_count,
       CAST({_NT} AS BIGINT) AS n_tokens,
       CAST(CASE WHEN {_NT} > 0 THEN length({_NORM}) / {_NT} ELSE 0.0 END AS DOUBLE) AS mean_token_len,
       CAST(CASE WHEN length(text) > 0 THEN length(regexp_replace({_NORM}, '[a-z0-9 ]', '', 'g')) / length(text) ELSE 0.0 END AS DOUBLE) AS punct_ratio,
       CAST(CASE WHEN {_NT} > 0 THEN ({_STOP_HITS}) / {_NT} ELSE 0.0 END AS DOUBLE) AS stopword_ratio,
       CAST(CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^A-Z]', '', 'g')) / length(text) ELSE 0.0 END AS DOUBLE) AS upper_ratio,
       CAST(least({_NT} / 100.0, 1.0) * 0.4
          + least(CASE WHEN {_NT} > 0 THEN ({_STOP_HITS}) / {_NT} ELSE 0.0 END * 5.0, 1.0) * 0.3
          + (1.0 - least(CASE WHEN length(text) > 0 THEN length(regexp_replace({_NORM}, '[a-z0-9 ]', '', 'g')) / length(text) ELSE 0.0 END * 4.0, 1.0)) * 0.2
          + (1.0 - least(CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^A-Z]', '', 'g')) / length(text) ELSE 0.0 END * 5.0, 1.0)) * 0.1 AS DOUBLE) AS quality_score
FROM documents
"""


def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir))


def _lang_sql() -> str:
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import LANG_MARKERS

    hits = {
        lang: " + ".join(
            f"len(list_filter(string_split({_NORM}, ' '), x -> x = '{w}'))" for w in words
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in sorted(hits)) + ")"
    pred = "CASE " + " ".join(
        f"WHEN hits_{lang} = {best} AND {best} > 0 THEN '{lang}'" for lang in sorted(hits)
    ) + " ELSE 'und' END"
    cols = ",\n       ".join(f"CAST({hits[lang]} AS BIGINT) AS hits_{lang}" for lang in sorted(hits))
    return f"""
WITH h AS (
  SELECT doc_id,
       {cols}
  FROM documents)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in sorted(hits))}, {pred} AS lang_pred
FROM h
"""


LANG_ID_SQL = _lang_sql()


def fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_docs(spark, sf_dir))


FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split({_NORM}, ' '))), ' ')) AS fingerprint,
       CAST(len(list_distinct(string_split({_NORM}, ' '))) AS BIGINT) AS n_distinct_tokens
FROM documents
"""


def token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).cast("bigint").alias("bpe_tokens"),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       CAST({_NT} AS BIGINT) AS ws_tokens,
       CAST(len(list_filter(regexp_split_to_array({_NORM}, '[^a-z0-9]+'), x -> len(x) > 0))
            + length(regexp_replace({_NORM}, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS bpe_tokens
FROM documents
"""


# --- deterministic stratified hash sampling (train-split stability) ---
def hash_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.sampling import (
        stratified_hash_sample,
    )

    docs = _docs(spark, sf_dir)
    out = stratified_hash_sample(
        docs, key_col="doc_id", stratum_col="lang",
        rates={"en": 0.5, "de": 0.25}, default_rate=0.1,
    )
    return out.select("doc_id", "lang", "source")


def mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.sampling import mixture_sample

    docs = _docs(spark, sf_dir)
    out = mixture_sample(
        docs, key_col="doc_id", domain_col="lang",
        parts={"en": 4, "zh": 2, "es": 2, "de": 1, "fr": 1},
    )
    return out.select("doc_id", "lang", "source")


# Same exact-integer threshold derivation as pipelines/sampling.py
# mixture_thresholds (Python bigints there, HUGEINT here): N = largest
# total with no domain oversampled, threshold_d = floor(p*N*B/(P*c)).
MIXTURE_SAMPLE_SQL = f"""
WITH parts(domain, p) AS (
  VALUES ('en', 4), ('zh', 2), ('es', 2), ('de', 1), ('fr', 1)),
tot AS (SELECT SUM(p) AS tp FROM parts),
counts AS (SELECT lang AS domain, COUNT(*) AS c FROM documents GROUP BY 1),
j AS (SELECT pa.domain, pa.p, COALESCE(co.c, 0) AS c
      FROM parts pa LEFT JOIN counts co USING (domain)),
nmax AS (SELECT MIN(c * (SELECT tp FROM tot) // p) AS n FROM j),
th AS (SELECT domain,
              CASE WHEN c = 0 THEN 0
                   ELSE LEAST(10000, p * (SELECT n FROM nmax) * 10000
                              // ((SELECT tp FROM tot) * c)) END AS t
       FROM j),
b AS (
  SELECT doc_id, lang, source,
         {_md5_bucket_sql("doc_id")} AS bucket
  FROM documents)
SELECT b.doc_id, b.lang, b.source
FROM b JOIN th ON b.lang = th.domain
WHERE b.bucket < th.t
"""


def sample_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.sampling import sample_n_per_group

    docs = _docs(spark, sf_dir)
    out = sample_n_per_group(docs, group_col="lang", n=20, key_col="doc_id")
    return out.select("doc_id", "lang")


SAMPLE_PER_GROUP_SQL = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) t
WHERE rn <= 20
"""


HASH_SAMPLE_SQL = f"""
WITH b AS (
  SELECT doc_id, lang, source,
         {_md5_bucket_sql("doc_id")} AS bucket
  FROM documents)
SELECT doc_id, lang, source FROM b
WHERE bucket < (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500 ELSE 1000 END)
"""


# --- corpus vocabulary head: top-k tokens by frequency ---
def token_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import token_topk

    return token_topk(_docs(spark, sf_dir), k=50)


TOKEN_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token FROM documents)
SELECT token, count(*) AS term_count, count(DISTINCT doc_id) AS doc_freq
FROM toks WHERE len(token) > 0
GROUP BY token ORDER BY term_count DESC, token ASC LIMIT 50
"""


# --- duplicate clustering: near-dup pairs -> connected components ->
#     canonical representative per cluster ---
def dup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.operators.connected_components import (
        dedup_clusters,
    )

    emb = _emb(spark, sf_dir)
    pairs = embedding_near_dup_pairs(emb, threshold=0.35)
    return dedup_clusters(emb, pairs, id_col="vec_id")


# oracle: same pair graph, components via recursive reachability
# (UNION dedups rows, so the walk reaches a fixpoint), label = min
# reachable id.
DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_LSH_CTES},
cand AS (
  SELECT DISTINCT bx.vec_id AS id_a, bb.vec_id AS id_b
  FROM bands bx JOIN bands bb
    ON bx.band = bb.band AND bx.h = bb.h AND bx.vec_id < bb.vec_id),
pairs AS (
  SELECT cand.id_a, cand.id_b
  FROM cand
  JOIN embeddings x ON cand.id_a = x.vec_id
  JOIN embeddings y ON cand.id_b = y.vec_id
  WHERE {_COS_XY} >= 0.35),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
walk(u, r) AS (
  SELECT u, v FROM edges
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.r = e.u AND e.v <> w.u),
comp AS (
  SELECT u AS id, least(min(r), u) AS component FROM walk GROUP BY u),
sizes AS (
  SELECT component, count(*) AS sz FROM comp GROUP BY component)
SELECT e.vec_id,
       coalesce(cm.component, e.vec_id) AS canonical_id,
       CAST(coalesce(s.sz, 1) AS BIGINT) AS cluster_size,
       e.vec_id <> coalesce(cm.component, e.vec_id) AS is_duplicate
FROM embeddings e
LEFT JOIN comp cm ON e.vec_id = cm.id
LEFT JOIN sizes s ON cm.component = s.component
"""


# --- tf-idf top terms per document ---
def tfidf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k_per_doc=5)


TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(string_split({_NORM}, ' ')) AS token FROM documents),
tf AS (
  SELECT doc, token, count(*) AS tf FROM toks WHERE len(token) > 0 GROUP BY 1, 2),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc AS doc_id, tf.token, tf.tf,
         tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
  FROM scored)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(rank AS BIGINT) AS rank,
       CAST(tfidf AS DOUBLE) AS tfidf
FROM r WHERE rank <= 5
"""


# --- composed corpus-curation filter (dedup ∧ lang ∧ quality ∧ length) ---
def curate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.curation import curate_corpus

    return curate_corpus(
        _docs(spark, sf_dir), lang="en", min_quality=0.5, min_tokens=5,
        max_tokens=100_000,
    )


def _curate_ctes(min_quality: float) -> str:
    """The curation gauntlet as reusable CTEs ending in ``curated``
    (doc_id, lang_pred, n_tokens, quality_score) — shared by the
    standalone CURATE_SQL oracle and the composed training_set_chunks
    oracle, so a scoring tweak cannot desync the two."""
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import LANG_MARKERS

    hits = {
        lang: " + ".join(
            f"len(list_filter(string_split({_NORM}, ' '), x -> x = '{w}'))" for w in words
        )
        for lang, words in LANG_MARKERS.items()
    }
    hit_cols = ",\n       ".join(f"{hits[lang]} AS hits_{lang}" for lang in sorted(hits))
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in sorted(hits)) + ")"
    pred = "CASE " + " ".join(
        f"WHEN hits_{lang} = {best} AND {best} > 0 THEN '{lang}'" for lang in sorted(hits)
    ) + " ELSE 'und' END"
    score = f"""least({_NT} / 100.0, 1.0) * 0.4
          + least(CASE WHEN {_NT} > 0 THEN ({_STOP_HITS}) / {_NT} ELSE 0.0 END * 5.0, 1.0) * 0.3
          + (1.0 - least(CASE WHEN length(text) > 0 THEN length(regexp_replace({_NORM}, '[a-z0-9 ]', '', 'g')) / length(text) ELSE 0.0 END * 4.0, 1.0)) * 0.2
          + (1.0 - least(CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^A-Z]', '', 'g')) / length(text) ELSE 0.0 END * 5.0, 1.0)) * 0.1"""
    return f"""h AS (
  SELECT doc_id, md5({_NORM}) AS th,
       CAST({_NT} AS BIGINT) AS n_tokens,
       CAST({score} AS DOUBLE) AS quality_score,
       {hit_cols}
  FROM documents),
p AS (
  SELECT doc_id, n_tokens, quality_score, {pred} AS lang_pred,
         min(doc_id) OVER (PARTITION BY th) = doc_id AS is_canonical
  FROM h),
curated AS (
  SELECT doc_id, lang_pred, n_tokens, quality_score
  FROM p
  WHERE is_canonical AND lang_pred = 'en' AND quality_score >= {min_quality}
    AND n_tokens BETWEEN 5 AND 100000)"""


CURATE_SQL = f"""
WITH {_curate_ctes(0.5)}
SELECT doc_id, lang_pred, n_tokens, quality_score FROM curated
"""


# --- per-group corpus profile (count / tokens / percentiles) ---
def corpus_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import corpus_profile

    # exact percentiles for cross-engine reproducibility (the approx
    # t-digest default is the scale path but not oracle-comparable)
    return corpus_profile(_docs(spark, sf_dir), group_col="lang", exact=True)


_NT_D = (
    f"CAST(CASE WHEN length({_NORM}) = 0 THEN 0 "
    f"ELSE len(string_split({_NORM}, ' ')) END AS DOUBLE)"
)

CORPUS_PROFILE_SQL = f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum({_NT_D}) AS BIGINT) AS total_tokens,
       avg({_NT_D}) AS avg_tokens,
       quantile_cont({_NT_D}, 0.5) AS p50_tokens,
       quantile_cont({_NT_D}, 0.9) AS p90_tokens,
       quantile_cont({_NT_D}, 0.99) AS p99_tokens
FROM documents GROUP BY lang
"""


# --- within-document repetition signals (Gopher-style filters) ---
def repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(_docs(spark, sf_dir), n=2)


REPETITION_SQL = f"""
WITH toks AS ({_TOKS}),
grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
              ELSE [array_to_string(t, ' ')] END AS g
  FROM toks),
top AS (
  SELECT doc_id, max(c) AS top_cnt FROM (
    SELECT doc_id, u, count(*) AS c
    FROM (SELECT doc_id, unnest(t) AS u FROM toks) GROUP BY 1, 2)
  GROUP BY 1)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       (len(t.t) - len(list_distinct(t.t))) / CAST(len(t.t) AS DOUBLE) AS dup_token_frac,
       (len(g.g) - len(list_distinct(g.g))) / CAST(len(g.g) AS DOUBLE) AS dup_ngram_frac,
       CAST(top.top_cnt AS BIGINT) AS top_token_count,
       top.top_cnt / CAST(len(t.t) AS DOUBLE) AS top_token_frac
FROM toks t JOIN grams g USING (doc_id) JOIN top USING (doc_id)
"""


# --- train/test contamination scan (benchmark n-gram overlap) ---
def contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_check(train, bench, n=3)


CONTAMINATION_SQL = f"""
WITH toks AS ({_TOKS}),
grams AS ({_GRAMS3}),
bench AS (SELECT DISTINCT shingle FROM grams WHERE doc_id % 97 = 0),
docg AS (SELECT doc_id, shingle FROM grams WHERE doc_id % 97 <> 0),
tot AS (SELECT doc_id, count(*) AS n_grams FROM docg GROUP BY 1),
m AS (
  SELECT d.doc_id, count(*) AS n_matched
  FROM docg d JOIN bench b USING (shingle) GROUP BY 1)
SELECT m.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams, m.n_matched,
       m.n_matched / CAST(t.n_grams AS DOUBLE) AS contamination_frac
FROM m JOIN tot t USING (doc_id)
WHERE m.n_matched >= 1
"""


# --- hashed linear classifier (quality-filter inference) ---
# Deterministic stand-in weight vector (md5-derived, environment-
# independent) — the single source of truth for BOTH the Spark plan
# literal and the DuckDB oracle literal, the same sharing pattern as
# PII_PATTERNS. Real use loads trained logistic-regression weights.
import hashlib as _hashlib

_CLF_BUCKETS = 256
_CLF_WEIGHTS = [
    (int(_hashlib.md5(f"w{i}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
    / 1000.0
    for i in range(_CLF_BUCKETS)
]
_CLF_BIAS = 0.1


def classifier_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import (
        hashed_linear_score,
    )

    return hashed_linear_score(
        _docs(spark, sf_dir), weights=_CLF_WEIGHTS, bias=_CLF_BIAS
    )


_CLF_BUCKET_SQL = (
    "list_reduce(list_transform(range(1, 9), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1 AS BIGINT)), "
    f"(acc, d) -> acc * 16 + d) % {_CLF_BUCKETS}"
)
CLASSIFIER_SQL = f"""
WITH wt AS (SELECT [{", ".join(repr(w) for w in _CLF_WEIGHTS)}] AS w),
toks AS (
  SELECT doc_id, list_filter(string_split({_NORM}, ' '), x -> len(x) > 0) AS t
  FROM documents)
SELECT doc_id,
       1.0 / (1.0 + exp(-({_CLF_BIAS!r} + CASE WHEN len(t) > 0 THEN
           list_avg(list_transform(t, tok -> w[CAST({_CLF_BUCKET_SQL} AS INT) + 1]))
           ELSE 0.0 END))) AS clf_score,
       CAST(COALESCE(len(t), 0) AS BIGINT) AS n_tokens
FROM toks, wt
"""


# --- sliding-window document chunking (context-window prep) ---
def doc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.packing import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), max_tokens=32, overlap=8
    )


# stride = 32 - 8 = 24; DuckDB list slicing t[a:b] is 1-based
# inclusive and clips at the end, matching Spark F.slice(toks, a, 32)
DOC_CHUNKS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         COALESCE(list_filter(string_split({_NORM}, ' '), x -> len(x) > 0), []) AS t
  FROM documents),
n AS (
  SELECT doc_id, t, len(t) AS nt,
         CASE WHEN len(t) <= 32 THEN 1
              ELSE CAST(ceil((len(t) - 32) / 24.0) AS INT) + 1 END AS nc
  FROM toks),
ex AS (
  SELECT doc_id, nt, nc,
         unnest(list_transform(range(nc), i -> {{
             'chunk_idx': CAST(i AS INT),
             'chunk_text': array_to_string(t[i * 24 + 1 : i * 24 + 32], ' ')
         }})) AS ch
  FROM n)
SELECT doc_id, ch.chunk_idx AS chunk_idx,
       CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':'
           || CAST(doc_id AS VARCHAR) || ':'
           || CAST(ch.chunk_idx AS VARCHAR) AS chunk_uid,
       ch.chunk_text AS chunk_text,
       CAST(nt AS BIGINT) AS doc_n_tokens, nc AS n_chunks
FROM ex
"""


# --- clustering tier shared parameters: every binding below fits the
# SAME spherical k-means (k=8, seed=42, max_iter=8, tol=1e-6), and
# every oracle reads THESE constants — edit them here and the engine
# call sites and the generated SQL move together (r10 self-review:
# literals at the call sites silently desync engine and oracle) ---
_SD_K, _SD_THR, _SD_ITER, _SD_TOL, _SD_SEED = 8, 0.35, 8, 1e-6, 42
_EMB_DIM = 64  # testdata embedding width (pinned by tests/test_demoted_bindings_oracle.py)
_SD_MAX_CLUSTER = 4096  # semantic_dedup's max_cluster_size default
_DS_N = 20  # diverse_sample binding: n_per_cluster
_IVF_K, _IVF_NPROBE, _IVF_NQ = 10, 4, 20  # ivf_kmeans_topk binding params


def ivf_kmeans_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True IVF with learned k-means centroids (nprobe=4 of 8 lists)
    over the embeddings table; queries = first 20 vectors. FULL
    cross-engine value oracle since r10 (was rows-only): the shared
    unrolled-Lloyd fit chain plus inverted lists, the per-query
    nprobe probe expansion, and the top-k window (IVF_KMEANS_TOPK_SQL);
    recall >= 0.8 vs brute force and determinism additionally pinned
    in tests/test_clustering.py."""
    from gapless_deribit_clickhouse_spark.pipelines.clustering import (
        ivf_kmeans_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _IVF_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_kmeans_topk(
        emb, queries, k=_IVF_K, n_centroids=_SD_K, nprobe=_IVF_NPROBE,
        max_iter=_SD_ITER, seed=_SD_SEED,
    )


def diverse_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling: 20 vectors from each of 8 semantic
    clusters. FULL cross-engine value oracle since r10 (was
    rows-only): the shared unrolled-Lloyd fit chain plus the
    md5-smallest-n-per-cluster sample rule (DIVERSE_SAMPLE_SQL);
    coverage, balance-under-skew and partition-determinism
    additionally pinned in tests/test_clustering.py."""
    from gapless_deribit_clickhouse_spark.pipelines.clustering import (
        diverse_sample,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return diverse_sample(
        emb, n_per_cluster=_DS_N, k=_SD_K, max_iter=_SD_ITER, seed=_SD_SEED
    )


def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: spherical k-means (k=8,
    hash-seeded, deterministic) then per-cluster greedy cosine pruning.

    FULL cross-engine value oracle since r10 (was rows-only): the fit
    loop has a FIXED iteration budget (max_iter=8, tol early-stop), so
    the DuckDB twin unrolls all 8 Lloyd iterations as chained CTEs
    with a converged-freeze flag, replays the hash-seeded init, the
    argmax-cosine assign (tie -> lowest cid), the empty-keeps-old /
    renormalize update, the md5 chunk rule, and then walks the greedy
    farthest-first prune as a keyed WITH RECURSIVE carrying the
    kept-set (ids + unit vectors) in the recursion state. Threshold
    0.35 (not the paper-typical 0.97) because the synthetic corpus's
    max pairwise cosine is ~0.51 — at 0.97 the duplicate branch would
    never fire and the oracle would only check the keep path; 0.35 is
    the same bar ``embedding_near_dup`` uses, so both prune branches
    are exercised cross-engine. Paper-threshold behavior on planted
    near-dups stays pinned in tests/test_clustering.py."""
    from gapless_deribit_clickhouse_spark.pipelines.clustering import (
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding",
        k=_SD_K, threshold=_SD_THR, max_iter=_SD_ITER, seed=_SD_SEED,
    )


def _sd_iter_ctes(i: int) -> str:
    """One unrolled Lloyd iteration for the semantic_dedup oracle:
    assign under c{i-1} (argmax dot, tie -> lowest cid — numpy argmax
    parity), per-cluster component sums, renormalized update with
    empty-cluster-keeps-old and zero-norm-divides-by-1 (the
    ``_normalize_rows`` rule), max-L2 centroid shift, and the
    converged-freeze flag that mirrors the fit loop's ``break``."""
    p = i - 1
    return f"""
a{i} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.c) DESC, c.cid) AS rk
    FROM e CROSS JOIN c{p} c) WHERE rk = 1),
s{i} AS (
  SELECT cid, list(sm ORDER BY dim) AS sv FROM (
    SELECT cid, dim, sum(x) AS sm FROM (
      SELECT cid, generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM a{i})
    GROUP BY cid, dim) GROUP BY cid),
craw{i} AS (
  SELECT p.cid,
         CASE WHEN s.cid IS NULL THEN p.c
              ELSE list_transform(s.sv, x -> x /
                (CASE WHEN sqrt(list_dot_product(s.sv, s.sv)) = 0 THEN 1.0
                      ELSE sqrt(list_dot_product(s.sv, s.sv)) END))
         END AS c
  FROM c{p} p LEFT JOIN s{i} s USING (cid)),
sh{i} AS (
  SELECT max(sqrt(ss)) AS shift FROM (
    SELECT n.cid, sum((n.x - o.x) * (n.x - o.x)) AS ss
    FROM (SELECT cid, generate_subscripts(c,1) AS dim, unnest(c) AS x FROM craw{i}) n
    JOIN (SELECT cid, generate_subscripts(c,1) AS dim, unnest(c) AS x FROM c{p}) o
      USING (cid, dim)
    GROUP BY n.cid)),
c{i} AS MATERIALIZED (
  SELECT p.cid, CASE WHEN (SELECT f FROM frz{p}) THEN p.c ELSE n.c END AS c
  FROM c{p} p JOIN craw{i} n USING (cid)),
frz{i} AS (
  SELECT CASE WHEN (SELECT f FROM frz{p}) THEN true
              ELSE (SELECT shift FROM sh{i}) < {_SD_TOL!r} END AS f)"""


def _kmeans_fit_block() -> str:
    """The shared spherical-k-means fit chain every clustering oracle
    builds on (semantic_dedup, diverse_sample, ivf_kmeans_topk — all
    three bindings fit with k=8, seed=42, max_iter=8, tol=1e-6, so the
    fitted centroids are IDENTICAL and the SQL is one generator):
    ``e`` (usable rows, unit-normalized), ``c0`` (md5-smallest-K
    seeds), and the 8 unrolled Lloyd iterations ending at
    ``c{_SD_ITER}``. Emitted as the leading CTEs of a WITH RECURSIVE
    statement."""
    iters = ",".join(_sd_iter_ctes(i) for i in range(1, _SD_ITER + 1))
    return f"""e AS MATERIALIZED (
  SELECT vec_id, list_transform(raw, x -> x / nrm) AS v FROM (
    SELECT vec_id, embedding::DOUBLE[] AS raw,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) = {_EMB_DIM})
  WHERE nrm > 0 AND isfinite(nrm)),
c0 AS (
  SELECT CAST(rn - 1 AS INT) AS cid, v AS c FROM (
    SELECT vec_id, v, row_number() OVER (
      ORDER BY md5('{_SD_SEED}:' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM e) WHERE rn <= {_SD_K}),
frz0 AS (SELECT false AS f),
{iters}"""


def _semantic_dedup_oracle_sql() -> str:
    """The composed oracle: usable filter + unit normalization, the
    md5-smallest-K seed rule, {_SD_ITER} unrolled Lloyd iterations,
    final assign with centroid_sim, the chunk rule (hash_u32 %
    nchunks; 1 chunk below the 4096 cap), and the greedy prune as a
    keyed recursion over scan order (centroid_sim asc, vec_id asc)
    whose state carries the kept ids + unit vectors; dup_of takes the
    FIRST max-cosine kept doc (list_position == numpy argmax's
    first-on-tie). Recursion-fed CTEs are MATERIALIZED — inlined,
    DuckDB re-evaluates them per recursion iteration."""
    sims = "list_transform(r.kvs, kv -> list_dot_product(kv, i.v))"
    is_dup = f"len(r.kids) > 0 AND list_max({sims}) >= {_SD_THR!r}"
    return f"""
WITH RECURSIVE {_kmeans_fit_block()},
fin AS MATERIALIZED (
  SELECT vec_id, v, cid AS cluster_id, sim AS centroid_sim FROM (
    SELECT e.vec_id, e.v, c.cid, list_dot_product(e.v, c.c) AS sim,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.c) DESC, c.cid) AS rk
    FROM e CROSS JOIN c{_SD_ITER} c) WHERE rk = 1),
sz AS (SELECT cluster_id, count(*) AS s FROM fin GROUP BY cluster_id),
pr AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY cluster_id, chunk
                               ORDER BY centroid_sim, vec_id) AS idx
  FROM (
    SELECT f.vec_id, f.v, f.cluster_id, f.centroid_sim,
           CASE WHEN z.s <= {_SD_MAX_CLUSTER} THEN 0
                ELSE CAST(CAST(('0x' || substr(md5(CAST(f.vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % CAST(ceil(z.s / {0.75 * _SD_MAX_CLUSTER!r}) AS BIGINT) AS INT)
           END AS chunk
    FROM fin f JOIN sz z USING (cluster_id))),
rec(cluster_id, chunk, idx, vec_id, centroid_sim, kept, dup_of, kids, kvs) AS (
  SELECT cluster_id, chunk, 0, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
         CAST(NULL AS BOOLEAN), CAST(NULL AS BIGINT),
         CAST([] AS BIGINT[]), CAST([] AS DOUBLE[][])
  FROM (SELECT DISTINCT cluster_id, chunk FROM pr)
  UNION ALL
  SELECT r.cluster_id, r.chunk, i.idx, i.vec_id, i.centroid_sim,
         NOT ({is_dup}),
         CASE WHEN {is_dup}
              THEN r.kids[list_position({sims}, list_max({sims}))] END,
         CASE WHEN NOT ({is_dup}) THEN list_append(r.kids, i.vec_id)
              ELSE r.kids END,
         CASE WHEN NOT ({is_dup}) THEN list_append(r.kvs, i.v)
              ELSE r.kvs END
  FROM rec r JOIN pr i
    ON i.cluster_id = r.cluster_id AND i.chunk = r.chunk AND i.idx = r.idx + 1)
SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id, centroid_sim, kept, dup_of
FROM rec WHERE idx > 0
"""


SEMANTIC_DEDUP_SQL = _semantic_dedup_oracle_sql()


def _diverse_sample_oracle_sql() -> str:
    """diverse_sample = the shared fit chain -> final assign (argmax
    dot, tie lowest cid, centroid_sim) -> sample_n_per_group's hash
    rule (the n rows with the smallest md5(vec_id) per cluster, tie by
    vec_id — the two-level tournament is exact by construction, so the
    single-window form IS the oracle)."""
    return f"""
WITH RECURSIVE {_kmeans_fit_block()},
fin AS (
  SELECT vec_id, cid AS cluster_id, sim AS centroid_sim FROM (
    SELECT e.vec_id, c.cid, list_dot_product(e.v, c.c) AS sim,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.c) DESC, c.cid) AS rk
    FROM e CROSS JOIN c{_SD_ITER} c) WHERE rk = 1)
SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id, centroid_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM fin) WHERE rn <= {_DS_N}
"""


def _ivf_kmeans_oracle_sql() -> str:
    """ivf_kmeans_topk = the shared fit chain -> corpus inverted lists
    (argmax assign) -> per-query nprobe nearest centroids (dot DESC,
    cid — numpy stable argsort parity) -> exact cosine on the probed
    lists -> per-query top-k window (cosine DESC, vec_id). Queries are
    the binding's vec_id < 20 slice under the probe stage's own guard
    (non-null, contract width, positive norm)."""
    return f"""
WITH RECURSIVE {_kmeans_fit_block()},
lists AS (
  SELECT vec_id, v, cid AS cluster_id FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.c) DESC, c.cid) AS rk
    FROM e CROSS JOIN c{_SD_ITER} c) WHERE rk = 1),
q AS (
  SELECT vec_id AS query_id, list_transform(raw, x -> x / nrm) AS qv FROM (
    SELECT vec_id, embedding::DOUBLE[] AS raw,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
    WHERE vec_id < {_IVF_NQ} AND embedding IS NOT NULL
      AND len(embedding) = {_EMB_DIM})
  -- NOT isnan, not isfinite: the engine's numpy guard (nrms > 0) is
  -- False for NaN but TRUE for +inf (an inf-norm query normalizes to
  -- the SAME NaN-bearing vector on BOTH engines: the inf component
  -- becomes inf/inf = NaN, finite components become 0 — identical,
  -- so parity holds); DuckDB orders NaN above zero, so nrm > 0 alone
  -- would keep NaN-norm queries the engine drops
  WHERE nrm > 0 AND NOT isnan(nrm)),
probes AS (
  SELECT query_id, qv, cid AS cluster_id FROM (
    SELECT q.query_id, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, c.c) DESC, c.cid) AS rk
    FROM q CROSS JOIN c{_SD_ITER} c) WHERE rk <= {_IVF_NPROBE}),
scored AS (
  SELECT p.query_id, l.vec_id,
         list_dot_product(l.v, p.qv) AS cosine_sim
  FROM lists l JOIN probes p USING (cluster_id))
SELECT query_id, vec_id, CAST(rank AS INT) AS rank, cosine_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM scored) WHERE rank <= {_IVF_K}
"""


DIVERSE_SAMPLE_SQL = _diverse_sample_oracle_sql()
IVF_KMEANS_TOPK_SQL = _ivf_kmeans_oracle_sql()


def training_set_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-set assembly flagship (curate -> near
    dedup -> chunk -> pack) on the documents table.

    FULL cross-engine value oracle since r10 (was rows-only): the
    chunk-projection chain was already oracled
    (TRAINING_SET_CHUNKS_SQL); the FFD pack tier joins it via the
    shared keyed-recursion walk (see sequence_packing), so every
    output column — pack_id and pack_pos included — is value-checked
    against DuckDB. Invariants additionally pinned in
    tests/test_packing.py::test_build_training_set_end_to_end."""
    from gapless_deribit_clickhouse_spark.pipelines.curation import (
        build_training_set,
    )

    return build_training_set(
        _docs(spark, sf_dir), lang="en", min_quality=0.3,
        dedup_threshold=_DEDUP_THRESHOLD,
        max_tokens=_TS_BUDGET, overlap=16, num_shards=_PACK_SHARDS,
    )


def training_set_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship's chunk projection, oracle-checked (VERDICT r4
    next-round #1): everything ``build_training_set`` emits EXCEPT the
    FFD pack assignment — chunk identity, text, and the per-chunk
    BPE-ish token count the packer budgets on — is deterministic
    column algebra over curate -> LSH near-dedup -> chunk, all
    SQL-expressible. Runs the REAL composed pipeline (same params as
    ``training_set``), then drops the two iterative columns, so the
    driver/CI value-compare pins the flagship end to end up to pack
    assignment; the pack tier is pinned by the SQL invariant test in
    tests/test_packing.py."""
    from gapless_deribit_clickhouse_spark.pipelines.curation import (
        build_training_set,
    )

    return build_training_set(
        _docs(spark, sf_dir), lang="en", min_quality=0.3,
        dedup_threshold=_DEDUP_THRESHOLD,
        max_tokens=128, overlap=16, num_shards=16,
    ).select("chunk_uid", "doc_id", "chunk_idx", "chunk_text", "n_tokens")


def _minhash_sql_parts(thr: float) -> tuple[str, str, str]:
    """The three DuckDB fragments of the banded-minhash derivation —
    (base shingle hash, per-signature min expressions, band equality
    over aliases a/b) — auto-sized from the threshold with the SAME
    ``minhash_params`` call the Spark side uses. ONE generator for
    every oracle that reproduces the banding (the within-set CC chain
    and the incremental cross tier): a change to the band layout or
    base hash lands in both or neither."""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        MINHASH_PRIME as _P,
        minhash_affine_params,
        minhash_params,
    )

    num_hashes, bands = minhash_params(thr)
    r = num_hashes // bands
    base = (
        "list_reduce(list_transform(range(1, 16), i -> "
        "CAST(strpos('0123456789abcdef', substr(md5('0:' || shingle), i, 1)) - 1 AS BIGINT)), "
        f"(acc, d) -> (acc * 16 + d) % {_P})"
    )
    mins = ",\n         ".join(
        f"min((h * CAST({a} AS BIGINT) + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_affine_params(num_hashes))
    )
    band_eq = " OR ".join(
        "("
        + " AND ".join(f"a.h{b * r + i} = b.h{b * r + i}" for i in range(r))
        + ")"
        for b in range(bands)
    )
    return base, mins, band_eq


def _lsh_cc_kept_ctes(survivor_cte: str, thr: float) -> str:
    """The MinHash-LSH -> exact-Jaccard -> connected-components ->
    survivors CTE chain, from a (doc_id) relation named
    ``survivor_cte`` to a ``kept`` relation — shared by the
    training_set_chunks and near_dedup_docs oracles so the dedup
    semantics cannot desync. Auto-sizes (num_hashes, bands) from the
    threshold with the SAME ``minhash_params`` derivation the Spark
    side uses; components via recursive reachability (the
    DUP_CLUSTERS_SQL pattern). Must be spliced after a
    ``WITH RECURSIVE`` head."""
    base, mins, band_eq = _minhash_sql_parts(thr)
    return f"""stoks AS (
  SELECT d.doc_id, string_split({_NORM}, ' ') AS t
  FROM documents d JOIN {survivor_cte} USING (doc_id)),
sgrams AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
    ELSE [array_to_string(t, ' ')] END)) AS shingle FROM stoks),
hg AS (SELECT doc_id, {base} AS h FROM sgrams),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hg GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE {band_eq}),
ssz AS (SELECT doc_id, count(*) AS c FROM sgrams GROUP BY doc_id),
jac AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN sgrams ga ON ga.doc_id = c.id_a
  JOIN sgrams gb ON gb.doc_id = c.id_b AND gb.shingle = ga.shingle
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b
  FROM jac JOIN ssz sa ON sa.doc_id = id_a JOIN ssz sb ON sb.doc_id = id_b
  WHERE inter / (sa.c + sb.c - inter) >= {thr}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
walk(u, rr) AS (
  SELECT u, v FROM edges
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.rr = e.u AND e.v <> w.u),
comp AS (
  SELECT u AS id, least(min(rr), u) AS component FROM walk GROUP BY u),
losers AS (SELECT id FROM comp WHERE component <> id),
kept AS (
  SELECT doc_id FROM {survivor_cte}
  WHERE doc_id NOT IN (SELECT id FROM losers))"""


def _training_chunks_sql() -> str:
    """Composed oracle for the flagship's chunk projection: the
    curation CTEs (shared with CURATE_SQL), the shared LSH/CC dedup
    chain (``_lsh_cc_kept_ctes``, shared with NEAR_DEDUP_DOCS_SQL),
    then the 128/16 sliding chunker (the DOC_CHUNKS_SQL pattern) over
    the kept docs, with the packer's BPE-ish per-chunk token count."""
    # chunker params must match training_set_chunks_q: 128-token
    # windows, overlap 16 -> stride 112
    mt, stride = 128, 112
    bpe = (
        "CAST(len(list_filter(regexp_split_to_array(ch.chunk_text, '[^a-z0-9]+'), x -> len(x) > 0))"
        " + length(regexp_replace(ch.chunk_text, '[a-z0-9 ]', '', 'g')) AS BIGINT)"
    )
    return f"""
WITH RECURSIVE {_curate_ctes(0.3)},
{_lsh_cc_kept_ctes("curated", _DEDUP_THRESHOLD)},
ctoks AS (
  SELECT d.doc_id,
         COALESCE(list_filter(string_split({_NORM}, ' '), x -> len(x) > 0), []) AS t
  FROM documents d JOIN kept USING (doc_id)),
cn AS (
  SELECT doc_id, t, len(t) AS nt,
         CASE WHEN len(t) <= {mt} THEN 1
              ELSE CAST(ceil((len(t) - {mt}) / {stride}.0) AS INT) + 1 END AS nc
  FROM ctoks),
ex AS (
  SELECT doc_id, nt, nc,
         unnest(list_transform(range(nc), i -> {{
             'chunk_idx': CAST(i AS INT),
             'chunk_text': array_to_string(t[i * {stride} + 1 : i * {stride} + {mt}], ' ')
         }})) AS ch
  FROM cn)
SELECT CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':'
           || CAST(doc_id AS VARCHAR) || ':'
           || CAST(ch.chunk_idx AS VARCHAR) AS chunk_uid,
       doc_id, ch.chunk_idx AS chunk_idx, ch.chunk_text AS chunk_text,
       {bpe} AS n_tokens
FROM ex
"""


TRAINING_SET_CHUNKS_SQL = _training_chunks_sql()

# packer params shared by the sequence_packing binding (512-token
# budget over raw documents) and its oracle; the shard count is also
# the training_set flagship's, whose chunker AND packer budget is
# _TS_BUDGET (declared here, before first use — constants after
# their referencing functions only work until someone moves the
# module-level *_SQL = fn() calls, r10 self-review)
_PACK_BUDGET, _PACK_SHARDS = 512, 16
_TS_BUDGET = 128


def _ffd_rec_ctes(
    items_cte: str, budget: int, id_sql_type: str = "BIGINT"
) -> str:
    """The FFD walk as a keyed recursion, from an ``{items_cte}``
    relation (id, n_tokens, shard) to an ``assigned`` relation (id,
    n_tokens, pack_id) — shared by the sequence_packing and
    training_set oracles. State per shard: ``rooms`` (remaining
    capacity of each OPEN pack, creation order — oversized packs are
    closed at creation and never enter), ``tree_pack`` (open-pack ->
    global pack index), ``next_pack``. First-fit = lowest-index room
    that fits (list_position == the segment tree's prefer-left
    descent; 0 = not found, hence the nullif). The fit position is
    computed ONCE per step in a derived table (r10 self-review: six
    textual inlinings rescanned the rooms list six times). pack_pos
    is NOT carried: docs join packs in processing order, so it is a
    post-hoc window (row_number per pack over the same order)."""
    return f"""ord AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY shard
                               ORDER BY n_tokens DESC, id) AS idx
  FROM {items_cte}),
rec(shard, idx, id, n_tokens, pack_local, rooms, tree_pack, next_pack) AS (
  SELECT shard, 0, CAST(NULL AS {id_sql_type}), CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT), CAST([] AS BIGINT[]), CAST([] AS BIGINT[]),
         CAST(0 AS BIGINT)
  FROM (SELECT DISTINCT shard FROM ord)
  UNION ALL
  SELECT shard, idx, id, n_tokens,
         CASE WHEN fit IS NOT NULL THEN tree_pack[fit] ELSE next_pack END,
         CASE WHEN fit IS NOT NULL THEN
                list_transform(rooms, (rm, j) ->
                  CASE WHEN j = fit THEN rm - n_tokens ELSE rm END)
              WHEN n_tokens <= {budget} THEN
                list_append(rooms, {budget} - n_tokens)
              ELSE rooms END,
         CASE WHEN fit IS NULL AND n_tokens <= {budget} THEN
                list_append(tree_pack, next_pack)
              ELSE tree_pack END,
         next_pack + CASE WHEN fit IS NULL THEN 1 ELSE 0 END
  FROM (
    SELECT r.shard, i.idx, i.id, i.n_tokens,
           r.rooms, r.tree_pack, r.next_pack,
           CASE WHEN i.n_tokens <= {budget} THEN
             nullif(list_position(
               list_transform(r.rooms, rm -> rm >= i.n_tokens), true), 0)
           END AS fit
    FROM rec r JOIN ord i ON i.shard = r.shard AND i.idx = r.idx + 1)),
assigned AS (
  SELECT id, n_tokens, shard * {1 << 40} + pack_local AS pack_id
  FROM rec WHERE idx > 0)"""


def _training_set_oracle_sql() -> str:
    """The FULL flagship oracle (r10 — was rows-only): the proven
    chunk-projection chain (curate -> LSH/CC dedup -> chunker, the
    TRAINING_SET_CHUNKS_SQL statement verbatim, nested as a
    MATERIALIZED CTE) plus the shared FFD recursion over chunk_uid
    items at the binding's 128-token budget and the md5 shard split,
    with pack_pos recovered post-hoc (docs join packs in processing
    order, so it is a per-pack row_number over the same (n_tokens
    DESC, id) order)."""
    return f"""
WITH RECURSIVE chunks AS MATERIALIZED ({TRAINING_SET_CHUNKS_SQL}),
items AS MATERIALIZED (
  SELECT chunk_uid AS id, n_tokens,
         CAST(('0x' || substr(md5(chunk_uid), 1, 8)) AS BIGINT)
           % {_PACK_SHARDS} AS shard
  FROM chunks),
{_ffd_rec_ctes('items', _TS_BUDGET, id_sql_type='VARCHAR')},
pos AS (
  SELECT id, n_tokens, pack_id,
         CAST(row_number() OVER (PARTITION BY pack_id
                                 ORDER BY n_tokens DESC, id) - 1 AS INT)
           AS pack_pos
  FROM assigned)
SELECT c.chunk_uid, c.doc_id, c.chunk_idx, c.chunk_text,
       p.pack_id, p.pack_pos, p.n_tokens,
       p.n_tokens > {_TS_BUDGET} AS oversized
FROM pos p JOIN chunks c ON c.chunk_uid = p.id
"""


TRAINING_SET_SQL = _training_set_oracle_sql()


def near_dedup_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-call near-dedup corpus filter as its own oracle-checked
    binding (round 5 — previously exercised only inside the
    training_set composition): exact tier -> auto-sized MinHash-LSH
    pairs on survivors -> connected components -> anti-join losers,
    projected to the compare-friendly columns."""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        near_dedup_corpus,
    )

    return near_dedup_corpus(_docs(spark, sf_dir), threshold=_DEDUP_THRESHOLD).select(
        "doc_id", "lang", "source"
    )


NEAR_DEDUP_DOCS_SQL = f"""
WITH RECURSIVE winners AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5({_NORM})),
{_lsh_cc_kept_ctes("winners", _DEDUP_THRESHOLD)}
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN kept USING (doc_id)
"""


def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing of the documents table (BPE-ish token
    proxy, 512-token packs) reduced to the corpus-level packing
    quality rollup (pack count, fill rate, oversized packs).

    FULL cross-engine value oracle since r10 (was rows-only): first-
    fit-decreasing is sequential per shard, but the per-item decision
    is loop-free — "first open pack with room >= size, else open one"
    — so the DuckDB twin walks each shard's (n_tokens DESC, id ASC)
    order as a keyed WITH RECURSIVE whose state carries the open-pack
    rooms list (the segment tree is an ACCELERATOR for that list
    scan, not different semantics), then replays the pack_stats
    rollup. Requires the md5 shard split (``pack_sequences``
    shard_hash default) so both engines partition identically."""
    from gapless_deribit_clickhouse_spark.pipelines.packing import (
        pack_sequences,
        pack_stats,
    )

    docs = _docs(spark, sf_dir)
    packed = pack_sequences(
        docs, id_col="doc_id", text_col="text",
        max_tokens=_PACK_BUDGET, num_shards=_PACK_SHARDS,
    )
    return pack_stats(packed, max_tokens=_PACK_BUDGET)



def _sequence_packing_oracle_sql() -> str:
    """items = BPE-ish token counts + the hash_u32 md5 shard split,
    then the shared FFD recursion, then the pack_stats rollup."""
    bpe = (
        f"len(list_filter(regexp_split_to_array({_NORM}, '[^a-z0-9]+'), x -> len(x) > 0))"
        f" + length(regexp_replace({_NORM}, '[a-z0-9 ]', '', 'g'))"
    )
    return f"""
WITH RECURSIVE items AS MATERIALIZED (
  SELECT doc_id AS id,
         CAST(COALESCE({bpe}, 0) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {_PACK_SHARDS} AS shard
  FROM documents),
{_ffd_rec_ctes('items', _PACK_BUDGET)},
per_pack AS (
  SELECT pack_id, count(*) AS n_docs, sum(n_tokens) AS pack_tokens,
         max(CASE WHEN n_tokens > {_PACK_BUDGET} THEN 1 ELSE 0 END) AS has_oversized
  FROM assigned GROUP BY pack_id)
SELECT CAST(count(*) AS BIGINT) AS n_packs,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       avg(n_docs) AS avg_docs_per_pack,
       sum(least(pack_tokens, {_PACK_BUDGET}))
         / (count(*) * CAST({_PACK_BUDGET} AS DOUBLE)) AS fill_rate,
       CAST(sum(has_oversized) AS BIGINT) AS oversized_packs
FROM per_pack
"""


SEQUENCE_PACKING_SQL = _sequence_packing_oracle_sql()


# --- PII scrubbing (pure regex column algebra, CI-oracle demoted) ---
def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.scrub import scrub_documents

    return scrub_documents(load_table(spark, sf_dir, "documents"))


def _pii_scrub_sql() -> str:
    """Oracle generated from the SAME PII_PATTERNS list the Spark side
    applies (single source of truth — a pattern edit cannot desync the
    two engines). Patterns stay within the Java-regex/RE2 common
    subset; DuckDB needs the 'g' flag to match Spark's replace-all."""
    from gapless_deribit_clickhouse_spark.pipelines.scrub import PII_PATTERNS

    clean = "text"
    for _name, pattern, repl in PII_PATTERNS:
        p = pattern.replace("'", "''")
        clean = f"regexp_replace({clean}, '{p}', '{repl}', 'g')"
    counts = ", ".join(
        f"coalesce(len(regexp_extract_all(text, '{pattern}')), 0) AS n_{name}"
        for name, pattern, _repl in PII_PATTERNS
    )
    total = " + ".join(
        f"coalesce(len(regexp_extract_all(text, '{pattern}')), 0)"
        for _name, pattern, _repl in PII_PATTERNS
    )
    return (
        f"SELECT doc_id, {clean} AS clean_text, {counts}, "
        f"{total} AS n_pii_total FROM documents"
    )


PII_SCRUB_SQL = _pii_scrub_sql()


BINDINGS = [
    ("tfidf_top_terms", tfidf_q, TFIDF_SQL),
    ("repetition_stats", repetition_q, REPETITION_SQL),
    ("contamination", contamination_q, CONTAMINATION_SQL),
    ("corpus_profile", corpus_profile_q, CORPUS_PROFILE_SQL),
    ("curate_corpus", curate_q, CURATE_SQL),
    ("dup_clusters", dup_clusters_q, DUP_CLUSTERS_SQL),
    ("hash_sample", hash_sample_q, HASH_SAMPLE_SQL),
    ("mixture_sample", mixture_sample_q, MIXTURE_SAMPLE_SQL),
    ("sample_per_group", sample_per_group_q, SAMPLE_PER_GROUP_SQL),
    ("token_topk", token_topk_q, TOKEN_TOPK_SQL),
    ("dedup_exact", dedup_exact_q, DEDUP_EXACT_SQL),
    ("ngram_jaccard_pairs", ngram_jaccard_q, NGRAM_JACCARD_SQL),
    ("minhash_lsh_pairs", minhash_lsh_q, MINHASH_LSH_SQL),
    ("simhash_near_pairs", simhash_q, SIMHASH_SQL),
    ("cosine_topk", cosine_topk_q, COSINE_TOPK_SQL),
    ("embedding_near_dup", emb_near_dup_q, EMB_NEAR_DUP_SQL),
    ("ivf_topk", ivf_topk_q, IVF_TOPK_SQL),
    ("text_quality", quality_q, QUALITY_SQL),
    ("lang_id", lang_id_q, LANG_ID_SQL),
    ("doc_fingerprint", fingerprint_q, FINGERPRINT_SQL),
    ("token_counts", token_counts_q, TOKEN_COUNTS_SQL),
    ("pii_scrub", pii_scrub_q, PII_SCRUB_SQL),
    # iterative operators, ALL fully value-oracled since r10 (the
    # fixed iteration budgets make them SQL-expressible: unrolled
    # Lloyd CTEs + keyed recursions); value-level behavior is ALSO
    # pinned in tests/test_clustering.py and tests/test_packing.py.
    # egarch_params (extra_ops) is the one remaining rows-only binding.
    ("semantic_dedup", semantic_dedup_q, SEMANTIC_DEDUP_SQL),
    ("sequence_packing", sequence_packing_q, SEQUENCE_PACKING_SQL),
    ("ivf_kmeans_topk", ivf_kmeans_topk_q, IVF_KMEANS_TOPK_SQL),
    ("diverse_sample", diverse_sample_q, DIVERSE_SAMPLE_SQL),
    ("training_set", training_set_q, TRAINING_SET_SQL),
    # NOT rows-only: full oracles, value-checked by the CI past-window
    # compare (the driver's 50-entry window is already full)
    ("classifier_score", classifier_score_q, CLASSIFIER_SQL),
    ("doc_chunks", doc_chunks_q, DOC_CHUNKS_SQL),
    # the flagship's chunk projection with a FULL composed oracle
    # (curate -> LSH near-dedup -> components -> chunk); the pack tier
    # is pinned by the SQL invariant test in tests/test_packing.py
    ("training_set_chunks", training_set_chunks_q, TRAINING_SET_CHUNKS_SQL),
    # the one-call near-dedup filter, oracle-checked standalone
    ("near_dedup_docs", near_dedup_docs_q, NEAR_DEDUP_DOCS_SQL),
]


# --- leakage-safe deterministic split assignment ---
_SPLIT_WEIGHTS = [("train", 0.9), ("val", 0.05), ("test", 0.05)]


def split_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test labels keyed on doc_id: a salted
    md5-bucket when-chain — pure map, no shuffle, hash-stable
    membership the DuckDB oracle reproduces bit-for-bit (both sides
    derive thresholds from the SAME ``split_thresholds`` call and the
    same md5 bucket mirror, so they cannot desync)."""
    from gapless_deribit_clickhouse_spark.pipelines.sampling import split_assign

    return split_assign(_docs(spark, sf_dir), "doc_id", weights=_SPLIT_WEIGHTS).select(
        "doc_id", "lang", "split"
    )


def _split_assign_sql() -> str:
    from gapless_deribit_clickhouse_spark.pipelines.sampling import (
        split_thresholds,
    )

    cases = "\n            ".join(
        f"WHEN bucket < {t} THEN '{name}'"
        for name, t in split_thresholds(_SPLIT_WEIGHTS)
    )
    return f"""
WITH b AS (
  SELECT doc_id, lang,
         {_md5_bucket_sql("doc_id", salt="split")} AS bucket
  FROM documents)
SELECT doc_id, lang,
       CASE {cases}
            ELSE '{_SPLIT_WEIGHTS[-1][0]}' END AS split
FROM b
"""


SPLIT_ASSIGN_SQL = _split_assign_sql()


# --- inter-document repetition (duplicated n-gram fraction) ---
def interdoc_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of distinct 3-gram shingles shared with >= 5
    documents — the RefinedWeb-style boilerplate/template signal,
    complementing repetition_stats' intra-document measure."""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        interdoc_repetition,
    )

    return interdoc_repetition(_docs(spark, sf_dir), min_docs=5)


INTERDOC_REPETITION_SQL = f"""
WITH toks AS ({_TOKS}),
grams AS ({_GRAMS3}),
freq AS (SELECT shingle, count(*) AS df_count FROM grams GROUP BY shingle)
SELECT g.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN f.df_count >= 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS shared_shingles,
       CAST(sum(CASE WHEN f.df_count >= 5 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS shared_fraction
FROM grams g JOIN freq f USING (shingle)
GROUP BY g.doc_id
"""


# --- incremental dedup: new batch vs existing corpus ---
def incremental_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The steady-state dedup shape: documents with doc_id % 5 >= 3
    arrive as the NEW batch and are deduped within-batch AND against
    the % 5 < 3 'existing corpus' — exact digest anti-join plus
    banded-LSH candidates with exact-Jaccard verification, never a
    corpus-corpus pair."""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        incremental_dedup,
    )

    docs = _docs(spark, sf_dir)
    batch = docs.filter(F.col("doc_id") % 5 >= 3)
    corpus = docs.filter(F.col("doc_id") % 5 < 3)
    return incremental_dedup(batch, corpus, threshold=_DEDUP_THRESHOLD).select(
        "doc_id", "lang", "source"
    )


def _incremental_dedup_sql(thr: float) -> str:
    """Oracle for ``incremental_dedup_q``: the within-batch tier is
    the SAME composed chain as near_dedup_docs (``_lsh_cc_kept_ctes``
    over the batch's exact-dedup winners), then an exact digest
    anti-join against the corpus, then cross-batch banded-minhash
    candidates (same auto-sized params, same affine family) verified
    with exact shingle Jaccard."""
    base, mins, band_eq = _minhash_sql_parts(thr)
    norm_c = _NORM.replace("(text)", "(c.text)")
    return f"""
WITH RECURSIVE corp AS (
  SELECT doc_id FROM documents WHERE doc_id % 5 < 3),
winners AS (
  SELECT min(d.doc_id) AS doc_id
  FROM documents d WHERE d.doc_id % 5 >= 3
  GROUP BY md5({_NORM})),
{_lsh_cc_kept_ctes("winners", thr)},
kept2 AS (
  SELECT k.doc_id
  FROM kept k JOIN documents d USING (doc_id)
  WHERE md5({_NORM}) NOT IN (
    SELECT md5({norm_c}) FROM documents c JOIN corp USING (doc_id))),
univ AS (SELECT doc_id FROM kept2 UNION ALL SELECT doc_id FROM corp),
stoksx AS (
  SELECT d.doc_id, string_split({_NORM}, ' ') AS t
  FROM documents d JOIN univ USING (doc_id)),
sgramsx AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
    ELSE [array_to_string(t, ' ')] END)) AS shingle FROM stoksx),
hgx AS (SELECT doc_id, {base} AS h FROM sgramsx),
sigx AS (
  SELECT doc_id,
         {mins}
  FROM hgx GROUP BY doc_id),
candx AS (
  SELECT a.doc_id AS new_id, b.doc_id AS corp_id
  FROM sigx a JOIN sigx b
    ON a.doc_id IN (SELECT doc_id FROM kept2)
   AND b.doc_id IN (SELECT doc_id FROM corp)
   AND ({band_eq})),
sszx AS (SELECT doc_id, count(*) AS c FROM sgramsx GROUP BY doc_id),
jacx AS (
  SELECT c.new_id, c.corp_id, count(*) AS inter
  FROM candx c
  JOIN sgramsx ga ON ga.doc_id = c.new_id
  JOIN sgramsx gb ON gb.doc_id = c.corp_id AND gb.shingle = ga.shingle
  GROUP BY 1, 2),
crosslosers AS (
  SELECT DISTINCT new_id AS doc_id
  FROM jacx
  JOIN sszx sa ON sa.doc_id = new_id
  JOIN sszx sb ON sb.doc_id = corp_id
  WHERE inter / (sa.c + sb.c - inter) >= {thr})
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN kept2 USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_id FROM crosslosers)
"""


INCREMENTAL_DEDUP_SQL = _incremental_dedup_sql(_DEDUP_THRESHOLD)


# Round-5 curation additions, registered past the driver's stable
# first-50 window (same CI value-check path as every tail binding)
# --- JL random-projection dimensionality reduction ---
_PROJECT_OUT_DIM = 8


def embedding_project_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project the 64-d embeddings to 8 components against the seeded
    Gaussian matrix and explode to (vec_id, dim_idx, value) rows — a
    float-scalar layout the rounded value compare handles exactly
    (array-of-double string formatting differs across engines)."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        project_embeddings,
    )

    out = project_embeddings(_emb(spark, sf_dir), out_dim=_PROJECT_OUT_DIM)
    return out.select(
        "vec_id", F.posexplode("projected").alias("dim_idx", "value")
    )


def _embedding_project_sql() -> str:
    """Oracle regenerates the SAME seeded Gaussian matrix (identical
    ``random_projections`` call) as literal VALUES rows; the dot is
    list_sum(list_transform(...)) — the evaluation order
    ``_proj_dot``'s fold mirrors."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        DEFAULT_LSH_SEED,
        random_projections,
    )

    dim = 64  # testdata embeddings are FLOAT[64]
    proj = random_projections(dim, _PROJECT_OUT_DIM, DEFAULT_LSH_SEED)
    # ::DOUBLE[] is load-bearing: without it DuckDB types the literal
    # list from the repr'd values (DECIMAL unless one happens to print
    # in scientific notation), FLOAT * DECIMAL evaluates single-
    # precision, and the 64-term accumulation drifts past the
    # harness's 6dp compare
    rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in row)}]::DOUBLE[])"
        for i, row in enumerate(proj)
    )
    return f"""
WITH proj(dim_idx, w) AS (VALUES
  {rows})
SELECT e.vec_id, p.dim_idx,
       list_sum(list_transform(range(1, {dim + 1}),
                j -> CAST(e.embedding[j] AS DOUBLE) * p.w[j])) AS value
FROM embeddings e CROSS JOIN proj p
WHERE e.embedding IS NOT NULL AND len(e.embedding) = {dim}
"""


EMBEDDING_PROJECT_SQL = _embedding_project_sql()


# --- corpus bigram LM quality scoring (CCNet-style ppl filter) ---
def lm_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import (
        bigram_lm_score,
    )

    return bigram_lm_score(_docs(spark, sf_dir), k=0.5)


LM_SCORE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS l
  FROM documents
  WHERE length({_NORM}) > 0 AND len(string_split({_NORM}, ' ')) >= 2),
pairs AS (
  SELECT doc_id, pr[1] AS w1, pr[2] AS w2
  FROM (SELECT doc_id, unnest(list_zip(l[1:-2], l[2:])) AS pr FROM toks) u),
cnt2 AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
cnt1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
voc AS (SELECT count(DISTINCT w2) AS v FROM pairs)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       avg(ln((c2 + 0.5) / (c1 + 0.5 * v))) AS avg_logp,
       exp(-avg(ln((c2 + 0.5) / (c1 + 0.5 * v)))) AS ppl
FROM pairs JOIN cnt2 USING (w1, w2) JOIN cnt1 USING (w1), voc
GROUP BY doc_id
"""


# --- weighted reservoir sampling (A-Res, deterministic) ---
def weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 docs per language, probability proportional to length
    (Efraimidis-Spirtsos A-Res over the canonical md5-uniform):
    the curation move for building length-balanced eval slices.
    WindowGroupLimit caps per-task output at n per group."""
    from gapless_deribit_clickhouse_spark.pipelines.sampling import (
        weighted_sample_per_group,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    out = weighted_sample_per_group(
        docs, group_col="lang", n=5, key_col="doc_id",
        weight_col="n_chars", salt="wsamp",
    )
    return out.select("lang", "rn", "doc_id", "n_chars", "priority")


def _weighted_sample_sql() -> str:
    u32 = _md5_bucket_sql("doc_id", salt="wsamp", buckets=4_294_967_296)
    return f"""
WITH w AS (
  SELECT doc_id, lang, n_chars,
         -ln(CAST(({u32}) + 1 AS DOUBLE) / 4294967296.0)
           / CAST(n_chars AS DOUBLE) AS priority
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY lang ORDER BY priority ASC, doc_id ASC) AS rn
  FROM w)
SELECT lang, rn, doc_id, n_chars, priority
FROM r WHERE rn <= 5
"""


WEIGHTED_SAMPLE_SQL = _weighted_sample_sql()


# --- composed two-signal quality gate (heuristics x corpus LM) ---
def quality_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs clearing BOTH the heuristic quality floor and the
    corpus-median perplexity cut — the composed gate whose oracle is
    the conjunction of the two already-proven chains plus an exact
    median scalar, so the composition (not just the parts) is
    value-checked."""
    from gapless_deribit_clickhouse_spark.pipelines.curation import quality_gate

    return quality_gate(_docs(spark, sf_dir), min_quality=0.5).orderBy("doc_id")


QUALITY_GATE_SQL = f"""
WITH lm AS ({LM_SCORE_SQL}),
q AS ({QUALITY_SQL})
SELECT doc_id, quality_score, ppl
FROM q JOIN lm USING (doc_id)
WHERE quality_score >= 0.5
  AND ppl <= (SELECT quantile_cont(ppl, 0.5) FROM lm)
ORDER BY doc_id
"""


# --- Okapi BM25 top-k lexical retrieval ---
# One source of truth for the bench queries: the Spark binding and the
# generated VALUES clause both read this dict, so engine and oracle
# cannot desync on query text or tokenization.
_BM25_QUERIES = {
    "q_exec": "hash join scan",
    "q_retail": "customer order filter",
    "q_stream": "stream window batch",
}


def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.retrieval import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), _BM25_QUERIES, k=10)


def _bm25_sql(k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    from gapless_deribit_clickhouse_spark.pipelines.retrieval import tokenize_query

    values = ", ".join(
        f"('{qid}', '{tok}')"
        for qid, qtext in sorted(_BM25_QUERIES.items())
        for tok in tokenize_query(qtext)
    )
    # spell every float the way Python computed it so both engines
    # subtract/multiply the SAME doubles in the SAME order
    dl = f"CASE WHEN length({_NORM}) = 0 THEN 0 ELSE len(string_split({_NORM}, ' ')) END"
    return f"""
WITH toks AS (
  SELECT doc_id, {dl} AS dl, unnest(string_split({_NORM}, ' ')) AS token
  FROM documents),
tok2 AS (SELECT * FROM toks WHERE len(token) > 0),
tf AS (
  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
  FROM tok2 GROUP BY doc_id, token),
q(query_id, token) AS (VALUES {values}),
s AS (SELECT count(*) AS n_docs, avg({dl}) AS avgdl FROM documents),
m AS (
  SELECT q.query_id, tf.doc_id, tf.token, tf.tf, tf.dl,
         count(*) OVER (PARTITION BY q.query_id, tf.token) AS df
  FROM tf JOIN q USING (token)),
sc AS (
  SELECT query_id, doc_id,
         CAST(count(*) AS BIGINT) AS n_terms,
         round(sum(ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
           * ((CAST(tf AS DOUBLE) * {k1 + 1.0!r})
              / (CAST(tf AS DOUBLE) + {k1!r}
                 * ({1.0 - b!r} + {b!r} * (CAST(dl AS DOUBLE) / avgdl))))), 6)
           AS score
  FROM m CROSS JOIN s GROUP BY query_id, doc_id),
r AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM sc)
SELECT query_id, doc_id, n_terms, score, rank FROM r WHERE rank <= {k}
"""


BM25_TOPK_SQL = _bm25_sql()


# --- int8 embedding quantization (4x shuffle/storage compression) ---
def embedding_quantize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization digest: the full qvec
    arrays stay in pytest pins (array columns stringify differently
    across engines); here every coordinate is pinned through EXACT
    integer digests — L1 mass, position-weighted checksum (catches
    any misplaced element), min/max — plus the float scale and the
    bounded reconstruction error."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        quantize_embeddings,
    )

    out = quantize_embeddings(_emb(spark, sf_dir))
    q = F.col("qvec")
    return out.select(
        "vec_id",
        "scale",
        "n_dims",
        "max_abs_err",
        F.aggregate(
            q, F.lit(0).cast("long"), lambda a, x: a + F.abs(x).cast("long")
        ).alias("q_l1"),
        F.aggregate(
            F.zip_with(
                q,
                F.sequence(F.lit(1).cast("long"), F.size(q).cast("long")),
                lambda x, i: x.cast("long") * i,
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("q_checksum"),
        F.array_min(q).cast("int").alias("q_min"),
        F.array_max(q).cast("int").alias("q_max"),
    )


EMBEDDING_QUANTIZE_SQL = """
WITH b AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
a AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM b),
s AS (
  SELECT vec_id, v, CASE WHEN amax > 0 THEN amax / 127.0 END AS scale FROM a),
q AS (
  SELECT vec_id, v, scale,
         CASE WHEN scale IS NOT NULL THEN
           list_transform(v, x -> CAST(round(x / scale) AS TINYINT)) END AS qv
  FROM s)
SELECT vec_id, scale, len(v) AS n_dims,
       CASE WHEN scale IS NOT NULL THEN
         list_max(list_transform(range(1, len(v) + 1),
                  i -> abs(v[i] - CAST(qv[i] AS DOUBLE) * scale))) END
         AS max_abs_err,
       CAST(list_sum(list_transform(qv, x -> abs(CAST(x AS BIGINT)))) AS BIGINT)
         AS q_l1,
       CAST(list_sum(list_transform(range(1, len(qv) + 1),
                     i -> CAST(qv[i] AS BIGINT) * i)) AS BIGINT) AS q_checksum,
       CAST(list_min(qv) AS INT) AS q_min,
       CAST(list_max(qv) AS INT) AS q_max
FROM q
"""


# --- brute-force top-k over the int8-quantized index ---
def quantized_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        quantized_cosine_topk,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return quantized_cosine_topk(emb, queries, k=10)


QUANTIZED_TOPK_SQL = """
WITH b AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
a AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM b),
s AS (SELECT vec_id, v, amax / 127.0 AS scale FROM a WHERE amax > 0),
q AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(round(x / scale) AS TINYINT)) AS qv
  FROM s),
n AS (
  SELECT vec_id, qv,
         CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT)))
              AS BIGINT) AS n2
  FROM q),
pairs AS (
  SELECT qq.vec_id AS query_id, cc.vec_id,
         CAST(list_sum(list_transform(range(1, len(cc.qv) + 1),
              i -> CAST(cc.qv[i] AS BIGINT) * CAST(qq.qv[i] AS BIGINT))) AS BIGINT)
           AS idot,
         cc.n2 AS cn2, qq.n2 AS qn2
  FROM n cc CROSS JOIN n qq WHERE qq.vec_id < 5),
r AS (
  SELECT query_id, vec_id,
         CAST(idot AS DOUBLE)
           / (sqrt(CAST(cn2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))) AS qcos_sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY
              CAST(idot AS DOUBLE)
                / (sqrt(CAST(cn2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))) DESC,
              vec_id) AS INT) AS rank
  FROM pairs)
SELECT query_id, vec_id, rank, qcos_sim FROM r WHERE rank <= 10
"""


# --- hybrid retrieval: RRF fusion of exact cosine + LSH-IVF ANN ---
def hybrid_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the exact brute-force ranking and the
    SRP-LSH IVF ranking over the same 5 queries — the retriever
    ensemble shape (each system's oracle is already hash-proven; this
    value-checks the FUSION on top of both)."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import ivf_topk
    from gapless_deribit_clickhouse_spark.pipelines.retrieval import rrf_fuse

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, queries, k=10)
    ann = ivf_topk(emb, queries, k=10)
    return rrf_fuse([exact, ann], on=("query_id", "vec_id"), k=10)


HYBRID_RRF_SQL = f"""
WITH a AS ({COSINE_TOPK_SQL}),
b AS ({IVF_TOPK_SQL}),
f AS (
  SELECT query_id, vec_id,
         (CASE WHEN a.rank IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN b.rank IS NOT NULL THEN 1 ELSE 0 END) AS n_systems,
         coalesce(1.0 / (60.0 + a.rank), 0.0)
           + coalesce(1.0 / (60.0 + b.rank), 0.0) AS rrf_score
  FROM a FULL JOIN b USING (query_id, vec_id)),
r AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY rrf_score DESC, vec_id) AS INT) AS rank
  FROM f)
SELECT query_id, vec_id, n_systems, rrf_score, rank FROM r WHERE rank <= 10
"""


LATE_BINDINGS = [
    ("split_assign", split_assign_q, SPLIT_ASSIGN_SQL),
    ("interdoc_repetition", interdoc_repetition_q, INTERDOC_REPETITION_SQL),
    ("incremental_dedup", incremental_dedup_q, INCREMENTAL_DEDUP_SQL),
    ("embedding_project", embedding_project_q, EMBEDDING_PROJECT_SQL),
    ("lm_score", lm_score_q, LM_SCORE_SQL),
    ("weighted_sample", weighted_sample_q, WEIGHTED_SAMPLE_SQL),
    ("quality_gate", quality_gate_q, QUALITY_GATE_SQL),
    ("bm25_topk", bm25_topk_q, BM25_TOPK_SQL),
    ("hybrid_rrf", hybrid_rrf_q, HYBRID_RRF_SQL),
    ("embedding_quantize", embedding_quantize_q, EMBEDDING_QUANTIZE_SQL),
    ("quantized_topk", quantized_topk_q, QUANTIZED_TOPK_SQL),
]


# --- deterministic epoch shuffle (exact distributed global rank) ---
def epoch_shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-1 training order of the documents table: every doc's
    exact global position under the md5 permutation
    (``pipelines/sampling.py:epoch_shuffle``). The rank is computed
    with NO global window — order-preserving 32-bit-prefix shards +
    per-shard row_number + broadcast cumulative offsets — and the
    DuckDB oracle is the naive single-sort
    ``row_number() OVER (ORDER BY md5(...), doc_id)``, so the compare
    proves the sharded derivation IS the global sort."""
    from gapless_deribit_clickhouse_spark.pipelines.sampling import epoch_shuffle

    return epoch_shuffle(
        _docs(spark, sf_dir), "doc_id", epoch=1, salt="shuffle", shards=64
    ).select("doc_id", "epoch_rank")


EPOCH_SHUFFLE_SQL = """
SELECT doc_id,
       CAST(row_number() OVER (
           ORDER BY md5('shuffle:1:' || CAST(doc_id AS VARCHAR)), doc_id
       ) - 1 AS BIGINT) AS epoch_rank
FROM documents
"""

LATE_BINDINGS.append(("epoch_shuffle", epoch_shuffle_q, EPOCH_SHUFFLE_SQL))


# --- one oracled Lloyd's k-means iteration (VERDICT r7 #4) ---
_KM_K, _KM_DIM = 4, 64


def kmeans_assign_step_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's update step with fixed centroids — the vectors of
    the ``_KM_K`` smallest vec_ids, unit-normalized (both engines
    derive them from the table the same way, so no literal
    round-tripping). Exercises the REAL shared Arrow assign kernel
    (``clustering._assign_table``) plus the partial-sum/renormalize
    update as relational ops; the oracle replays assign + update in
    pure SQL. With this bound, Lloyd's per-iteration arithmetic is
    cross-engine checked — only the LOOP (and FFD packing /
    farthest-point) remains rows-only."""
    import numpy as np

    from gapless_deribit_clickhouse_spark.pipelines.clustering import (
        _usable_rows,
        lloyd_step,
    )

    emb = _emb(spark, sf_dir)
    # centroid rows go through the SAME usable filter the oracle's `e`
    # CTE applies (non-null, contract width, positive finite norm) —
    # a degenerate vector among the smallest vec_ids must drop out of
    # the centroid set identically on both engines, not crash np.stack
    # or desync the cluster-id numbering. Selection is BY RANK (the
    # first _KM_K usable rows ordered by vec_id), not a literal
    # `vec_id < K` cutoff, so non-contiguous or non-0-based ids still
    # yield exactly K centroids (ADVICE r8) — mirrored by the oracle's
    # row_number() <= K in the `cent` CTE.
    rows = (
        _usable_rows(emb, "vec_id", "embedding", dim=_KM_DIM)
        .orderBy("__id")
        .limit(_KM_K)
        .collect()
    )
    if len(rows) != _KM_K:
        raise ValueError(
            f"kmeans_assign_step: expected {_KM_K} usable centroid rows, "
            f"got {len(rows)} — embeddings table too small or degenerate"
        )
    cents = np.stack([np.asarray(r["__v"], dtype=np.float64) for r in rows])
    return lloyd_step(emb, cents).orderBy("cluster_id", "dim")


# unit-normalization of a double list, shared by both oracle CTEs
_KM_UNIT = "list_transform({v}, x -> x / sqrt(list_dot_product({v}, {v})))"

KMEANS_ASSIGN_STEP_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {_KM_DIM}
    AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    AND isfinite(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))),
cent AS (
  -- fail-loud parity with the Spark side's ValueError (ADVICE r9):
  -- fewer than K usable rows must error here too, not silently run
  -- with a smaller centroid set than the engine under test refused.
  -- The guard is a UNION ALL branch (not a per-row CASE) so it fires
  -- even when e is EMPTY — a per-row expression over zero rows is
  -- never evaluated (r10 self-review)
  SELECT CAST(rn - 1 AS INT) AS cid, {_KM_UNIT.format(v='v')} AS c
  FROM (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn FROM e)
  WHERE rn <= {_KM_K}
  UNION ALL
  SELECT CAST(error('kmeans_assign_step: fewer than K usable centroid rows') AS INT),
         NULL
  WHERE (SELECT count(*) FROM e) < {_KM_K}),
sims AS (
  SELECT e.vec_id, cent.cid,
         list_dot_product({_KM_UNIT.format(v='e.v')}, cent.c) AS sim
  FROM e CROSS JOIN cent),
assign AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
  FROM sims),
ax AS (
  SELECT a.cid AS cluster_id,
         CAST(generate_subscripts(e.v, 1) - 1 AS INT) AS dim,
         unnest({_KM_UNIT.format(v='e.v')}) AS xn
  FROM assign a JOIN e USING (vec_id) WHERE a.rk = 1),
sums AS (
  SELECT cluster_id, dim, count(*) AS cnt, sum(xn) AS sum_x
  FROM ax GROUP BY cluster_id, dim),
nrm AS (
  SELECT cluster_id, sqrt(sum(sum_x * sum_x)) AS cn
  FROM sums GROUP BY cluster_id)
SELECT s.cluster_id, s.dim, s.cnt, s.sum_x, s.sum_x / n.cn AS new_c
FROM sums s JOIN nrm n USING (cluster_id)
ORDER BY cluster_id, dim
"""

LATE_BINDINGS.append(
    ("kmeans_assign_step", kmeans_assign_step_q, KMEANS_ASSIGN_STEP_SQL)
)


# --- asymmetric near-containment pairs (round 8) ---
def containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|A∩B| / min(|A|,|B|) >= 0.9 over trigram shingle sets — the
    small-doc-inside-big-doc duplication class symmetric Jaccard
    misses (pipelines/text_dedup.py:containment_pairs; same
    single-scan shingle-bucket intersection core as
    ngram_jaccard_pairs, containment is a formula, not a new join)."""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        containment_pairs,
    )

    return containment_pairs(_docs(spark, sf_dir), n=3, threshold=0.9)


CONTAINMENT_PAIRS_SQL = f"""
WITH toks AS ({_TOKS}),
grams AS ({_GRAMS3}),
sz AS (SELECT doc_id, count(*) AS c FROM grams GROUP BY doc_id),
j AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       inter / least(sa.c, sb.c) AS containment,
       inter / (sa.c + sb.c - inter) AS jaccard,
       CASE WHEN sa.c <= sb.c THEN id_a ELSE id_b END AS contained_id
FROM j JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE inter / least(sa.c, sb.c) >= 0.9
"""

LATE_BINDINGS.append(
    ("containment_pairs", containment_pairs_q, CONTAINMENT_PAIRS_SQL)
)

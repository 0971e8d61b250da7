"""LLM pipeline operators: dedup recall, ANN recall, multimodal
plumbing, text stats sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.core.tables import load_table
from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
    cosine_topk,
    cosine_topk_pandas,
    ivf_topk,
)
from gapless_deribit_clickhouse_spark.pipelines.multimodal import (
    fake_feature_extract,
    frame_sample_plan,
    synthetic_media,
)
from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_minhash_lsh_recall_vs_exact(docs):
    """LSH (32 hashes, 8 bands) must recover the high-similarity pairs
    the exact n-gram Jaccard finds."""
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, n=3, num_hashes=32, bands=8, threshold=0.8).collect()
    }
    assert exact, "fixture should contain planted near-duplicates"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9
    assert lsh <= exact  # verification step kills false positives


def test_minhash_params_rule_and_auto_recall(docs):
    """minhash_params: analytic recall at the threshold clears the
    target, r grows with the threshold (selectivity), the budget holds;
    and auto-sized minhash_lsh_pairs (num_hashes=None) matches exact
    Jaccard with >= 0.9 recall."""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import minhash_params

    prev_r = 0
    for t in (0.3, 0.5, 0.7, 0.9):
        num_hashes, bands = minhash_params(t)
        r = num_hashes // bands
        assert r >= prev_r, "rows-per-band must not shrink as threshold rises"
        prev_r = r
        assert num_hashes <= 256 and num_hashes % bands == 0
        assert 1.0 - (1.0 - t**r) ** bands >= 0.9
    exact = {
        (p.id_a, p.id_b)
        for p in ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    auto = {
        (p.id_a, p.id_b)
        for p in minhash_lsh_pairs(
            docs, n=3, num_hashes=None, bands=None, threshold=0.8
        ).collect()
    }
    assert exact and len(exact & auto) / len(exact) >= 0.9
    assert auto <= exact


def _ivf_recall(emb, queries, multiprobe):
    exact = cosine_topk(emb, queries, k=5).toPandas()
    approx = ivf_topk(emb, queries, k=5, multiprobe=multiprobe).toPandas()
    e = exact.groupby("query_id").vec_id.apply(set)
    a = approx.groupby("query_id").vec_id.apply(set)
    return np.mean([len(e[q] & a.get(q, set())) / len(e[q]) for q in e.index]), approx


def test_ivf_recall_vs_brute_force(emb):
    """COVERAGE promise: banded SRP-LSH with query-directed multi-probe
    recovers >= 0.9 of the brute-force top-k. The test corpus is
    near-uniform (top-10 cosine ~0.25-0.4, barely above random), the
    hardest case for LSH — real clustered embeddings hit the same
    recall with fewer probes."""
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    base_recall, _ = _ivf_recall(emb, queries, multiprobe=0)
    probed_recall, approx = _ivf_recall(emb, queries, multiprobe=2)
    assert probed_recall >= 0.9
    # multi-probe only ever adds candidates
    assert probed_recall >= base_recall
    # rank 1 is the vector itself (cosine=1), always in its own buckets
    self_hits = approx[approx["rank"] == 1]
    assert (self_hits.query_id == self_hits.vec_id).all()


def test_embedding_near_dup_recovers_planted_dups(spark, emb):
    """At the operator's design point (cosine >= 0.95): plant a noisy
    copy of every 5th vector and require the banded 4x6-bit LSH to
    recover >= 90% of the planted pairs (analytic recall ~0.95) with
    zero false positives (exact-cosine verification)."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(99)
    base = emb.orderBy("vec_id").toPandas()
    planted = []
    rows = []
    for _, r in base.iterrows():
        rows.append((int(r.vec_id), [float(x) for x in r.embedding]))
        if r.vec_id % 5 == 0:
            v = np.asarray(r.embedding, dtype="float64")
            noisy = v + rng.standard_normal(len(v)) * 0.02 * np.linalg.norm(v) / np.sqrt(len(v))
            cos = float(v @ noisy / (np.linalg.norm(v) * np.linalg.norm(noisy)))
            assert cos >= 0.95, "planted copy must sit above the threshold"
            dup_id = int(r.vec_id) + 100_000
            rows.append((dup_id, [float(x) for x in noisy]))
            planted.append((int(r.vec_id), dup_id))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    result = embedding_near_dup_pairs(df, threshold=0.95).collect()
    # exact verification: nothing below the threshold survives
    assert all(r.cosine_sim >= 0.95 for r in result)
    got = {(r.id_a, r.id_b) for r in result}
    hit = sum(1 for p in planted if p in got)
    assert hit / len(planted) >= 0.9


def test_lsh_band_table_arrow_matches_column(emb):
    """The BLAS signature stage (mapInPandas) and the pure-Column
    left-fold path must produce identical (id, band, h) rows — they
    can only diverge if a |projection| lands within float summation
    error of zero (measure-zero for Gaussian hyperplanes)."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        lsh_band_table,
        random_projections,
    )

    proj = random_projections(64, 24)
    for bb in (4, 6):
        arrow = sorted(
            map(tuple, lsh_band_table(emb, "vec_id", "embedding", proj, bb).collect())
        )
        column = sorted(
            map(
                tuple,
                lsh_band_table(
                    emb, "vec_id", "embedding", proj, bb, use_arrow=False
                ).collect(),
            )
        )
        assert arrow == column


def test_embedding_ops_ignore_null_vectors(spark, emb):
    """A null embedding row (corrupt upstream record) must neither
    crash the Arrow stages nor silently empty the result: non-null
    vectors are processed exactly as if the null row were absent."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        embedding_near_dup_pairs,
        ivf_topk,
    )

    clean = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    # null row FIRST so a naive dim probe would hit it
    null_row = spark.createDataFrame([(-1, None)], "vec_id long, embedding array<double>")
    dirty = null_row.unionByName(clean)
    want = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(clean, threshold=0.35).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(dirty, threshold=0.35).collect()
    }
    assert got == want and len(got) > 0
    queries = clean.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = ivf_topk(clean, queries, k=5).collect()
    b = ivf_topk(dirty, queries, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lsh_params_growth_rule():
    """The auto-sizer turns the documented scaling story into code:
    band_bits grows ~log2(corpus) (bounded buckets), band count covers
    the target recall analytically, and the bit budget is respected."""
    import math

    from gapless_deribit_clickhouse_spark.pipelines.embeddings import lsh_params

    prev_b = 0
    for n in (1_000, 10_000, 100_000, 1_000_000):
        n_bits, b = lsh_params(n, threshold=0.95)
        assert b >= prev_b, "band_bits must not shrink as the corpus grows"
        prev_b = b
        assert 4 <= b <= 16 and n_bits % b == 0 and n_bits <= 512
        # analytic recall at the threshold must clear the 0.9 target
        p = 1.0 - math.acos(0.95) / math.pi
        recall = 1.0 - (1.0 - p**b) ** (n_bits // b)
        assert recall >= 0.9
    # clipped floor at tiny corpora
    assert lsh_params(10)[1] == 4


def test_near_dup_auto_params_at_1e5_rows(spark):
    """VERDICT r3 #3 'done' criterion: at a 10^5-row synthetic corpus
    with AUTO-chosen LSH params (n_bits=None), planted near-dup pairs
    are recovered with recall >= 0.9 and zero sub-threshold survivors —
    the growth rule proven, not just documented."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    n, dim, n_dups = 100_000, 16, 150
    base = rng.standard_normal((n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    planted = []
    dup_rows = np.empty((n_dups, dim))
    for j in range(n_dups):
        i = j * (n // n_dups)
        noisy = base[i] + rng.standard_normal(dim) * 0.18 / np.sqrt(dim)
        cos = float(base[i] @ noisy / np.linalg.norm(noisy))
        assert cos >= 0.95, "planted copy must sit above the threshold"
        dup_rows[j] = noisy
        planted.append((i, n + j))
    import pandas as pd

    all_vecs = np.vstack([base, dup_rows])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(all_vecs), dtype="int64"), "embedding": list(map(list, all_vecs))}
    )
    df = spark.createDataFrame(pdf).repartition(32)
    result = embedding_near_dup_pairs(
        df, threshold=0.95, n_bits=None, band_bits=None, corpus_size=len(all_vecs)
    ).collect()
    assert all(r.cosine_sim >= 0.95 for r in result)
    got = {(r.id_a, r.id_b) for r in result}
    hit = sum(1 for p in planted if p in got)
    assert hit / len(planted) >= 0.9


def test_embedding_ops_drop_zero_norm_vectors(spark, emb):
    """A zero-norm embedding (all-zero vector) must never surface as a
    near-dup or a top-k hit (ADVICE r3): naive numpy cosine yields NaN
    for 0/0 and Spark orders NaN ABOVE every number, so an unmasked
    Arrow path would rank the zero vector first. Both Arrow and Column
    paths must agree with the clean-corpus result."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        cosine_topk_pandas,
        embedding_near_dup_pairs,
        ivf_topk,
    )

    clean = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = len(clean.first().embedding)
    zero_row = spark.createDataFrame(
        [(-1, [0.0] * dim)], "vec_id long, embedding array<double>"
    )
    dirty = zero_row.unionByName(clean)
    queries = clean.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    for use_arrow in (True, False):
        pairs = embedding_near_dup_pairs(
            dirty, threshold=0.35, use_arrow=use_arrow
        ).collect()
        assert all(r.id_a != -1 and r.id_b != -1 for r in pairs)
        topk = ivf_topk(dirty, queries, k=5, use_arrow=use_arrow).collect()
        assert all(r.vec_id != -1 for r in topk)
        assert all(r.cosine_sim is not None for r in topk)
    qvecs = [(int(r.query_id), list(r.query_vec)) for r in queries.collect()]
    pk = cosine_topk_pandas(dirty, qvecs, k=5).collect()
    assert all(r.vec_id != -1 for r in pk)


def test_embedding_ops_empty_input_yields_empty_output(spark):
    """An empty corpus (e.g. a fully-filtered upstream stage) must
    yield empty, correctly-typed results — not a pipeline failure."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        embedding_near_dup_pairs,
        ivf_topk,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    pairs = embedding_near_dup_pairs(empty)
    assert pairs.count() == 0
    assert set(pairs.columns) == {"id_a", "id_b", "cosine_sim"}
    queries = spark.createDataFrame([], "query_id long, query_vec array<double>")
    topk = ivf_topk(empty, queries, k=5)
    assert topk.count() == 0
    assert set(topk.columns) == {"query_id", "vec_id", "rank", "cosine_sim"}


def test_lsh_pairs_invariant_to_partitioning(spark, emb):
    """Shuffle-layout invariance: the near-dup pair set must not
    depend on how the input happens to be partitioned (catches
    accidental partition-local logic or nondeterministic dedup)."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        embedding_near_dup_pairs,
    )

    a = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb.repartition(17), threshold=0.35).collect()
    }
    b = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb.coalesce(1), threshold=0.35).collect()
    }
    assert a == b and len(a) > 0


def test_query_probe_table_arrow_matches_column(spark, emb):
    """Arrow probe expansion == Column probe expansion (same base
    hashes, same lowest-|margin| flips, same tie-break by bit index)."""
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        _query_probe_table,
        _query_probe_table_arrow,
        random_projections,
    )

    queries = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    proj = random_projections(64, 24)
    for mp in (0, 2):
        a = sorted(
            map(
                tuple,
                _query_probe_table_arrow(
                    queries, "query_id", "query_vec", proj, 4, mp
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                _query_probe_table(
                    queries, "query_id", "query_vec", proj, 4, mp
                ).collect(),
            )
        )
        assert a == b
        assert len(a) == 25 * 6 * (1 + mp)


def test_pandas_topk_matches_jvm_topk(emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    jvm = cosine_topk(emb, queries, k=5).toPandas().sort_values(["query_id", "rank"])
    qv = [(r.query_id, list(r.query_vec)) for r in queries.collect()]
    arrow = (
        cosine_topk_pandas(emb, qv, k=5).toPandas().sort_values(["query_id", "rank"])
    )
    assert jvm.vec_id.tolist() == arrow.vec_id.tolist()
    assert np.allclose(jvm.cosine_sim.to_numpy(), arrow.cosine_sim.to_numpy(), atol=1e-9)


def test_multimodal_feature_plumbing(spark):
    media = synthetic_media(spark, n=32)
    feats = fake_feature_extract(media, dim=8).toPandas()
    assert len(feats) == 32
    assert (feats.n_bytes > 0).all()
    assert all(len(f) == 8 for f in feats.feature)
    assert all(abs(sum(f) - 1.0) < 1e-5 for f in feats.feature)
    # deterministic: re-run produces identical shas
    again = fake_feature_extract(media, dim=8).toPandas()
    assert sorted(feats.payload_sha) == sorted(again.payload_sha)


def test_multimodal_decode_unsupported_format():
    """Formats outside the stdlib-decodable set (PNG/PPM/PGM) need PIL;
    without it decode raises the documented NotImplementedError."""
    from gapless_deribit_clickhouse_spark.pipelines.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: JPEG decode is delegated to it")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0jpegish")


def test_png_roundtrip_all_channel_counts():
    """encode_png -> decode_image is the identity for 8-bit gray,
    gray-alpha, RGB and RGBA — pure stdlib zlib, no imaging library."""
    from gapless_deribit_clickhouse_spark.pipelines.multimodal import (
        decode_image,
        encode_png,
    )

    rng = np.random.default_rng(3)
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(9, 7, c)).astype("uint8")
        out = decode_image(encode_png(arr))
        assert out.shape == arr.shape
        assert (out == arr).all()


def test_png_decode_handles_all_filter_types():
    """The decoder reconstructs scanlines under every PNG filter type
    (None/Sub/Up/Average/Paeth), not just the filter-0 rows our own
    encoder emits — real-world PNGs mix them per row."""
    import struct
    import zlib

    from gapless_deribit_clickhouse_spark.pipelines.multimodal import decode_image

    rng = np.random.default_rng(5)
    h, w, c = 5, 6, 3
    img = rng.integers(0, 256, size=(h, w, c)).astype("int32")
    stride = w * c
    flat = img.reshape(h, stride)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    raw = bytearray()
    prev = np.zeros(stride, dtype="int32")
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        raw.append(ftype)
        for x in range(stride):
            a = int(cur[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, cc)}[ftype]
            raw.append((int(cur[x]) - pred) % 256)
        prev = cur

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    out = decode_image(png)
    assert (out == img.astype("uint8")).all()


def test_pnm_decode():
    from gapless_deribit_clickhouse_spark.pipelines.multimodal import decode_image

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(4, 5, 3)).astype("uint8")
    ppm = b"P6\n# comment\n5 4\n255\n" + rgb.tobytes()
    assert (decode_image(ppm) == rgb).all()
    gray = rng.integers(0, 256, size=(3, 2, 1)).astype("uint8")
    pgm = b"P5 2 3 255\n" + gray.tobytes()
    assert (decode_image(pgm) == gray).all()


def test_wav_roundtrip_and_audio_features(spark):
    """encode_wav -> decode_audio roundtrips 16-bit PCM (mono and
    stereo), and the mapInPandas audio kernel extracts the analytic
    features of a known sine tone (duration, RMS ~ 1/sqrt(2) of
    amplitude, zero-crossing rate ~ 2*f/rate) with corrupt payloads
    isolated into the error column."""
    from gapless_deribit_clickhouse_spark.pipelines.multimodal import (
        MEDIA_SCHEMA,
        audio_feature_extract,
        decode_audio,
        encode_wav,
    )

    rate, freq, secs = 8000, 440.0, 0.5
    t = np.arange(int(rate * secs)) / rate
    tone = 0.5 * np.sin(2 * np.pi * freq * t)
    out, got_rate = decode_audio(encode_wav(tone, rate))
    assert got_rate == rate and out.shape == (len(t), 1)
    assert np.allclose(out[:, 0], tone, atol=1e-3)
    stereo = np.stack([tone, -tone], axis=1)
    out2, _ = decode_audio(encode_wav(stereo, rate))
    assert out2.shape == (len(t), 2)
    assert np.allclose(out2, stereo, atol=1e-3)

    rows = [
        (0, "audio", "audio/wav", bytearray(encode_wav(tone, rate)), None, None, int(secs * 1000)),
        (1, "audio", "audio/mpeg", bytearray(b"ID3broken"), None, None, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = audio_feature_extract(media).toPandas().set_index("media_id")
    ok = feats.loc[0]
    assert ok.error is None or (isinstance(ok.error, float) and np.isnan(ok.error))
    assert ok.n_frames == len(t) and ok.sample_rate == rate
    assert abs(ok.duration_ms - 500.0) < 1e-6
    assert abs(ok.rms - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(ok.zero_crossing_rate - 2 * freq / rate) < 0.01
    assert isinstance(feats.loc[1].error, str) and "NotImplementedError" in feats.loc[1].error


def test_decode_kernels_isolate_corrupt_payloads(spark):
    """Blobs are untrusted: corruption shapes that raise struct.error,
    zlib.error, IndexError or ZeroDivisionError inside the parsers must
    land in the error column, never fail the Spark task (the r4 review
    finding: the original except-list missed all four)."""
    import struct
    import zlib

    import pandas as pd

    from gapless_deribit_clickhouse_spark.pipelines.multimodal import (
        MEDIA_SCHEMA,
        audio_feature_extract,
        encode_framepack,
        encode_png,
        image_feature_extract,
        video_frame_features,
    )

    # corrupt IDAT: valid signature+IHDR, garbage deflate stream
    good_png = encode_png(np.zeros((2, 2, 1), dtype="uint8"))
    bad_idat = good_png[:33] + good_png[33:].replace(
        zlib.compress(b"\x00\x00\x00\x00\x00\x00"), b"notdeflate00"
    )
    images = [
        (0, bytearray(good_png)),
        (1, bytearray(good_png[:12])),           # truncated IHDR -> struct/IndexError
        (2, bytearray(bad_idat)),                 # zlib.error
        (3, bytearray(b"P5 2")),                  # truncated PGM header
    ]
    media = spark.createDataFrame(
        [(i, "image", None, p, None, None, None) for i, p in images],
        schema=MEDIA_SCHEMA,
    )
    out = image_feature_extract(media).toPandas().set_index("media_id")
    assert pd.isna(out.loc[0].error)
    assert all(isinstance(out.loc[i].error, str) for i in (1, 2, 3))

    # truncated WAV fmt chunk -> struct.error
    bad_wav = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    audio = spark.createDataFrame(
        [(0, "audio", None, bytearray(bad_wav), None, None, None)],
        schema=MEDIA_SCHEMA,
    )
    a = audio_feature_extract(audio).toPandas()
    assert len(a) == 1 and isinstance(a.error.iloc[0], str)

    # fps=0 framepack -> ZeroDivisionError in the timestamp math
    zed = encode_framepack([np.zeros((2, 2, 1), dtype="uint8")], fps=0.0)
    video = spark.createDataFrame(
        [(0, "video", None, bytearray(zed), None, None, None),
         (1, "video", None, bytearray(b"FPK1" + b"\x00" * 4), None, None, None)],
        schema=MEDIA_SCHEMA,
    )
    v = video_frame_features(video).toPandas().set_index("media_id")
    assert "ZeroDivisionError" in v.loc[0].error
    assert isinstance(v.loc[1].error, str)  # truncated header


def test_framepack_roundtrip_and_video_features(spark):
    """encode_framepack -> decode_framepack roundtrips the frames, and
    the mapInPandas video kernel samples every Nth frame with correct
    timestamps; a real-codec payload isolates into the error column."""
    from gapless_deribit_clickhouse_spark.pipelines.multimodal import (
        MEDIA_SCHEMA,
        decode_framepack,
        encode_framepack,
        video_frame_features,
    )

    rng = np.random.default_rng(21)
    frames = [
        rng.integers(0, 256, size=(6, 8, 3)).astype("uint8") for _ in range(10)
    ]
    pack = encode_framepack(frames, fps=20.0)
    got, fps = decode_framepack(pack)
    assert fps == 20.0 and len(got) == 10
    assert all((a == b).all() for a, b in zip(got, frames))

    rows = [
        (0, "video", "video/x-fpk", bytearray(pack), 8, 6, 500),
        (1, "video", "video/mp4", bytearray(b"\x00\x00\x00 ftypmp42"), None, None, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = video_frame_features(media, every_n=3).toPandas()
    ok = feats[feats.media_id == 0].sort_values("frame_idx")
    assert ok.frame_idx.tolist() == [0, 3, 6, 9]
    assert np.allclose(ok.frame_ts_ms, [0.0, 150.0, 300.0, 450.0])
    assert (ok.height == 6).all() and (ok.width == 8).all()
    expected_means = [float(frames[i].mean()) for i in (0, 3, 6, 9)]
    assert np.allclose(ok.mean_pixel, expected_means)
    err = feats[feats.media_id == 1]
    assert len(err) == 1 and "NotImplementedError" in err.error.iloc[0]


def test_image_feature_extract_real_decode(spark):
    """The real decode kernel end-to-end over mapInPandas: every
    synthetic PNG decodes (no error rows), shapes match the generator,
    and a corrupt payload isolates into its error column instead of
    failing the task."""
    from gapless_deribit_clickhouse_spark.pipelines.multimodal import (
        MEDIA_SCHEMA,
        image_feature_extract,
        synthetic_images,
    )

    media = synthetic_images(spark, n=24, size=12)
    feats = image_feature_extract(media, dim=8).toPandas()
    assert len(feats) == 24
    assert feats.error.isna().all()
    meta = media.select("media_id", "width", "height").toPandas()
    merged = feats.merge(meta, on="media_id")
    assert (merged.width_x == merged.width_y).all()
    assert (merged.height_x == merged.height_y).all()
    assert all(abs(sum(f) - 1.0) < 1e-5 for f in feats.feature)
    bad = spark.createDataFrame(
        [(999, "image", "image/png", bytearray(b"\x89PNG\r\n\x1a\nbroken"), 1, 1, None)],
        schema=MEDIA_SCHEMA,
    )
    out = image_feature_extract(media.unionByName(bad)).toPandas()
    err = out[out.media_id == 999]
    assert len(err) == 1 and err.error.notna().all()
    assert out[out.media_id != 999].error.isna().all()


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=12)
    frames = frame_sample_plan(media, every_ms=500).toPandas()
    vids = media.filter(F.col("kind") == "video").toPandas()
    expected = sum(int(d // 500) + 1 for d in vids.duration_ms)
    assert len(frames) == expected
    assert (frames.frame_ts_ms % 500 == 0).all()


def test_simhash_base_hash_modes_agree_on_exact_dups(docs):
    """Docs with identical distinct-token sets hash identically under
    EITHER signature mode, so those pairs must be hamming-0 in both
    md5 (oracle-exact) and xxhash64 (scale path). (Full hamming-0 sets
    may differ: unrelated docs can vote-collide, and collisions are
    hash-family-dependent.)"""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        simhash_near_pairs,
    )

    pdf = docs.toPandas()
    tokset = {
        r.doc_id: frozenset(str(r.text).lower().split()) for _, r in pdf.iterrows()
    }
    ids = sorted(tokset)
    same_tokens = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if tokset[a] == tokset[b]
    }
    assert same_tokens, "fixture should contain exact near-duplicates"
    for mode in ("md5", "xxhash64"):
        got = {
            (r.id_a, r.id_b)
            for r in simhash_near_pairs(docs, max_hamming=0, base_hash=mode).collect()
        }
        assert same_tokens <= got


def test_hash_sample_deterministic_and_stratified(docs):
    from gapless_deribit_clickhouse_spark.pipelines.sampling import (
        hash_sample,
        stratified_hash_sample,
    )

    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    assert a == b  # stable across runs
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n  # roughly the requested rate
    # monotone: raising the rate only adds members (nested splits)
    bigger = {r.doc_id for r in hash_sample(docs, "doc_id", 0.6).select("doc_id").collect()}
    assert a <= bigger
    # different salt -> a different (roughly independent) subset
    salted = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, salt="v2").select("doc_id").collect()}
    assert salted != a
    # stratified: zero-rate stratum vanishes, others keep their rate
    strat = stratified_hash_sample(
        docs, "doc_id", "lang", rates={"en": 1.0}, default_rate=0.0
    ).toPandas()
    assert set(strat.lang) == {"en"}
    assert len(strat) == docs.filter(F.col("lang") == "en").count()


def test_mixture_thresholds_exact_integer_math():
    from gapless_deribit_clickhouse_spark.pipelines.sampling import (
        BUCKETS,
        mixture_thresholds,
    )

    # binding scenario at sf0.01: hand-computed expected thresholds
    counts = {"en": 218, "zh": 75, "es": 73, "de": 70, "fr": 64}
    parts = {"en": 4, "zh": 2, "es": 2, "de": 1, "fr": 1}
    th = mixture_thresholds(counts, parts)
    # N = min(218*10//4, 75*10//2, 73*10//2, 70*10//1, 64*10//1) = 365
    assert th == {"en": 6697, "zh": 9733, "es": 10000, "de": 5214, "fr": 5703}
    # the binding domain (es) hits the cap: it is the scarce domain
    assert max(th.values()) == BUCKETS
    # a zero-count domain collapses the whole mixture (unrealizable)
    th0 = mixture_thresholds({"en": 218, "code": 0}, {"en": 1, "code": 1})
    assert th0 == {"en": 0, "code": 0}
    with pytest.raises(ValueError):
        mixture_thresholds(counts, {})
    with pytest.raises(ValueError):
        mixture_thresholds(counts, {"en": 0})


def test_mixture_sample_hits_target_shares(docs):
    from gapless_deribit_clickhouse_spark.pipelines.sampling import mixture_sample

    parts = {"en": 2, "de": 1}
    out = mixture_sample(docs, "doc_id", "lang", parts).toPandas()
    # domains outside the recipe are dropped entirely
    assert set(out.lang) <= {"en", "de"}
    got = out.groupby("lang").size()
    # md5 buckets are uniform, so realized shares track the recipe
    # within sampling noise on a few-hundred-row corpus
    assert got["en"] / got["de"] == pytest.approx(2.0, rel=0.35)
    # deterministic: same members on a rerun
    again = mixture_sample(docs, "doc_id", "lang", parts).toPandas()
    assert set(out.doc_id) == set(again.doc_id)


def test_sample_n_per_group_fixed_and_stable(docs):
    from gapless_deribit_clickhouse_spark.pipelines.sampling import sample_n_per_group

    a = sample_n_per_group(docs, group_col="lang", n=5, key_col="doc_id").toPandas()
    b = sample_n_per_group(docs, group_col="lang", n=5, key_col="doc_id").toPandas()
    assert (a.groupby("lang").size() <= 5).all()
    # identical membership across runs
    assert sorted(a.doc_id) == sorted(b.doc_id)
    # a different salt draws a different subset
    c = sample_n_per_group(
        docs, group_col="lang", n=5, key_col="doc_id", salt="v2"
    ).toPandas()
    assert sorted(c.doc_id) != sorted(a.doc_id)
    # the two-level tournament must select the identical rows a single
    # per-group window would (exactness of the split pre-rank)
    d = sample_n_per_group(
        docs, group_col="lang", n=5, key_col="doc_id", splits=1
    ).toPandas()
    assert sorted(a.doc_id) == sorted(d.doc_id)


def test_token_topk_vocab_head(docs):
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import token_topk

    top = token_topk(docs, k=10).toPandas()
    assert len(top) <= 10
    # sorted by count desc with token tiebreak
    assert list(top.term_count) == sorted(top.term_count, reverse=True)
    # doc_freq can never exceed term_count nor the corpus size
    assert (top.doc_freq <= top.term_count).all()
    assert (top.doc_freq <= docs.count()).all()


def test_sessionize_gap_splits(spark):
    import datetime as dt

    from gapless_deribit_clickhouse_spark.operators.sessionize import (
        session_stats,
        sessionize,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (40-min gap), user 2: one session
        (1, base), (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(minutes=50)),
        (2, base), (2, base + dt.timedelta(minutes=29)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    s = sessionize(ev, gap_seconds=1800).toPandas()
    u1 = s[s.user_id == 1].sort_values("ts")
    assert u1.session_seq.tolist() == [1, 1, 2]
    stats = session_stats(ev, gap_seconds=1800).toPandas()
    assert len(stats) == 3
    u2 = stats[(stats.user_id == 2)]
    assert u2.n_events.tolist() == [2] and u2.duration_s.tolist() == [29 * 60.0]


def test_connected_components_and_dedup_clusters(spark):
    from gapless_deribit_clickhouse_spark.operators.connected_components import (
        connected_components,
        dedup_clusters,
    )

    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # local union-find tier (default threshold) and distributed
    # star-contraction tier (threshold 0) must agree
    st_local: dict = {}
    comp = {
        r.node: r.component
        for r in connected_components(pairs, stats=st_local).collect()
    }
    assert comp == expected
    st_dist: dict = {}
    dist = {
        r.node: r.component
        for r in connected_components(
            pairs, local_threshold=0, stats=st_dist
        ).collect()
    }
    assert dist == expected
    # stats out-param (VERDICT r11 #5): the scaling probe attributes
    # growth to pair count vs star-round count from these fields
    assert st_local == {
        "input_edges": 7,
        "rounds": 0,
        "local_tier": True,
        "local_edges": 7,
    }
    assert st_dist["input_edges"] == 7 and st_dist["local_tier"] is False
    assert st_dist["rounds"] >= 1  # star rounds actually ran

    universe = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]], "doc long")
    out = dedup_clusters(universe, pairs, id_col="doc").toPandas().set_index("doc")
    assert out.loc[99].canonical_id == 99 and out.loc[99].cluster_size == 1
    assert not out.loc[99].is_duplicate
    assert out.loc[4].canonical_id == 1 and out.loc[4].cluster_size == 4
    assert out.loc[10].cluster_size == 3 and not out.loc[10].is_duplicate
    assert out.is_duplicate.sum() == 6  # one canonical per cluster + singleton


def test_tfidf_top_terms(spark):
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry durian cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k_per_doc=2).toPandas()
    # every doc gets at most k terms, ranked 1..k
    assert set(out.groupby("doc_id")["rank"].max()) <= {1, 2}
    d1 = out[out.doc_id == 1].sort_values("rank")
    # 'apple' (tf=2, df=1) dominates 'banana' (tf=1, df=2) for doc 1
    assert d1.token.tolist() == ["apple", "banana"]
    import math
    exp = 2 * (math.log(4 / 2) + 1)
    assert abs(d1.tfidf.iloc[0] - exp) < 1e-9


def test_curate_corpus_gauntlet(spark):
    from gapless_deribit_clickhouse_spark.pipelines.curation import curate_corpus

    good = "the quick brown fox and the lazy dog walk to the park in the morning " * 8
    docs = spark.createDataFrame(
        [
            (1, good),                      # survives
            (2, good),                      # exact dup of 1 -> dropped
            (3, "der hund und die katze nicht das haus " * 10),  # German
            (4, "x " * 3),                  # too short
            (5, "!!! ??? $$$ %%% ^^^ &&& " * 30),  # junk punctuation
        ],
        "doc_id long, text string",
    )
    out = curate_corpus(docs, min_tokens=5).toPandas()
    assert out.doc_id.tolist() == [1]
    assert out.lang_pred.iloc[0] == "en"
    assert out.quality_score.iloc[0] >= 0.5


def test_minhash_fast_hash_path_finds_same_dups(spark):
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),      # near-dup of 1
            (3, "completely different words about spark partitions and shuffles ok"),
        ],
        "doc_id long, text string",
    )
    slow = minhash_lsh_pairs(docs, threshold=0.5).select("id_a", "id_b").collect()
    fast = minhash_lsh_pairs(docs, threshold=0.5, base_hash="xxhash64").select(
        "id_a", "id_b"
    ).collect()
    assert {(r.id_a, r.id_b) for r in slow} == {(1, 2)}
    assert {(r.id_a, r.id_b) for r in fast} == {(1, 2)}
    import pytest

    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs, base_hash="sha9000").collect()


def test_repetition_stats_signals(spark):
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),          # fully repetitive
            (2, "one two three four five"),           # fully diverse
            (3, "a b a b a b a b"),                   # repeated bigram
        ],
        "doc_id long, text string",
    )
    out = repetition_stats(docs, n=2).toPandas().set_index("doc_id")
    assert out.loc[1].top_token_count == 5 and out.loc[1].top_token_frac == 1.0
    assert out.loc[1].dup_token_frac == 0.8   # 1 distinct of 5
    assert out.loc[1].dup_ngram_frac == 0.75  # 1 distinct of 4 bigrams
    assert out.loc[2].dup_token_frac == 0.0
    assert out.loc[2].dup_ngram_frac == 0.0
    assert out.loc[2].top_token_count == 1
    assert out.loc[3].top_token_count == 4    # 'a' and 'b' 4x each
    assert out.loc[3].dup_ngram_frac == (7 - 2) / 7  # 'a b' + 'b a'


def test_corpus_profile_groups_and_percentiles(spark):
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import corpus_profile

    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a b", "en"), (3, "", "de")],
        "doc_id long, text string, lang string",
    )
    out = corpus_profile(df, exact=True).toPandas().set_index("lang")
    assert out.loc["en"].n_docs == 2 and out.loc["en"].total_tokens == 5
    assert out.loc["en"].p50_tokens == 2.5  # linear interpolation
    assert out.loc["de"].total_tokens == 0  # empty text counts 0 tokens
    approx = corpus_profile(df).toPandas().set_index("lang")
    assert approx.loc["en"].p50_tokens in (2.0, 3.0)  # sketch picks a sample


def test_contamination_check_flags_overlap(spark):
    from gapless_deribit_clickhouse_spark.pipelines.curation import contamination_check

    bench = spark.createDataFrame(
        [(100, "the capital of france is paris")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "we know the capital of france is paris obviously"),  # contaminated
            (2, "completely unrelated text about cooking pasta well"),  # clean
        ],
        "doc_id long, text string",
    )
    out = contamination_check(docs, bench, n=3).toPandas()
    assert out.doc_id.tolist() == [1]
    row = out.iloc[0]
    # doc 1 has 7 distinct trigrams; 4 appear in the benchmark sentence
    assert row.n_grams == 7 and row.n_matched == 4
    assert abs(row.contamination_frac - 4 / 7) < 1e-12


def test_salted_agg_matches_plain_groupby(spark):
    from gapless_deribit_clickhouse_spark.operators.skew import salted_agg

    # heavily skewed: key 'hot' has 10k rows, others 10
    rows = [("hot", i % 7, float(i)) for i in range(10_000)] + [
        (f"k{j}", j, float(j)) for j in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v long, x double").repartition(16)
    got = (
        salted_agg(
            df, ["k"],
            {"total": ("sum", "x"), "n": ("count", "v"),
             "lo": ("min", "x"), "hi": ("max", "x")},
        )
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        df.groupBy("k")
        .agg(
            F.sum("x").alias("total"), F.count("v").alias("n"),
            F.min("x").alias("lo"), F.max("x").alias("hi"),
        )
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert got.equals(want)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        salted_agg(df, ["k"], {"bad": ("avg", "x")})


def test_hashed_linear_score_edges(spark):
    import math

    from gapless_deribit_clickhouse_spark.pipelines.text_stats import (
        hashed_linear_score,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "hello hello")],
        "doc_id long, text string",
    )
    w = [0.5] * 8  # uniform weights -> mean token weight is 0.5
    out = {
        r.doc_id: r
        for r in hashed_linear_score(df, weights=w, bias=0.25).collect()
    }
    sig = lambda x: 1.0 / (1.0 + math.exp(-x))  # noqa: E731
    # any tokens -> logit = bias + 0.5
    assert out[1].clf_score == pytest.approx(sig(0.75), abs=1e-12)
    assert out[1].n_tokens == 2
    # empty / null text -> the prior sigmoid(bias)
    assert out[2].clf_score == pytest.approx(sig(0.25), abs=1e-12)
    assert out[3].clf_score == pytest.approx(sig(0.25), abs=1e-12)
    assert out[3].n_tokens == 0
    assert out[4].clf_score == pytest.approx(sig(0.75), abs=1e-12)
    with pytest.raises(ValueError):
        hashed_linear_score(df, weights=[])
    # discriminative weights separate docs (hashing trick actually
    # routes different tokens to different buckets)
    import hashlib

    wid = [
        (int(hashlib.md5(f"w{i}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
        / 1000.0
        for i in range(64)
    ]
    scored = hashed_linear_score(df, weights=wid).toPandas()
    assert scored.clf_score.nunique() > 1


def test_near_dedup_corpus_one_call_filter(spark, docs):
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        near_dedup_corpus,
    )

    base = docs.select("doc_id", "text", "lang", "source", "n_chars")
    # plant one exact duplicate and one trivially-near duplicate of
    # doc 0 with HIGHER ids (canonical = min id survives)
    d0 = base.filter(F.col("doc_id") == 0)
    exact = d0.select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = d0.select(
        (F.col("doc_id") + 900_001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    dirty = base.unionByName(exact).unionByName(near)
    kept = near_dedup_corpus(dirty, threshold=0.8).toPandas()
    ids = set(kept.doc_id)
    assert 0 in ids  # canonical survives
    assert 900_000 not in ids  # exact dup dropped by the exact tier
    assert 900_001 not in ids  # near dup dropped by the LSH tier
    assert list(kept.columns) == ["doc_id", "text", "lang", "source", "n_chars"]
    # idempotent: running on the already-clean OUTPUT drops nothing
    clean_df = spark.createDataFrame(
        kept, "doc_id long, text string, lang string, source string, n_chars long"
    )
    again = near_dedup_corpus(clean_df, threshold=0.8).toPandas()
    assert set(again.doc_id) == ids


def test_split_assign_total_stable_and_leakage_safe(docs):
    from gapless_deribit_clickhouse_spark.pipelines.sampling import split_assign

    out = split_assign(docs, "doc_id").select("doc_id", "source", "split").toPandas()
    n = docs.count()
    assert len(out) == n  # a total labeling: no row dropped or duplicated
    assert set(out.split) <= {"train", "val", "test"}
    shares = out.split.value_counts(normalize=True)
    assert 0.85 < shares.get("train", 0.0) < 0.95
    # stable across runs
    again = split_assign(docs, "doc_id").select("doc_id", "split").toPandas()
    merged = out.merge(again, on="doc_id", suffixes=("", "_again"))
    assert (merged.split == merged.split_again).all()
    # a different salt gives a genuinely different assignment
    resalted = split_assign(docs, "doc_id", salt="resplit-v2").select(
        "doc_id", "split"
    ).toPandas()
    m2 = out.merge(resalted, on="doc_id", suffixes=("", "_v2"))
    assert (m2.split != m2.split_v2).any()
    # leakage guard: keying on a GROUP column sends whole groups to one split
    grouped = split_assign(docs, "source").select("source", "split").toPandas()
    assert grouped.groupby("source").split.nunique().max() == 1
    # weight validation
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", weights=[("train", 1.0)])
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", weights=[("a", -0.1), ("b", 1.1)])


def test_interdoc_repetition_flags_planted_boilerplate(spark):
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        interdoc_repetition,
    )

    boiler = "subscribe to our newsletter for updates"
    rows = [
        (i, boiler + " " + " ".join(f"tail{i}w{j}" for j in range(6)))
        for i in range(10)
    ]
    # fully unique docs: every token carries the doc index
    rows += [
        (100 + i, " ".join(f"solo{100 + i}w{j}" for j in range(9)))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = interdoc_repetition(df, min_docs=5).toPandas().set_index("doc_id")
    assert len(out) == 20  # one row per doc, zero-shared docs included
    boiler_docs = out.loc[range(10)]
    solo_docs = out.loc[range(100, 110)]
    # the 4 boilerplate 3-grams appear in 10 >= 5 docs -> shared
    assert (boiler_docs.shared_shingles == 4).all()
    assert (solo_docs.shared_shingles == 0).all()
    assert ((out.shared_fraction >= 0) & (out.shared_fraction <= 1)).all()
    # raising min_docs past the clique size clears the signal
    strict = interdoc_repetition(df, min_docs=11).toPandas()
    assert (strict.shared_shingles == 0).all()


def test_split_thresholds_exact_integer_math():
    from gapless_deribit_clickhouse_spark.pipelines.sampling import (
        split_thresholds,
    )

    # defaults: decimal-exact 9000/9500, no float rounding involved
    assert split_thresholds([("train", 0.9), ("val", 0.05), ("test", 0.05)]) == [
        ("train", 9000),
        ("val", 9500),
    ]
    # thirds floor to 3333/6666 (NOT banker's-rounded 3333/6667) —
    # any oracle following the documented exact-integer recipe agrees
    assert split_thresholds([("a", 1), ("b", 1), ("c", 1)]) == [
        ("a", 3333),
        ("b", 6666),
    ]
    # a positive weight that floors to an empty bucket range raises
    # instead of yielding a silently-empty split
    with pytest.raises(ValueError):
        split_thresholds([("a", 0.00001), ("b", 1.9999)])
    # an explicitly ZERO weight is an intentional empty split: allowed
    assert split_thresholds([("a", 0.0), ("b", 1.0), ("c", 1.0)]) == [
        ("a", 0),
        ("b", 5000),
    ]


def test_incremental_dedup_against_corpus(spark):
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        incremental_dedup,
    )

    def sent(i: int) -> str:
        return " ".join(f"corp{i}tok{j}" for j in range(12))

    corpus = spark.createDataFrame(
        [(i, sent(i)) for i in range(10)], ["doc_id", "text"]
    )
    fresh = [(100 + i, " ".join(f"new{i}tok{j}" for j in range(12))) for i in range(5)]
    batch_rows = fresh + [
        (200, sent(3)),                  # exact copy of corpus doc 3
        (201, sent(4) + " extra"),       # near copy of corpus doc 4
        (202, fresh[0][1]),              # exact within-batch copy of 100
        (203, fresh[1][1] + " tail"),    # near within-batch copy of 101
    ]
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])

    kept = incremental_dedup(batch, corpus, threshold=0.8).toPandas()
    ids = set(kept.doc_id)
    assert ids == {100, 101, 102, 103, 104}  # fresh docs survive, min-id wins
    assert list(kept.columns) == ["doc_id", "text"]
    # idempotent: re-running the kept batch against the same corpus
    # drops nothing further
    kept_df = spark.createDataFrame(kept, "doc_id long, text string")
    again = incremental_dedup(kept_df, corpus, threshold=0.8).toPandas()
    assert set(again.doc_id) == ids


def test_incremental_dedup_indexed_equivalent(spark, tmp_path):
    """The persisted-index path must return EXACTLY the recompute
    path's rows: build_dedup_index(corpus) then
    incremental_dedup_indexed(batch, index) == incremental_dedup(
    batch, corpus) — the steady-state 100 TB shape where each batch
    touches zero corpus text (VERDICT r5 #5)."""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        build_dedup_index,
        incremental_dedup,
        incremental_dedup_indexed,
    )

    def sent(i: int) -> str:
        return " ".join(f"corp{i}tok{j}" for j in range(12))

    corpus = spark.createDataFrame(
        [(i, sent(i)) for i in range(10)], ["doc_id", "text"]
    )
    fresh = [
        (100 + i, " ".join(f"new{i}tok{j}" for j in range(12))) for i in range(5)
    ]
    batch = spark.createDataFrame(
        fresh
        + [
            (200, sent(3)),                # exact copy of corpus doc 3
            (201, sent(4) + " extra"),     # near copy of corpus doc 4
            (202, fresh[0][1]),            # exact within-batch copy
            (203, fresh[1][1] + " tail"),  # near within-batch copy
        ],
        ["doc_id", "text"],
    )

    idx = str(tmp_path / "dedup_index")
    build_dedup_index(corpus, idx, threshold=0.8)
    via_index = incremental_dedup_indexed(batch, idx).toPandas()
    recompute = incremental_dedup(batch, corpus, threshold=0.8).toPandas()
    assert sorted(via_index.doc_id) == sorted(recompute.doc_id) == [
        100, 101, 102, 103, 104,
    ]
    assert list(via_index.columns) == list(recompute.columns)
    # the meta table pins the LSH family; the stored params round-trip
    meta = spark.read.parquet(f"{idx}/meta").collect()[0]
    assert (meta["n"], meta["base_hash"]) == (3, "md5")
    # appending the surviving batch through the API (the "plain ETL
    # step" the build docstring promises): after the append, re-running
    # the batch drops everything — the index now contains it
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        append_dedup_index,
    )

    kept_df = spark.createDataFrame(via_index, "doc_id long, text string")
    append_dedup_index(kept_df, idx)
    rerun = incremental_dedup_indexed(batch, idx).toPandas()
    assert len(rerun) == 0


def test_project_embeddings_jl_properties(spark, emb):
    import numpy as np

    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        project_embeddings,
    )

    def cos_pairs(m):
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        u = m / np.clip(nrm, 1e-12, None)
        sims = u @ u.T
        iu = np.triu_indices(len(m), k=1)
        return sims[iu]

    def corr_at(out_dim):
        pdf = (
            project_embeddings(emb, out_dim=out_dim)
            .filter(F.col("projected").isNotNull())
            .orderBy("vec_id")
            .limit(200)
            .toPandas()
        )
        hi = np.stack([np.asarray(v, dtype=float) for v in pdf.embedding])
        lo = np.stack([np.asarray(v, dtype=float) for v in pdf.projected])
        return np.corrcoef(cos_pairs(hi), cos_pairs(lo))[0, 1], lo

    # JL: projected cosines track the high-dim cosines across pairs,
    # and fidelity improves with out_dim (distortion ~ 1/sqrt(out_dim))
    corr24, _ = corr_at(24)
    corr48, lo = corr_at(48)
    assert corr48 > 0.6, corr48
    assert corr48 > corr24 - 0.05, (corr24, corr48)
    # deterministic: same seed -> identical values
    again = (
        project_embeddings(emb, out_dim=48)
        .filter(F.col("projected").isNotNull())
        .orderBy("vec_id")
        .limit(200)
        .toPandas()
    )
    lo2 = np.stack([np.asarray(v, dtype=float) for v in again.projected])
    assert np.array_equal(lo, lo2)


def test_project_embeddings_guards_and_normalize(spark):
    import numpy as np

    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        project_embeddings,
    )

    rows = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, None),            # null vector -> null projection
        (3, [1.0, 2.0]),      # width mismatch -> null, never truncated
        (4, [0.0, 0.0, 0.0, 0.0]),  # zero vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.projected for r in project_embeddings(df, out_dim=3).collect()}
    assert out[1] is not None and len(out[1]) == 3
    assert out[2] is None
    assert out[3] is None
    # zero vector projects to all-zero (valid), and linearity holds:
    # proj(2v) == 2*proj(v)
    assert all(abs(x) < 1e-12 for x in out[4])
    df2 = spark.createDataFrame(
        [(1, [2.0, 4.0, 6.0, 8.0])], "vec_id long, embedding array<double>"
    )
    doubled = project_embeddings(df2, out_dim=3).collect()[0].projected
    assert np.allclose(np.asarray(doubled), 2 * np.asarray(out[1]))
    # normalize: unit L2 norm for non-zero, NULL for the zero vector
    norm_out = {
        r.vec_id: r.projected
        for r in project_embeddings(df, out_dim=3, normalize=True).collect()
    }
    assert abs(np.linalg.norm(np.asarray(norm_out[1])) - 1.0) < 1e-9
    assert norm_out[4] is None


def test_bigram_lm_score_separates_fluent_from_gibberish(spark):
    from gapless_deribit_clickhouse_spark.pipelines.text_stats import (
        bigram_lm_score,
    )

    fluent = "the cat sat on the mat and the cat sat on the mat again"
    rows = [
        ("f1", fluent),
        ("f2", fluent + " and the cat sat down"),
        # tokens never repeat a context seen elsewhere -> every bigram
        # is a smoothing-only probability
        ("g1", "zq xv qj wk vb nm pl ty re ua"),
        ("s1", "onetoken"),  # < 2 tokens: no bigram evidence, excluded
        ("n1", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert set(out) == {"f1", "f2", "g1"}
    # repeated fluent bigrams score far better than unseen-context ones
    assert out["f1"]["avg_logp"] > out["g1"]["avg_logp"]
    assert out["g1"]["ppl"] > out["f1"]["ppl"]
    # perplexity is exp(-avg_logp) by construction
    import math

    for r in out.values():
        assert math.isclose(r["ppl"], math.exp(-r["avg_logp"]), rel_tol=1e-12)
        assert r["n_bigrams"] >= 1


def test_weighted_sample_per_group_properties(spark):
    from gapless_deribit_clickhouse_spark.pipelines.sampling import (
        weighted_sample_per_group,
    )

    rows = [(f"d{i}", "en" if i % 2 else "de", 10.0) for i in range(40)]
    rows += [("heavy_en", "en", 1e12), ("heavy_de", "de", 1e12)]
    rows += [("zero", "en", 0.0), ("nullw", "de", None)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, w double")

    out = weighted_sample_per_group(
        df, group_col="lang", n=5, key_col="doc_id", weight_col="w", salt="t"
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    # exactly n per group, ranks 1..n
    assert sorted(len(v) for v in by_lang.values()) == [5, 5]
    assert sorted(r["rn"] for r in out if r["lang"] == "en") == [1, 2, 3, 4, 5]
    # overwhelming weight -> certain inclusion; zero/null weight -> excluded
    assert "heavy_en" in by_lang["en"] and "heavy_de" in by_lang["de"]
    picked = {r["doc_id"] for r in out}
    assert "zero" not in picked and "nullw" not in picked
    # partition-invariant determinism
    out2 = weighted_sample_per_group(
        df.repartition(13), group_col="lang", n=5, key_col="doc_id",
        weight_col="w", salt="t",
    ).collect()
    assert {(r["lang"], r["rn"], r["doc_id"]) for r in out2} == {
        (r["lang"], r["rn"], r["doc_id"]) for r in out
    }


def test_quantize_embeddings_exact(spark):
    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        quantize_embeddings,
    )

    rows = [
        (0, [1.27, -1.27, 0.635, 0.0]),   # amax 1.27 -> scale 0.01
        (1, [0.0, 0.0]),                  # zero vector: no scale
        (2, None),                        # null vector: all null
        (3, [-2.0]),                      # single negative: q = -127
    ]
    out = {
        r["vec_id"]: r
        for r in quantize_embeddings(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        ).collect()
    }
    r0 = out[0]
    assert r0["scale"] == pytest.approx(0.01)
    assert list(r0["qvec"]) == [127, -127, 64, 0]  # 63.5 rounds HALF_UP
    assert r0["n_dims"] == 4
    assert r0["max_abs_err"] <= r0["scale"] / 2 + 1e-12
    assert out[1]["scale"] is None and out[1]["qvec"] is None
    assert out[2]["qvec"] is None and out[2]["n_dims"] is None
    assert list(out[3]["qvec"]) == [-127] and out[3]["max_abs_err"] == 0.0


def test_quantized_topk_recall_vs_exact(spark):
    import random

    from gapless_deribit_clickhouse_spark.pipelines.embeddings import (
        cosine_topk,
        quantized_cosine_topk,
    )

    rng = random.Random(7)
    corpus = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)
    ]
    emb = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 3").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    exact = cosine_topk(emb, queries, k=10).collect()
    quant = quantized_cosine_topk(emb, queries, k=10).collect()
    by_q_exact: dict = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    by_q_quant: dict = {}
    top1 = {}
    for r in quant:
        by_q_quant.setdefault(r["query_id"], set()).add(r["vec_id"])
        if r["rank"] == 1:
            top1[r["query_id"]] = r["vec_id"]
    for qid, ex in by_q_exact.items():
        recall = len(ex & by_q_quant[qid]) / len(ex)
        # int8 keeps ~2 decimal digits of cosine resolution: the top
        # set is essentially unchanged
        assert recall >= 0.8, (qid, recall)
        assert top1[qid] == qid  # self-similarity survives quantization


def test_dedup_index_digests_written_last(spark, tmp_path, monkeypatch):
    """ADVICE r6 crash-recovery contract: the digests projection — the
    table a replayed batch anti-joins itself away against — must be
    the LAST index table written, so a crash mid-append leaves the
    batch visible to its replay instead of permanently missing its
    bands/sets rows."""
    from pyspark.sql.readwriter import DataFrameWriter

    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        append_dedup_index,
        build_dedup_index,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "order_idx")
    build_dedup_index(docs, idx, threshold=0.8)

    batch = spark.createDataFrame(
        [(3, "sphinx of black quartz judge my vow")], "doc_id long, text string"
    )
    order: list[str] = []
    real_parquet = DataFrameWriter.parquet

    def recording_parquet(self, path, *a, **kw):
        order.append(path.rsplit("/", 1)[-1])
        return real_parquet(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", recording_parquet)
    append_dedup_index(batch, idx)
    assert set(order) == {"bands", "sets", "digests"}
    assert order[-1] == "digests"


def test_epoch_shuffle_exact_rank_and_epoch_independence(docs):
    from gapless_deribit_clickhouse_spark.pipelines.sampling import epoch_shuffle

    n = docs.count()
    out = epoch_shuffle(docs, "doc_id", epoch=0).select(
        "doc_id", "epoch_rank"
    ).toPandas()
    # a permutation: every position 0..n-1 exactly once
    assert sorted(out.epoch_rank) == list(range(n))
    # shard count is parallelism only — the rank is shard-invariant
    for shards in (1, 7, 512):
        again = epoch_shuffle(docs, "doc_id", epoch=0, shards=shards).select(
            "doc_id", "epoch_rank"
        ).toPandas()
        m = out.merge(again, on="doc_id", suffixes=("", "_s"))
        assert (m.epoch_rank == m.epoch_rank_s).all(), shards
    # a different epoch is a genuinely different permutation
    e1 = epoch_shuffle(docs, "doc_id", epoch=1).select(
        "doc_id", "epoch_rank"
    ).toPandas()
    m = out.merge(e1, on="doc_id", suffixes=("", "_e1"))
    assert (m.epoch_rank != m.epoch_rank_e1).any()
    # and matches the naive global sort (the oracle's formulation)
    import pyspark.sql.functions as F

    naive = (
        docs.select(
            "doc_id",
            F.md5(F.concat(F.lit("shuffle:0:"), F.col("doc_id").cast("string"))).alias(
                "h"
            ),
        )
        .orderBy("h", "doc_id")
        .toPandas()
    )
    naive["rank"] = range(n)
    m = out.merge(naive[["doc_id", "rank"]], on="doc_id")
    assert (m.epoch_rank == m["rank"]).all()


def test_containment_catches_what_jaccard_misses(spark):
    """The operator's reason to exist: a short doc quoted whole inside
    a much longer one has containment ~1 but Jaccard ~|small|/|large|
    — below any sane symmetric threshold."""
    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        containment_pairs,
    )

    small = " ".join(f"s{i}" for i in range(12))
    big = small + " " + " ".join(f"b{i}" for i in range(200))
    rows = [
        (1, small),
        (2, big),
        (3, " ".join(f"x{i}" for i in range(50))),  # unrelated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = containment_pairs(df, threshold=0.9).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.contained_id == 1  # the smaller side is the drop target
    assert r.containment == 1.0  # every small-doc trigram is in big
    assert r.jaccard < 0.1  # symmetric measure misses this pair
    # symmetric operator at the same corpus finds nothing at 0.5
    assert ngram_jaccard_pairs(df, threshold=0.5).count() == 0


def test_simhash_chunk_filter_dedup_equals_distinct(spark):
    """r11 rework guard: candidate-pair dedup moved from distinct()
    to the first-zero-XOR-chunk filter (a pair matching in m chunks
    exits the bucket join m times; exactly one copy sits at the first
    zero 15-bit slice of the XOR). The two must produce EXACTLY the
    same pair set — rebuilt here via the old distinct() route over
    the same signatures, on a corpus salted with exact dups,
    multi-chunk near-dups, and unrelated docs."""
    from pyspark.sql import functions as F

    from gapless_deribit_clickhouse_spark.pipelines.text_dedup import (
        simhash64,
        simhash_near_pairs,
    )

    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "sphinx of black quartz judge my vow",
    ]
    rows = []
    did = 0
    for i, b in enumerate(base):
        for copy in range(3):  # exact dups -> hamming 0, all 4 chunks match
            rows.append((did, b))
            did += 1
        rows.append((did, b + f" salt{i}"))  # near-dup of the clique
        did += 1
    for j in range(40):  # unrelated filler
        rows.append((did, f"unique document number {j} token{j} filler{j * 7}"))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for k in (0, 3, 10):
        new = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_near_pairs(docs, max_hamming=k).collect()
        }
        # the pre-r11 route: explode chunks, bucket self-join, distinct
        sig = simhash64(docs, "text", "doc_id", "md5")
        chunks = F.array(*[
            F.shiftright(F.col("simhash"), c * 15)
            .bitwiseAND(F.lit(0x7FFF))
            .alias(f"c{c}")
            for c in range(4)
        ])
        b = sig.select(
            "id", "simhash", F.posexplode(chunks).alias("chunk", "chunk_val")
        )
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
        old = {
            (r.id_a, r.id_b, r.hamming)
            for r in cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= k)
            .select("id_a", "id_b", "hamming")
            .collect()
        }
        assert new == old, f"k={k}: filter dedup != distinct dedup"
        if k == 0:
            # every exact-dup clique pair must be present: 3 per clique
            assert len(new) >= 4 * 3

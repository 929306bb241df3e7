"""Operator tests: dedup suite, similarity search, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from blink_spark.operators import dedup, multimodal, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# ---- dedup ---------------------------------------------------------------

def test_exact_dedup_planted(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text"), (4, "HELLO WORLD ")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["canon_id"], r["group_size"]) for r in dedup.exact_dedup(df).collect()}
    assert got == {1: (1, 3), 2: (1, 3), 4: (1, 3), 3: (3, 1)}


def test_minhash_clusters_recover_planted_neardups(spark, documents):
    """Plant corrupted copies of real documents; clusters must recover them."""
    base = documents.limit(20)
    copies = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        # word-drop corruption: remove every 13th word
        F.array_join(
            F.filter(F.split("text", " "), lambda w, i: i % 13 != 0, ),
            " ",
        ).alias("text"),
    )
    corpus = base.select("doc_id", "text").unionByName(copies)
    clusters = dedup.minhash_dedup_clusters(corpus, jaccard_threshold=0.5)
    got = {r["doc_id"]: r["canon_id"] for r in clusters.collect()}
    for i in [r["doc_id"] for r in base.select("doc_id").collect()]:
        assert got[i + 100000] == got[i], f"copy of {i} not clustered with original"


def test_simhash_pairs_hamming_exact(spark, documents):
    """Banded pairs must agree with the exact definition: every reported pair
    respects the hamming bound, and identical docs always pair."""
    dup = documents.limit(5).select((F.col("doc_id") + 50000).alias("doc_id"), "text")
    corpus = documents.select("doc_id", "text").unionByName(dup)
    pairs = dedup.simhash_dedup_pairs(corpus, max_hamming=8)
    rows = pairs.collect()
    assert all(r["hamming"] <= 8 for r in rows)
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    for i in range(5):
        assert (i, i + 50000) in got or (i + 50000, i) in got


def test_ngram_jaccard_identical_is_one(spark):
    docs = spark.createDataFrame([(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w q r")], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["doc_a", "doc_b"])
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(docs, pairs, threshold=-1).collect()}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.0


def test_embedding_neardup_symmetric_threshold(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {(r["id_a"], r["id_b"]) for r in dedup.embedding_neardup_pairs(df, threshold=0.95).collect()}
    assert got == {(1, 2)}


# ---- similarity search ----------------------------------------------------

def test_brute_force_topk_shape(spark, embeddings):
    out = similarity.brute_force_topk(embeddings, k=3)
    n = embeddings.count()
    rows = out.collect()
    assert len(rows) == n * 3
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == [1, 2, 3]
        cosines = [x["cosine"] for x in sorted(rs, key=lambda x: x["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(x["nbr_id"] != q for x in rs)


def test_chunked_topk_merge_is_lossless(spark, embeddings):
    """§2.6: per-chunk top-k then re-top-k must equal the one-shot global
    top-k exactly (same tie-break at both stages), at more than one chunk
    count and independent of input partitioning."""
    exact = sorted(map(tuple, similarity.brute_force_topk(embeddings, k=3).collect()))
    for n_chunks in (1, 4, 7):
        got = sorted(
            map(tuple, similarity.chunked_topk_merge(embeddings, k=3, n_chunks=n_chunks).collect())
        )
        assert got == exact, f"n_chunks={n_chunks}"
    repart = sorted(
        map(tuple, similarity.chunked_topk_merge(embeddings.repartition(13), k=3, n_chunks=4).collect())
    )
    assert repart == exact


def test_lsh_topk_recall_vs_bruteforce(spark, embeddings):
    """ANN recall@3 vs the exact oracle on sf0.001 — near-random vectors
    (top-3 cosine ≈ 0.35, θ ≈ 70°) are LSH's hostile regime, so buckets are
    sized wide (4 planes × 16 tables → per-table collision ≈ 0.13)."""
    recall = similarity.ann_recall_vs_exact(embeddings, k=3, n_tables=16, n_planes=4)
    assert recall >= 0.8, recall


def test_lsh_finds_planted_high_cosine_neighbors(spark, embeddings):
    """In LSH's design regime (near-dup, cosine ≥ 0.95) recall must be ~1:
    plant jittered copies and require every copy to list its original first."""
    base = embeddings.limit(30)
    jitter = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.98 + 0.01).alias("embedding"),
    )
    corpus = base.select("vec_id", "embedding").unionByName(jitter.select("vec_id", "embedding"))
    out = similarity.lsh_topk_neighbors(corpus, k=1, n_planes=6, n_tables=12)
    got = {r["query_id"]: r["nbr_id"] for r in out.collect()}
    hits = sum(1 for r in range(30) if got.get(r + 10000) == r)
    assert hits >= 29, f"only {hits}/30 planted neighbors found"


def test_ivf_topk_recall_vs_bruteforce(spark, embeddings):
    """IVF recall@3 vs the exact oracle: near-random vectors again, so probe
    wide (8 lists, nprobe 4 → half the corpus scanned per query)."""
    exact = similarity.brute_force_topk(embeddings, k=3).select("query_id", "nbr_id")
    approx = similarity.ivf_topk_neighbors(embeddings, k=3, n_lists=8, nprobe=4).select(
        "query_id", "nbr_id"
    )
    n_exact = exact.count()
    hit = exact.join(approx, ["query_id", "nbr_id"], "left_semi").count()
    assert hit / n_exact >= 0.8, hit / n_exact


def test_ivf_finds_planted_high_cosine_neighbors(spark, embeddings):
    """A jittered copy points in (almost) the same direction as its source,
    so the spherical quantizer must put both in the same list: recall ~1 in
    the near-dup regime even at nprobe=1."""
    base = embeddings.limit(30)
    jitter = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.98 + 0.01).alias("embedding"),
    )
    corpus = base.select("vec_id", "embedding").unionByName(jitter.select("vec_id", "embedding"))
    out = similarity.ivf_topk_neighbors(corpus, k=1, n_lists=4, nprobe=1, seed=3)
    got = {r["query_id"]: r["nbr_id"] for r in out.collect()}
    hits = sum(1 for r in range(30) if got.get(r + 10000) == r)
    assert hits >= 29, f"only {hits}/30 planted neighbors found"


def test_ivf_deterministic_across_partitioning(spark, embeddings):
    """Centroid training samples via a hash filter (not limit), so the same
    seed must give identical output under any partitioning — the property
    that makes the sf0.01 VALUES pin a stable oracle."""
    a = similarity.ivf_topk_neighbors(embeddings, k=3, n_lists=8, nprobe=2, seed=5)
    b = similarity.ivf_topk_neighbors(embeddings.repartition(13), k=3, n_lists=8, nprobe=2, seed=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivf_max_list_cap_drops_degenerate_lists(spark, embeddings):
    """With max_list below any list size every corpus vector is anti-joined
    away and no pairs survive — the skew guard actually guards."""
    out = similarity.ivf_topk_neighbors(embeddings, k=3, n_lists=2, nprobe=2, max_list=1)
    assert out.count() == 0


def test_hyperplane_buckets_deterministic(spark, embeddings):
    b1 = {r["vec_id"]: r["buckets"] for r in similarity.hyperplane_buckets(embeddings, seed=1).collect()}
    b2 = {r["vec_id"]: r["buckets"] for r in similarity.hyperplane_buckets(embeddings.repartition(7), seed=1).collect()}
    assert b1 == b2


def test_hyperplane_buckets_empty_and_sparse_partitions(spark, embeddings):
    """Zero-row Arrow batches must not crash the bucket kernel (regression:
    np.array([]) of an empty series has no shape[1])."""
    empty = embeddings.where(F.lit(False))
    assert similarity.hyperplane_buckets(empty).count() == 0
    # more partitions than rows → some partitions are empty
    sparse = embeddings.limit(3).repartition(16)
    out = {r["vec_id"]: r["buckets"] for r in similarity.hyperplane_buckets(sparse, seed=1).collect()}
    full = {r["vec_id"]: r["buckets"] for r in similarity.hyperplane_buckets(embeddings, seed=1).collect()}
    assert out == {k: full[k] for k in out}


# ---- multimodal plumbing ----------------------------------------------------

def test_extract_features_deterministic_and_shaped(spark):
    media = multimodal.synth_media(spark, n=30, seed=5)
    f1 = multimodal.extract_features(media).orderBy("media_id").collect()
    f2 = multimodal.extract_features(media.repartition(4)).orderBy("media_id").collect()
    assert len(f1) == 30
    for a, b in zip(f1, f2):
        assert a["media_id"] == b["media_id"]
        assert a["feature"] == b["feature"]
        assert len(a["feature"]) == 64
        assert abs(float(np.linalg.norm(a["feature"])) - 1.0) < 1e-3


def test_real_decoder_is_explicit_stub():
    # inter-frame video codecs (non-AVI payloads) are the one remaining stub
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"bytes", "video")
    # unknown containers fail loudly, not silently
    with pytest.raises(ValueError, match="unsupported image container"):
        multimodal.decode_image(b"XXnotanimage")


def test_frame_sample_plan(spark):
    media = multimodal.synth_media(spark, n=30, seed=5)
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    vids = {r["media_id"] for r in media.where(F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in rows} == vids
    for r in rows:
        assert r["frame_ts_ms"] % 1000 == 0


# ---- real image decode ------------------------------------------------------

def test_decode_image_roundtrips():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8)  # odd width → BMP row padding
    assert np.array_equal(multimodal.decode_image(multimodal.bmp_bytes(px)), px)
    assert np.array_equal(multimodal.decode_image(multimodal.ppm_bytes(px)), px)
    g = rng.randint(0, 256, size=(4, 6)).astype(np.uint8)
    out = multimodal.decode_image(multimodal.pgm_bytes(g))
    assert out.shape == (4, 6, 3)
    for c in range(3):
        assert np.array_equal(out[:, :, c], g)


def test_decode_png_roundtrips_all_filters():
    """Every PNG scanline filter (None/Sub/Up/Average/Paeth) unfilters back
    to the exact source pixels, for RGB, gray, and RGBA color types."""
    rng = np.random.RandomState(3)
    for shape in [(5, 7, 3), (1, 1, 3), (4, 6), (16, 3, 3)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        want = px if px.ndim == 3 else np.repeat(px[:, :, None], 3, axis=2)
        for ft in range(5):
            got = multimodal.decode_image(multimodal.png_bytes(px, filter_type=ft))
            assert np.array_equal(got, want), (shape, ft)
    rgba = rng.randint(0, 256, size=(6, 5, 4)).astype(np.uint8)
    assert np.array_equal(multimodal.decode_png(multimodal.png_bytes(rgba)), rgba[:, :, :3])


def test_decode_png_palette_and_rejections():
    # hand-built palette (color type 3) PNG: 2×2 indices into a 3-entry PLTE
    import struct as _s
    import zlib as _z

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raster = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])  # filter 0 rows
    def chunk(tag, body):
        return _s.pack(">I", len(body)) + tag + body + _s.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    buf = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", plte)
           + chunk(b"IDAT", _z.compress(raster))
           + chunk(b"IEND", b""))
    px = multimodal.decode_png(buf)
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]]
    # 16-bit and interlaced are rejected loudly
    bad_depth = (b"\x89PNG\r\n\x1a\n"
                 + chunk(b"IHDR", _s.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)))
    with pytest.raises(ValueError, match="bit depth"):
        multimodal.decode_png(bad_depth)
    interlaced = (b"\x89PNG\r\n\x1a\n"
                  + chunk(b"IHDR", _s.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)))
    with pytest.raises(ValueError, match="Adam7"):
        multimodal.decode_png(interlaced)


def test_image_features_known_pixels(spark):
    """Constant-color and gradient images have closed-form features."""
    const = np.full((8, 8, 3), 51, dtype=np.uint8)  # 51/255 = 0.2 exactly
    grad = np.zeros((2, 256, 3), dtype=np.uint8)
    grad[:, :, :] = np.arange(256, dtype=np.uint8)[None, :, None]
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(multimodal.bmp_bytes(const)), ("image/bmp", 8, 8, None)),
            (2, "image", bytearray(multimodal.ppm_bytes(grad)), ("image/x-portable-pixmap", 256, 2, None)),
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in multimodal.image_features(media).collect()}
    r1 = rows[1]
    assert (r1["width"], r1["height"]) == (8, 8)
    assert all(abs(m - 0.2) < 1e-12 for m in r1["mean_rgb"])
    assert all(abs(s) < 1e-12 for s in r1["std_rgb"])  # constant image (mean-sub float fuzz)
    # constant luma 0.2 lands entirely in bin 1 of 8 ([0.125, 0.25))
    assert r1["luma_hist"][1] == 1.0 and sum(r1["luma_hist"]) == 1.0
    r2 = rows[2]
    assert (r2["width"], r2["height"]) == (256, 2)
    # uniform 0..255 gradient: mean = 127.5/255, histogram flat at 1/8
    assert all(abs(m - 127.5 / 255) < 1e-12 for m in r2["mean_rgb"])
    assert all(abs(b - 0.125) < 1e-12 for b in r2["luma_hist"])


def test_synth_image_payloads_decode_everywhere(spark):
    """Every synthetic image row (BMP, PPM, PGM, PNG, and JPEG containers)
    decodes and matches its metadata dimensions."""
    media = multimodal.synth_media(spark, n=40, seed=5)
    imgs = media.where(F.col("kind") == "image")
    feats = {r["media_id"]: r for r in multimodal.image_features(imgs).collect()}
    metas = {r["media_id"]: r["meta"] for r in imgs.collect()}
    assert len(feats) == 14 and set(feats) == set(metas)
    mimes = set()
    for mid, meta in metas.items():
        mimes.add(meta["mime"])
        assert feats[mid]["width"] == meta["width"]
        assert feats[mid]["height"] == meta["height"]
        assert sum(feats[mid]["luma_hist"]) == pytest.approx(1.0)
    assert mimes == {
        "image/bmp",
        "image/x-portable-pixmap",
        "image/x-portable-graymap",
        "image/png",
        "image/jpeg",
    }


def test_real_decode_image_feature_vector():
    px = np.full((16, 16, 3), 200, dtype=np.uint8)
    v = multimodal.real_decode(multimodal.ppm_bytes(px), "image", dim=16)
    assert v.shape == (16,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # constant image → identical tile means → uniform unit vector
    assert np.allclose(v, v[0])


# ---- real JPEG decode --------------------------------------------------------

def test_decode_jpeg_constant_color_known_pixels():
    """A constant-color block has only a DC coefficient; at quant=1 the
    encode→decode chain (DCT → quantize → Huffman → IDCT → color convert)
    must reproduce the color to within the two rounding steps (±1)."""
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, :] = (51, 102, 153)
    out = multimodal.decode_image(multimodal.jpeg_bytes(px, quant=1))
    assert out.shape == (8, 8, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1
    # pure gray constant is EXACT: Cb = Cr = 128, Y integral
    gray = np.full((8, 8, 3), 77, dtype=np.uint8)
    assert np.array_equal(multimodal.decode_jpeg(multimodal.jpeg_bytes(gray, quant=1)), gray)


def test_decode_jpeg_gradient_near_lossless_444():
    """4:4:4 at quant=1 keeps every pixel within DCT rounding error (±3),
    including non-multiple-of-8 dimensions (edge-padded blocks)."""
    rng = np.random.RandomState(11)
    for shape in [(8, 8), (13, 19), (9, 40)]:
        col = np.arange(shape[1]) / max(shape[1] - 1, 1)
        px = (
            np.tile(col, (shape[0], 1))[:, :, None] * np.array([200.0, 150.0, 100.0])
            + rng.randint(0, 12, size=(*shape, 3))
        ).clip(0, 255).astype(np.uint8)
        out = multimodal.decode_image(multimodal.jpeg_bytes(px, quant=1))
        assert out.shape == px.shape
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 3, shape


def test_decode_jpeg_420_and_restart_markers():
    """4:2:0 subsampling (2×2-Y MCUs, box-averaged chroma) and restart
    intervals (DRI + RSTn segments, DC predictors reset per segment) both
    decode; luma survives subsampling almost exactly on a smooth image."""
    col = np.arange(24) / 23.0
    px = (np.tile(col, (16, 1))[:, :, None] * np.array([180.0, 140.0, 90.0])).astype(np.uint8)
    for rst in (0, 2):
        out = multimodal.decode_jpeg(multimodal.jpeg_bytes(px, quant=1, subsample=(2, 2), restart_interval=rst))
        assert out.shape == px.shape
        # chroma detail is averaged 2×2 but overall error stays small on a
        # smooth gradient; luma (the weighted mean) is preserved tightly
        assert np.abs(out.astype(int) - px.astype(int)).mean() < 4.0
        luma_in = px.astype(float) @ np.array([0.299, 0.587, 0.114])
        luma_out = out.astype(float) @ np.array([0.299, 0.587, 0.114])
        assert np.abs(luma_in - luma_out).max() <= 4.0
    # restart output must equal no-restart output (same coefficients)
    a = multimodal.decode_jpeg(multimodal.jpeg_bytes(px, quant=2, restart_interval=2))
    b = multimodal.decode_jpeg(multimodal.jpeg_bytes(px, quant=2))
    assert np.array_equal(a, b)


def test_decode_jpeg_rejections():
    px = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = multimodal.jpeg_bytes(px, quant=1)
    # progressive (SOF2) rejected loudly
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        multimodal.decode_jpeg(progressive)
    with pytest.raises(ValueError, match="SOI"):
        multimodal.decode_jpeg(b"notajpeg")
    # truncated header (no SOF/SOS) rejected loudly
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0....")


# ---- P10 context quota window ----------------------------------------------

def test_context_quota_window_edges(spark):
    """Redistribution edges per blink/biencoder/data_process.py:45-57 with
    max_tokens=10: base left_quota=(10-2)//2-1=3, right_quota=10-2-3-2=3."""
    from blink_spark.functions.text import context_quota_window

    L = lambda *xs: list(xs)
    rows = [
        # (id, left, mention, right)
        (1, L("a", "b", "c", "d", "e"), L("M", "N"), L("x", "y", "z", "w", "v")),  # both long
        (2, L("a"), L("M", "N"), L("x", "y", "z", "w", "v", "u")),  # short left → right gets +2
        (3, L("a", "b", "c", "d", "e"), L("M", "N"), L("x")),       # short right → left gets +2
        (4, L(), L("M", "N"), L()),                                   # both empty
        (5, L("a", "b"), L("M", "N"), L("x", "y")),                   # both under quota
    ]
    df = spark.createDataFrame(
        rows, "id long, l array<string>, m array<string>, r array<string>"
    )
    out = {
        r.id: r.ctx
        for r in df.select(
            "id", context_quota_window(F.col("l"), F.col("m"), F.col("r"), 10).alias("ctx")
        ).collect()
    }
    # python oracle mirroring the reference's exclusive branches
    def oracle(left, mention, right, mx=10):
        lq = (mx - len(mention)) // 2 - 1
        rq = mx - len(mention) - lq - 2
        if len(left) <= lq:
            if len(right) > rq:
                rq += lq - len(left)
        elif len(right) <= rq:
            lq += rq - len(right)
        lq, rq = max(lq, 0), max(rq, 0)
        lpart = left[-lq:] if lq > 0 else []
        return lpart + mention + right[:rq]

    for rid, left, mention, right in rows:
        assert out[rid] == oracle(left, mention, right), rid
    # explicit expectations for the two redistribution branches
    assert out[2] == ["a", "M", "N", "x", "y", "z", "w", "v"]
    assert out[3] == ["a", "b", "c", "d", "e", "M", "N", "x"]


def test_context_quota_window_mention_exceeds_budget(spark):
    from blink_spark.functions.text import context_quota_window

    df = spark.createDataFrame(
        [(1, ["a", "b"], ["m1", "m2", "m3", "m4", "m5", "m6"], ["x", "y"])],
        "id long, l array<string>, m array<string>, r array<string>",
    )
    out = df.select(
        context_quota_window(F.col("l"), F.col("m"), F.col("r"), 4).alias("ctx")
    ).first().ctx
    # quotas go negative → clamp to 0: mention alone survives
    assert out == ["m1", "m2", "m3", "m4", "m5", "m6"]


# ---- real audio decode ------------------------------------------------------

def test_decode_wav_roundtrip_and_features(spark):
    """Known-signal checks: a sine of amplitude A has RMS A/√2 and
    zero-crossing rate 2f/sr; its energy concentrates in the right band."""
    import numpy as np

    sr, f, dur = 8000, 440.0, 1.0
    t = np.arange(int(sr * dur)) / sr
    x = 0.5 * np.sin(2 * np.pi * f * t)
    payload = multimodal.wav_bytes(x, sr)
    decoded, got_sr = multimodal.decode_wav(payload)
    assert got_sr == sr
    assert len(decoded) == len(x)
    assert float(np.max(np.abs(decoded - x))) < 2e-4  # 16-bit quantization

    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload), ("audio/wav", None, None, 1000))],
        schema=multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.audio_features(media).first()
    assert r.sample_rate == sr
    assert abs(r.duration_ms - 1000.0) < 1e-6
    assert abs(r.rms - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(r.zero_crossing_rate - 2 * f / sr) < 2e-3
    # 440 Hz of a 0..4000 Hz spectrum in 8 bands → band 0 (0..500 Hz) peaks
    assert int(np.argmax(r.band_energy)) == 0
    assert abs(sum(r.band_energy) - 1.0) < 1e-3


def test_real_decode_audio_feature_vector(spark):
    import numpy as np

    sr = 8000
    x = 0.25 * np.sin(2 * np.pi * 220.0 * np.arange(sr) / sr)
    v = multimodal.real_decode(multimodal.wav_bytes(x, sr), "audio", dim=16)
    assert v.shape == (16,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_synth_audio_payloads_are_valid_wav(spark):
    media = multimodal.synth_media(spark, n=12, seed=3)
    rows = multimodal.audio_features(media).collect()
    assert len(rows) == 4  # every third row is audio
    for r in rows:
        assert r.sample_rate == 8000
        assert r.duration_ms >= 500
        assert r.rms > 0.3  # 0.5-amplitude sine → RMS ≈ 0.354


# ---- real video decode (MJPEG-in-AVI) ---------------------------------------

def test_decode_video_frames_roundtrip_known_pixels():
    """Known frames → AVI/MJPEG encode → decode: frame count, fps, and the
    per-frame pixels (within JPEG quantization error) all round-trip."""
    frames = []
    for fi in range(4):
        px = np.zeros((16, 16, 3), dtype=np.uint8)
        px[:, :] = (40 + 50 * fi, 80, 120)  # distinct constant color per frame
        frames.append(px)
    payload = multimodal.avi_mjpeg_bytes(frames, fps=5, quant=1)
    got, fps = multimodal.decode_video_frames(payload)
    assert fps == pytest.approx(5.0)
    assert len(got) == 4
    for want, dec in zip(frames, got):
        assert dec.shape == (16, 16, 3)
        # constant color + quant=1: within the two rounding steps (±1)
        assert int(np.max(np.abs(dec.astype(int) - want.astype(int)))) <= 1


def test_decode_video_frames_rejections():
    # non-AVI payloads are the scoped inter-frame-codec stub
    with pytest.raises(NotImplementedError, match="MJPEG-in-AVI"):
        multimodal.decode_video_frames(b"\x00\x00\x00\x18ftypmp42" + b"x" * 64)
    # a structurally broken AVI fails loudly
    import struct as _s
    truncated = b"RIFF" + _s.pack("<I", 40) + b"AVI " + b"LIST" + _s.pack("<I", 9999) + b"movi"
    with pytest.raises(ValueError, match="truncated AVI chunk"):
        multimodal.decode_video_frames(truncated)
    # an AVI with headers but zero frame chunks fails loudly
    empty = b"RIFF" + _s.pack("<I", 16) + b"AVI " + b"LIST" + _s.pack("<I", 4) + b"movi"
    with pytest.raises(ValueError, match="no video frame chunks"):
        multimodal.decode_video_frames(empty)


def test_video_frame_features_known_signal(spark):
    """Constant-luma frames have closed-form features: mean_luma equals the
    constant, std 0, motion 0 between identical frames and >0 across a
    luma step."""
    lo = np.full((8, 8, 3), 51, dtype=np.uint8)   # luma 51/255 = 0.2
    hi = np.full((8, 8, 3), 153, dtype=np.uint8)  # luma 153/255 = 0.6
    # 2 fps, 4 frames = 2000 ms → ticks at 0/1000 ms sample frames 0 and 2
    payload = multimodal.avi_mjpeg_bytes([lo, lo, hi, hi], fps=2, quant=1)
    media = spark.createDataFrame(
        [(7, "video", bytearray(payload), ("video/x-msvideo", 8, 8, 2000))],
        schema=multimodal.MEDIA_SCHEMA,
    )
    rows = sorted(
        multimodal.video_frame_features(media, every_ms=1000).collect(),
        key=lambda r: r.frame_ts_ms,
    )
    assert [(r.frame_idx, r.frame_ts_ms) for r in rows] == [(0, 0), (2, 1000)]
    assert rows[0].mean_luma == pytest.approx(0.2, abs=2 / 255)
    assert rows[1].mean_luma == pytest.approx(0.6, abs=2 / 255)
    for r in rows:
        assert r.std_luma == pytest.approx(0.0, abs=2 / 255)
        assert (r.width, r.height) == (8, 8)
    assert rows[0].motion == 0.0  # first sampled frame has no predecessor
    # 0.2 → 0.6 luma step: motion ≈ 0.4
    assert rows[1].motion == pytest.approx(0.4, abs=4 / 255)


def test_real_decode_video_feature_vector():
    px = np.full((16, 16, 3), 200, dtype=np.uint8)
    payload = multimodal.avi_mjpeg_bytes([px, px], fps=4, quant=1)
    v = multimodal.real_decode(payload, "video", dim=16)
    assert v.shape == (16,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    assert np.allclose(v, v[0])  # constant frames → uniform unit vector


def test_decode_video_frames_fallbacks_and_padding():
    """Container robustness: fps falls back to avih's usec-per-frame when
    the vids strh is absent, and the chunk walker honors RIFF word
    alignment (odd-size chunks are followed by a pad byte)."""
    import struct as _s

    px = np.full((8, 8, 3), 100, dtype=np.uint8)
    payload = multimodal.avi_mjpeg_bytes([px, px, px], fps=3, quant=1)

    # corrupt the strh fcc so the walker never sees a vids header: the fps
    # must come from avih's dwMicroSecPerFrame (1e6/3 rounded -> ~3.000003)
    i = payload.find(b"strh")
    no_strh = payload[:i] + b"strX" + payload[i + 4 :]
    frames, fps = multimodal.decode_video_frames(no_strh)
    assert len(frames) == 3
    assert fps == pytest.approx(3.0, abs=1e-4)

    # splice an ODD-size junk chunk before the movi list: the walker must
    # skip its pad byte or every subsequent fcc read is off by one
    junk = b"JUNK" + _s.pack("<I", 5) + b"abcde" + b"\x00"
    movi_at = payload.find(b"LIST", 12)
    # find the movi LIST specifically (the first LIST is hdrl)
    while payload[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = payload.find(b"LIST", movi_at + 4)
    padded = payload[:movi_at] + junk + payload[movi_at:]
    padded = padded[:4] + _s.pack("<I", len(padded) - 8) + padded[8:]  # fix RIFF size
    frames2, fps2 = multimodal.decode_video_frames(padded)
    assert len(frames2) == 3 and fps2 == pytest.approx(3.0)


def test_video_codec_roundtrip_property():
    """Property-style sweep: random frame counts / dims / fps / content all
    round-trip through AVI-MJPEG within JPEG quantization error."""
    rng = np.random.RandomState(77)
    for _ in range(6):
        n_frames = int(rng.randint(1, 6))
        h, w = int(rng.randint(8, 25)), int(rng.randint(8, 25))
        fps = int(rng.randint(1, 31))
        # smooth content (JPEG is near-lossless at quant=1 on smooth data)
        base = np.linspace(0, 200, w)[None, :, None] + np.linspace(0, 40, h)[:, None, None]
        frames = [
            np.clip(base + 5 * fi, 0, 255).astype(np.uint8).repeat(3, axis=2)[:, :, :3]
            for fi in range(n_frames)
        ]
        got, got_fps = multimodal.decode_video_frames(
            multimodal.avi_mjpeg_bytes(frames, fps=fps, quant=1)
        )
        assert len(got) == n_frames
        assert got_fps == pytest.approx(fps)
        for want, dec in zip(frames, got):
            assert dec.shape == want.shape
            assert int(np.max(np.abs(dec.astype(int) - want.astype(int)))) <= 2


def test_synth_video_payloads_split_real_and_stub(spark):
    """Two of three synthetic video rows are valid MJPEG-in-AVI (decode for
    real, per-frame features flow); the third is the scoped inter-frame
    stand-in that must raise NotImplementedError."""
    media = multimodal.synth_media(spark, n=36, seed=9)
    vids = media.where(F.col("kind") == "video")
    avi = vids.where(F.col("meta.mime") == "video/x-msvideo")
    mp4 = vids.where(F.col("meta.mime") == "video/mp4")
    assert avi.count() == 8 and mp4.count() == 4  # 12 video rows, 2:1 split
    feat = multimodal.video_frame_features(avi, every_ms=1000).collect()
    by_media = {}
    for r in feat:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == {r.media_id for r in avi.collect()}
    for rows in by_media.values():
        rows.sort(key=lambda r: r.frame_ts_ms)
        assert rows[0].motion == 0.0
        # the moving bright bar guarantees nonzero inter-frame motion
        if len(rows) > 1 and rows[1].frame_idx != rows[0].frame_idx:
            assert rows[1].motion > 0.0
    for r in mp4.collect():
        with pytest.raises(NotImplementedError):
            multimodal.decode_video_frames(bytes(r.payload))

"""Unit semantics for the training-data operators (dedup / similarity /
text / multimodal)."""

from __future__ import annotations

from pyspark.sql import functions as F

from binlogsub_spark.functions.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from binlogsub_spark.functions.multimodal import attach_media, decode_media
from binlogsub_spark.functions.similarity import cosine_topk, lsh_topk
from binlogsub_spark.functions.text import lang_id, token_count

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (3, "the quick brown fox jumps over the sleepy dog"),  # near dup
            (4, "completely different content about spark engines"),
            (5, "  The  QUICK   brown fox jumps over the lazy dog "),  # dup modulo norm
            (6, "der hund und die katze und das haus und der baum ist"),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup_normalized(spark):
    out = {r["doc_id"]: r for r in exact_duplicates(_docs(spark)).collect()}
    assert out[1]["keeper_id"] == 1 and not out[1]["is_duplicate"]
    assert out[2]["keeper_id"] == 1 and out[2]["is_duplicate"]
    assert out[5]["keeper_id"] == 1 and out[5]["is_duplicate"]  # case/ws-normalized
    assert out[1]["group_size"] == 3
    assert not out[3]["is_duplicate"] and not out[4]["is_duplicate"]


def test_jaccard_near_dup(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             jaccard_pairs(_docs(spark), threshold=0.4).collect()}
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 5)] == 1.0
    assert 0.4 <= pairs[(1, 3)] < 1.0  # one-word change
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(_docs(spark), threshold=0.4).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs and (1, 3) in pairs
    assert (1, 4) not in pairs


def test_simhash_exact_dup_hamming_zero(spark):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_pairs(_docs(spark), max_hamming=12).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 5)] == 0
    # doc 6 is unrelated: expected Hamming ~31 of 63 bits — far above 12
    assert (1, 6) not in pairs


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat is on the mat and the dog"),
         (2, "der hund und die katze ist das"),
         (3, "xyzzy qwerty plugh")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_token_count_edges(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "one"), (4, " a  b ")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 2}


def test_arrow_topk_equals_expression_topk(spark):
    """The numpy-matmul path and the pure-expression path must rank
    identically (validates the partial-topk + final-window reduction)."""
    import __spark_entry__ as entry

    a = entry.q_similarity_cosine_topk(spark, SF).toPandas()
    b = entry.q_similarity_ann_arrow_topk(spark, SF).toPandas()
    cols = ["query_id", "vec_id", "cosine", "rank"]
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_lsh_topk_is_subset_quality(spark):
    """LSH hits must be true high-cosine neighbors: every LSH rank-1 result
    must appear in the exact brute-force top-20 of that query."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, q, k=20).toPandas()
    approx = lsh_topk(emb, q, k=1, planes=4).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set).to_dict()
    hits = sum(
        1 for r in approx.itertuples() if r.vec_id in exact_sets.get(r.query_id, set())
    )
    assert hits >= len(approx) * 0.5  # recall sanity at tiny scale


def test_multimodal_plumbing(spark):
    d = spark.createDataFrame([(1, b"abc"), (2, b"defgh")], "doc_id long, payload binary")
    m = attach_media(d, "doc_id", "payload", kind="image")
    rows = {r["media_id"]: r for r in decode_media(m).collect()}
    assert rows[1]["n_bytes"] == 3 and rows[2]["n_bytes"] == 5
    assert len(rows[1]["sha256"]) == 64
    assert 64 <= rows[1]["width"] < 256 and 64 <= rows[1]["height"] < 256
    assert len(rows[1]["feature"]) == 8
    # deterministic: same payload -> same features
    rows2 = {r["media_id"]: r for r in decode_media(m).collect()}
    assert rows[1]["feature"] == rows2[1]["feature"]


def test_resize_and_frame_sample(spark):
    """Resize planning preserves aspect (integer-exact) and only flags
    images over the limit; frame sampling fans out stride-indexed rows
    deterministically."""
    from binlogsub_spark.functions.multimodal import (
        attach_media,
        frame_sample,
        resize_media,
    )
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(1, bytearray(b"payload-one")), (2, bytearray(b"payload-two"))],
        "doc_id LONG, payload BINARY",
    )
    m = attach_media(d, "doc_id", "payload")
    rz = {r["media_id"]: r for r in resize_media(m, max_side=128).collect()}
    for r in rz.values():
        if r["resized"]:
            longest = max(r["width"], r["height"])
            assert longest > 128
            assert r["new_width"] == (r["width"] * 128) // longest
            assert r["new_height"] == (r["height"] * 128) // longest
            assert max(r["new_width"], r["new_height"]) <= 128
        else:
            assert (r["new_width"], r["new_height"]) == (r["width"], r["height"])

    fs = frame_sample(m, every_n=8).collect()
    by_id: dict = {}
    for r in fs:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_id.items():
        n = rows[0]["n_frames"]
        assert sorted(r["frame_idx"] for r in rows) == list(range(0, n, 8))
    # deterministic across runs
    fs2 = frame_sample(m, every_n=8).collect()
    assert sorted(map(str, fs)) == sorted(map(str, fs2))


def test_ivf_topk_recall(spark):
    """IVF-probed results must be true neighbors: every IVF rank-1 hit
    appears in the exact brute-force top-20 of its query."""
    from binlogsub_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, q, k=20).toPandas()
    approx = ivf_topk(emb, q, k=1, n_cells=8, n_probe=4).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set).to_dict()
    hits = sum(
        1 for r in approx.itertuples() if r.vec_id in exact_sets.get(r.query_id, set())
    )
    assert len(approx) == 10
    assert hits >= len(approx) * 0.5


def test_simhash_pigeonhole_recall(spark):
    """A constructed pair at hamming ~10 must be found when
    max_hamming=10 (bands derived = 11) — the exact case the old fixed
    4-band blocking silently missed — and bands <= max_hamming must be
    rejected loudly."""
    import pytest

    from binlogsub_spark.functions.dedup import simhash, simhash_pairs

    base = " ".join(f"w{i}" for i in range(60))
    variant = " ".join(f"w{i}" if i % 6 else f"x{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, variant), (3, "completely different content here")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ham = bin(sigs[1] ^ sigs[2]).count("1")
    assert 4 <= ham <= 20, f"fixture hamming drifted: {ham}"
    pairs = simhash_pairs(docs, max_hamming=ham).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} >= {(1, 2)}
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, max_hamming=10, bands=4)


def test_simhash_md5_matches_xxhash_semantics(spark):
    """Both hash families agree on exact-duplicate (hamming 0) pairs."""
    from binlogsub_spark.functions.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "  Alpha   beta GAMMA "), (3, "other text")],
        ["doc_id", "text"],
    )
    for fn in ("xxhash64", "md5"):
        got = {(r["id_a"], r["id_b"], r["hamming"])
               for r in simhash_pairs(docs, max_hamming=0, hash_fn=fn).collect()}
        assert got == {(1, 2, 0)}, (fn, got)


def test_minhash_md5_equals_xxhash_results(spark):
    """The md5 (oracle-portable) hash family finds the same verified pairs
    as xxhash64 — verification is exact Jaccard either way."""
    from binlogsub_spark.functions.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {(r["id_a"], r["id_b"], r["jaccard"])
         for r in minhash_lsh_pairs(docs, threshold=0.05).collect()}
    b = {(r["id_a"], r["id_b"], r["jaccard"])
         for r in minhash_lsh_pairs(docs, threshold=0.05, hash_fn="md5").collect()}
    # candidate sets may differ slightly (different LSH families); verified
    # high-jaccard pairs must agree on the overlap of both candidate sets
    assert a and b
    assert len(a & b) / max(len(a | b), 1) > 0.8


def test_embedding_near_dup_multi_table_recall(spark):
    """Inject true near-duplicates (perturbed copies, cosine ≈ 0.999):
    multi-table LSH (4 x 16 planes) must recover ≥ 95% of them, and every
    reported pair must genuinely clear the threshold (no false positives —
    exact rescoring guarantees precision)."""
    from binlogsub_spark.functions.similarity import embedding_near_dup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    noise = F.transform(
        F.col("embedding"), lambda x, i: x + 0.05 * F.sin(F.col("vec_id") * 7 + i) / 8.0
    )
    pert = emb.select((F.col("vec_id") + 1000000).alias("vec_id"), noise.alias("embedding"))
    n = emb.count()
    got = embedding_near_dup(emb.unionByName(pert), threshold=0.99).collect()
    planted = {(r["id_a"], r["id_b"]) for r in got if r["id_b"] == r["id_a"] + 1000000}
    recall = len(planted) / n
    assert recall >= 0.95, f"recall {recall} of {n} planted near-dups"
    assert all(r["cosine"] >= 0.99 for r in got)


# ---------------------------------------------------------- real PPM codec
def test_ppm_roundtrip_and_header_variants():
    import numpy as np

    from binlogsub_spark.functions.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 29, 3), dtype=np.uint8)
    w, h, back = decode_ppm(encode_ppm(px))
    assert (w, h) == (29, 13)
    np.testing.assert_array_equal(back, px)
    # spec variants: comments and extra whitespace in the header
    body = px.tobytes()
    variant = b"P6\n# a comment\n 29\t13 \n255\n" + body
    w2, h2, back2 = decode_ppm(variant)
    assert (w2, h2) == (29, 13)
    np.testing.assert_array_equal(back2, px)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # wrong magic
    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n\x00\x01")  # short pixel data


def test_ppm_resize_nearest_matches_reference():
    import numpy as np

    from binlogsub_spark.functions.multimodal import resize_nearest

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(64, 100, 3), dtype=np.uint8)
    out = resize_nearest(px, 31, 17)
    assert out.shape == (17, 31, 3)
    # independent reference: per-pixel floor index math
    for y in range(17):
        for x in range(0, 31, 7):
            np.testing.assert_array_equal(out[y, x], px[(y * 64) // 17, (x * 100) // 31])


def test_codec_dispatch_real_vs_stub():
    import numpy as np

    from binlogsub_spark.functions.multimodal import _decode_image

    px = np.full((10, 20, 3), 77, dtype=np.uint8)
    from binlogsub_spark.functions.multimodal import encode_ppm

    w, h, feat = _decode_image(encode_ppm(px))
    assert (w, h) == (20, 10)
    assert abs(feat[0] - 77 / 255.0) < 1e-6  # REAL channel mean
    # non-PPM bytes fall back to the stub (digest-derived dims)
    w2, h2, _ = _decode_image(b"not an image at all")
    assert 64 <= w2 < 256 and 64 <= h2 < 256
    # P6-prefixed garbage must not crash the kernel
    w3, h3, _ = _decode_image(b"P6 garbage that is not a header")
    assert w3 >= 64 and h3 >= 64


# ---------------------------------------------------------- real BMP codec
def test_bmp_roundtrip_padding_and_topdown():
    import numpy as np
    import pytest as _pytest

    from binlogsub_spark.functions.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(19)
    # width 29 -> row_bytes 87 -> 1 pad byte per row: exercises the stride
    px = rng.integers(0, 256, size=(13, 29, 3), dtype=np.uint8)
    blob = encode_bmp(px)
    assert blob[:2] == b"BM"
    assert len(blob) == 54 + (29 * 3 + 1) * 13
    w, h, back = decode_bmp(blob)
    assert (w, h) == (29, 13)
    np.testing.assert_array_equal(back, px)
    # width % 4 == 0 -> no padding
    px4 = rng.integers(0, 256, size=(5, 8, 3), dtype=np.uint8)
    assert len(encode_bmp(px4)) == 54 + 8 * 3 * 5
    np.testing.assert_array_equal(decode_bmp(encode_bmp(px4))[2], px4)
    # top-down variant (negative height) decodes to the same pixels
    import struct

    td = bytearray(encode_bmp(px))
    struct.pack_into("<i", td, 22, -13)
    rows = np.frombuffer(bytes(td)[54:], dtype=np.uint8).reshape(13, 88)
    flipped = rows[::-1].tobytes()
    td = bytes(td[:54]) + flipped
    w2, h2, back2 = decode_bmp(td)
    assert (w2, h2) == (29, 13)
    np.testing.assert_array_equal(back2, px)
    with _pytest.raises(ValueError):
        decode_bmp(b"PX" + bytes(60))  # wrong magic
    with _pytest.raises(ValueError):
        decode_bmp(encode_bmp(px)[:50])  # truncated header
    with _pytest.raises(ValueError):
        decode_bmp(encode_bmp(px)[:-5])  # short pixel data


def test_codec_dispatch_bmp():
    import numpy as np

    from binlogsub_spark.functions.multimodal import _decode_image, encode_bmp

    px = np.full((10, 20, 3), 0, dtype=np.uint8)
    px[..., 0] = 11
    px[..., 1] = 22
    px[..., 2] = 33
    w, h, feat = _decode_image(encode_bmp(px))
    assert (w, h) == (20, 10)
    assert abs(feat[0] - 11 / 255.0) < 1e-6  # REAL channel means, RGB order
    assert abs(feat[1] - 22 / 255.0) < 1e-6
    assert abs(feat[2] - 33 / 255.0) < 1e-6
    # BM-prefixed garbage must fall to the stub, never crash
    w2, h2, _ = _decode_image(b"BM garbage that is not a bitmap header")
    assert w2 >= 64 and h2 >= 64


def test_resize_media_same_container_reencode(spark):
    """resize_media re-encodes in the SOURCE container: PPM rows report
    P6 sizes, BMP rows report padded-DIB sizes, stub rows NULL."""
    import numpy as np

    from binlogsub_spark.functions.multimodal import (
        attach_media,
        encode_bmp,
        encode_ppm,
        resize_media,
    )

    px = np.full((60, 200, 3), 5, dtype=np.uint8)  # longest 200 -> resize
    rows = [
        (0, bytearray(encode_ppm(px))),
        (2, bytearray(encode_bmp(px))),
        (1, bytearray(b"just text")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["media_id"]: r
        for r in resize_media(
            attach_media(df, "doc_id", "payload"), max_side=128
        ).collect()
    }
    # 200x60 -> 128x38
    assert (out[0]["new_width"], out[0]["new_height"]) == (128, 38)
    assert out[0]["new_n_bytes"] == len(b"P6\n128 38\n255\n") + 3 * 128 * 38
    assert (out[2]["new_width"], out[2]["new_height"]) == (128, 38)
    assert out[2]["new_n_bytes"] == 54 + (3 * 128) * 38  # 384 % 4 == 0
    assert out[1]["new_n_bytes"] is None


def test_pii_scrub_sequential_semantics(spark):
    """Sequential count-then-replace: a masked email never re-counts as a
    phone; the SSN shape masks as <ID> before the phone rule can eat it;
    scrubbing is idempotent."""
    from binlogsub_spark.functions.text import pii_features

    rows = [
        (0, "mail a.b+c@ex-ample.co.uk and 10.255.0.1 call +1 (555) 123-4567"),
        (1, "ssn 123-45-6789 plain 42"),
        (2, "no pii at all"),
        (3, "two mails x@y.io z@w.dev"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = pii_features(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *(feats[f"pii_{n}"].alias(f"pii_{n}")
              for n in ("email", "ssn", "ipv4", "phone")),
            feats["text_scrubbed"].alias("scrubbed"),
        ).collect()
    }
    assert (out[0]["pii_email"], out[0]["pii_ipv4"], out[0]["pii_phone"]) == (1, 1, 1)
    assert out[0]["scrubbed"] == "mail <EMAIL> and <IP> call <PHONE>"
    # the SSN masks as <ID>, NOT as a phone run
    assert (out[1]["pii_ssn"], out[1]["pii_phone"]) == (1, 0)
    assert out[1]["scrubbed"] == "ssn <ID> plain 42"
    assert out[2]["scrubbed"] == "no pii at all"
    assert out[3]["pii_email"] == 2

    # idempotent: scrubbing the scrubbed text changes nothing
    scrubbed = df.select(
        "doc_id", feats["text_scrubbed"].alias("text")
    )
    feats2 = pii_features(F.col("text"))
    again = scrubbed.select(
        "doc_id",
        (feats2["pii_email"] + feats2["pii_ssn"] + feats2["pii_ipv4"]
         + feats2["pii_phone"]).alias("n"),
        feats2["text_scrubbed"].alias("t2"),
    ).collect()
    for r0, r in zip(sorted(scrubbed.collect(), key=lambda x: x["doc_id"]),
                     sorted(again, key=lambda x: x["doc_id"])):
        assert r["n"] == 0 and r["t2"] == r0["text"]


def test_decontaminate_counts_and_broadcast_plan(spark):
    from binlogsub_spark.functions.dedup import decontaminate

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # 2 shingles, both in eval
            (1, "alpha beta gamma delta epsilon other"),  # 2 shingles, 1 in eval
            (2, "one two three four five six seven"),     # 3 shingles, clean
            (3, "too short"),                             # 0 shingles
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = decontaminate(corpus, eval_df, n=5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_shingles"] == 2 and rows[0]["n_contaminated"] == 2
    assert rows[1]["n_shingles"] == 2 and rows[1]["n_contaminated"] == 1
    assert rows[2]["n_contaminated"] == 0 and not rows[2]["contaminated"]
    assert rows[3]["n_shingles"] == 0 and not rows[3]["contaminated"]
    assert rows[0]["contaminated"] and rows[1]["contaminated"]
    # the eval side must broadcast (map-side semi-join at corpus scale)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------- real WAV codec
def test_wav_roundtrip_chunk_walk_and_rejects():
    import numpy as np
    import pytest as _pytest

    from binlogsub_spark.functions.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(23)
    samples = rng.integers(-32768, 32768, size=(777, 2), dtype=np.int16)
    blob = encode_wav(samples, 44100)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    assert len(blob) == 44 + 777 * 2 * 2
    rate, ch, back = decode_wav(blob)
    assert (rate, ch) == (44100, 2)
    np.testing.assert_array_equal(back, samples)

    # RIFF spec: unknown chunks (incl. odd-sized, word-aligned) are skipped
    import struct

    extra = struct.pack("<4sI", b"LIST", 5) + b"12345" + b"\x00"  # pad byte
    with_extra = blob[:12] + extra + blob[12:]
    fixed = bytearray(with_extra)
    struct.pack_into("<I", fixed, 4, len(with_extra) - 8)
    rate2, ch2, back2 = decode_wav(bytes(fixed))
    assert rate2 == 44100
    np.testing.assert_array_equal(back2, samples)

    with _pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 40)  # not WAVE
    with _pytest.raises(ValueError):
        decode_wav(blob[:20])  # truncated: no data chunk
    # non-PCM (format 3 = float) must refuse, not mis-decode
    bad = bytearray(blob)
    struct.pack_into("<H", bad, 20, 3)
    with _pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_wav_resample_nearest():
    import numpy as np

    from binlogsub_spark.functions.multimodal import resample_nearest_audio

    x = np.arange(100, dtype=np.int16).reshape(-1, 1)
    up = resample_nearest_audio(x, 8000, 16000)
    assert up.shape == (200, 1)
    # index gather reference: out[i] = x[(i * n) // new_n]
    for i in (0, 1, 57, 199):
        assert up[i, 0] == x[(i * 100) // 200, 0]
    down = resample_nearest_audio(x, 16000, 8000)
    assert down.shape == (50, 1)
    assert down[49, 0] == x[98, 0]


def test_decode_audio_real_vs_stub(spark):
    """REAL WAV rows report genuine PCM stats; non-WAV rows hit the
    digest stub; both deterministic."""
    import numpy as np

    from binlogsub_spark.functions.multimodal import (
        attach_media,
        decode_audio,
        encode_wav,
    )

    const = np.full((500, 1), 3277, dtype=np.int16)  # ~0.1 full scale
    stereo = np.empty((250, 2), dtype=np.int16)
    stereo[:, 0] = 1000
    stereo[:, 1] = -2000
    d = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(const, 8000))),
            (2, bytearray(encode_wav(stereo, 16000))),
            (3, bytearray(b"plain text, not audio")),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_audio(attach_media(d, "doc_id", "payload", kind="audio")).collect()}
    r1 = rows[1]
    assert (r1["sample_rate"], r1["channels"], r1["n_samples"]) == (8000, 1, 500)
    assert r1["duration_ms"] == 500 * 1000 // 8000
    assert abs(r1["rms"] - 3277 / 32768.0) < 1e-12
    assert abs(r1["peak"] - 3277 / 32768.0) < 1e-12
    r2 = rows[2]
    assert (r2["sample_rate"], r2["channels"], r2["n_samples"]) == (16000, 2, 250)
    import math

    assert abs(r2["rms"] - math.sqrt((1000**2 + 2000**2) / 2) / 32768.0) < 1e-12
    assert abs(r2["peak"] - 2000 / 32768.0) < 1e-12
    r3 = rows[3]  # stub: digest-derived, bounded
    assert 8000 <= r3["sample_rate"] <= 8000 + 100 * 255
    assert r3["channels"] in (1, 2)
    assert 0.0 <= r3["rms"] <= 1.0 and 0.0 <= r3["peak"] <= 1.0


def test_resample_audio_real_passthrough_and_opaque(spark):
    import numpy as np

    from binlogsub_spark.functions.multimodal import (
        attach_media,
        encode_wav,
        resample_audio,
    )

    x = np.arange(1000, dtype=np.int16).reshape(-1, 1)
    d = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(x, 8000))),     # upsample 8k -> 16k
            (2, bytearray(encode_wav(x, 16000))),    # already at rate
            (3, bytearray(b"opaque non-wav bytes")),  # stub boundary
        ],
        "doc_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in resample_audio(
            attach_media(d, "doc_id", "payload", kind="audio"), target_rate=16000
        ).collect()
    }
    r1 = rows[1]
    assert r1["resampled"] and r1["new_n_samples"] == 2000
    assert r1["new_n_bytes"] == 44 + 2000 * 2  # true re-encoded size
    r2 = rows[2]
    assert not r2["resampled"] and r2["new_n_samples"] == 1000
    assert r2["new_n_bytes"] == 44 + 1000 * 2
    r3 = rows[3]
    assert r3["sample_rate"] is None and r3["new_n_bytes"] is None

"""Multimodal plumbing: schema, deterministic fake decode, feature shapes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark import corpus
from geotrellis_contrib_spark.operators import media as md


@pytest.fixture(scope="module")
def media(spark):
    docs = corpus.synth_docs(spark, 300, partitions=4)
    return md.synth_media(corpus.extract_media(docs)).cache()


def test_schema_and_kinds(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["meta"] == "map<string,string>"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio"}


def test_features_deterministic(media):
    f1 = md.extract_features(media)
    rows = {(r.doc_id, r.span_idx): r.feature for r in f1.collect()}
    assert all(len(v) == md.FEATURE_DIM for v in rows.values())
    rows2 = {(r.doc_id, r.span_idx): r.feature
             for r in md.extract_features(media).collect()}
    assert rows == rows2  # decode is deterministic -> plan re-runs agree
    # distinct payloads -> distinct features (the fake decoder is payload-driven)
    assert len({tuple(v) for v in rows.values()}) > 1


def test_fake_decoders_shapes():
    img = md._fake_decode_image(b"x")
    assert img.shape == (32, 32) and img.min() >= 0 and img.max() <= 255
    au = md._fake_decode_audio(b"x")
    assert au.shape == (1024,) and float(au.min()) >= -1.0 and float(au.max()) <= 1.0


def test_cross_modal_similarity_pipeline(spark, media):
    """Composition: media decode -> feature vectors -> cosine top-k over the
    feature column (the training-pipeline 'nearest media by content' path).
    Exact duplicates (same payload -> same features) must rank first with
    cos == 1.0."""
    from pyspark.sql import functions as F

    from geotrellis_contrib_spark.operators import similarity as sim

    feats = md.extract_features(media).withColumn(
        "fid", F.concat_ws("#", "doc_id", F.col("span_idx").cast("string")))
    corpus = feats.select(F.col("fid").alias("vec_id"), F.col("feature").alias("embedding"))
    queries = corpus.limit(3).select(F.col("vec_id").alias("query_id"),
                                     F.col("embedding").alias("qvec"))
    top = sim.cosine_topk(corpus, queries, k=3, dims=md.FEATURE_DIM)
    rows = top.collect()
    assert len(rows) == 9
    assert all(r.cos <= 1.0 + 1e-12 for r in rows)
    # rank ordering is non-increasing in cos per query
    byq = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        byq.setdefault(r.query_id, []).append(r.cos)
    for cs in byq.values():
        assert all(a >= b for a, b in zip(cs, cs[1:]))


def test_resize_images(media):
    out = md.resize_images(media, 8, 8)
    r = out.filter(F.col("kind") == "image").first()
    arr = np.frombuffer(r.payload, dtype=np.float64)
    assert arr.size == 64
    a = out.filter(F.col("kind") == "audio").first()
    assert np.frombuffer(a.payload, dtype=np.float64).size == 256  # 1024/4


# ---------------------------------------------------------------------------
# REAL codecs (stdlib wave / zlib PNG) through the DECODERS seam
# ---------------------------------------------------------------------------

def test_png_roundtrip_pure():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(17, 23)).astype(np.uint8)
    back = md.decode_png(md.encode_png(img))
    np.testing.assert_array_equal(back, img.astype(np.int64))


def test_png_all_filters_decode():
    """Hand-filter scanlines with every standard PNG filter type and check
    the decoder unfilters them back — proves this isn't an
    only-decodes-its-own-encoder toy."""
    import struct
    import zlib
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(5, 8)).astype(np.int64)
    h, w = img.shape
    raw = b""
    prev = np.zeros(w, dtype=np.int64)
    for r, ft in zip(range(h), [0, 1, 2, 3, 4]):
        cur = img[r]
        if ft == 0:
            line = cur
        elif ft == 1:
            line = (cur - np.concatenate([[0], cur[:-1]])) & 0xFF
        elif ft == 2:
            line = (cur - prev) & 0xFF
        elif ft == 3:
            left = np.concatenate([[0], cur[:-1]])
            line = (cur - (left + prev) // 2) & 0xFF
        else:  # paeth
            line = np.empty(w, dtype=np.int64)
            for i in range(w):
                a = cur[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (cur[i] - pred) & 0xFF
        raw += bytes([ft]) + line.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    payload = (md._PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    np.testing.assert_array_equal(md.decode_png(payload), img)


def test_wav_roundtrip_pure():
    rng = np.random.RandomState(4)
    samples = np.round(rng.uniform(-1, 1, size=512) * 32768) / 32768.0
    samples = np.clip(samples, -1.0, 32767 / 32768.0)
    back = md.decode_wav(md.encode_wav(samples))
    np.testing.assert_allclose(back, samples, atol=0)


def test_real_decode_through_engine(spark):
    """extract_features over GENUINE PNG/WAV byte streams decoded by the
    registry-swapped real codecs: features equal a pure-numpy recomputation
    from the known synthesized content."""
    rows = [("d%03d" % i, i % 4, "ref-%03d" % i) for i in range(24)]
    base = spark.createDataFrame(rows, "doc_id string, span_idx int, media_ref string")
    m = md.synth_real_media(base)
    feats = md.extract_features(m, decoders=md.REAL_DECODERS).collect()
    assert len(feats) == 24
    for r in feats:
        seed = md.payload_seed(r.media_ref.encode("utf-8"))
        if r.span_idx % 2 == 0:
            rr = np.arange(32).reshape(-1, 1)
            cc = np.arange(32).reshape(1, -1)
            dec = (((seed % 251) + rr * 31 + cc * 17) % 256).astype(np.float64)
        else:
            i = np.arange(1024, dtype=np.int64)
            pcm = ((((seed % 1000003) + i * 7919) % 65536) / 32768.0 - 1.0)
            # encode quantizes to 16-bit PCM: clip exactly as the codec does
            dec = np.clip(pcm * 32768.0, -32768, 32767).astype("<i2") / 32768.0
        chunks = np.array_split(dec.ravel(), md.FEATURE_DIM)
        expect = [float(c.mean()) for c in chunks]
        np.testing.assert_allclose(r.feature, expect, rtol=0, atol=0)


def test_registry_swap_changes_no_plans(spark):
    """The real-codec swap is a pure registry change: the physical plan
    operator sequence is identical with fake and real decoders."""
    rows = [("d0", 0, "ref-0"), ("d1", 1, "ref-1")]
    base = spark.createDataFrame(rows, "doc_id string, span_idx int, media_ref string")
    m = md.synth_real_media(base)

    def plan_shape(df):
        s = df._jdf.queryExecution().executedPlan().toString()
        return [ln.split("(")[0].strip("*+- ") for ln in s.splitlines() if ln.strip()]

    fake = md.extract_features(m)
    real = md.extract_features(m, decoders=md.REAL_DECODERS)
    assert plan_shape(fake) == plan_shape(real)
    assert fake.schema == real.schema

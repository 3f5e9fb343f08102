"""Multimodal plumbing: schema, batch shape, composability, and the
pluggable decoder/transform registries — real even though the media codecs
are deterministic stubs (none ship in this container)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark.operators.multimodal import (
    as_media,
    extract_features,
    frame_sample,
    register_transform,
    transform_media,
)
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _media(spark):
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("text").isNotNull())
    return as_media(docs, "doc_id", "text", kind="image")


def test_transform_media_schema_composes(spark):
    m = _media(spark)
    out = transform_media(m, {"scale": 0.5})
    assert out.schema.simpleString() == m.schema.simpleString()
    # composable: a second transform runs on the first's output
    out2 = transform_media(out, {"scale": 0.5})
    rows = {r.doc_id: r for r in out2.collect()}
    orig = {r.doc_id: r for r in m.collect()}
    for did, r in rows.items():
        n0 = orig[did].meta.n_bytes
        assert r.meta.n_bytes == max(1, int(max(1, int(n0 * 0.5)) * 0.5))
        assert len(r.media) == r.meta.n_bytes  # metadata tracks payload


def test_frame_sample_explodes_deterministically(spark):
    m = _media(spark)
    frames = frame_sample(m, every_n=4)
    per_doc = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    sizes = {r.doc_id: r.meta.n_bytes for r in m.collect()}
    for r in per_doc:
        n_frames = max(1, sizes[r.doc_id] // 16)
        want = len(range(0, n_frames, 4))
        assert r.n == want


def test_registered_transform_overrides_stub(spark):
    register_transform("image", lambda b, p: b"X" * 3)
    try:
        out = transform_media(_media(spark), {"scale": 0.5})
        rows = out.limit(5).collect()
        assert all(bytes(r.media) == b"XXX" and r.meta.n_bytes == 3 for r in rows)
    finally:
        from hadoop_spark.operators import multimodal

        multimodal._TRANSFORMS.pop("image", None)


def test_features_on_transformed_media(spark):
    out = extract_features(transform_media(_media(spark), {"scale": 0.25}))
    rows = out.collect()
    assert rows and all(r.content_md5 and not r.decoded for r in rows)


def test_ppm_codec_roundtrip():
    from hadoop_spark.operators.multimodal import PPM_H, PPM_W, decode_ppm, make_ppm

    f = decode_ppm(make_ppm(42))
    assert (f["width"], f["height"]) == (PPM_W, PPM_H)
    assert f["n_pixels"] == PPM_W * PPM_H * 3
    assert f["sum_pixel"] == sum((42 * 7919 + i) % 256 for i in range(PPM_W * PPM_H * 3))
    assert f["decoded"]
    # comment lines in the header are tolerated (real-world PPMs have them)
    with_comment = b"P6\n# made by hand\n2 1\n255\n" + bytes(6)
    g = decode_ppm(with_comment)
    assert (g["width"], g["height"], g["sum_pixel"]) == (2, 1, 0)


def test_wav_codec_roundtrip():
    from hadoop_spark.operators.multimodal import WAV_RATE, decode_wav, make_wav

    f = decode_wav(make_wav(7))
    n = 64 + 7 % 64
    assert f["n_samples"] == n
    assert f["sample_rate"] == WAV_RATE
    assert f["sum_abs"] == sum(abs((7 * 31 + i * 17) % 65536 - 32768) for i in range(n))


def test_decode_features_skips_malformed_media(spark):
    """Bad-record stance: a corrupt payload yields decoded=false, never a
    task failure."""
    from pyspark.sql import functions as F

    from hadoop_spark.operators.multimodal import as_media, decode_features, make_ppm

    rows = [(1, make_ppm(1)), (2, b"garbage not a ppm")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = decode_features(as_media(df, "doc_id", "payload", kind="image"))
    got = {r.doc_id: r.decoded for r in out.collect()}
    assert got == {1: True, 2: False}


def test_image_patches_skips_truncated_body(spark):
    """A truncated P6 (valid header, short body — what transform_media's
    stub produces) must be SKIPPED by image_patches, never fail the task
    (the ADVICE r3 IndexError repro)."""
    from hadoop_spark.operators.multimodal import as_media, image_patches, make_ppm

    whole = make_ppm(3)
    truncated = whole[:-10]  # valid header, short pixel body
    rows = [(1, whole), (2, truncated), (3, b"garbage")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = image_patches(as_media(df, "doc_id", "payload", kind="image"))
    got = {r.doc_id for r in out.collect()}
    assert got == {1}


def test_channel_stats_skips_truncated_payloads(spark):
    """A truncated P6 body (valid header, short pixels) must be skipped,
    never fail the task or emit partial channels."""
    from hadoop_spark.operators.multimodal import as_media, channel_stats, make_ppm

    def make(i: int) -> bytes:
        b = make_ppm(i)
        return b[: len(b) - 10] if i % 2 == 0 else b  # truncate evens

    df = spark.createDataFrame(
        [(i, bytearray(make(i))) for i in range(6)], "doc_id long, p binary"
    )
    media = as_media(df, "doc_id", "p", "image")
    rows = channel_stats(media).collect()
    ids = {r.doc_id for r in rows}
    assert ids == {1, 3, 5}, ids  # truncated evens skipped entirely
    assert len(rows) == 9  # 3 channels per surviving image
    for r in rows:
        assert 0 <= r.min_val <= r.max_val <= 255, r


def test_audio_peak_gain_inverts_peak(spark):
    from hadoop_spark.plans import QUERIES, load_all
    from tests.conftest import SF_DIR

    load_all()
    rows = QUERIES["audio_peak_normalize"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.peak <= 32768, r
        # gain * peak ≈ 32767e6 within half a micro-unit * peak
        assert abs(r.gain_micro * r.peak - 32767_000_000) <= r.peak / 2 + 1, r

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

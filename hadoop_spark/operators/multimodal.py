"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, processed with Arrow-batched Pandas UDFs (`mapInPandas`).

No reference analogue (SURVEY §7 M9 extension; the closest reference idea is
`BytesWritable` records, `hadoop-common/.../io/BytesWritable.java`). The
Spark-side plumbing here — schema, batch iteration, partition behavior — is
real and tested; the actual media DECODERS are stubbed (this container ships
no image/audio libraries) behind `register_decoder`, with a deterministic
fallback "decoder" that fingerprints the bytes, so pipelines are testable
end-to-end and a real decoder (PIL / torchaudio / ffmpeg) drops in without
touching the plumbing.

Scale notes:
- Media bytes stay in `binary` columns end-to-end: Arrow moves them
  JVM→Python zero-copy per batch; nothing is base64'd or collected.
- `mapInPandas` streams batches (spark.sql.execution.arrow.maxRecordsPerBatch
  caps batch memory) — a 100 TB media table processes one Arrow batch per
  core at a time.
- Feature extraction is embarrassingly parallel (no shuffle); downstream
  groupBys shuffle only the small feature columns, never the media bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# media kind → decoder(bytes) -> dict of features. Stubbed by default.
_DECODERS: dict[str, Callable[[bytes], dict[str, Any]]] = {}

FEATURE_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, content_md5 string, decoded boolean"
)


def register_decoder(kind: str, fn: Callable[[bytes], dict[str, Any]]) -> None:
    """Plug a real decoder in (e.g. PIL for kind='image'). Not available in
    this container — see module docstring."""
    _DECODERS[kind] = fn


def _stub_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic fake decode: fingerprint only. A real decoder would
    return width/height/duration/frames here; raising NotImplementedError is
    the other documented choice, but a deterministic stub keeps pipelines
    runnable end-to-end."""
    import hashlib

    return {"content_md5": hashlib.md5(payload).hexdigest(), "decoded": False}


def as_media(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap a column as an opaque media payload with typed metadata:
    (id, media: binary, meta: struct<kind, n_bytes>)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("media"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over (id, media, meta): per batch,
    run the registered decoder (or the deterministic stub) on each payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: F401  (stub path uses it via _stub_decode)

        for pdf in batches:
            kinds = pdf["meta"].map(lambda m: m["kind"])
            feats = [
                _DECODERS.get(k, _stub_decode)(bytes(p))
                for k, p in zip(kinds, pdf["media"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "kind": kinds,
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "content_md5": [f.get("content_md5") for f in feats],
                    "decoded": [bool(f.get("decoded", True)) for f in feats],
                }
            )

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


# media kind → transform(bytes, params) -> bytes. Stubbed by default.
_TRANSFORMS: dict[str, Callable[[bytes, dict[str, Any]], bytes]] = {}


def register_transform(kind: str, fn: Callable[[bytes, dict[str, Any]], bytes]) -> None:
    """Plug a real media transform in (e.g. PIL resize for kind='image')."""
    _TRANSFORMS[kind] = fn


def _stub_transform(payload: bytes, params: dict[str, Any]) -> bytes:
    """Deterministic fake 'resize': keep a prefix proportional to the
    requested scale. A real image resize drops in via register_transform
    without touching the plumbing; the batch shape, binary-in/binary-out
    schema, and metadata update below are the real contract."""
    scale = float(params.get("scale", 1.0))
    keep = max(1, int(len(payload) * min(max(scale, 0.0), 1.0)))
    return payload[:keep]


def transform_media(
    media_df: DataFrame, params: dict[str, Any], id_col: str = "doc_id"
) -> DataFrame:
    """binary → binary media transform (image resize, audio resample, ...):
    Arrow-batched, media bytes never leave the executor, metadata
    (n_bytes) recomputed after the transform. Output schema == input
    schema, so transforms compose like any df.transform chain."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf["meta"].map(lambda m: m["kind"])
            out_payloads = [
                _TRANSFORMS.get(k, _stub_transform)(bytes(p), params)
                for k, p in zip(kinds, pdf["media"])
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": out_payloads,
                    "meta": [
                        {"kind": k, "n_bytes": len(p)}
                        for k, p in zip(kinds, out_payloads)
                    ],
                }
            )

    return media_df.mapInPandas(
        run, schema=f"{id_col} bigint, media binary, meta struct<kind:string,n_bytes:bigint>"
    )


def frame_sample(
    media_df: DataFrame, every_n: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """1 → N frame sampling (video → frames): each payload explodes into
    its every-Nth 'frame', keeping (id, frame_idx, frame: binary). The
    deterministic stub treats the payload as fixed 16-byte frames; a real
    ffmpeg-backed sampler drops in via register_transform plumbing. This is
    the flatMap shape of the reference's Mapper (1→N records,
    `mapreduce/Mapper.java:122`) applied to media bytes."""
    frame_bytes = 16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf["media"]):
                b = bytes(p)
                n = max(1, len(b) // frame_bytes)
                for fi in range(0, n, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(b[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return media_df.mapInPandas(
        run, schema=f"{id_col} bigint, frame_idx int, frame binary"
    )

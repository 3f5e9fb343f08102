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
            F.lit(kind).alias("kind"), F.octet_length(payload).alias("n_bytes")
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

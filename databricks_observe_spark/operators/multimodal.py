"""Multimodal-column plumbing (extension surface).

Treats media as opaque ``binary`` columns with typed metadata, per the
100 TB design stance: the bytes never leave the executor, metadata travels
in columns, and decode/feature-extraction runs in Arrow-batched
``mapInPandas`` with an explicit output schema.

The container has no image/audio codecs, so the actual decode is STUBBED:
``decode_media`` raises ``NotImplementedError`` for real formats, and the
pipeline uses ``fake_decode_features`` — a deterministic stand-in keyed on
the content digest — so the Spark-side plumbing (schema, batching,
partition behavior) is real and tested end-to-end.

``media_blobs`` derives a synthetic binary column from ``documents.text``
(same shape a real image/audio table would have: id, blob, media_type).
``multimodal_meta`` is the oracle-checked metadata pass (byte length,
sha256, magic prefix) — pure JVM, no Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8

_MEDIA_TYPE = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
    "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END"
)


def media_blobs(t: dict[str, DataFrame]) -> DataFrame:
    """Synthetic media table: (doc_id, blob BINARY, media_type STRING).

    Stands in for an ingested object-store listing; blob payload is the
    utf-8 document text (deterministic, cross-engine reproducible).
    """
    return t["documents"].select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.expr(_MEDIA_TYPE).alias("media_type"),
    )


def multimodal_meta(t: dict[str, DataFrame]) -> DataFrame:
    """Typed metadata over opaque blobs — JVM-only, scan-and-project.

    At 100 TB this is the pass that runs *before* any decode: cheap
    per-blob stats drive partition pruning and dedup (sha256 as content
    key) so expensive Python decoding touches unique content only.
    """
    blobs = media_blobs(t)
    return blobs.select(
        "doc_id",
        "media_type",
        F.length("blob").alias("n_bytes"),
        F.sha2("blob", 256).alias("sha256"),
        F.lower(F.hex(F.substring(F.col("blob"), 1, 4))).alias("magic"),
    )


# DuckDB's sha256/substring want VARCHAR; the fixture text is ASCII so
# character ops equal byte ops, and sha256(varchar) hashes the utf-8 bytes —
# same value as Spark's sha2(encode(text,'UTF-8'), 256).
MULTIMODAL_META_SQL = f"""
SELECT doc_id,
       {_MEDIA_TYPE} AS media_type,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256,
       lower(hex(encode(substring(text, 1, 4)))) AS magic
FROM documents
"""


def decode_media(blob: bytes, media_type: str) -> dict:
    """Real decode hook — requires codecs this container does not ship."""
    raise NotImplementedError(
        f"no codec available for {media_type}; install pillow/librosa/av "
        "and replace fake_decode_features with a real extractor"
    )


def fake_decode_features(blob: bytes) -> list[float]:
    """Deterministic stand-in feature vector derived from content bytes.

    Mimics the shape/cost profile of an embedding extractor: output is a
    unit-scale float vector keyed on a content digest.
    """
    import hashlib

    h = hashlib.sha256(blob).digest()
    return [round(b / 255.0 - 0.5, 6) for b in h[:FEATURE_DIM]]


FEATURES_SCHEMA = "doc_id bigint, media_type string, n_bytes int, feature array<double>"


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["blob"].str.len(),
                "feature": pdf["blob"].map(fake_decode_features),
            }
        )


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a blobs frame via
    ``mapInPandas``: explicit output schema, batch iterator (constant
    memory), blob bytes never leave the executor. Swap
    ``fake_decode_features`` for a real decoder when codecs exist.
    """
    return blobs.mapInPandas(_extract_batches, schema=FEATURES_SCHEMA)


def media_features(t: dict[str, DataFrame]) -> DataFrame:
    # fan_out: the Python decode stage is the CPU-bound path — spread the
    # under-split fixture scan across cores (no-op on a well-split scan)
    from databricks_observe_spark.sources.tables import fan_out

    return extract_features(fan_out(media_blobs(t)))

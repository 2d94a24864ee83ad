"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (clearly marked), but everything Spark-side is real
and tested: the schema contract, Arrow batch shapes, ``mapInPandas``
signatures, and partitioning behavior — exactly what you'd keep when
swapping the stub for PIL/ffmpeg on a real cluster.

Design for 100 TB: binary payloads ride in their own column so column
pruning skips them unless a stage actually decodes; decode runs in
``mapInPandas`` (Arrow-batched, one Python worker per core, zero
driver involvement); metadata extraction that doesn't need the bytes
(size, hash, magic sniffing) stays JVM-side as plain expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic prefixes for cheap JVM-side format sniffing (hex of the first
# bytes; real-world values for the stubbed decoders to route on).
MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "52494646": "audio/wav",  # RIFF
    "494433": "audio/mp3",  # ID3
}

FEATURE_DIM = 8

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def binarize_text(docs: DataFrame) -> DataFrame:
    """Turn a text table into an asset table with a ``binary`` payload
    column — the shape every multimodal pipeline stage consumes:
    (asset_id, payload binary, media_type, n_bytes, content_md5)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    ).withColumns(
        {
            "n_bytes": F.length("payload").cast("long"),
            "content_md5": F.md5("payload"),
        }
    )


def sniff_media_type(assets: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side format detection from magic bytes — no decode, no
    Python, prunes to the first 4 bytes of the payload."""
    hex_prefix = F.lower(F.hex(F.expr(f"substring({payload_col}, 1, 4)")))
    expr = F.lit("application/octet-stream")
    for magic, mime in MAGIC.items():
        expr = F.when(hex_prefix.startswith(magic.lower()), F.lit(mime)).otherwise(expr)
    return assets.withColumn("sniffed_type", expr)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    STUB DECODE: real image/audio decoding needs codecs absent from
    this container. The stub derives a deterministic FEATURE_DIM-dim
    float vector from the payload bytes, so the full distributed path —
    Arrow transfer, batch iteration, output schema — is exercised
    end-to-end and swapping in a real decoder is a one-function change.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                digest = hashlib.sha256(bytes(payload)).digest()
                feats.append(
                    [
                        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "features": feats,
                }
            )

    return assets.mapInPandas(_decode_batch, schema=_DECODED_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """Real decoder hook. Not implementable in this container (no
    PIL/opencv); see ``extract_features`` for the stubbed path."""
    raise NotImplementedError(
        "image decode requires codec libraries not present in this environment; "
        "swap this in on a cluster with PIL/opencv installed"
    )


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """Metadata-only projection over binary assets (no decode): the
    query-able face of a multimodal table. Fully JVM-side."""
    return binarize_text(docs).select(
        "asset_id", "media_type", "n_bytes", "content_md5"
    )


def multimodal_meta_oracle_sql() -> str:
    return (
        "SELECT doc_id AS asset_id, 'text/plain' AS media_type, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "md5(text) AS content_md5 "
        "FROM documents"
    )

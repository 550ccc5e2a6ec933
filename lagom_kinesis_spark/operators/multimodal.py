"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's payload model is exactly this — opaque bytes with external
typing (`KinesisRecord.data: ByteString`, KinesisSubscriberActor.scala:145;
`KinesisOutboundRecord.data: ByteBuffer`, KinesisOutboundRecord.scala:5-9) —
generalized here to media blobs: a ``BinaryType`` payload column plus a
``StructType`` metadata column (modality, width/height/duration, codec).

The decode / feature-extract step is where real image/audio libraries would
run; this container has none (driver mandate: STUB the decode, make the
Spark-side plumbing real). ``decode_features`` is a genuine Arrow-batched
``mapInPandas`` operator with the production schema, partitioning and batch
shape; its per-blob "decoder" is a deterministic fake (byte statistics) that
raises ``NotImplementedError`` for modalities a real deployment would wire
to PIL/ffmpeg.

Scale: payloads never pass through Python row-at-a-time — Arrow batches
only; metadata-only predicates (modality, size) prune before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Modalities the fake decoder understands.
_STUB_MODALITIES = {"text", "image"}

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, byte_mean double, "
    "width int, height int"
)


def attach_payload(docs: DataFrame, modality_expr=None) -> DataFrame:
    """Synthesize (payload BINARY, meta STRUCT) columns from documents —
    stands in for reading real media blobs from object storage."""
    modality = modality_expr if modality_expr is not None else (
        F.when(F.col("doc_id") % 3 == 0, "image").otherwise("text")
    )
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            modality.alias("modality"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    Real deployment: replace ``_decode_one`` with PIL / torchaudio / ffmpeg.
    """

    def _decode_one(modality: str, payload: bytes, width: int, height: int):
        if modality not in _STUB_MODALITIES:
            raise NotImplementedError(
                f"decoder for modality {modality!r} not available in this container"
            )
        # Deterministic fake feature: byte statistics. Unrounded — callers
        # needing cross-engine determinism apply SQL-side round (helpers.r6),
        # whose half-up rule differs from Python's banker's rounding.
        if payload is None:
            # A NULL blob (e.g. upstream encode of a NULL text) is an empty
            # payload, not a task-killing TypeError from len(None).
            return 0, 0.0, width, height
        mean = (sum(payload) / len(payload)) if payload else 0.0
        return len(payload), mean, width, height

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_one(m["modality"], p, m["width"], m["height"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [f[0] for f in feats],
                    "byte_mean": [f[1] for f in feats],
                    "width": [f[2] for f in feats],
                    "height": [f[3] for f in feats],
                }
            )

    return blobs.mapInPandas(_batches, FEATURE_SCHEMA)

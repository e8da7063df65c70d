"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched mapInPandas.

The container has no image/audio libraries, so the decode kernel is a
clearly-marked deterministic fake (STUB) — but every piece of Spark
plumbing is real and tested: the binary column, the metadata struct,
the mapInPandas batch iteration, the output schema, and the
partitioning story (payloads stay columnar in parquet; decode is a
narrow map — no shuffle, scales linearly with executors at 100 TB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long, checksum string"
)


def to_binary_assets(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Model an asset table: id + opaque binary payload + metadata
    struct (mime/size), as a real image/audio table would look."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_assets(assets: DataFrame) -> DataFrame:
    """'Decode' each binary payload into frame metadata via mapInPandas.

    STUB: a real implementation would call PIL/ffmpeg here; the
    container has neither, so dimensions are derived deterministically
    from the payload length (oracle-checkable). Batch shape, schema and
    Arrow transfer are the real thing.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": n % 640,
                    "height": (n * 7) % 480,
                    "n_frames": n % 24 + 1,
                    "checksum": pdf["payload"].map(lambda b: format(len(b) * 2654435761 % (1 << 32), "08x")),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(decode, schema=DECODED_SCHEMA)


def real_decode_image(payload: bytes):
    """Placeholder for the real decoder; requires PIL which is not in
    this container."""
    raise NotImplementedError("image decode requires PIL/ffmpeg (not installed); see decode_assets")

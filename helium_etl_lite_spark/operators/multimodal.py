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


FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, max_byte long, n_distinct_bytes long"
)


def extract_features(assets: DataFrame) -> DataFrame:
    """Byte-level feature extraction over the binary payload via
    Arrow-batched mapInPandas — the shape a real embedding/feature
    kernel takes (numpy over the raw bytes, one batch at a time,
    no shuffle; output is a narrow fixed-width row per asset)."""
    import numpy as np

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [a.size for a in arrs],
                    "mean_byte": [round(float(a.mean()), 6) if a.size else 0.0 for a in arrs],
                    "max_byte": [int(a.max()) if a.size else 0 for a in arrs],
                    "n_distinct_bytes": [int(np.unique(a).size) for a in arrs],
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(features, schema=FEATURES_SCHEMA)


def extract_features_arrow(assets: DataFrame) -> DataFrame:
    """Same features as extract_features, but via mapInArrow: the
    kernel consumes pyarrow RecordBatches directly — no pandas
    conversion layer at either edge of the Python boundary. For wide
    binary payloads this is the cheapest Python path Spark offers;
    numerics are identical to the pandas variant (tested)."""
    import numpy as np
    import pyarrow as pa

    def features(batches):
        for batch in batches:
            payloads = batch.column("payload")
            arrs = [np.frombuffer(payloads[i].as_py(), dtype=np.uint8)
                    for i in range(len(payloads))]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_bytes": pa.array([a.size for a in arrs], pa.int64()),
                    "mean_byte": pa.array(
                        [round(float(a.mean()), 6) if a.size else 0.0 for a in arrs],
                        pa.float64(),
                    ),
                    "max_byte": pa.array(
                        [int(a.max()) if a.size else 0 for a in arrs], pa.int64()
                    ),
                    "n_distinct_bytes": pa.array(
                        [int(np.unique(a).size) for a in arrs], pa.int64()
                    ),
                }
            )

    return assets.select("doc_id", "payload").mapInArrow(features, schema=FEATURES_SCHEMA)


def resize_assets(decoded: DataFrame, max_w: int = 320, max_h: int = 240) -> DataFrame:
    """Fit-in-box resize of the decoded dimensions: pure column
    arithmetic (no UDF — the geometry math is JVM-side and codegen'd;
    only the pixel resample itself would need a kernel, which is the
    STUB part at this container's library surface)."""
    w = F.greatest(F.col("width"), F.lit(1))
    h = F.greatest(F.col("height"), F.lit(1))
    scale = F.least(F.lit(1.0), F.lit(float(max_w)) / w, F.lit(float(max_h)) / h)
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.floor(w * scale).cast("long").alias("out_w"),
        F.floor(h * scale).cast("long").alias("out_h"),
    )


def sample_frames(decoded: DataFrame, every_n: int = 4, fps: float = 24.0) -> DataFrame:
    """Frame sampling: explode every `every_n`-th frame index of each
    asset into its own row with a timestamp — the generate/UNNEST shape
    (SURVEY E5) applied to media. Row count scales with frames kept,
    not frames decoded; at 100 TB the sampled explode is what keeps the
    downstream decode cost sublinear in video length."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return decoded.select(
        "doc_id", "n_frames", F.explode(idx).alias("frame_idx")
    ).withColumn("frame_ts", F.round(F.col("frame_idx") / F.lit(fps), 6))


def real_decode_image(payload: bytes):
    """Placeholder for the real decoder; requires PIL which is not in
    this container."""
    raise NotImplementedError("image decode requires PIL/ffmpeg (not installed); see decode_assets")

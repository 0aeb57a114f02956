"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched Pandas iterators.

The container has no image/audio codecs, so the *decode kernel* is a
clearly-marked deterministic stub — but every piece of Spark plumbing
around it is real and what a production pipeline uses:

* payloads travel as `binary` columns next to a `struct` metadata column
  (modality, width/height/sample_rate, codec) — scan-prunable, splittable;
* kernels run via mapInPandas: Arrow batches in, Arrow batches out, with
  an explicit output schema, batch-size-bounded memory, and zero
  row-at-a-time Python;
* feature outputs are fixed-width array<double> ready for the similarity
  operators in datapipe.similarity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

FEATURES_SCHEMA = "doc_id bigint, modality string, n_bytes int, features array<double>"


def attach_fake_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: binary payload (here: encoded text —
    in production the raw image/audio bytes) + typed metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("image").alias("modality"),
        (F.length(payload) % 64 + 16).alias("width"),
        (F.length(payload) % 48 + 16).alias("height"),
        F.lit("fake/raw").alias("codec"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def decode_image(_payload: bytes) -> None:
    """REAL-DECODER STUB: the container ships no image codecs.

    In production this is `PIL.Image.open(io.BytesIO(payload))` (or
    torchvision / ffmpeg for frames); swap it in and `extract_features`
    below needs no other change.
    """
    raise NotImplementedError(
        "no image codec in this environment — deterministic fake features "
        "are produced by _byte_histogram instead"
    )


def _byte_histogram(payload: bytes, bins: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature kernel: normalized byte-value histogram.
    Stands in for a real embedding/feature model; same shape, same
    batch-wise contract."""
    counts = [0] * bins
    for b in payload:
        counts[b % bins] += 1
    n = max(len(payload), 1)
    return [c / n for c in counts]


def extract_features(mm: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas: each Arrow batch becomes one pandas DataFrame; the kernel
    is applied column-wise; output schema is declared so Spark plans the
    downstream operators without running Python first. Partition-parallel,
    memory bounded by the Arrow batch size (session conf
    spark.sql.execution.arrow.maxRecordsPerBatch)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["meta"].map(lambda m: m["modality"]),
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(_byte_histogram),
                }
            )

    return mm.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def sample_frames(mm: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: slice the payload at fixed strides (the
    video-frame analog), emitting one row per pseudo-frame — pure Spark
    (posexplode over a computed slice array), no Python."""
    n_frames = F.least(
        F.floor(F.length("payload") / every_n_bytes).cast("int"), F.lit(max_frames)
    )
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    frames = F.transform(
        idx,
        lambda i: F.substring(
            F.col("payload").cast("string"), i * every_n_bytes + 1, every_n_bytes
        ),
    )
    return mm.select(
        "doc_id", F.posexplode(frames).alias("frame_no", "frame_bytes")
    ).withColumn("frame_len", F.length("frame_bytes"))

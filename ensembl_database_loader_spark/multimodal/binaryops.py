"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column (or a reference into object storage), keep typed
metadata (modality, byte size, codec) alongside, and run decode /
feature-extraction as mapInPandas stages so each Arrow batch crosses
the JVM<->Python boundary once. Media libraries are not available in
this container, so the actual decoders are STUBS behind
``NotImplementedError``; ``_fake_decode`` is a deterministic
stand-in that keeps the Spark-side plumbing (schema, batching,
partitioning) real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "id BIGINT, modality STRING, width INT, height INT, n_frames INT, n_bytes BIGINT"


def with_binary_payload(df: DataFrame, id_col: str, payload_col: str, modality: str = "text") -> DataFrame:
    """Project to the engine's multimodal layout: (id, modality, bytes,
    meta struct). For the fixtures the payload is UTF-8 text bytes; for
    real corpora it would be the raw media bytes column."""
    b = F.encode(F.col(payload_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        F.lit(modality).alias("modality"),
        b.alias("bytes"),
        F.struct(
            F.octet_length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
            F.lit("utf-8").alias("codec"),
        ).alias("meta"),
    )


def decode_image(data: bytes) -> tuple[int, int]:
    """Real image decode — requires an imaging library not present in
    this environment. Kept as an explicit stub so the seam is obvious."""
    raise NotImplementedError(
        "image decoding needs an imaging library (e.g. Pillow); "
        "install one and replace this stub"
    )


def _fake_decode(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for media decode: derives (width, height,
    n_frames) from the byte stream. Mirrors the SQL oracle in
    plans/llm.py exactly."""
    n = len(data)
    first = data[0] if n else 0
    return 16 + n % 64, 16 + (n * 7 + first) % 64, 1 + n % 8


def decode_media_stats(df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """mapInPandas decode stage: (id, modality, bytes, meta) ->
    DECODED_SCHEMA rows. One Python worker per partition, one Arrow
    batch per ~10k rows; partitioning of the input is preserved."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoder = decode_image if use_real_decoder else _fake_decode
            dims = [decoder(b) for b in pdf["bytes"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "n_bytes": [len(b) for b in pdf["bytes"]],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "id BIGINT, modality STRING, width INT, height INT, bytes BINARY"


def resize_images(
    df: DataFrame, target_w: int, target_h: int, use_real_decoder: bool = False
) -> DataFrame:
    """Resize stage over (id, modality, bytes, meta): emits the target
    geometry plus the (stub-)resized payload. The real implementation
    decodes, resamples, and re-encodes inside the Arrow batch; the
    deterministic stub truncates/pads bytes to w*h so batch shapes and
    schema are exercised end to end."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h
        for pdf in batches:
            if use_real_decoder:
                decode_image(b"")  # explicit NotImplementedError seam
            out_bytes = [
                bytes(b[:size]).ljust(size, b"\0") for b in pdf["bytes"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "width": target_w,
                    "height": target_h,
                    "bytes": out_bytes,
                }
            )

    return df.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "id BIGINT, frame_idx INT, frame_bytes BINARY"


def sample_frames(
    df: DataFrame, every_nth: int = 2, use_real_decoder: bool = False
) -> DataFrame:
    """Frame-sampling stage (video modality): one input row fans out to
    ceil(n_frames / every_nth) frame rows — a mapInPandas UDTF shape.
    Frame count/splitting uses the deterministic fake decoder (real
    seam: a video lib container parser); the fan-out, schema, and
    Arrow batching are the real plumbing."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for i, b in zip(pdf["id"], pdf["bytes"]):
                data = bytes(b)
                if use_real_decoder:
                    decode_image(data)
                _, _, n_frames = _fake_decode(data)
                step = max(1, len(data) // max(n_frames, 1))
                for j in range(0, n_frames, every_nth):
                    ids.append(i)
                    idxs.append(j)
                    chunks.append(data[j * step : (j + 1) * step])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_bytes": chunks})

    return df.mapInPandas(frames, schema=FRAME_SCHEMA)

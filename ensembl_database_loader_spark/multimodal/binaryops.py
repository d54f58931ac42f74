"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column (or a reference into object storage), keep typed
metadata (modality, byte size, codec) alongside, and run decode /
feature-extraction as mapInPandas stages so each Arrow batch crosses
the JVM<->Python boundary once.

Decoding is PLUGGABLE by modality:

- ``image/bmp`` and ``audio/wav`` are decoded FOR REAL by the stdlib
  codecs below (``decode_bmp24`` parses the BITMAPINFOHEADER + pixel
  rows with stride handling; ``decode_wav16`` parses RIFF via the
  stdlib ``wave`` module + PCM samples via ``struct``) — no external
  media library needed.
- compressed formats (PNG/JPEG/MP4...) need libraries this container
  lacks; ``decode_image`` stays an explicit ``NotImplementedError``
  seam, and ``_fake_decode`` is the deterministic stand-in that keeps
  schema/batching/fan-out testable for those modalities.
"""

from __future__ import annotations

import struct
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
    """Compressed-image decode (PNG/JPEG/...): returns (width, height)
    via Pillow when it is importable; otherwise raises
    ``NotImplementedError`` — an OPTIONAL dependency seam, not a
    missing feature (this container ships no imaging library;
    uncompressed BMP decodes for real via ``decode_bmp24`` and the
    Spark-side plumbing is identical either way)."""
    try:
        from PIL import Image  # optional; absent in this container
    except ImportError as exc:
        raise NotImplementedError(
            "compressed image decoding needs an imaging library (e.g. "
            "Pillow); BMP/WAV decode for real below"
        ) from exc
    import io

    with Image.open(io.BytesIO(data)) as im:
        return im.width, im.height


# --- real stdlib codecs ----------------------------------------------------


def encode_bmp24(width: int, height: int, bgr: tuple[int, int, int]) -> bytes:
    """A real uncompressed 24-bit BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER, bottom-up rows padded to 4-byte stride), solid
    ``bgr`` fill. Pure stdlib."""
    stride = (width * 3 + 3) & ~3
    image_size = stride * height
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    row = bytes(bgr) * width + b"\x00" * (stride - width * 3)
    return file_header + info_header + row * height


def decode_bmp24(data: bytes) -> tuple[int, int, float, float, float]:
    """Real BMP decode: validate magic/compression, parse the header,
    walk padded pixel rows, and return (width, height, mean_b, mean_g,
    mean_r) over the actual pixel bytes."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (offset,) = struct.unpack_from("<I", data, 10)
    header_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bitcount = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if header_size < 40 or bitcount != 24 or compression != 0 or planes != 1:
        raise ValueError(
            f"unsupported BMP variant (header={header_size} bpp={bitcount} "
            f"compression={compression})"
        )
    flipped = height < 0  # negative height = top-down row order
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    sums = [0, 0, 0]
    for r in range(height):
        base = offset + r * stride
        row = data[base : base + width * 3]
        sums[0] += sum(row[0::3])
        sums[1] += sum(row[1::3])
        sums[2] += sum(row[2::3])
    n = width * height
    del flipped  # solid-fill stats are row-order independent
    return width, height, sums[0] / n, sums[1] / n, sums[2] / n


def encode_wav16(n_samples: int, value: int, framerate: int = 8000) -> bytes:
    """A real 16-bit mono PCM WAV written by the stdlib ``wave``
    module, every sample equal to ``value``."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{n_samples}h", *([value] * n_samples)))
    return buf.getvalue()


def decode_wav16(data: bytes) -> tuple[int, int, int, int]:
    """Real WAV decode via the stdlib RIFF parser: returns
    (n_channels, framerate, n_frames, max_abs_sample)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n_channels = w.getnchannels()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        raw = w.readframes(n_frames)
    samples = struct.unpack(f"<{n_frames * n_channels}h", raw)
    return n_channels, framerate, n_frames, max((abs(s) for s in samples), default=0)


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


def build_deterministic_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, modality, bytes): a REAL solid-fill BMP for even ids, a REAL
    constant-sample WAV for odd ids — geometry/fill/sample count derived
    from (id, octet_length(text)) so every decoded statistic is
    closed-form predictable by a SQL oracle over the source table:

    image (even id): width = 4 + olen%13, height = 3 + id%7,
                     fill BGR = (p, (p+1)%256, (p+2)%256), p = (id*37+olen)%256
    audio (odd id):  n_samples = 8 + olen%32, framerate 8000,
                     sample value = id%1000 - 500
    """

    base = df.select(
        F.col(id_col).alias("id"),
        F.octet_length(F.col(text_col)).cast("bigint").alias("olen"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, modalities = [], []
            for i, olen in zip(pdf["id"], pdf["olen"]):
                i, olen = int(i), int(olen)
                if i % 2 == 0:
                    p = (i * 37 + olen) % 256
                    payloads.append(
                        encode_bmp24(
                            4 + olen % 13,
                            3 + i % 7,
                            (p, (p + 1) % 256, (p + 2) % 256),
                        )
                    )
                    modalities.append("image/bmp")
                else:
                    payloads.append(encode_wav16(8 + olen % 32, i % 1000 - 500))
                    modalities.append("audio/wav")
            yield pd.DataFrame(
                {"id": pdf["id"], "modality": modalities, "bytes": payloads}
            )

    return base.mapInPandas(gen, schema="id BIGINT, modality STRING, bytes BINARY")


REAL_DECODED_SCHEMA = (
    "id BIGINT, modality STRING, width INT, height INT, mean_b DOUBLE, "
    "mean_r DOUBLE, n_frames INT, sample_rate INT, max_amp INT, n_bytes BIGINT"
)


def decode_real_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode stage dispatching on modality to the REAL
    stdlib codecs (BMP header+pixel parse, RIFF/WAV parse). Unknown
    modalities raise — this stage is for formats we actually decode;
    opaque payloads go through ``decode_media_stats``."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "id": [], "modality": [], "width": [], "height": [],
                "mean_b": [], "mean_r": [], "n_frames": [], "sample_rate": [],
                "max_amp": [], "n_bytes": [],
            }  # fmt: skip
            for i, m, b in zip(pdf["id"], pdf["modality"], pdf["bytes"]):
                data = bytes(b)
                row: dict[str, object] = {
                    "id": int(i), "modality": m, "width": None, "height": None,
                    "mean_b": None, "mean_r": None, "n_frames": None,
                    "sample_rate": None, "max_amp": None, "n_bytes": len(data),
                }  # fmt: skip
                if m == "image/bmp":
                    w, h, mb, _mg, mr = decode_bmp24(data)
                    row.update(width=w, height=h, mean_b=mb, mean_r=mr)
                elif m == "audio/wav":
                    _nch, rate, frames, amp = decode_wav16(data)
                    row.update(n_frames=frames, sample_rate=rate, max_amp=amp)
                else:
                    raise ValueError(f"no real decoder for modality {m!r}")
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(dec, schema=REAL_DECODED_SCHEMA)


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


# ---------------------------------------------------------------------------
# Perceptual image near-dup (aHash + banded Hamming join)
# ---------------------------------------------------------------------------


def encode_pattern_bmp24(bits64: int, cell_px: int = 2) -> bytes:
    """A real 24-bit BMP of an 8x8 black/white cell pattern (cell (r, c)
    white iff bit ``r*8 + c`` of ``bits64`` is set; rows indexed from
    the BOTTOM, matching BMP's bottom-up pixel order so the decoder's
    bit mapping is the identity). The deterministic image family the
    perceptual-dedup tests use: aHash recovers exactly these 64 bits."""
    width = height = 8 * cell_px
    stride = (width * 3 + 3) & ~3
    image_size = stride * height
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = []
    for py in range(height):  # py = 0 is the BOTTOM pixel row
        cell_r = py // cell_px
        row = bytearray()
        for px in range(width):
            cell_c = px // cell_px
            v = 255 if (bits64 >> (cell_r * 8 + cell_c)) & 1 else 0
            row += bytes((v, v, v))
        row += b"\x00" * (stride - width * 3)
        rows.append(bytes(row))
    return file_header + info_header + b"".join(rows)


def ahash64(data: bytes) -> int:
    """Perceptual average-hash of a 24-bit BMP: mean-pool the grayscale
    image to an 8x8 grid (any divisible size), threshold each cell
    against the GLOBAL mean, bit ``r*8 + c`` = cell brighter than mean
    (rows from the bottom, the encode_pattern_bmp24 convention).
    Returned as a SIGNED 64-bit int (two's complement) so it rides
    Spark's BIGINT and the banded-Hamming machinery directly."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (offset,) = struct.unpack_from("<I", data, 10)
    header_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bitcount = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if header_size < 40 or bitcount != 24 or compression != 0 or planes != 1:
        raise ValueError("unsupported BMP variant")
    height = abs(height)
    if width % 8 or height % 8:
        raise ValueError(f"dimensions not 8-divisible: {width}x{height}")
    stride = (width * 3 + 3) & ~3
    cw, ch = width // 8, height // 8
    sums = [[0] * 8 for _ in range(8)]
    for py in range(height):
        base = offset + py * stride
        row = data[base : base + width * 3]
        cr = py // ch
        for px in range(width):
            sums[cr][px // cw] += row[3 * px] + row[3 * px + 1] + row[3 * px + 2]
    total = sum(map(sum, sums))
    mean = total / 64.0
    u = 0
    for r in range(8):
        for c in range(8):
            if sums[r][c] > mean:
                u |= 1 << (r * 8 + c)
    return u - (1 << 64) if u >= (1 << 63) else u


def _pattern_bits(doc_id: int) -> int:
    """62 pseudo-random bits from md5(id) with bit0 forced 0 and bit1
    forced 1 (never all-black/all-white, so the aHash threshold always
    separates)."""
    import hashlib

    h = hashlib.md5(f"pat:{doc_id}".encode()).digest()
    u = int.from_bytes(h[:8], "little")
    return (u | 2) & ~1 & ((1 << 64) - 1)


def build_pattern_media(
    df: DataFrame,
    id_col: str,
    variant_offset: int = 500_000,
    flip_cells: int = 2,
    cell_px: int = 2,
) -> DataFrame:
    """(id, image) — one pattern BMP per input row PLUS a near-dup
    variant at ``id + variant_offset`` with ``flip_cells`` cells flipped
    (cells >= 2; the two forced cells stay put). The planted ground
    truth for perceptual dedup: every (id, id+offset) pair is a
    near-dup at Hamming exactly ``flip_cells``; unrelated patterns are
    ~32 apart. Arrow-batched generation, one output row pair per doc."""
    import pandas as pd

    if not 1 <= flip_cells <= 8:
        raise ValueError(f"flip_cells must be in [1, 8], got {flip_cells}")

    def gen(batches):
        for b in batches:
            ids, blobs = [], []
            for i in b[id_col]:
                i = int(i)
                bits = _pattern_bits(i)
                ids.append(i)
                blobs.append(encode_pattern_bmp24(bits, cell_px))
                # deterministic flip cells in [2, 63]; the k-stride 17
                # guarantees distinct positions mod 62 for flip_cells
                # <= 8, so the variant's Hamming is exactly flip_cells
                flipped = bits
                for k in range(flip_cells):
                    flipped ^= 1 << (2 + ((i * 31 + k * 17) % 62))
                ids.append(i + variant_offset)
                blobs.append(encode_pattern_bmp24(flipped, cell_px))
            yield pd.DataFrame({"id": ids, "image": blobs})

    return df.select(id_col).mapInPandas(gen, "id bigint, image binary")


def with_ahash(df: DataFrame, bytes_col: str = "image", out_col: str = "simhash") -> DataFrame:
    """BIGINT perceptual hash column via an Arrow-batched UDF."""
    import pandas as pd

    @F.pandas_udf("bigint")
    def _h(s):  # type: ignore[no-untyped-def]
        return pd.Series([ahash64(bytes(x)) if x is not None else None for x in s])

    return df.withColumn(out_col, _h(F.col(bytes_col)))


def image_neardup_pairs(
    media: DataFrame,
    id_col: str = "id",
    bytes_col: str = "image",
    max_hamming: int = 4,
) -> DataFrame:
    """(id1, id2, hamming) image near-dup pairs: aHash each image
    (Arrow batch), then the SAME banded-Hamming machinery the text
    simhash uses (operators/dedup.banded_hamming_pairs) — pigeonhole
    band join, never all-pairs. Text and images dedup through one
    engine; only the fingerprint function differs."""
    from ensembl_database_loader_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    fps = with_ahash(media, bytes_col).select(
        F.col(id_col).alias("id"), "simhash", F.lit(0).alias("blk")
    )
    return banded_hamming_pairs(fps, 64, max_hamming)


# ---------------------------------------------------------------------------
# Perceptual audio near-dup (amplitude-envelope hash + banded Hamming)
# ---------------------------------------------------------------------------


def encode_envelope_wav16(
    bits64: int, samples_per_window: int = 32, framerate: int = 8000,
    loud: int = 12000, quiet: int = 800,
) -> bytes:
    """A real 16-bit mono PCM WAV whose AMPLITUDE ENVELOPE encodes 64
    bits: window ``w`` alternates +/-``loud`` when bit ``w`` is set,
    +/-``quiet`` otherwise (a square carrier, so the signal is audible
    audio, not a bit dump). The deterministic audio family the
    perceptual-dedup tests use."""
    import io
    import wave

    frames = []
    for w in range(64):
        amp = loud if (bits64 >> w) & 1 else quiet
        for s in range(samples_per_window):
            frames.append(amp if s % 2 == 0 else -amp)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(framerate)
        f.writeframes(struct.pack(f"<{len(frames)}h", *frames))
    return buf.getvalue()


def audiohash64(data: bytes) -> int:
    """Perceptual amplitude-envelope hash of a 16-bit mono WAV: split
    the samples into 64 equal windows, mean absolute amplitude per
    window, threshold at the global mean — bit ``w`` = window louder
    than average. Robust to sample-rate/duration changes that preserve
    the envelope (a resampled clip pools to the same 64 means — pinned
    by test). SIGNED 64-bit return, ready for the banded-Hamming
    engine."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise ValueError("only 16-bit mono PCM supported")
        n = f.getnframes()
        raw = f.readframes(n)
    if n < 64:
        raise ValueError(f"too short for a 64-window envelope: {n} frames")
    samples = struct.unpack(f"<{n}h", raw)
    sums = [0] * 64
    counts = [0] * 64
    for i, s in enumerate(samples):
        w = i * 64 // n
        sums[w] += abs(s)
        counts[w] += 1
    means = [sums[w] / counts[w] for w in range(64)]
    gmean = sum(means) / 64.0
    u = 0
    for w in range(64):
        if means[w] > gmean:
            u |= 1 << w
    return u - (1 << 64) if u >= (1 << 63) else u


def build_envelope_media(
    df: DataFrame,
    id_col: str,
    variant_offset: int = 500_000,
    flip_windows: int = 2,
    samples_per_window: int = 32,
) -> DataFrame:
    """(id, audio) — one envelope WAV per input row PLUS a near-dup
    variant at ``id + variant_offset`` with ``flip_windows`` windows
    flipped (the audio twin of build_pattern_media; same planted
    ground truth: variants at Hamming exactly ``flip_windows``,
    unrelated envelopes ~32 apart)."""
    import pandas as pd

    if not 1 <= flip_windows <= 8:
        raise ValueError(f"flip_windows must be in [1, 8], got {flip_windows}")

    def gen(batches):
        for b in batches:
            ids, blobs = [], []
            for i in b[id_col]:
                i = int(i)
                bits = _pattern_bits(i)  # same forced-bit hygiene
                ids.append(i)
                blobs.append(encode_envelope_wav16(bits, samples_per_window))
                flipped = bits
                for k in range(flip_windows):
                    flipped ^= 1 << (2 + ((i * 31 + k * 17) % 62))
                ids.append(i + variant_offset)
                blobs.append(encode_envelope_wav16(flipped, samples_per_window))
            yield pd.DataFrame({"id": ids, "audio": blobs})

    return df.select(id_col).mapInPandas(gen, "id bigint, audio binary")


def audio_neardup_pairs(
    media: DataFrame,
    id_col: str = "id",
    bytes_col: str = "audio",
    max_hamming: int = 4,
) -> DataFrame:
    """(id1, id2, hamming) audio near-dup pairs through the SAME banded
    Hamming engine as text simhash and image aHash — the third modality
    on one dedup machinery."""
    import pandas as pd

    from ensembl_database_loader_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    @F.pandas_udf("bigint")
    def _h(s):  # type: ignore[no-untyped-def]
        return pd.Series(
            [audiohash64(bytes(x)) if x is not None else None for x in s]
        )

    fps = media.select(
        F.col(id_col).alias("id"),
        _h(F.col(bytes_col)).alias("simhash"),
        F.lit(0).alias("blk"),
    )
    return banded_hamming_pairs(fps, 64, max_hamming)

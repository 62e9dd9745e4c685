"""Multimodal column handling (SURVEY §2.9): opaque binary payloads +
typed metadata structs, with decode/feature-extraction as Arrow-batched
``mapInPandas`` operators.

``decode_image`` is a REAL pure-Python decoder for the two classic
uncompressed raster formats — PPM (P6, whitespace/comment-tolerant
header) and BMP (24-bit uncompressed, bottom-up or top-down rows,
4-byte row padding) — both implementable from their public format
specs with ``struct`` alone, so no codec library is needed. Compressed
formats (JPEG/PNG/audio/video) would plug into the same hook; those
libs aren't in this container, so only the two uncompressed codecs are
wired (and the stand-in resize/frame passes stay byte-level).

Scale stance (100 TB): binary payloads stay opaque until the single
``mapInPandas`` pass (Arrow batches, zero-copy into numpy); metadata
predicates (format, n_bytes) are plain columns, so Catalyst pushes them
into the scan and prunes before any byte ever reaches Python.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), False),
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("checksum", T.StringType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("max_byte", T.IntegerType(), True),
        T.StructField("distinct_bytes", T.IntegerType(), True),
    ]
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct
    from the text corpus (stand-in for image/audio bytes; in a real
    deployment the payload is read as-is from parquet `binary`)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        "source",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("media_meta"),
    )


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """PPM (P6) encoder: ASCII header + raw RGB rows, top-down."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} RGB bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """BMP encoder: BITMAPFILEHEADER + BITMAPINFOHEADER (BI_RGB 24-bit),
    pixel rows bottom-up in BGR order, each row zero-padded to a 4-byte
    boundary — the layout every uncompressed .bmp on disk uses."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} RGB bytes, got {len(rgb)}")
    row_size = (3 * width + 3) // 4 * 4
    image_size = row_size * height
    file_header = b"BM" + struct.pack("<IHHI", 14 + 40 + image_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    pad = b"\x00" * (row_size - 3 * width)
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            i = (y * width + x) * 3
            rows += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR
        rows += pad
    return file_header + info_header + bytes(rows)


def _decode_ppm(payload: bytes) -> tuple[str, int, int, bytes]:
    # Header: magic, then 3 ints (width, height, maxval) separated by
    # whitespace, with '#' comments allowed — then ONE whitespace byte
    # before the raster.
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos] == ord("#"):
            while pos < len(payload) and payload[pos] != ord("\n"):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height * 3
    rgb = payload[pos : pos + n]
    if len(rgb) != n:
        raise ValueError("truncated PPM raster")
    return "ppm", width, height, bytes(rgb)


def _decode_bmp(payload: bytes) -> tuple[str, int, int, bytes]:
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if header_size < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = height < 0
    height = abs(height)
    row_size = (3 * width + 3) // 4 * 4
    if len(payload) < data_offset + row_size * height:
        raise ValueError("truncated BMP raster")
    rgb = bytearray(width * height * 3)
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        base = data_offset + src_row * row_size
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            i = (y * width + x) * 3
            rgb[i], rgb[i + 1], rgb[i + 2] = r, g, b
    return "bmp", width, height, bytes(rgb)


def encode_wav(
    channels: int, sample_rate: int, pcm: bytes
) -> bytes:
    """WAV (RIFF) encoder: canonical 44-byte header + 16-bit PCM LE
    interleaved frames — the uncompressed audio layout every .wav
    uses."""
    if len(pcm) % (2 * channels) != 0:
        raise ValueError("PCM byte length must be a whole number of frames")
    byte_rate = sample_rate * channels * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return header + pcm


def decode_audio(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a PCM WAV → (channels, sample_rate, n_frames, samples as
    signed ints, interleaved). Real decode: walks RIFF chunks (extra
    chunks like LIST are skipped, as the spec allows), requires
    format 1 (PCM) at 16 bits."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            raise ValueError("truncated RIFF chunk")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM supported")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return channels, sample_rate, len(samples) // channels, samples


def decode_image(payload: bytes) -> tuple[str, int, int, bytes]:
    """Decode an uncompressed raster image → (format, width, height,
    RGB bytes row-major top-down). Real decode, pure Python: PPM (P6)
    and BMP (24-bit BI_RGB, top-down or bottom-up, row padding
    stripped). Compressed formats raise ValueError — a deployment
    chains PIL/libvips behind the same signature."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise ValueError("unrecognized image payload (PPM P6 / BMP supported)")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload:
    deterministic byte statistics per item (the shape a real
    decode/resize/embed pass would have).

    mapInPandas keeps the whole batch columnar end-to-end; output rows
    are 1:1 with input (no fan-out), so partitioning carries over.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if b else None
                    ),
                    "max_byte": payloads.map(lambda b: max(b) if b else None),
                    "distinct_bytes": payloads.map(
                        lambda b: len(set(b)) if b else None
                    ),
                }
            )
            yield out

    return media.select("doc_id", "payload").mapInPandas(_extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            MEDIA_SCHEMA["media_meta"].dataType,
            False,
        ),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_sum", T.LongType(), False),
    ]
)


def resize_payload(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Multimodal "resize" pass: 1:1 mapInPandas that re-encodes each
    payload to a bounded size and restamps the metadata struct
    (format/n_bytes/checksum). The codec-dependent inner step is a
    DETERMINISTIC FAKE — stride-sampling the byte array to
    ``target_bytes`` — standing in for decode→resize→encode; a real
    deployment replaces only the inner function, the Spark plumbing
    (schema, Arrow batching, 1:1 partition-preserving shape) is real."""
    import hashlib

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def shrink(b):
            if b is None:
                return None
            if len(b) <= target_bytes:
                return bytes(b)
            stride = len(b) / target_bytes
            return bytes(b[int(i * stride)] for i in range(target_bytes))

        for pdf in batches:
            small = pdf["payload"].map(shrink)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": small,
                    "media_meta": [
                        {
                            "format": "application/x-resized",
                            "n_bytes": 0 if b is None else len(b),
                            "checksum": "" if b is None else hashlib.md5(b).hexdigest(),
                        }
                        for b in small
                    ],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_size: int = 16, n_frames: int = 4
) -> DataFrame:
    """Multimodal frame-sampling pass: 1:N mapInPandas treating the
    payload as concatenated fixed-size frames (the video layout) and
    emitting ``n_frames`` evenly-strided frames per item. Deterministic
    byte-level stand-in for a real demuxer — the fan-out shape, Arrow
    batching, and output schema are the production plumbing."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "frame_idx": [], "frame_payload": [],
                "n_bytes": [], "byte_sum": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None or len(b) == 0:
                    continue
                total = max(1, len(b) // frame_size)
                take = min(n_frames, total)
                stride = total / take
                for j in range(take):
                    fi = int(j * stride)
                    frame = bytes(b[fi * frame_size : (fi + 1) * frame_size])
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(fi)
                    rows["frame_payload"].append(frame)
                    rows["n_bytes"].append(len(frame))
                    rows["byte_sum"].append(sum(frame))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(_sample, FRAME_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_px", T.IntegerType(), False),
        T.StructField("px_sum", T.LongType(), False),
        T.StructField("max_px", T.IntegerType(), False),
        T.StructField("min_px", T.IntegerType(), False),
    ]
)


def _pixel_stream(doc_id: int, n: int) -> bytes:
    """Deterministic pixel bytes for synthetic images: the ASCII bytes
    of concatenated md5 hex blocks keyed by (doc_id, block). md5 hex is
    the one byte stream Spark, Python, and DuckDB can all reproduce
    bit-for-bit, which is what makes the encode→decode round-trip
    value-checkable by a SQL oracle (not just shape-checked)."""
    blocks = (n + 31) // 32
    s = "".join(
        hashlib.md5(f"{doc_id}:{b}".encode()).hexdigest() for b in range(blocks)
    )
    return s[:n].encode("ascii")


def synth_dims(doc_id: int) -> tuple[int, int, str]:
    """Per-doc synthetic image shape/format — a pure function of the id
    (w ∈ 4..8, h ∈ 4..6, alternating PPM/BMP) so the oracle recomputes
    it in SQL."""
    return 4 + doc_id % 5, 4 + doc_id % 3, ("ppm" if doc_id % 2 == 0 else "bmp")


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Encode a real image payload per doc (PPM for even ids, BMP for
    odd) with md5-derived pixels. 1:1 Arrow pass; payload + metadata
    struct match the MEDIA_SCHEMA contract."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, fmt = synth_dims(d)
                rgb = _pixel_stream(d, w * h * 3)
                payload = encode_ppm(w, h, rgb) if fmt == "ppm" else encode_bmp(w, h, rgb)
                payloads.append(payload)
                metas.append(
                    {
                        "format": "image/x-portable-pixmap" if fmt == "ppm" else "image/bmp",
                        "n_bytes": len(payload),
                        "checksum": hashlib.md5(payload).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "media_meta": metas}
            )

    return docs.select("doc_id").mapInPandas(_synth, RESIZED_SCHEMA)


def decode_features(media: DataFrame) -> DataFrame:
    """REAL decode pass: parse each payload with :func:`decode_image`
    and emit per-image shape + exact integer pixel statistics (sums stay
    integers so downstream aggregation is engine-exact). 1:1 Arrow pass,
    partitioning carries over."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in DECODED_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                fmt, w, h, rgb = decode_image(bytes(payload))
                rows["doc_id"].append(int(doc_id))
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["px_sum"].append(sum(rgb))
                rows["max_px"].append(max(rgb))
                rows["min_px"].append(min(rgb))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(_decode, DECODED_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("sample_sum", T.LongType(), False),
        T.StructField("max_sample", T.IntegerType(), False),
        T.StructField("min_sample", T.IntegerType(), False),
    ]
)


def _digest_stream(doc_id: int, n: int) -> bytes:
    """Deterministic RAW bytes (0..255, not hex ASCII): concatenated
    md5 DIGESTS keyed by (doc_id, block) — negative int16 samples need
    high bytes ≥ 0x80, which hex-ASCII streams never produce. SQL
    rebuilds a digest byte from its two hex chars via strpos
    arithmetic."""
    blocks = (n + 15) // 16
    s = b"".join(
        hashlib.md5(f"{doc_id}:{b}".encode()).digest() for b in range(blocks)
    )
    return s[:n]


def synth_audio_dims(doc_id: int) -> tuple[int, int, int]:
    """(channels, sample_rate, n_frames) per doc — pure function of the
    id so the oracle recomputes it."""
    return 1 + doc_id % 2, 8000 * (1 + doc_id % 2), 20 + doc_id % 13


def synthesize_audio(docs: DataFrame) -> DataFrame:
    """Encode a real PCM WAV payload per doc with md5-digest sample
    bytes. 1:1 Arrow pass mirroring synthesize_media."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ch, rate, frames = synth_audio_dims(d)
                pcm = _digest_stream(d, frames * ch * 2)
                payload = encode_wav(ch, rate, pcm)
                payloads.append(payload)
                metas.append(
                    {
                        "format": "audio/wav",
                        "n_bytes": len(payload),
                        "checksum": hashlib.md5(payload).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "media_meta": metas}
            )

    return docs.select("doc_id").mapInPandas(_synth, RESIZED_SCHEMA)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode pass: parse each WAV with :func:`decode_audio`
    and emit shape + exact integer sample statistics. 1:1 Arrow pass."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in AUDIO_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ch, rate, frames, samples = decode_audio(bytes(payload))
                rows["doc_id"].append(int(doc_id))
                rows["channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["n_frames"].append(frames)
                rows["sample_sum"].append(sum(samples))
                rows["max_sample"].append(max(samples))
                rows["min_sample"].append(min(samples))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(_decode, AUDIO_SCHEMA)


def nn_resample(rgb: bytes, w: int, h: int, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample on the integer grid: output pixel
    (r, c) is source pixel (r·h // out_h, c·w // out_w). Integer-only
    ⇒ engine-exact (the property the mm_resize_stats oracle uses)."""
    out = bytearray(out_w * out_h * 3)
    for r in range(out_h):
        sy = r * h // out_h
        for c in range(out_w):
            sx = c * w // out_w
            si = (sy * w + sx) * 3
            oi = (r * out_w + c) * 3
            out[oi : oi + 3] = rgb[si : si + 3]
    return bytes(out)


def resize_image(
    media: DataFrame, out_w: int = 4, out_h: int = 4
) -> DataFrame:
    """REAL image resize: decode (PPM/BMP) → nearest-neighbor resample
    to ``out_w``×``out_h`` → re-encode as PPM. The sample grid is pure
    integer arithmetic — src pixel of output (r, c) is
    (r·h // out_h, c·w // out_w) — so the resampled raster is exactly
    reproducible by any engine (no filtering kernel, no float). 1:1
    Arrow pass; a production deployment swaps the inner resample for a
    real kernel (bilinear/Lanczos), the plumbing is unchanged.

    Replaces the byte-stride stand-in ``resize_payload`` for payloads
    that really are images; the stand-in remains for opaque bytes."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        payloads, metas, ids = [], [], []
        for pdf in batches:
            payloads.clear(), metas.clear(), ids.clear()
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                _fmt, w, h, rgb = decode_image(bytes(b))
                payload = encode_ppm(
                    out_w, out_h, nn_resample(rgb, w, h, out_w, out_h)
                )
                ids.append(int(doc_id))
                payloads.append(payload)
                metas.append(
                    {
                        "format": "image/x-portable-pixmap",
                        "n_bytes": len(payload),
                        "checksum": hashlib.md5(payload).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": list(ids), "payload": list(payloads), "media_meta": list(metas)}
            )

    return media.select("doc_id", "payload").mapInPandas(_resize, RESIZED_SCHEMA)


def feature_summary(docs: DataFrame) -> DataFrame:
    """Per-source rollup of extracted features — metadata-only columns
    stay JVM-side; only the payload pass is Python (Arrow)."""
    media = attach_binary(docs)
    feats = extract_features(media)
    joined = media.select("doc_id", "source", F.col("media_meta.n_bytes").alias("meta_bytes")).join(
        feats, "doc_id"
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.sum(F.col("mean_byte").cast("decimal(20,10)")).cast("double") / F.count("*"), 4)
            .alias("avg_mean_byte"),
            F.max("max_byte").alias("max_byte"),
            F.sum(F.when(F.col("n_bytes") != F.col("meta_bytes"), 1).otherwise(0))
            .cast("long")
            .alias("n_meta_mismatch"),
        )
        .orderBy("source")
    )


def decimate_samples(
    samples: list[int], channels: int, frames: int, factor: int
) -> list[int]:
    """Pure decimation kernel: keep every ``factor``-th frame's full
    channel group, interleaved order preserved (property-tested)."""
    kept: list[int] = []
    for f in range(0, frames, factor):
        kept.extend(samples[f * channels : (f + 1) * channels])
    return kept


def decimate_audio(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio transform: decode each WAV, keep every ``factor``-th
    FRAME (all channels of frame f survive together iff f % factor
    == 0 — the naive-decimation resampler; a production pipeline puts
    an anti-alias low-pass first, noted here because naive decimation
    aliases), re-encode at sample_rate/factor. The audio twin of the
    image resize pass: decode → transform → encode, 1:1 Arrow batch
    pass, so the downstream decode round-trips the whole chain."""

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ch, rate, frames, samples = decode_audio(bytes(payload))
                kept = decimate_samples(samples, ch, frames, factor)
                pcm = b"".join(struct.pack("<h", v) for v in kept)
                out = encode_wav(ch, rate // factor, pcm)
                payloads.append(out)
                metas.append(
                    {
                        "format": "audio/wav",
                        "n_bytes": len(out),
                        "checksum": hashlib.md5(out).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "media_meta": metas}
            )

    return media.select("doc_id", "payload").mapInPandas(_dec, RESIZED_SCHEMA)


#: aHash near-dup contract: replicas re-render their BASE id's raster
#: with every AHASH_PERTURB_EVERY-th byte brightened by
#: AHASH_PERTURB_DELTA — a visible-but-small change, so the pair is a
#: NEAR-duplicate (Hamming usually 0-8), not a byte-identical copy.
AHASH_REPLICA_STRIDE = 10
AHASH_PERTURB_EVERY = 5
AHASH_PERTURB_DELTA = 9

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("hash_hi", T.LongType(), False),
        T.StructField("hash_lo", T.LongType(), False),
        T.StructField("bands", T.ArrayType(T.IntegerType(), False), False),
    ]
)


def synthesize_media_with_replicas(docs: DataFrame) -> DataFrame:
    """`synthesize_media` variant that PLANTS near-duplicate images:
    ids with ``doc_id % AHASH_REPLICA_STRIDE == 1`` re-render the
    raster of ``doc_id - 1`` (same dims, same pixel stream) with every
    ``AHASH_PERTURB_EVERY``-th byte brightened by
    ``AHASH_PERTURB_DELTA`` — the slightly-edited-copy case a
    perceptual-hash dedup exists to catch (format still alternates by
    the REPLICA's own parity, so pair members usually cross the
    PPM/BMP codec boundary and the match proves content-level, not
    byte-level, equality). All other ids render exactly as
    `synthesize_media`."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                is_rep = d % AHASH_REPLICA_STRIDE == 1
                ck = d - 1 if is_rep else d
                w, h, _ = synth_dims(ck)
                fmt = "ppm" if d % 2 == 0 else "bmp"
                rgb = _pixel_stream(ck, w * h * 3)
                if is_rep:
                    rgb = bytes(
                        min(255, b + AHASH_PERTURB_DELTA)
                        if i % AHASH_PERTURB_EVERY == 0
                        else b
                        for i, b in enumerate(rgb)
                    )
                payload = encode_ppm(w, h, rgb) if fmt == "ppm" else encode_bmp(w, h, rgb)
                payloads.append(payload)
                metas.append(
                    {
                        "format": "image/x-portable-pixmap" if fmt == "ppm" else "image/bmp",
                        "n_bytes": len(payload),
                        "checksum": hashlib.md5(payload).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "media_meta": metas}
            )

    return docs.select("doc_id").mapInPandas(_synth, RESIZED_SCHEMA)


def image_ahash64(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) per image: decode → integer
    nearest-neighbor resample to 8×8 → per-pixel gray (r+g+b)//3 →
    bit_i = gray_i > floor(mean) — 64 bits, integer-only end to end,
    so the hash is exactly reproducible by any engine. Emitted as two
    signed 32-bit halves (hash_lo = bits 0-31, hash_hi = bits 32-63;
    a single signed 64-bit value would overflow when bit 63 is set)
    plus the 8 byte-bands (band_j = bits 8j..8j+7) the LSH candidate
    join keys on: Hamming ≤ 7 ⇒ at least one band equal (pigeonhole),
    so banded candidate generation is lossless at that threshold.
    1:1 Arrow pass over (doc_id, payload)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in AHASH_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _fmt, w, h, rgb = decode_image(bytes(payload))
                small = nn_resample(rgb, w, h, 8, 8)
                gray = [
                    (small[3 * i] + small[3 * i + 1] + small[3 * i + 2]) // 3
                    for i in range(64)
                ]
                mean = sum(gray) // 64
                bits = [1 if g > mean else 0 for g in gray]
                lo = sum(b << i for i, b in enumerate(bits[:32]))
                hi = sum(b << i for i, b in enumerate(bits[32:]))
                bands = [
                    sum(bits[8 * j + i] << i for i in range(8)) for j in range(8)
                ]
                rows["doc_id"].append(int(doc_id))
                rows["hash_hi"].append(hi)
                rows["hash_lo"].append(lo)
                rows["bands"].append(bands)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(_hash, AHASH_SCHEMA)

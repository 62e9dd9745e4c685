"""Multimodal column handling (SURVEY §2.9): opaque binary payloads +
typed metadata structs, with decode/feature-extraction as Arrow-batched
``mapInPandas`` operators.

The container has no image/audio codecs, so the decode step is STUBBED
(``decode_image`` raises NotImplementedError; the pipeline uses a
deterministic byte-level feature extractor instead) — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested.

Scale stance (100 TB): binary payloads stay opaque until the single
``mapInPandas`` pass (Arrow batches, zero-copy into numpy); metadata
predicates (format, n_bytes) are plain columns, so Catalyst pushes them
into the scan and prunes before any byte ever reaches Python.
"""

from __future__ import annotations

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


def decode_image(payload: bytes) -> object:
    """Real decoder hook — intentionally stubbed (no codecs in this
    container). A deployment plugs PIL/libvips here; the surrounding
    Spark plumbing is identical."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment; "
        "use extract_features (deterministic byte-level features) instead"
    )


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
            rows = {"doc_id": [], "frame_idx": [], "frame_payload": [], "n_bytes": []}
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
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(_sample, FRAME_SCHEMA)


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

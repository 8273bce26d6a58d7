"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the layout a 100 TB multimodal training-data lake
uses (payload bytes columnar-compressed in parquet, metadata queryable
without touching bytes). The Spark-side plumbing here is real and tested:
schemas, Arrow-batched ``mapInPandas`` operators, per-batch shapes. The
actual codecs are STUBBED deterministically — PIL/ffmpeg style libs are
not in this container; ``decode_image`` raises ``NotImplementedError``
when asked for a real decode and every feature extractor derives values
from the payload bytes alone (stable across engines and runs).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload + metadata schema for a multimodal asset column
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, format string, "
    "width int, height int, mean_byte double"
)

FRAME_SAMPLE_SCHEMA = "asset_id long, frame_index int, frame_offset_bytes long, frame_hash long"


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build an asset table from a text table: payload = utf-8 bytes.

    Stands in for real image/audio bytes; keeps everything deterministic.
    """
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.length(F.col(text_col).cast("binary")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - real codec absent
    """Real image decode — unavailable in this environment by design."""
    raise NotImplementedError(
        "image codecs are not installed in this container; "
        "use extract_image_features (deterministic stub) instead"
    )


def _fake_dims(first: int, n: int) -> tuple[int, int]:
    # deterministic fake decode: dimensions derived from payload bytes
    return (first % 64 + 1, n % 64 + 1)


def extract_image_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` is the right shape for codec work: whole Arrow batches
    cross into Python once, the codec loop stays in C-backed pandas/numpy,
    and the 100 TB scan parallelism is the parquet split count. The decode
    itself is the deterministic stub documented above.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b))
            first = payloads.map(lambda b: b[0] if b else 0)
            dims = [
                _fake_dims(f, n) for f, n in zip(first.tolist(), n_bytes.tolist())
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "format": pdf["meta"].map(
                        lambda m: None if m is None else m["format"]
                    ),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if b else 0.0
                    ),
                }
            )

    return assets.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: 1 input row → N output rows (video pattern).

    Real frame extraction would seek the container; the stub emits one
    "frame" per ``every_n_bytes`` window with a content hash of the window
    so downstream dedup/similarity operators have real inputs to chew on.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_index": [],
                "frame_offset_bytes": [],
                "frame_hash": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                for idx, off in enumerate(range(0, len(payload), every_n_bytes)):
                    window = payload[off : off + every_n_bytes]
                    out["asset_id"].append(aid)
                    out["frame_index"].append(idx)
                    out["frame_offset_bytes"].append(off)
                    # crc32, not hash(): Python's hash() is salted per process
                    out["frame_hash"].append(zlib.crc32(bytes(window)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)

"""Multimodal column plumbing (task brief: first-class component).

Images/audio/video are opaque ``binary`` columns with typed metadata.
This container has no image/audio codecs, so the DECODE step is
stubbed exactly as mandated: header parsing, schema, partitioning,
Arrow batch shape, and the feature pipeline are real and tested; the
pixel/sample decode raises NotImplementedError behind a clearly-marked
flag, with a deterministic fake-feature path for tests.

Blob format (synthetic, deterministic per id):
  bytes 0-3   magic  b'IMG1'
  bytes 4-7   width  uint32 little-endian
  bytes 8-11  height uint32 little-endian
  bytes 12..  payload (splitmix64 byte stream keyed by id)
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from el.hashing import h64, splitmix64

MAGIC = b"IMG1"

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def gen_blobs(spark: SparkSession, n: int, payload_bytes: int = 256) -> DataFrame:
    """Deterministic synthetic blob table (pure function of id)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                w = int(16 + (h64(np.array([i]), 1)[0] % 241))
                h = int(16 + (h64(np.array([i]), 2)[0] % 241))
                n_words = (payload_bytes + 7) // 8
                with np.errstate(over="ignore"):
                    words = splitmix64(
                        np.arange(n_words, dtype=np.uint64)
                        + np.uint64(i) * np.uint64(0x9E3779B97F4A7C15)
                    )
                payload = words.tobytes()[:payload_bytes]
                content = MAGIC + struct.pack("<II", w, h) + payload
                rows.append((int(i), "image", content))
            yield pd.DataFrame(rows, columns=["blob_id", "media_type", "content"])

    return spark.range(n).mapInPandas(gen, schema=BLOB_SCHEMA)


def extract_meta(blobs: DataFrame) -> DataFrame:
    """Parse typed metadata from the binary header (vectorized batch
    kernel; malformed blobs -> valid=false, never an executor error)."""

    def gen(batches):
        for pdf in batches:
            out = []
            for bid, mt, content in zip(
                pdf["blob_id"], pdf["media_type"], pdf["content"]
            ):
                b = bytes(content) if content is not None else b""
                if len(b) >= 12 and b[:4] == MAGIC:
                    w, h = struct.unpack("<II", b[4:12])
                    out.append((int(bid), mt, int(w), int(h), len(b), True))
                else:
                    out.append((int(bid), mt, None, None, len(b), False))
            yield pd.DataFrame(
                out,
                columns=[
                    "blob_id", "media_type", "width", "height", "n_bytes", "valid",
                ],
            )

    return blobs.mapInPandas(gen, schema=META_SCHEMA)


# STUB: real pixel decoding needs an image codec (PIL/opencv), absent
# in this container. The Spark plumbing around it is real.
DECODE_IMPLEMENTED = False


def decode_pixels(content: bytes):  # pragma: no cover - stub
    raise NotImplementedError(
        "pixel decode requires an image codec not present in this "
        "container; deterministic fake features are produced by "
        "feature_stub() instead"
    )


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def feature_stub(blobs: DataFrame) -> DataFrame:
    """Deterministic fake feature vector per blob (stands in for the
    decode->embed step; same schema/partitioning/batch shape as the
    real thing would have)."""

    def gen(batches):
        for pdf in batches:
            ids, feats = [], []
            for bid, content in zip(pdf["blob_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                arr = np.frombuffer(b[12 : 12 + FEATURE_DIM * 8], dtype=np.uint64)
                if arr.size < FEATURE_DIM:
                    arr = np.pad(arr, (0, FEATURE_DIM - arr.size))
                feats.append((arr.astype(np.float64) / 2**64).astype(np.float32))
                ids.append(int(bid))
            yield pd.DataFrame({"blob_id": ids, "features": feats})

    return blobs.mapInPandas(gen, schema=FEATURES_SCHEMA)

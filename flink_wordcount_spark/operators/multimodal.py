"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction run as Arrow-batched Pandas UDFs
over ``mapInPandas`` so each batch crosses the JVM<->Python boundary once.

The decode step itself is a STUB in this environment (no image/audio codecs
in the container — SURVEY/driver contract): ``decode_image`` raises
``NotImplementedError`` unless given the deterministic fake codec, which is
what tests and the declared queries use. Everything around it — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of featurize(): stable across scale factors.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("histogram8", ArrayType(LongType())),
        StructField("header_hex", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sum", LongType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque payload column + typed metadata (mime/size).

    Fixtures carry no real media, so the payload is the UTF-8 encoding of the
    text column — the engine-side plumbing (binary type, metadata struct,
    pushdown of metadata predicates) is identical for real media.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def decode_image(payload: bytes, codec: str = "real"):
    """STUB: real image decode needs PIL/libvips — not in this container.

    ``codec='fake'`` returns a deterministic pseudo-decode (byte stats) used
    by tests; anything else raises, by design.
    """
    if codec != "fake":
        raise NotImplementedError(
            "image decode requires an image codec library (not in this environment); "
            "use codec='fake' for the deterministic stand-in"
        )
    arr = bytearray(payload)
    return {"n": len(arr), "sum": int(sum(arr))}


def featurize(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow-batched).

    Deterministic byte-level features stand in for codec output; the operator
    shape (per-batch vectorized numpy work, stable output schema) is the real
    100 TB pattern.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL text -> NULL payload: skip, don't crash
                    continue
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b >> 5, minlength=8).astype("int64")
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": int(b.size),
                        "byte_sum": int(b.sum()),
                        "byte_mean": round(float(b.mean()) if b.size else 0.0, 4),
                        "histogram8": hist.tolist(),
                        "header_hex": bytes(payload)[:8].hex(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("n_px", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_min", LongType()),
        StructField("px_max", LongType()),
    ]
)


def resize_1d(df: DataFrame, out_px: int = 64) -> DataFrame:
    """Area-resize the payload to a fixed ``out_px``-sample vector
    (mapInPandas, Arrow-batched) — the image-thumbnail / audio-downsample
    shape: each output sample i is floor(mean(bytes[floor(i*L/out_px) :
    floor((i+1)*L/out_px)])), i.e. block means over an exact integer
    partition of the input, so any two engines agree bit-for-bit.

    Payloads shorter than ``out_px`` bytes are skipped (a real thumbnailer
    would pad; the block partition would contain empty blocks).  The real
    pipeline swaps the byte array for decode_image() pixels — same operator
    shape, batch geometry, and schema.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL text -> NULL payload: skip, don't crash
                    continue
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                L = b.size
                if L < out_px:
                    continue
                bounds = [(i * L) // out_px for i in range(out_px + 1)]
                px = [
                    int(b[lo:hi].sum()) // (hi - lo)
                    for lo, hi in zip(bounds, bounds[1:])
                ]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": int(L),
                        "n_px": out_px,
                        "px_sum": int(sum(px)),
                        "px_min": int(min(px)),
                        "px_max": int(max(px)),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(resize, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, frame_size: int = 256, every_k: int = 4) -> DataFrame:
    """Treat the payload as a frame stream; emit every k-th fixed-size frame.

    The video-pipeline shape: one input row fans out to many frame rows inside
    the Arrow batch (no driver involvement, no shuffle).
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL text -> NULL payload: skip, don't crash
                    continue
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_frames = (b.size + frame_size - 1) // frame_size
                for idx in range(0, n_frames, every_k):
                    fr = b[idx * frame_size : (idx + 1) * frame_size]
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": int(idx),
                            "frame_bytes": int(fr.size),
                            "frame_sum": int(fr.sum()),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(frames, FRAME_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Prompt mandate: image/audio/video as ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample as Pandas
UDFs over mapInPandas. The image/audio libs are not in this container,
so the DECODE step is stubbed two ways, both clearly marked:

- payloads in the engine's own deterministic FAKE container format
  (``FAKEIMG``/``FAKEVID`` headers, see make_fake_image) decode fully
  — schema, batch shape, partitioning and feature plumbing are real
  and tested end-to-end;
- real formats (PNG/JPEG/...) raise NotImplementedError inside the
  kernel, which surfaces as an ``error`` row — never a task crash —
  exactly like the extraction router's failure envelopes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

FAKE_IMG_MAGIC = b"FAKEIMG1"
FAKE_VID_MAGIC = b"FAKEVID1"

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(FloatType())),
    StructField("error", StringType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_index", IntegerType()),
    StructField("frame", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("data_len", IntegerType()),
    ])),
])


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image: magic + WH header + seeded bytes."""
    body = bytes(
        (i * 31 + seed * 7 + 13) % 256 for i in range(width * height)
    )
    return FAKE_IMG_MAGIC + struct.pack(">II", width, height) + body


def make_fake_video(frames: int, width: int, height: int,
                    seed: int = 0) -> bytes:
    body = b"".join(
        make_fake_image(width, height, seed + i)[len(FAKE_IMG_MAGIC):]
        for i in range(frames)
    )
    return FAKE_VID_MAGIC + struct.pack(">III", frames, width, height) + body


def _decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode the fake container; REAL image decode is a documented
    stub (no image libs in this environment)."""
    if payload.startswith(FAKE_IMG_MAGIC):
        w, h = struct.unpack(">II", payload[8:16])
        body = payload[16:16 + w * h]
        # 16-bin byte histogram, L1-normalized — the stand-in for a
        # real embedding; deterministic, so testable end-to-end.
        hist = [0] * 16
        for b in body:
            hist[b >> 4] += 1
        total = max(len(body), 1)
        return w, h, [v / total for v in hist]
    raise NotImplementedError(
        "real image decode requires an image library not present in "
        "this environment (stub per SURVEY.md §2.3 media note)"
    )


def image_features(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Decode + feature-extract over Arrow batches."""

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            out = {k: [] for k in ("media_id", "width", "height",
                                   "n_bytes", "features", "error")}
            for mid, payload in zip(batch[id_col], batch[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["n_bytes"].append(len(payload))
                try:
                    w, h, feats = _decode_image(payload)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["features"].append(feats)
                    out["error"].append(None)
                except Exception as exc:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["features"].append(None)
                    out["error"].append(str(exc))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        _run, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_n: int = 2,
                  id_col: str = "media_id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame-sample fake-video payloads: 1-to-many mapInPandas (the
    cardinality-changing shape a real ffmpeg sampler would have)."""

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            rows = {"media_id": [], "frame_index": [], "frame": []}
            for mid, payload in zip(batch[id_col], batch[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                if not payload.startswith(FAKE_VID_MAGIC):
                    continue
                frames, w, h = struct.unpack(">III", payload[8:20])
                frame_len = w * h
                for fi in range(0, frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(fi)
                    rows["frame"].append(
                        {"width": w, "height": h, "data_len": frame_len}
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        _run, schema=FRAME_SCHEMA
    )

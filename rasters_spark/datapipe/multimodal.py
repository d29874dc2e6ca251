"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the codec layer is pluggable:
``raw``/``q8`` decode is the engine's own pure-numpy codec, while
container formats that need external libs absent from this environment
(jpeg/png/wav/mp4) are STUBS that raise NotImplementedError — swap in
PIL/ffmpeg decoders behind the same interface on a real cluster.

Design for 100 TB: binary payloads never enter a shuffle — metadata
extraction and feature kernels are scan-side mapInPandas stages, and
anything relational (joins, dedup by phash) happens on the extracted
skinny columns.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rasters_spark import codec

FEATURE_SCHEMA = "image_id string, fmt string, n_bytes long, width int, height int, mean double, std double, phash long"


def _decode_media(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt in ("raw", "q8"):
        return codec.decode_tile(data, w, h, fmt)
    if fmt in ("jpeg", "png", "webp"):
        raise NotImplementedError(
            f"container format {fmt!r}: plug a PIL/libvips decoder into "
            "rasters_spark.datapipe.multimodal._decode_media on a cluster with image libs"
        )
    if fmt in ("wav", "mp3", "flac", "mp4", "webm"):
        raise NotImplementedError(f"audio/video format {fmt!r}: plug ffmpeg/torchaudio here")
    raise ValueError(f"unknown fmt: {fmt}")


def extract_features(tiles: DataFrame, on_error: str = "null") -> DataFrame:
    """Decode → per-item features (dims, mean/std, phash) in one Arrow
    pass. ``on_error='null'`` yields NULL features for undecodable
    formats instead of failing the stage (quarantine-and-continue, the
    sane 10^12-row behavior); 'raise' propagates."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                base = {"image_id": r.image_id, "fmt": r.fmt, "n_bytes": len(r.bytes)}
                try:
                    arr = _decode_media(r.bytes, int(r.w), int(r.h), r.fmt)
                    # float64 BEFORE reducing: exact sums for quantized pixel
                    # values → cross-engine-reproducible means
                    valid = arr[np.isfinite(arr)].astype(np.float64)
                    rows.append({**base, "width": int(arr.shape[1]), "height": int(arr.shape[0]),
                                 "mean": float(valid.mean()) if valid.size else None,
                                 "std": float(valid.std()) if valid.size else None,
                                 "phash": codec.phash64(arr)})
                except NotImplementedError:
                    if on_error == "raise":
                        raise
                    rows.append({**base, "width": None, "height": None,
                                 "mean": None, "std": None, "phash": None})
            yield pd.DataFrame(rows)

    return tiles.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_nearest(tiles: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Per-item nearest-neighbor resize (raster.py:1262-1281 order-0
    path) — index-grid sampling in numpy, re-encoded raw."""
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = _decode_media(r.bytes, int(r.w), int(r.h), r.fmt)
                ri = np.minimum((np.arange(out_h) * arr.shape[0] / out_h).astype(int), arr.shape[0] - 1)
                ci = np.minimum((np.arange(out_w) * arr.shape[1] / out_w).astype(int), arr.shape[1] - 1)
                rows.append({"image_id": r.image_id, "bytes": codec.encode_tile(arr[np.ix_(ri, ci)], "raw"),
                             "w": out_w, "h": out_h, "fmt": "raw"})
            yield pd.DataFrame(rows)

    return tiles.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, schema=schema)


def frame_sample(videos: DataFrame, every_n: int = 10,
                 decoder: Callable[[bytes], np.ndarray] | None = None) -> DataFrame:
    """Video → sampled frames plumbing: (video_id, frame_no, frame_bytes).
    The real decoder is a stub (no ffmpeg here); a deterministic fake
    treats the payload as a stack of raw float32 frames so the
    partitioning/explode shape is tested end-to-end."""
    schema = "video_id string, frame_no int, frame_bytes binary"

    def fake_decoder(data: bytes, w: int, h: int) -> np.ndarray:
        frame = w * h * 4
        n = len(data) // frame
        return np.frombuffer(data[: n * frame], dtype="<f4").reshape(n, h, w)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt in ("mp4", "webm") and decoder is None:
                    raise NotImplementedError("plug an ffmpeg frame decoder for real containers")
                stack = (decoder or (lambda b: fake_decoder(b, int(r.w), int(r.h))))(r.bytes)
                for i in range(0, stack.shape[0], every_n):
                    rows.append({"video_id": r.image_id, "frame_no": i,
                                 "frame_bytes": codec.encode_tile(stack[i], "raw")})
            yield pd.DataFrame(rows) if rows else pd.DataFrame({"video_id": [], "frame_no": [], "frame_bytes": []})

    return videos.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, schema=schema)

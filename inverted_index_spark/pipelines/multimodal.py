"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media alongside text. The
engine treats media as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
functions over ``mapInPandas`` so each task streams record batches
instead of materializing a partition (binaries are big — the batch size
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this sandbox, so the
decode kernels are stubbed behind ``_decode_image_bytes`` — a
deterministic fake that parses our synthetic header — with the real
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) fully wired and tested. Swapping in a real codec touches only the
kernel function.

Schema conventions:

    media(doc_id: long, kind: string, data: binary,
          meta: struct<width:int, height:int, sample_rate:int,
                       n_frames:int, codec:string>)
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

_MAGIC = b"FAKEMEDIA"


def synth_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media column derived from the text column.

    Payload = magic || width:u16 || height:u16 || md5(text)-seeded bytes
    (md5 so an external SQL engine can reproduce the derived features —
    the `image_features` contract entry is oracled in DuckDB). Stands in
    for real image/audio blobs so the binary-column plumbing is
    exercised end-to-end without codec libraries.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for text in pdf["text"]:
                seed = hashlib.md5(text.encode("utf-8")).digest()
                w = 16 + seed[0] % 48
                h = 16 + seed[1] % 48
                body = (seed * ((w * h) // len(seed) + 1))[: w * h]
                blobs.append(_MAGIC + struct.pack("<HH", w, h) + body)
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "sample_rate": 0,
                        "n_frames": 1,
                        "codec": "fake",
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": kind,
                    "data": blobs,
                    "meta": metas,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_bytes(data: bytes) -> np.ndarray:
    """STUB decode kernel: parses the synthetic format above.

    Replace with e.g. ``PIL.Image.open(io.BytesIO(data))`` when codec
    libraries are available; raises on real formats to fail loudly.
    """
    if data[: len(_MAGIC)] != _MAGIC:
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "plug a decoder into _decode_image_bytes"
        )
    w, h = struct.unpack_from("<HH", data, len(_MAGIC))
    pixels = np.frombuffer(
        data, dtype=np.uint8, count=w * h, offset=len(_MAGIC) + 4
    )
    return pixels.reshape(h, w)


FEATURE_SCHEMA = (
    "doc_id long, width int, height int, mean_px double, std_px double, "
    "phash string"
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per image: dimensions, intensity stats,
    a perceptual-hash-style signature (mean-threshold bits of the 8x8
    downsample). Arrow-batched; numpy per batch, no per-row Python at
    the Spark API level."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                img = _decode_image_bytes(bytes(data))
                h, w = img.shape
                small = img[:: max(h // 8, 1), :: max(w // 8, 1)][:8, :8]
                bits = (small >= small.mean()).flatten()
                phash = "".join(
                    f"{int(''.join('1' if b else '0' for b in bits[i:i+8]), 2):02x}"
                    for i in range(0, len(bits), 8)
                )
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "mean_px": float(img.mean()),
                        "std_px": float(img.std()),
                        "phash": phash,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "data").mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Nearest-neighbor resize -> (doc_id, pixels array<int>) — the
    downsample-for-model-input stage, stub-decoded."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_px = [], []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                img = _decode_image_bytes(bytes(data))
                h, w = img.shape
                yi = (np.arange(height) * h // height).clip(0, h - 1)
                xi = (np.arange(width) * w // width).clip(0, w - 1)
                out_ids.append(doc_id)
                out_px.append(img[np.ix_(yi, xi)].flatten().astype(int).tolist())
            yield pd.DataFrame({"doc_id": out_ids, "pixels": out_px})

    return media.select("doc_id", "data").mapInPandas(
        rs, schema="doc_id long, pixels array<int>"
    )


def synth_audio(docs: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Synthetic audio-kind media: payload = magic || n:u32 || fake
    8-bit PCM derived from md5(text) (md5 so the derived features are
    SQL-reproducible — see the `audio_features` contract oracle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for text in pdf["text"]:
                seed = hashlib.md5(text.encode("utf-8")).digest()
                n = 256 + seed[2] % 1024  # samples
                pcm = (seed * (n // len(seed) + 1))[:n]
                blobs.append(_MAGIC + struct.pack("<I", n) + pcm)
                metas.append(
                    {
                        "width": 0,
                        "height": 0,
                        "sample_rate": sample_rate,
                        "n_frames": n,
                        "codec": "fakepcm",
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": "audio",
                    "data": blobs,
                    "meta": metas,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_audio_bytes(data: bytes) -> np.ndarray:
    """STUB decode kernel for audio (cf. ``_decode_image_bytes``):
    parses the synthetic PCM format; replace with soundfile/librosa when
    codec libraries are available."""
    if data[: len(_MAGIC)] != _MAGIC:
        raise NotImplementedError(
            "real audio codecs are not available in this environment; "
            "plug a decoder into _decode_audio_bytes"
        )
    (n,) = struct.unpack_from("<I", data, len(_MAGIC))
    return (
        np.frombuffer(data, dtype=np.uint8, count=n, offset=len(_MAGIC) + 4)
        .astype(np.float64)
        / 127.5
        - 1.0
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples int, duration_sec double, rms double, "
    "zero_crossings int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per clip: length, RMS level, zero
    crossings — the audio-side analogue of ``image_features``."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data, meta in zip(
                pdf["doc_id"], pdf["data"], pdf["meta"]
            ):
                x = _decode_audio_bytes(bytes(data))
                sr = max(int(meta["sample_rate"]), 1)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": int(x.size),
                        "duration_sec": round(x.size / sr, 6),
                        "rms": round(float(np.sqrt((x**2).mean())), 6),
                        "zero_crossings": int(
                            np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "data", "meta").mapInPandas(
        extract, schema=AUDIO_FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video-kind media: emit (doc_id, frame_idx,
    frame binary) rows for every ``every_n``-th frame. With the stub
    format each blob is a single frame; the expansion plumbing (one
    input row -> many output rows through mapInPandas) is the part that
    matters for real video."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, data, meta in zip(pdf["doc_id"], pdf["data"], pdf["meta"]):
                n = int(meta["n_frames"])
                for i in range(0, n, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(data))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("doc_id", "data", "meta").mapInPandas(
        fs, schema="doc_id long, frame_idx int, frame binary"
    )

"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media alongside text. The
engine treats media as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
functions over ``mapInPandas`` so each task streams record batches
instead of materializing a partition (binaries are big — the batch size
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``).

The decode kernels are REAL, pure-stdlib codecs: ``decode_png``
(zlib-inflate + all five PNG scanline unfilters; 8-bit gray/RGB/RGBA)
and ``decode_wav`` (RIFF/WAVE PCM via the ``wave`` module; 8/16-bit).
The matching encoders let the synthetic corpus carry genuine PNG/WAV
payloads — lossless containers around md5(text)-seeded pixel/sample
bytes, so an external SQL engine can still reproduce every derived
feature (the `image_features`/`audio_features` contract oracles).
Heavier formats (JPEG, Opus, video codecs) would slot into the same
``_decode_*_bytes`` dispatchers via PIL/ffmpeg where available.

Schema conventions:

    media(doc_id: long, kind: string, data: binary,
          meta: struct<width:int, height:int, sample_rate:int,
                       n_frames:int, codec:string>)
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

# -- PNG (pure stdlib: zlib + struct) ---------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Minimal lossless PNG encoder: 8-bit grayscale ``(h, w)`` or
    RGB/RGBA ``(h, w, 3|4)`` uint8, non-interlaced, filter-0 scanlines.
    Output opens in any standards-compliant viewer/decoder."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        color = 2
    elif img.ndim == 3 and img.shape[2] == 4:
        color = 6
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Pure-stdlib PNG decoder: 8-bit gray / RGB / RGBA, non-interlaced,
    all five scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6).
    Returns uint8 ``(h, w)`` for grayscale or ``(h, w, channels)``."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, []
    w = h = bit = color = interlace = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit != 8 or color not in (0, 2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (bit={bit}, color={color}, "
            f"interlace={interlace}); supported: 8-bit gray/RGB/RGBA, "
            "non-interlaced"
        )
    ch = {0: 1, 2: 3, 6: 4}[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, offset=off + 1).astype(
            np.int32
        )
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: + left — per-channel modular prefix sum
            cur = line.copy()
            for c in range(ch):
                cur[c::ch] = np.cumsum(cur[c::ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average (sequential: left depends on output)
            cur = line.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth (sequential)
            cur = line.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """uint8 image of any supported channel count -> (h, w) luma
    (integer Rec.601: (299R + 587G + 114B) // 1000; alpha ignored)."""
    if img.ndim == 2:
        return img
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


# -- WAV (stdlib ``wave`` module) --------------------------------------------


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, sampwidth: int = 1
) -> bytes:
    """RIFF/WAVE PCM encoder via the stdlib ``wave`` module: mono,
    8-bit unsigned (``sampwidth=1``, uint8 input) or 16-bit signed
    little-endian (``sampwidth=2``, int16 input)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sample_rate)
        dtype = np.uint8 if sampwidth == 1 else np.dtype("<i2")
        wf.writeframes(np.ascontiguousarray(samples, dtype=dtype).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM decoder -> (float64 samples in [-1, 1], rate).
    Mono or multi-channel (channels averaged), 8-bit unsigned or
    16-bit signed PCM — the stdlib ``wave`` surface."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        nch, sw, rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        frames = wf.readframes(nframes)
    if sw == 1:
        x = np.frombuffer(frames, np.uint8).astype(np.float64) / 127.5 - 1.0
    elif sw == 2:
        x = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def synth_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media column derived from the text column.

    Payload = a REAL grayscale PNG (``encode_png``) whose pixel body is
    md5(text)-seeded bytes — lossless, so an external SQL engine can
    reproduce the derived features from the md5 chain alone (the
    `image_features` contract entry is oracled in DuckDB) while the
    decode path exercises a genuine format end-to-end.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for text in pdf["text"]:
                seed = hashlib.md5(text.encode("utf-8")).digest()
                w = 16 + seed[0] % 48
                h = 16 + seed[1] % 48
                body = (seed * ((w * h) // len(seed) + 1))[: w * h]
                img = np.frombuffer(body, np.uint8).reshape(h, w)
                blobs.append(encode_png(img))
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "sample_rate": 0,
                        "n_frames": 1,
                        "codec": "png",
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
    """Image decode dispatcher -> (h, w) uint8 grayscale.

    PNG is decoded with the pure-stdlib ``decode_png`` (color images
    reduce via Rec.601 luma). Other containers (JPEG etc.) would
    dispatch to PIL here where available.
    """
    if data[:8] == _PNG_SIG:
        return to_grayscale(decode_png(data))
    raise ValueError(
        "unrecognized image container (PNG supported in-sandbox; plug "
        "PIL into _decode_image_bytes for JPEG and friends)"
    )


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
    """Synthetic audio-kind media: payload = a REAL RIFF/WAVE file
    (``encode_wav``, mono 8-bit PCM) whose samples are derived from
    md5(text) — lossless, so the derived features stay SQL-reproducible
    (see the `audio_features` contract oracle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for text in pdf["text"]:
                seed = hashlib.md5(text.encode("utf-8")).digest()
                n = 256 + seed[2] % 1024  # samples
                pcm = (seed * (n // len(seed) + 1))[:n]
                blobs.append(
                    encode_wav(np.frombuffer(pcm, np.uint8), sample_rate, 1)
                )
                metas.append(
                    {
                        "width": 0,
                        "height": 0,
                        "sample_rate": sample_rate,
                        "n_frames": n,
                        "codec": "pcm_u8",
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
    """Audio decode dispatcher -> float64 samples in [-1, 1].

    RIFF/WAVE PCM is decoded with the stdlib ``decode_wav``; compressed
    codecs (Opus, MP3) would dispatch to ffmpeg/soundfile here where
    available.
    """
    if data[:4] == b"RIFF":
        return decode_wav(data)[0]
    raise ValueError(
        "unrecognized audio container (WAV/PCM supported in-sandbox; "
        "plug soundfile/ffmpeg into _decode_audio_bytes for compressed "
        "codecs)"
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

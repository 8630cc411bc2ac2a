"""Multimodal binary columns: real stdlib codecs (PNG via zlib, WAV via
``wave``) under Arrow-batched Spark plumbing."""

import numpy as np
import pytest

from inverted_index_spark.pipelines.multimodal import (
    _decode_audio_bytes,
    _decode_image_bytes,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    frame_sample,
    image_features,
    resize_images,
    synth_media,
    to_grayscale,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    return synth_media(docs).cache()


def test_media_schema_and_determinism(spark, media):
    assert dict(media.dtypes)["data"] == "binary"
    assert media.count() == 50
    row = media.orderBy("doc_id").first()
    assert row["meta"]["width"] >= 16 and row["meta"]["codec"] == "png"
    # payloads are genuine PNG files
    assert bytes(row["data"])[:8] == b"\x89PNG\r\n\x1a\n"
    # deterministic: regenerating yields identical blobs
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    again = synth_media(docs).orderBy("doc_id").first()
    assert bytes(again["data"]) == bytes(row["data"])


def test_image_features(media):
    feats = image_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert 16 <= r["width"] <= 64 and 16 <= r["height"] <= 64
        assert 0.0 <= r["mean_px"] <= 255.0
        assert len(r["phash"]) == 16  # 64 bits hex


def test_resize_shape(media):
    rows = resize_images(media, width=8, height=8).collect()
    assert all(len(r["pixels"]) == 64 for r in rows)


def test_frame_sample_expansion(media):
    rows = frame_sample(media, every_n=1).collect()
    assert len(rows) == 50  # synthetic media: one frame each
    assert all(r["frame_idx"] == 0 for r in rows)


def test_decode_rejects_unknown_containers():
    with pytest.raises(ValueError):
        _decode_image_bytes(b"GIF89a....")
    with pytest.raises(ValueError):
        _decode_audio_bytes(b"OggS....")


# -- PNG codec ---------------------------------------------------------------


def _rng(seed):
    return np.random.RandomState(seed)


@pytest.mark.parametrize("shape", [(5, 7), (8, 3, 3), (4, 6, 4)])
def test_png_roundtrip(shape):
    img = _rng(sum(shape)).randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def _filter_scanlines(img: np.ndarray, ftype: int) -> bytes:
    """Apply one PNG filter (RFC 2083 §6) forward to every scanline —
    produces the raw pre-compression stream an arbitrary encoder could
    emit, exercising the decoder's unfilter paths our own filter-0
    encoder never generates."""
    ch = 1 if img.ndim == 2 else img.shape[2]
    h = img.shape[0]
    flat = img.reshape(h, -1).astype(np.int32)
    stride = flat.shape[1]
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        enc = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0  # left (reconstructed)
            b = prev[i]  # up
            c = prev[i - ch] if i >= ch else 0  # up-left
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (cur[i] - pred) & 0xFF
        out.append(ftype)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(6, 5), (5, 4, 3)])
def test_png_unfilters_every_filter_type(ftype, shape):
    import struct
    import zlib

    from inverted_index_spark.pipelines.multimodal import _png_chunk

    img = _rng(ftype * 10 + sum(shape)).randint(0, 256, size=shape).astype(
        np.uint8
    )
    color = 0 if img.ndim == 2 else {3: 2, 4: 6}[img.shape[2]]
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = _filter_scanlines(img, ftype)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def test_png_rejects_unsupported_variants():
    img = np.zeros((4, 4), np.uint8)
    png = bytearray(encode_png(img))
    png[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError):
        decode_png(bytes(png))
    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG")


def test_grayscale_luma():
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], np.uint8)
    assert to_grayscale(rgb).tolist() == [[76, 149, 29]]  # Rec.601 // 1000
    gray = np.array([[7, 9]], np.uint8)
    assert np.array_equal(to_grayscale(gray), gray)


def test_image_features_on_color_png(spark):
    """An RGB PNG flows through the same feature kernel via luma."""
    rgb = _rng(3).randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    pdf = spark.createDataFrame(
        [(1, bytearray(encode_png(rgb)))], "doc_id long, data binary"
    )
    row = image_features(pdf).first()
    luma = to_grayscale(rgb)
    assert (row["width"], row["height"]) == (16, 16)
    assert row["mean_px"] == pytest.approx(float(luma.mean()))


# -- WAV codec ---------------------------------------------------------------


def test_wav_roundtrip_u8():
    pcm = _rng(1).randint(0, 256, size=500).astype(np.uint8)
    x, rate = decode_wav(encode_wav(pcm, 8000, 1))
    assert rate == 8000 and x.size == 500
    assert np.allclose(x, pcm.astype(np.float64) / 127.5 - 1.0)


def test_wav_roundtrip_s16():
    pcm = _rng(2).randint(-32768, 32768, size=300).astype(np.int16)
    x, rate = decode_wav(encode_wav(pcm, 44100, 2))
    assert rate == 44100
    assert np.allclose(x, pcm.astype(np.float64) / 32768.0)


def test_wav_stereo_averages_channels():
    import io
    import wave

    left = np.full(10, 100, np.uint8)
    right = np.full(10, 200, np.uint8)
    inter = np.empty(20, np.uint8)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(1)
        wf.setframerate(16000)
        wf.writeframes(inter.tobytes())
    x, _ = decode_wav(buf.getvalue())
    want = (
        left.astype(np.float64) / 127.5 - 1 + right.astype(np.float64) / 127.5 - 1
    ) / 2
    assert np.allclose(x, want)


def test_audio_features_deterministic(spark):
    from inverted_index_spark.pipelines.multimodal import (
        audio_features,
        synth_audio,
    )

    docs = spark.createDataFrame(
        [(1, "hello audio"), (2, "another clip"), (1001, "hello audio")],
        ["doc_id", "text"],
    )
    media = synth_audio(docs).cache()
    # payloads are genuine RIFF/WAVE files
    assert bytes(media.first()["data"])[:4] == b"RIFF"
    rows = {r["doc_id"]: r for r in audio_features(media).collect()}
    assert set(rows) == {1, 2, 1001}
    # same text -> same synthetic payload -> identical features
    a, b = rows[1], rows[1001]
    assert (a["n_samples"], a["rms"], a["zero_crossings"]) == (
        b["n_samples"], b["rms"], b["zero_crossings"],
    )
    assert rows[1]["duration_sec"] > 0 and 0.0 < rows[1]["rms"] < 1.5


def test_png_mixed_filters_per_row():
    """Real encoders pick a filter PER SCANLINE; decode must unfilter a
    stream that mixes all five types row-by-row."""
    import struct
    import zlib

    from inverted_index_spark.pipelines.multimodal import _png_chunk

    rng = _rng(99)
    for shape in [(12, 9), (9, 5, 3), (7, 4, 4)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        ch = 1 if img.ndim == 2 else img.shape[2]
        h, w = img.shape[:2]
        flat = img.reshape(h, -1).astype(np.int32)
        stride = flat.shape[1]
        ftypes = rng.randint(0, 5, size=h)
        out = bytearray()
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(h):
            cur = flat[y]
            ft = int(ftypes[y])
            enc = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pred = (
                    0 if ft == 0 else a if ft == 1 else b if ft == 2
                    else (a + b) >> 1 if ft == 3
                    else min(
                        [(abs(a + b - c - a), 0, a),
                         (abs(a + b - c - b), 1, b),
                         (abs(a + b - c - c), 2, c)]
                    )[2]
                )
                enc[i] = (cur[i] - pred) & 0xFF
            out.append(ft)
            out.extend(enc.astype(np.uint8).tobytes())
            prev = cur
        color = 0 if img.ndim == 2 else {3: 2, 4: 6}[img.shape[2]]
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(png), img), f"shape {shape}"

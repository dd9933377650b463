"""Optional-codec path for multimodal operators: REAL PIL decode/resize
when the library is present (skip-markered — absent in this container),
the pure-Python header-parse decode fallback always (unskipped: real
dimension decode without PIL), and the honest NotImplementedError where
no fallback is honest (video, strict pixel decode). The Spark-side
plumbing (schema, mapInPandas batch shape, narrow no-shuffle plan) is
exercised either way via extract_features (q25)."""

from __future__ import annotations

import struct
import sys
import zlib
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark.llm.multimodal import (  # noqa: E402
    _pil,
    decode_image,
    parse_image_header,
    resize_images,
    sample_frames,
)

HAS_PIL = _pil() is not None


def _png_bytes(w: int, h: int, rgb=(30, 10, 200)) -> bytes:
    """Minimal stdlib-only RGB PNG encoder (valid IHDR/IDAT/IEND) so the
    decode tests run in containers without PIL."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _image_df(spark):
    rows = [
        (i, _png_bytes(w, h, rgb=(i * 40 % 256, 10, 200)))
        for i, (w, h) in enumerate([(8, 6), (5, 5), (12, 3)])
    ]
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


def test_decode_image_header_fallback(spark):
    # Runs in ANY container: dimensions/channels/mode decode from the
    # container header (pure Python); with PIL installed the same call is
    # a full decode and must agree on these fields.
    out = {r["doc_id"]: r for r in decode_image(_image_df(spark), "doc_id", "payload").collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["channels"], out[0]["mode"]) == (8, 6, 3, "RGB")
    assert (out[2]["width"], out[2]["height"]) == (12, 3)


def test_parse_image_header_formats():
    assert parse_image_header(_png_bytes(8, 6)) == (6, 8, 3, "RGB")
    gif = b"GIF89a" + struct.pack("<HH", 11, 7) + b"\x00" * 20
    assert parse_image_header(gif) == (7, 11, 1, "P")
    # minimal JPEG: SOI + SOF0 (h=5, w=9, 3 components)
    jpeg = b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 5, 9) + b"\x03" + b"\x00" * 10
    assert parse_image_header(jpeg) == (5, 9, 3, "RGB")
    # FF fill bytes before a marker: FF FF FF C0 — the marker's leading FF
    # must not be consumed with the padding (ADVICE r3: the old scan
    # advanced 2 past each FF FF and missed the SOF entirely)
    jpeg_fill = (
        b"\xff\xd8"
        + b"\xff\xff"  # one padding byte, then the SOF's own FF
        + b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", 5, 9)
        + b"\x03"
        + b"\x00" * 10
    )
    assert parse_image_header(jpeg_fill) == (5, 9, 3, "RGB")
    with pytest.raises(ValueError, match="unrecognized"):
        parse_image_header(b"notanimage")


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed in this container")
def test_decode_image_real(spark):
    out = {r["doc_id"]: r for r in decode_image(_image_df(spark), "doc_id", "payload").collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["channels"]) == (8, 6, 3)
    assert out[1]["mode"] == "RGB"


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed in this container")
def test_resize_images_central_crop(spark):
    from io import BytesIO

    from PIL import Image

    out = resize_images(_image_df(spark), "doc_id", "payload", height=4, width=4).collect()
    for r in out:
        im = Image.open(BytesIO(bytes(r["image"])))
        assert (im.width, im.height) == (4, 4)
    # deterministic bytes: PNG re-encode of the same input is stable
    again = resize_images(_image_df(spark), "doc_id", "payload", height=4, width=4).collect()
    assert sorted(bytes(r["image"]) for r in out) == sorted(bytes(r["image"]) for r in again)


@pytest.mark.skipif(HAS_PIL, reason="fallback only without PIL")
def test_strict_decode_and_resize_raise_honestly_without_pil(spark):
    df = spark.createDataFrame([(1, b"notanimage")], "doc_id bigint, payload binary")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(df, "doc_id", "payload", allow_header_fallback=False)
    with pytest.raises(NotImplementedError, match="PIL"):
        resize_images(df, "doc_id", "payload", 4, 4)


def test_video_sampling_always_stubbed(spark):
    df = spark.createDataFrame([(1, b"notavideo")], "doc_id bigint, payload binary")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(df, "payload", every_n=2)


def _wav_bytes(channels=2, rate=16000, bits=16, n_frames=1600) -> bytes:
    """Minimal stdlib-only PCM WAV encoder (RIFF + fmt + data)."""
    frame_bytes = channels * bits // 8
    body = b"\x00" * (n_frames * frame_bytes)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * frame_bytes, frame_bytes, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_audio_header_wav():
    from plumberapp_spark.llm.multimodal import parse_audio_header

    assert parse_audio_header(_wav_bytes(2, 16000, 16, 1600)) == (2, 16000, 16, 1600, 0.1)
    assert parse_audio_header(_wav_bytes(1, 8000, 8, 8000)) == (1, 8000, 8, 8000, 1.0)
    with pytest.raises(ValueError, match="unrecognized audio"):
        parse_audio_header(b"ID3notawav")


def test_decode_audio(spark):
    from plumberapp_spark.llm.multimodal import decode_audio

    rows = [(0, _wav_bytes(1, 8000, 16, 800)), (1, _wav_bytes(2, 44100, 16, 44100))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in decode_audio(df, "doc_id", "payload").collect()}
    assert (out[0]["n_channels"], out[0]["sample_rate"], out[0]["duration_s"]) == (1, 8000, 0.1)
    assert (out[1]["n_channels"], out[1]["sample_rate"], out[1]["duration_s"]) == (2, 44100, 1.0)


def test_bmp_roundtrip_and_pixel_decode(spark):
    # Round 5: the BMP pixel path is REAL in this container (stdlib
    # encode + numpy decode) — roundtrip must be bit-exact, including
    # row padding (odd widths) and the BGR/bottom-up storage order.
    import numpy as np

    from plumberapp_spark.llm.multimodal import decode_bmp_pixels, decode_image_pixels, encode_bmp

    rng = np.random.default_rng(7)
    for h, w in [(5, 3), (1, 1), (4, 4), (3, 7)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_bmp_pixels(encode_bmp(arr))
        assert back.shape == (h, w, 3)
        assert (back == arr).all()

    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_bmp(arr)))], "doc_id long, payload binary")
    row = decode_image_pixels(df, "doc_id", "payload").collect()[0]
    assert (row.height, row.width, row.channels) == (6, 5, 3)
    assert (np.array(row.pixels).reshape(6, 5, 3) == arr).all()


def test_resize_pixels_nearest_neighbor(spark):
    import numpy as np

    from plumberapp_spark.llm.multimodal import decode_image_pixels, encode_bmp, resize_pixels

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_bmp(arr)))], "doc_id long, payload binary")
    out = resize_pixels(decode_image_pixels(df, "doc_id", "payload"), 4, 3).collect()[0]
    got = np.array(out.pixels).reshape(4, 3, 3)
    ys = (np.arange(4) * 8 // 4)
    xs = (np.arange(3) * 6 // 3)
    assert (got == arr[ys][:, xs]).all()


def test_image_header_consistent_with_pixel_decode(spark):
    import numpy as np

    from plumberapp_spark.llm.multimodal import encode_bmp, parse_image_header

    arr = np.zeros((9, 4, 3), dtype=np.uint8)
    h, w, ch, mode = parse_image_header(encode_bmp(arr))
    assert (h, w, ch, mode) == (9, 4, 3, "RGB")


def test_augment_pixels_training_jitter(spark):
    """Round-6 (P6 completion): the full training jitter runs for real
    without PIL — distorted-bbox crop + bilinear resize + random flip
    (imagenet_input.py:101-120 semantics), deterministic per (seed,
    doc_id)."""
    import numpy as np

    from plumberapp_spark.llm.multimodal import augment_pixels, decode_image_pixels, encode_bmp

    rng = np.random.default_rng(7)
    imgs = [
        (i, bytearray(encode_bmp(rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8))))
        for i in range(4)
    ]
    df = spark.createDataFrame(imgs, "doc_id long, payload binary")
    pixels = decode_image_pixels(df, "doc_id", "payload")

    out1 = {r.doc_id: list(r.pixels) for r in augment_pixels(pixels, 8, 8, seed=3).collect()}
    out2 = {r.doc_id: list(r.pixels) for r in augment_pixels(pixels, 8, 8, seed=3).collect()}
    assert out1 == out2  # pure function of (data, seed)
    assert all(len(v) == 8 * 8 * 3 for v in out1.values())
    out_other_seed = {
        r.doc_id: list(r.pixels) for r in augment_pixels(pixels, 8, 8, seed=4).collect()
    }
    assert any(out1[k] != out_other_seed[k] for k in out1)  # seed actually jitters
    assert all(0 <= v <= 255 for v in out1[0])


def test_augment_pixels_eval_central_crop(spark):
    """Eval path: central crop at size/(size+padding) coverage then
    bilinear resize (imagenet_input.py:62-80) — no randomness, so no
    seed sensitivity."""
    import numpy as np

    from plumberapp_spark.llm.multimodal import (
        _bilinear_resize,
        augment_pixels,
        decode_image_pixels,
        encode_bmp,
    )

    arr = np.arange(20 * 14 * 3, dtype=np.uint8).reshape(20, 14, 3) % 251
    df = spark.createDataFrame([(5, bytearray(encode_bmp(arr)))], "doc_id long, payload binary")
    pixels = decode_image_pixels(df, "doc_id", "payload")
    a = augment_pixels(pixels, 8, 8, seed=1, training=False, crop_padding=4).collect()[0]
    b = augment_pixels(pixels, 8, 8, seed=9, training=False, crop_padding=4).collect()[0]
    assert list(a.pixels) == list(b.pixels)
    # replay the central-crop arithmetic independently
    cs = int(round(8 / (8 + 4) * 14))
    oy, ox = (20 - cs + 1) // 2, (14 - cs + 1) // 2
    want = _bilinear_resize(arr[oy : oy + cs, ox : ox + cs].astype(np.int32), 8, 8)
    assert (np.array(a.pixels).reshape(8, 8, 3) == want).all()


def test_bilinear_resize_identity_and_mean():
    import numpy as np

    from plumberapp_spark.llm.multimodal import _bilinear_resize

    arr = np.random.default_rng(0).integers(0, 256, size=(6, 5, 3)).astype(np.int32)
    assert (_bilinear_resize(arr, 6, 5) == arr).all()  # identity at same size
    # downscale of a constant image stays constant
    const = np.full((9, 9, 1), 77, dtype=np.int32)
    assert (_bilinear_resize(const, 3, 3) == 77).all()

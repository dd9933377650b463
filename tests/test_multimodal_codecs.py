"""Optional-codec path for multimodal operators: REAL PIL decode/resize
when the library is present (skip-markered — absent in this container),
and the honest NotImplementedError fallback when it is not. The Spark-side
plumbing (schema, mapInPandas batch shape, narrow no-shuffle plan) is
exercised either way via extract_features (q25)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark.llm.multimodal import (  # noqa: E402
    _pil,
    decode_image,
    resize_images,
    sample_frames,
)

HAS_PIL = _pil() is not None


def _image_df(spark):
    from io import BytesIO

    from PIL import Image

    rows = []
    for i, (w, h) in enumerate([(8, 6), (5, 5), (12, 3)]):
        im = Image.new("RGB", (w, h), color=(i * 40 % 256, 10, 200))
        buf = BytesIO()
        im.save(buf, format="PNG")
        rows.append((i, buf.getvalue()))
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


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
def test_decode_raises_honestly_without_pil(spark):
    df = spark.createDataFrame([(1, b"notanimage")], "doc_id bigint, payload binary")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(df, "doc_id", "payload")
    with pytest.raises(NotImplementedError, match="PIL"):
        resize_images(df, "doc_id", "payload", 4, 4)


def test_video_sampling_always_stubbed(spark):
    df = spark.createDataFrame([(1, b"notavideo")], "doc_id bigint, payload binary")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(df, "payload", every_n=2)

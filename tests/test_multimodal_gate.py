"""PIL import gate: real decode self-upgrades when the library exists,
the deterministic fake path and the loud NotImplementedError stay the
contract when it doesn't (the tiktoken skip pattern)."""

from __future__ import annotations

import pytest

from lightrag_spark.operators.multimodal import (
    _pil_image,
    decode_image_meta,
    resize_kernel,
)

HAS_PIL = _pil_image() is not None


@pytest.mark.skipif(HAS_PIL, reason="PIL present: real decode active")
def test_absent_pil_raises_loudly():
    with pytest.raises(NotImplementedError):
        decode_image_meta(b"\x89PNG....")
    with pytest.raises(NotImplementedError):
        resize_kernel(b"\x89PNG....", 64, 64)


def test_fake_path_is_deterministic():
    a = decode_image_meta(b"payload-1", fake=True)
    b = decode_image_meta(b"payload-1", fake=True)
    assert a == b and 64 <= a["width"] <= 2047
    r1 = resize_kernel(b"payload-1", 64, 64, fake=True)
    assert r1 == resize_kernel(b"payload-1", 64, 64, fake=True)
    assert len(resize_kernel(b"payload-1", 256, 256, fake=True)) > len(r1)


@pytest.mark.skipif(not HAS_PIL, reason="PIL absent from this container")
def test_real_decode_roundtrip():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (37, 21)).save(buf, format="PNG")
    payload = buf.getvalue()
    meta = decode_image_meta(payload)
    assert (meta["width"], meta["height"], meta["format"]) == (37, 21, "png")
    resized = resize_kernel(payload, 16, 8)
    with Image.open(io.BytesIO(resized)) as im:
        assert (im.width, im.height) == (16, 8)

"""Differential harness for the multimodal codec switch (VERDICT r2 #10).

``decode_image`` auto-upgrades from the deterministic stub to PIL when the
library is importable. These tests pin the CONTRACT both paths must share —
shape (header H×W×3), dtype uint8, C-contiguous layout, and the downstream
feature-vector schema — so landing a real codec in a future container is a
no-op switch. The real-codec legs ``importorskip`` and skip cleanly here
(PIL is not in this container).
"""

from __future__ import annotations

import numpy as np
import pytest

from rika_ray import docgen
from rika_ray.pipelines import multimodal as mm


@pytest.mark.parametrize(
    "payload,h,w",
    [
        # all three exercise REAL pure-numpy codec paths (round 5: JPEG
        # and GIF joined PNG/BMP/TIFF in rika_ray.stages.codecs)
        (docgen.build_jpeg_rgb(docgen.gradient_pixels(32, 48)), 32, 48),
        (
            docgen.build_png_rgb(
                docgen.gradient_pixels(48, 64), filters=[2] * 48
            ),
            48,
            64,
        ),
        (
            docgen.build_gif_rgb(
                (docgen.gradient_pixels(16, 32) // 32) * 32
            ),
            16,
            32,
        ),
    ],
)
def test_decode_contract_shape_dtype_layout(payload, h, w):
    """The contract every decoder implementation must meet."""
    pixels, fmt = mm.decode_image(payload)
    assert pixels.shape == (h, w, 3)
    assert pixels.dtype == np.uint8
    assert pixels.flags["C_CONTIGUOUS"]
    feats = mm.image_features(pixels)
    assert feats.shape == (3 + 8,) and feats.dtype == np.float32
    small = mm.resize_nearest(pixels, 8, 8)
    assert small.shape == (8, 8, 3) and small.dtype == np.uint8


def test_no_image_stub_remains():
    # every raster format has a REAL decoder now; a pixel-less VP8X-only
    # WebP is refused typed, and a lossless WebP decodes bit-exact
    from rika_ray.stages.codecs import CodecError

    with pytest.raises(CodecError):
        mm.decode_image(docgen.build_webp(20, 10))
    src = docgen.gradient_pixels(10, 20, seed=2)
    pixels, media = mm.decode_image(docgen.build_webp_lossless(src))
    assert media == "image/webp"
    assert np.array_equal(pixels, src)


def test_real_codec_parity_with_stub():
    """When PIL is importable: a REAL image decoded by PIL must satisfy
    the same contract as the pure-numpy codecs (forced via monkeypatch) —
    shape/dtype/feature-schema equality; PNG and GIF are lossless so even
    values agree, JPEG agrees within quantization error."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("RGB", (24, 18))
    for fmt in ("PNG", "JPEG", "GIF"):
        buf = io.BytesIO()
        if fmt == "JPEG":
            # 4:4:4 — the pure-numpy decoder rejects subsampled scans
            img.save(buf, format=fmt, subsampling=0)
        else:
            img.save(buf, format=fmt)
        payload = buf.getvalue()
        real_pixels, media = mm.decode_image(payload)
        assert real_pixels.shape == (18, 24, 3)
        assert real_pixels.dtype == np.uint8
        # force the stub path on the same payload
        orig = mm.HAVE_PIL
        mm.HAVE_PIL = False
        try:
            stub_pixels, stub_media = mm.decode_image(payload)
        finally:
            mm.HAVE_PIL = orig
        assert stub_media == media
        assert stub_pixels.shape == real_pixels.shape
        assert stub_pixels.dtype == real_pixels.dtype
        assert (
            mm.image_features(stub_pixels).shape
            == mm.image_features(real_pixels).shape
        )


def test_real_audio_codec_parity_with_stub():
    """Same structural-parity harness for the audio path (soundfile)."""
    sf = pytest.importorskip("soundfile")
    import io

    buf = io.BytesIO()
    sf.write(buf, np.zeros(1600, dtype=np.float32), 16000, format="WAV")
    payload = buf.getvalue()
    real = sf.read(io.BytesIO(payload))[0]
    stub = mm.decode_audio_stub(payload)
    assert stub.ndim == real.ndim == 1
    assert stub.dtype == np.float32

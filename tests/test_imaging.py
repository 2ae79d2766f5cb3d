"""Image codec gates (BASELINE.json input_hint): PSNR ≥ 40 dB for the
lossy format, exact round-trip for PNG, deterministic encodes/phash."""

from __future__ import annotations

import pytest

from pyspider_spark import imaging


@pytest.mark.parametrize("w,h", [(32, 32), (64, 128), (128, 64)])
def test_png_roundtrip_exact(w, h):
    rgb = imaging.synth_image(f"png-{w}x{h}", w, h)
    assert (imaging.png_decode(imaging.png_encode(rgb)) == rgb).all()


@pytest.mark.parametrize("w,h", [(32, 32), (128, 128)])
def test_lossy_psnr_gate(w, h):
    rgb = imaging.synth_image(f"jpeg-{w}x{h}", w, h)
    decoded = imaging.decode(imaging.lossy_encode(rgb), "jpeg")
    assert imaging.psnr(rgb, decoded) >= 40.0


def test_encode_deterministic():
    rgb = imaging.synth_image("det", 64, 64)
    assert imaging.encode(rgb, "png") == imaging.encode(rgb, "png")
    assert imaging.encode(rgb, "jpeg") == imaging.encode(rgb, "jpeg")


def test_phash_stable_and_locality():
    rgb = imaging.synth_image("ph", 64, 64)
    h1 = imaging.phash64(rgb)
    assert h1 == imaging.phash64(rgb.copy())
    # lossy decode stays within a small hamming ball of the original
    decoded = imaging.decode(imaging.lossy_encode(rgb), "jpeg")
    h2 = imaging.phash64(decoded)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 6


def test_unknown_format_raises():
    rgb = imaging.synth_image("x", 32, 32)
    with pytest.raises(NotImplementedError):
        imaging.encode(rgb, "webp")
    with pytest.raises(NotImplementedError):
        imaging.decode(b"123", "webp")

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


def test_synth_separable_matches_elementwise_reference():
    """synth_image computes the sinusoid base via 1-D trig broadcast
    (O(w+h) instead of O(w*h) trig). This pins bitwise identity to the
    direct elementwise formulation: the broadcast feeds each output
    element the same operands in the same order, so the planes must be
    EQUAL, not merely allclose — including the motif/near-dup branch."""
    import numpy as np

    from pyspider_spark.imaging import (
        NEARDUP_MOTIFS,
        NEARDUP_ONE_IN,
        h64,
        hbytes,
    )

    def reference(image_id, w, h):
        motif = image_id
        if h64("dupflag", image_id) % NEARDUP_ONE_IN == 0:
            motif = f"motif{h64('dupsel', image_id) % NEARDUP_MOTIFS}"
        base = np.frombuffer(hbytes(64, "img", motif), np.uint8).astype(np.float64)
        yy, xx = np.mgrid[0:h, 0:w]
        u, v = xx / w, yy / h
        chans = []
        for c in range(3):
            a, b, ph, fr = base[c * 4 : c * 4 + 4]
            chans.append(
                128
                + 45 * np.sin((u * (3 + a % 5) + ph / 255.0) * 2 * np.pi)
                + 45 * np.cos((v * (3 + b % 5) + fr / 255.0) * 2 * np.pi)
            )
        img = np.stack(chans, axis=-1)
        blk = np.frombuffer(hbytes(64, "imgblk", motif), np.uint8).astype(np.float64)
        grid = np.where(blk >= 128, 1.0, -1.0) * (30.0 + (blk % 128) / 127.0 * 30.0)
        grid = grid.reshape(8, 8)
        if motif != image_id:
            nflip = 1 + h64("nflip", image_id) % 3
            g = grid.flatten()
            for j in range(nflip):
                g[h64(f"flip{j}", image_id) % 64] *= -1.0
            grid = g.reshape(8, 8)
            img += (((xx + yy) % 2)[..., None] - 0.5) * (
                2.0 * (1 + h64("dith", image_id) % 4)
            )
        img += np.kron(grid, np.ones((h // 8, w // 8)))[..., None]
        return np.clip(img, 0, 255).astype(np.uint8)

    import numpy as np

    checked_dup = 0
    for i in range(96):
        iid = f"sep{i}"
        w, h = [(32, 32), (64, 128), (96, 64)][i % 3]
        if h64("dupflag", iid) % NEARDUP_ONE_IN == 0:
            checked_dup += 1
        assert np.array_equal(
            imaging.synth_image(iid, w, h), reference(iid, w, h)
        ), f"pixel mismatch for {iid} at {w}x{h}"
    assert checked_dup, "sample never hit the motif branch — widen the loop"


def test_phash_tiny_images_no_crash():
    """Tracking pixels and icons (h or w < 8) must hash, not crash the
    8x8 block reshape; >=8px values are unchanged by the guard."""
    import numpy as np

    from pyspider_spark import imaging

    assert isinstance(imaging.phash64(np.zeros((4, 16, 3), np.uint8)), int)
    assert isinstance(imaging.phash64(np.full((1, 1, 3), 9, np.uint8)), int)
    assert imaging.phash64(np.zeros((0, 0, 3), np.uint8)) == 0


def test_resize_tolerates_corrupt_rows(spark):
    """One null/corrupt payload must not kill the resize stage: the bad
    row passes through unchanged, good rows resize."""
    from pyspider_spark import imaging
    from pyspider_spark.data.multimodal import resize_images
    from pyspider_spark.schemas import IMAGES

    rgb = imaging.synth_image("img-ok", 32, 32)
    ok_bytes = imaging.encode(rgb, "png")
    rows = [
        ("img-ok", ok_bytes, 32, 32, "png", "cap", imaging.phash64(rgb)),
        ("img-bad", None, 32, 32, "png", "cap", 7),
        ("img-garbage", b"not an image", 32, 32, "png", "cap", 8),
    ]
    out = {
        r.image_id: r
        for r in resize_images(
            spark.createDataFrame(rows, IMAGES), 16, 16
        ).collect()
    }
    assert out["img-ok"].w == 16 and len(out["img-ok"].bytes) > 0
    assert out["img-bad"].phash == 7 and out["img-bad"].bytes is None
    assert out["img-garbage"].phash == 8 and bytes(out["img-garbage"].bytes) == b"not an image"

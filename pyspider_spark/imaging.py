"""Image codec + perceptual hashing for the image+caption payload.

The payload table (BASELINE.json input_hint) carries encoded image bytes.
This container image has no PIL/libjpeg/ffmpeg, so:

- **PNG is real**: a complete, deterministic RGB8 PNG encoder/decoder on
  stdlib ``zlib``/``struct`` + numpy. Lossless round-trip is exact.
- **"jpeg" is a clearly-marked deterministic lossy STUB**: channel
  quantization to 6 bits (uniform error, PSNR ≈ 46 dB ≥ the 40 dB gate)
  inside a PNG container tagged ``fmt='jpeg'``. In production this is
  one function swap to turbojpeg/PIL; the Spark-side plumbing (binary
  column, Arrow batch shape, PSNR test) is real and tested.

phash: 64-bit average-hash over an 8x8 luma downsample — deterministic,
pure numpy, used by the near-duplicate broadcast-bloom pre-filter
(SURVEY.md §2.5 J5).

All functions are batch-shaped (numpy in, bytes out) so the Spark side
calls them from Arrow-batched pandas UDFs only — no per-row Python UDFs
(BASELINE.json input_hint).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .hashing import h64, hbytes

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG (filter 0, fixed zlib
    level → byte-identical across runs)."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`png_encode` (8-bit RGB, filters
    0/1/2 supported) back to (h, w, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = b""
    h = bit_depth = color = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if bit_depth != 8 or color != 2:
        raise ValueError("only 8-bit RGB supported")
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros_like(lines)
    for y in range(h):
        line = lines[y].copy()
        if filters[y] == 1:  # Sub
            for x in range(3, line.size):
                line[x] = (line[x] + line[x - 3]) & 0xFF
        elif filters[y] == 2:  # Up
            line = (line + (out[y - 1] if y else 0)) & 0xFF
        elif filters[y] != 0:
            raise ValueError(f"unsupported PNG filter {filters[y]}")
        out[y] = line
    return out.astype(np.uint8).reshape(h, w, 3)


# --- deterministic lossy stub ("jpeg") -------------------------------------
_QUANT_BITS = 6  # keep 6 of 8 bits/channel → PSNR ≈ 46 dB


def lossy_encode(rgb: np.ndarray) -> bytes:
    """STUB lossy codec: quantize then PNG-wrap. Deterministic; stands in
    for a real JPEG encoder (absent from this container)."""
    shift = 8 - _QUANT_BITS
    q = ((rgb.astype(np.int32) >> shift) << shift) + (1 << (shift - 1))
    return png_encode(np.clip(q, 0, 255).astype(np.uint8))


def encode(rgb: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(rgb)
    if fmt == "jpeg":
        return lossy_encode(rgb)
    raise NotImplementedError(f"codec for fmt={fmt!r} not available in this image")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt in ("png", "jpeg"):
        return png_decode(data)
    raise NotImplementedError(f"codec for fmt={fmt!r} not available in this image")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def phash64(rgb: np.ndarray) -> int:
    """64-bit average-hash: 8x8 block-mean luma vs global mean. Returns a
    SIGNED int64 (Spark LongType-compatible). Images smaller than 8px
    on a side (tracking pixels, icons — common on real pages) stretch
    by pixel repetition first; values for >=8px images are unchanged."""
    luma = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    if luma.size == 0:
        return 0
    if luma.shape[0] < 8:
        luma = np.repeat(luma, -(-8 // luma.shape[0]), axis=0)
    if luma.shape[1] < 8:
        luma = np.repeat(luma, -(-8 // luma.shape[1]), axis=1)
    h, w = luma.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = luma[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return int(np.int64(np.uint64(v)))


NEARDUP_ONE_IN = 32  # ≈3% of images are planted near-dups of a motif
NEARDUP_MOTIFS = 4096  # motif pool: expected pairs stay O(corpus/pool)


def synth_image(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGB image derived from image_id.

    Built so the corpus has a REALISTIC phash distribution (a web crawl
    is mostly-unique images plus a thin near-dup tail, not one giant
    perceptual cluster — an earlier sinusoid-only generator collapsed
    to a handful of phashes and made every banded join quadratic):

    - a per-image 8x8 block-offset grid (hash-derived, ±30..60 luma)
      dominates each aHash bit, so phashes are ~uniform over 2^64 and
      accidental near-dups are negligible;
    - ~1/NEARDUP_ONE_IN of images instead render a shared motif from a
      NEARDUP_MOTIFS-sized pool with 1-3 blocks sign-flipped and a tiny
      phash-neutral checker dither, planting true near-dup pairs at
      hamming 0-6 — images of the SAME motif at different (w, h) still
      collide because the pattern is resolution-normalized;
    - a low-frequency sinusoid base keeps the payload smooth enough
      that lossy quantization is visible but bounded (PSNR gate).
    """
    motif = image_id
    if h64("dupflag", image_id) % NEARDUP_ONE_IN == 0:
        motif = f"motif{h64('dupsel', image_id) % NEARDUP_MOTIFS}"
    base = np.frombuffer(hbytes(64, "img", motif), np.uint8).astype(np.float64)
    # The sinusoid base is separable — the sin term varies only along x
    # and the cos term only along y — so each channel is a 1-D trig
    # evaluation broadcast into the plane: O(w + h) trig instead of
    # O(w * h), and no int64 mgrid planes. The broadcast add feeds each
    # output element exactly the operands the elementwise form used, in
    # the same order ((128 + s) + c), so pixels are BITWISE identical
    # to the original formulation (pinned by tests).
    u = np.arange(w, dtype=np.int64) / w  # resolution-normalized coords
    v = np.arange(h, dtype=np.int64) / h
    img = np.empty((h, w, 3), np.float64)
    for c in range(3):
        a, b, ph, fr = base[c * 4 : c * 4 + 4]
        su = 128 + 45 * np.sin((u * (3 + a % 5) + ph / 255.0) * 2 * np.pi)
        cv = 45 * np.cos((v * (3 + b % 5) + fr / 255.0) * 2 * np.pi)
        img[:, :, c] = su[None, :] + cv[:, None]
    # per-motif 8x8 block offsets: each block's luma mean moves by a
    # hash-derived ±(30..60), far from the global mean, so every aHash
    # bit is an independent coin flip per motif
    blk = np.frombuffer(hbytes(64, "imgblk", motif), np.uint8).astype(np.float64)
    grid = np.where(blk >= 128, 1.0, -1.0) * (30.0 + (blk % 128) / 127.0 * 30.0)
    grid = grid.reshape(8, 8)
    if motif != image_id:
        nflip = 1 + h64("nflip", image_id) % 3
        g = grid.flatten()
        for j in range(nflip):
            g[h64(f"flip{j}", image_id) % 64] *= -1.0  # flip ~1 aHash bit
        grid = g.reshape(8, 8)
        # byte-level dither: same-motif images differ everywhere in
        # pixel space while block means (the phash) barely move.
        # (x + y) % 2 checkerboard via broadcast of the 1-D ranges —
        # identical integers to the old mgrid form.
        checker = (np.arange(h, dtype=np.int64)[:, None]
                   + np.arange(w, dtype=np.int64)[None, :]) % 2
        img += (checker[..., None] - 0.5) * (
            2.0 * (1 + h64("dith", image_id) % 4)
        )
    img += np.kron(grid, np.ones((h // 8, w // 8)))[..., None]
    return np.clip(img, 0, 255).astype(np.uint8)

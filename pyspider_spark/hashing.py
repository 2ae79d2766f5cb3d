"""Deterministic hash helpers shared by the Spark engine and the oracle.

Everything derived from URLs (priorities, fetch outcomes, link fan-out,
image pixels) is a pure function of stable string hashes, so the Spark
job and the pure-Python oracle simulator compute identical values, and a
resumed run is byte-identical (SURVEY.md §7.3: no nondeterminism in
persisted data). blake2b is stdlib, fast, and stable across platforms —
unlike Python's built-in ``hash`` (randomized) or Spark's xxhash64
(JVM-only, not reproducible driver-side without a shim).
"""

from __future__ import annotations

from hashlib import blake2b


def h64(*parts: str) -> int:
    """Stable unsigned 64-bit hash of the joined parts."""
    d = blake2b("\x1f".join(parts).encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big")


def hbytes(n: int, *parts: str) -> bytes:
    """n deterministic bytes derived from parts (counter-mode blake2b)."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += blake2b(
            ("\x1f".join(parts) + f"#{i}").encode("utf-8"), digest_size=32
        ).digest()
        i += 1
    return bytes(out[:n])


def hid(*parts: str, length: int = 16) -> str:
    """Stable hex id (deterministic surrogate for the reference's
    ``random.sample`` id generator, reference utils/tools.py:50-51)."""
    return blake2b("\x1f".join(parts).encode("utf-8"), digest_size=16).hexdigest()[:length]

"""Auth/token helpers (U5 — reference app/security.py:17-34).

The reference issues HS256 JWTs (``jose.jwt.encode`` with ``{"exp",
"sub"}`` claims, 60-minute expiry) and verifies bcrypt password hashes
(``passlib`` CryptContext). Neither wheel exists in this environment,
and neither is needed: HS256 is hmac-sha256 over base64url segments
(stdlib), and PBKDF2-HMAC-SHA256 (``hashlib.pbkdf2_hmac``, stdlib) is
the standard KDF substitute for bcrypt at equivalent work factors.

Differences from the reference, on purpose:

- **No baked-in secret.** The reference hard-codes ``SECRET_KEY`` in
  source; here every call takes the key explicitly — a deployment
  injects it from its secret store.
- **Logical-tick expiry, not wall clock.** The engine is deterministic
  end-to-end (north rule: resume must replay byte-identically), so
  expiry is compared against a caller-supplied ``tick`` exactly like
  the serving cache's TTL (serve.py). A web deployment passes the
  current epoch seconds; tests pass logical ticks.
- **Explicit salt.** bcrypt embeds a random salt; random is banned
  here, so ``hash_password`` takes the salt (callers derive it
  deterministically, e.g. from the username) and ``verify_password``
  reads it back from the stored string, same shape as passlib's
  ``$``-separated modular crypt format.

All helpers are pure driver-side functions (no Spark) — the serving
layer (serve.py) is their consumer, mirroring the reference's FastAPI
dependency wiring.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json

ALGORITHM = "HS256"
ACCESS_TOKEN_EXPIRE_TICKS = 3600  # ≙ reference's 60 minutes, in seconds
PBKDF2_ITERATIONS = 200_000


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _b64url_decode(s: str) -> bytes:
    pad = "=" * (-len(s) % 4)
    return base64.urlsafe_b64decode(s + pad)


def _sign(signing_input: bytes, key: str) -> bytes:
    return hmac.new(key.encode("utf-8"), signing_input, hashlib.sha256).digest()


def create_access_token(
    subject: str,
    key: str,
    tick: int,
    expires_ticks: int = ACCESS_TOKEN_EXPIRE_TICKS,
) -> str:
    """HS256 JWT with the reference's claim shape ``{"exp", "sub"}``
    (app/security.py:17-27). ``tick`` is the issue time on the caller's
    logical clock; ``exp = tick + expires_ticks``."""
    header = {"alg": ALGORITHM, "typ": "JWT"}
    payload = {"exp": tick + expires_ticks, "sub": str(subject)}
    seg = lambda obj: _b64url(
        json.dumps(obj, separators=(",", ":"), sort_keys=True).encode("utf-8")
    )
    signing_input = f"{seg(header)}.{seg(payload)}".encode("ascii")
    return f"{signing_input.decode('ascii')}.{_b64url(_sign(signing_input, key))}"


def decode_access_token(token: str, key: str, tick: int) -> str | None:
    """Verify signature + expiry; return the subject, or None for any
    malformed/forged/expired token (the FastAPI dependency's 401 path)."""
    parts = token.split(".")
    if len(parts) != 3:
        return None
    try:
        signing_input = f"{parts[0]}.{parts[1]}".encode("ascii")
        expected = _sign(signing_input, key)
        if not hmac.compare_digest(expected, _b64url_decode(parts[2])):
            return None
        header = json.loads(_b64url_decode(parts[0]))
        if header.get("alg") != ALGORITHM:  # no alg-confusion downgrades
            return None
        payload = json.loads(_b64url_decode(parts[1]))
    except (ValueError, TypeError):
        return None
    exp = payload.get("exp")
    if not isinstance(exp, int) or tick >= exp:
        return None
    sub = payload.get("sub")
    return str(sub) if sub is not None else None


def hash_password(password: str, salt: str, iterations: int = PBKDF2_ITERATIONS) -> str:
    """PBKDF2-HMAC-SHA256 in a self-describing modular format
    (≙ passlib's bcrypt hash string, app/security.py:33-34)."""
    dk = hashlib.pbkdf2_hmac(
        "sha256", password.encode("utf-8"), salt.encode("utf-8"), iterations
    )
    return f"pbkdf2_sha256${iterations}${salt}${dk.hex()}"


def verify_password(plain_password: str, hashed_password: str) -> bool:
    """Constant-time check against a stored hash string
    (≙ CryptContext.verify, app/security.py:29-30)."""
    try:
        # the salt is caller-supplied and may itself contain '$'
        # (e.g. derived from a username): parse the two fixed fields
        # from the left, the digest from the right, salt = the middle
        scheme, iters, rest = hashed_password.split("$", 2)
        salt, hexdigest = rest.rsplit("$", 1)
        if scheme != "pbkdf2_sha256":
            return False
        recomputed = hash_password(plain_password, salt, int(iters))
    except (ValueError, TypeError):
        return False
    return hmac.compare_digest(recomputed, hashed_password)

"""U5 auth helpers (reference app/security.py:17-34): HS256 token
create/verify with logical-tick expiry, PBKDF2 password hashing.
Pure driver-side functions — no Spark fixture."""

from __future__ import annotations

import base64
import json

from pyspider_spark import auth

KEY = "test-signing-key"


def _payload(token: str) -> dict:
    seg = token.split(".")[1]
    return json.loads(base64.urlsafe_b64decode(seg + "=" * (-len(seg) % 4)))


def test_token_roundtrip_and_claim_shape():
    tok = auth.create_access_token("user-7", KEY, tick=1000)
    assert auth.decode_access_token(tok, KEY, tick=1000) == "user-7"
    # the reference's exact claim set: {"exp", "sub"} (security.py:24)
    assert set(_payload(tok)) == {"exp", "sub"}
    assert _payload(tok)["exp"] == 1000 + auth.ACCESS_TOKEN_EXPIRE_TICKS


def test_token_expiry_is_logical_tick():
    tok = auth.create_access_token("u", KEY, tick=0, expires_ticks=60)
    assert auth.decode_access_token(tok, KEY, tick=59) == "u"
    assert auth.decode_access_token(tok, KEY, tick=60) is None  # exp inclusive
    assert auth.decode_access_token(tok, KEY, tick=10**9) is None


def test_token_rejects_forgery_and_garbage():
    tok = auth.create_access_token("u", KEY, tick=0)
    assert auth.decode_access_token(tok, "wrong-key", tick=0) is None
    h, p, s = tok.split(".")
    # payload tamper (re-signed payload under a different key fails too)
    forged_payload = base64.urlsafe_b64encode(
        json.dumps({"exp": 10**9, "sub": "admin"}).encode()
    ).rstrip(b"=").decode()
    assert auth.decode_access_token(f"{h}.{forged_payload}.{s}", KEY, 0) is None
    # alg-confusion: header downgraded to 'none' must not verify
    none_header = base64.urlsafe_b64encode(
        json.dumps({"alg": "none", "typ": "JWT"}).encode()
    ).rstrip(b"=").decode()
    assert auth.decode_access_token(f"{none_header}.{p}.{s}", KEY, 0) is None
    for junk in ("", "a.b", "a.b.c", tok + "x", "..", "\x00", "é.ü.ß"):
        assert auth.decode_access_token(junk, KEY, tick=0) is None


def test_token_deterministic():
    a = auth.create_access_token("u", KEY, tick=42)
    b = auth.create_access_token("u", KEY, tick=42)
    assert a == b  # resume-replay safe: no wall clock, no randomness


def test_password_hash_roundtrip():
    h = auth.hash_password("hunter2", salt="user-7", iterations=1000)
    assert h.startswith("pbkdf2_sha256$1000$user-7$")
    assert auth.verify_password("hunter2", h)
    assert not auth.verify_password("hunter3", h)
    assert not auth.verify_password("hunter2", h.replace("user-7", "user-8"))
    assert not auth.verify_password("hunter2", "not-a-hash")
    assert not auth.verify_password("hunter2", "md5$1$x$deadbeef")


def test_verify_password_salt_with_dollar():
    """The salt is caller-supplied (docstring: derive from username) —
    a '$' inside it must not break the modular-format parse."""
    from pyspider_spark.auth import hash_password, verify_password

    stored = hash_password("pw", "a$b$c")
    assert verify_password("pw", stored)
    assert not verify_password("wrong", stored)

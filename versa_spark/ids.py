"""Deterministic resource-ID kernel (MurmurHash3-based Versa hash convention).

Reproduces, byte-for-byte, the ID scheme of the reference engine:

* ``simple_hashstring``: MurmurHash3 x64-128 first half, big-endian packed,
  base64url, ``=`` stripped → 11-char ID (reference:
  /root/reference/tools/py/contrib/datachefids.py:35-55).
* ``resource_id``: append ``(VTYPE_REL, etype)`` if absent, sort pairs,
  canonical compact JSON, hash (reference:
  /root/reference/tools/py/pipeline/main.py:93-132).

The MurmurHash3 x64-128 implementation below is written from Austin
Appleby's public-domain algorithm specification (MurmurHash3.cpp /
smhasher); it is NOT Spark's ``hash()``/``xxhash64`` and must not be
replaced with them — ID parity with the reference depends on it.

Golden values (from the reference docstrings/tests):
  simple_hashstring("The quick brown fox jumps over the lazy dog")
      == 'bBsHvHu8S-M'            (64-bit; datachefids.py:41-42)
      == 'B7x7vEvj'               (48-bit; datachefids.py:43-44)
  FROM_EMPTY_64BIT_HASH == 'AAAAAAAAAAA'   (datachefids.py:92,116-117)
  resource_id('http://schema.org/Person',
      [('http://schema.org/name', 'Jonathan Bruce Postel'),
       ('http://schema.org/birthDate', '1943-08-06')]) == '-7hP9d_Xo8M'
                                   (pipeline/main.py:107-109)
"""

from __future__ import annotations

import base64
import json
import re
import struct
import unicodedata

from versa_spark import VTYPE_REL
from versa_spark.iri import is_absolute

_MASK64 = 0xFFFFFFFFFFFFFFFF
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def mmh3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64-128 → (h1, h2) as unsigned 64-bit ints."""
    length = len(data)
    nblocks = length // 16
    h1 = h2 = seed & _MASK64

    for i in range(nblocks):
        off = i * 16
        k1 = int.from_bytes(data[off:off + 8], "little")
        k2 = int.from_bytes(data[off + 8:off + 16], "little")

        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64

        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64

    tail = data[nblocks * 16:]
    tl = len(tail)
    if tl > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if tl > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def hash64(obj: str, seed: int = 0) -> tuple[int, int]:
    """Signed 64-bit halves of MurmurHash3 x64-128 of the UTF-8 text
    (same contract as the ``mmh3`` package's ``hash64``)."""
    h1, h2 = mmh3_x64_128(str(obj).encode("utf-8"), seed)
    if h1 >= 1 << 63:
        h1 -= 1 << 64
    if h2 >= 1 << 63:
        h2 -= 1 << 64
    return h1, h2


FROM_EMPTY_64BIT_HASH = "AAAAAAAAAAA"


def simple_hashstring(obj, bits: int = 64) -> str:
    """Short string hash per the Versa ID convention (see module docstring)."""
    basis = hash64(str(obj))[0] >> (64 - bits)
    raw = struct.pack("!q", basis)
    if bits != 64:
        raw = raw[: -int((64 - bits) / 8)]
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def _expand(term: str, vocabbase) -> str:
    if vocabbase and not is_absolute(term):
        if callable(vocabbase):
            return vocabbase(term)
        return str(vocabbase) + term
    return term


def fingerprint_plaintext(etype: str, fprint, vocabbase=None) -> str:
    """Canonical JSON plaintext hashed to form a resource ID
    (reference: pipeline/main.py:117-127).

    Values are JSON-encoded RAW, exactly like the reference (its
    json.dumps of the pair list): ints render unquoted, lists as arrays —
    no str() pre-coercion, so IDs stay byte-for-byte parity for
    non-string fingerprint values too.  The sort is over the raw pairs
    (mixed-type values that Python can't order raise TypeError, same as
    the reference)."""
    pairs = []
    for k, v in fprint or []:
        pairs.append((_expand(k, vocabbase), v))
    etype = _expand(etype, vocabbase)
    if (VTYPE_REL, etype) not in pairs:
        pairs.append((str(VTYPE_REL), etype))
    pairs.sort()
    return json.dumps(pairs, separators=(",", ":"))


def resource_id(etype: str, fprint=None, vocabbase=None, fallback_key=None) -> str:
    """Canonical 11-char entity ID from a type IRI + fingerprint pairs.

    When *fprint* is empty the reference draws a non-deterministic
    counter-based hash (pipeline/main.py:129-131) — unusable on a
    distributed engine.  Here an empty fingerprint instead hashes a
    deterministic provenance key (*fallback_key*), a documented divergence
    (SURVEY.md §7 risks).
    """
    fprint = [(k, v) for (k, v) in (fprint or []) if k is not None and v is not None]
    if not fprint:
        if fallback_key is None:
            raise ValueError(
                "empty fingerprint requires a deterministic fallback_key")
        plaintext = json.dumps(
            [[str(VTYPE_REL), _expand(etype, vocabbase)],
             ["@versa-spark/provenance", str(fallback_key)]],
            separators=(",", ":"))
        return simple_hashstring(plaintext)
    return simple_hashstring(fingerprint_plaintext(etype, fprint, vocabbase))


# --- slug helpers (reference: datachefids.py:58-89; standard public
# slugification recipes) ---------------------------------------------------

_OMIT_FROM_SLUG_PAT = re.compile(r"[^a-zA-Z0-9\-\_]")
_NORMALIZE_UNDERSCORES_PAT = re.compile(r"__+")
_SLUG_CHANGEME_RE = re.compile(r"[^\w\-_]")


def create_slug(title: str, plain_len: int | None = None) -> str:
    if plain_len:
        title = title[:plain_len]
    pass1 = _OMIT_FROM_SLUG_PAT.sub("_", title).lower()
    return _NORMALIZE_UNDERSCORES_PAT.sub("_", pass1)


def slugify(value: str, hyphenate: bool = True, lower: bool = True) -> str:
    value = unicodedata.normalize("NFKD", value).strip()
    if lower:
        value = value.lower()
    return _SLUG_CHANGEME_RE.sub("-" if hyphenate else "", value)

"""Vectorized resource-ID kernel: MurmurHash3 x64-128 over numpy arrays.

The per-row Python implementation (versa_spark.ids) is the semantic oracle;
this module computes the identical 11-char IDs for whole Arrow batches with
numpy uint64 arithmetic — the "no per-row Python" requirement of
BASELINE.json's input_hint.  Algorithm from Austin Appleby's public-domain
MurmurHash3 spec (same as versa_spark.ids — byte-for-byte ID parity with the
reference's mmh3-based convention, datachefids.py:35-55).

Vectorization strategy: strings → zero-padded byte matrix (n, ceil(L/16)*16)
viewed as little-endian uint64 lanes; the 16-byte block loop runs over
*columns* (few iterations) fully vectorized over rows, with per-row masks
for rows whose block count is smaller; the tail path falls out naturally
from zero padding (int-from-bytes of the zero-padded tail equals the
reference's partial read).
"""

from __future__ import annotations

import base64

import numpy as np

_M = np.uint64(0xFFFFFFFFFFFFFFFF)  # implicit via uint64 wraparound
_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_FIVE = np.uint64(5)
_N1 = np.uint64(0x52DCE729)
_N2 = np.uint64(0x38495AB5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(k: np.ndarray) -> np.ndarray:
    k ^= k >> np.uint64(33)
    k *= _F1
    k ^= k >> np.uint64(33)
    k *= _F2
    k ^= k >> np.uint64(33)
    return k


def mmh3_x64_128_batch(strings) -> tuple[np.ndarray, np.ndarray]:
    """MurmurHash3 x64-128 of each UTF-8 string → (h1, h2) uint64 arrays."""
    datas = [(s.encode("utf-8") if s is not None else b"") for s in strings]
    n = len(datas)
    lengths = np.fromiter((len(d) for d in datas), dtype=np.int64, count=n)
    maxlen = int(lengths.max()) if n else 0
    width = ((maxlen + 15) // 16) * 16 or 16
    buf = np.zeros((n, width), dtype=np.uint8)
    for i, d in enumerate(datas):
        if d:
            buf[i, :len(d)] = np.frombuffer(d, dtype=np.uint8)
    lanes = buf.view("<u8").reshape(n, width // 8)

    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    nblocks = lengths // 16

    old = np.seterr(over="ignore")
    try:
        for b in range(width // 16):
            active = nblocks > b
            if not active.any():
                break
            k1 = lanes[:, 2 * b].copy()
            k2 = lanes[:, 2 * b + 1].copy()
            k1 *= _C1
            k1 = _rotl(k1, 31)
            k1 *= _C2
            nh1 = h1 ^ k1
            nh1 = _rotl(nh1, 27)
            nh1 += h2
            nh1 = nh1 * _FIVE + _N1
            k2 *= _C2
            k2 = _rotl(k2, 33)
            k2 *= _C1
            nh2 = h2 ^ k2
            nh2 = _rotl(nh2, 31)
            nh2 += nh1
            nh2 = nh2 * _FIVE + _N2
            h1 = np.where(active, nh1, h1)
            h2 = np.where(active, nh2, h2)

        # tail: remaining 1..15 bytes; zero padding reproduces the
        # reference's int.from_bytes over just the tail bytes
        tail_off = nblocks * 2
        tl = lengths % 16
        rows = np.arange(n)
        t1 = lanes[rows, np.minimum(tail_off, width // 8 - 1)]
        t2_ix = np.minimum(tail_off + 1, width // 8 - 1)
        t2 = lanes[rows, t2_ix]

        m2 = tl > 8
        k2 = np.where(m2, t2, np.uint64(0))
        k2 *= _C2
        k2 = _rotl(k2, 33)
        k2 *= _C1
        h2 = np.where(m2, h2 ^ k2, h2)

        m1 = tl > 0
        k1 = np.where(m1, t1, np.uint64(0))
        k1 *= _C1
        k1 = _rotl(k1, 31)
        k1 *= _C2
        h1 = np.where(m1, h1 ^ k1, h1)

        ulen = lengths.astype(np.uint64)
        h1 ^= ulen
        h2 ^= ulen
        h1 += h2
        h2 += h1
        h1 = _fmix(h1)
        h2 = _fmix(h2)
        h1 += h2
        h2 += h1
    finally:
        np.seterr(**old)
    return h1, h2


def simple_hashstring_batch(strings) -> list[str]:
    """Vectorized Versa 11-char ID: first 64-bit half, big-endian packed,
    base64url, '=' stripped (parity with versa_spark.ids.simple_hashstring
    and reference datachefids.py:35-55)."""
    h1, _ = mmh3_x64_128_batch(strings)
    be = h1.astype(">u8").tobytes()
    return [base64.urlsafe_b64encode(be[i * 8:(i + 1) * 8])[:11].decode("ascii")
            for i in range(len(strings))]


def resource_id_series(plaintexts):
    """pandas Series of fingerprint plaintexts → Series of 11-char IDs.

    The plaintext is the canonical JSON built JVM-side (see
    versa_spark.kg.linking.fingerprint_plaintext_col); this kernel only
    hashes + encodes.  Null plaintexts (rows that don't need an ID, e.g.
    dictionary hits in entity linking) are skipped entirely — the common
    case pays nothing."""
    import pandas as pd
    s = plaintexts if isinstance(plaintexts, pd.Series) else pd.Series(
        list(plaintexts))
    mask = s.notna()
    if not mask.any():
        return pd.Series([None] * len(s), index=s.index, dtype=object)
    out = pd.Series([None] * len(s), index=s.index, dtype=object)
    out[mask] = simple_hashstring_batch(s[mask].tolist())
    return out

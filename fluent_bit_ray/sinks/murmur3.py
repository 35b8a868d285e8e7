"""MurmurHash3 x64_128 — public-domain algorithm (Austin Appleby).

Used by the es sink's Generate_ID (reference plugins/out_es/es.c:488-489
hashes the serialized record with seed 42 to synthesize a stable
document ``_id``). Pure-python implementation of the published
algorithm; only called per-record at format time, never in the hot
parse path.
"""

from __future__ import annotations

_M = (1 << 64) - 1
C1 = 0x87C37B91114253D5
C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 42) -> tuple[int, int]:
    h1 = h2 = seed & _M
    length = len(data)
    nblocks = length // 16

    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16:i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8:i * 16 + 16], "little")

        k1 = (k1 * C1) & _M
        k1 = _rotl64(k1, 31)
        k1 = (k1 * C2) & _M
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M

        k2 = (k2 * C2) & _M
        k2 = _rotl64(k2, 33)
        k2 = (k2 * C1) & _M
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M

    tail = data[nblocks * 16:]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * C2) & _M
        k2 = _rotl64(k2, 33)
        k2 = (k2 * C1) & _M
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * C1) & _M
        k1 = _rotl64(k1, 31)
        k1 = (k1 * C2) & _M
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def murmur3_id(data: bytes, seed: int = 42) -> str:
    """Hex _id string the way the es sink renders the 128-bit hash."""
    h1, h2 = murmur3_x64_128(data, seed)
    return f"{h1:016x}{h2:016x}"

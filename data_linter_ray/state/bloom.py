"""Bloom filter (Bloom, "Space/time trade-offs in hash coding with
allowable errors", CACM 1970) — vectorized, mergeable (bitwise OR),
serializable.

Role in the engine: EXACT-semantics referential pre-filtering at
dimension sizes where the exact broadcast key set no longer fits. A
Bloom filter never yields false negatives, so a foreign key that is
"definitely not in the set" is a CERTAIN violation; only the (maybe)
survivors — true matches plus an ``fpr`` sliver of false positives —
need the exact anti-join. The shuffle that remains is ``fpr`` × the
violation-free volume instead of the whole fact table.

Hashing uses Kirsch–Mitzenmacher double hashing (g_i = h1 + i·h2): the
``k`` probe positions derive from ONE 64-bit input hash with two
mixes, asymptotically as good as k independent hashes.
"""

from __future__ import annotations

import math

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix(z: np.ndarray) -> np.ndarray:
    z = (z + _MIX) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


class BloomFilter:
    """Fixed-size bit-array Bloom filter over 64-bit input hashes."""

    def __init__(self, n_bits: int, k: int):
        if n_bits < 8 or k < 1:
            raise ValueError("n_bits must be ≥ 8 and k ≥ 1")
        self.m = int(n_bits)
        self.k = int(k)
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    @classmethod
    def from_capacity(cls, n: int, fpr: float = 0.01) -> "BloomFilter":
        """Size for ``n`` expected keys at false-positive rate ``fpr``
        (standard m = -n·ln p / ln²2, k = m/n·ln 2)."""
        n = max(1, int(n))
        m = max(8, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
        k = max(1, int(round(m / n * math.log(2))))
        return cls(m, k)

    def _positions(self, h: np.ndarray, i: int) -> np.ndarray:
        h1 = h & _MASK
        h2 = _mix(h) | np.uint64(1)
        return ((h1 + np.uint64(i) * h2) % np.uint64(self.m)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64, copy=False)
        for i in range(self.k):
            pos = self._positions(h, i)
            np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """→ bool[n]: True = maybe present, False = DEFINITELY absent."""
        h = h.astype(np.uint64, copy=False)
        out = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            pos = self._positions(h, i)
            out &= (self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot merge blooms of different geometry")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        import struct

        return struct.pack("<qq", self.m, self.k) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        import struct

        m, k = struct.unpack("<qq", b[:16])
        bf = cls(m, k)
        bf.bits = np.frombuffer(b[16:], dtype=np.uint8).copy()
        return bf

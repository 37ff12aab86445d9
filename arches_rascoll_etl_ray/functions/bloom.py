"""Vectorized Bloom filter for large broadcast key sets.

An exact broadcast int64 key array stops scaling around 10^8–10^9 keys
(8 GB+ shipped to every worker); a Bloom filter at 1% fpr is ~1.2 bytes/key
— 10^10 keys fit in ~12 GB of bits, or ~1.5 GB at 10%. Used as the key-set
representation behind anti-joins: a "definitely not in set" answer is exact
(keep the row), a "maybe" answer is resolved by an exact distributed
semi-join over the (small) maybe-set — so results stay exact at any scale.

Standard construction (Bloom '70, public algorithm): k probe positions per
key via double hashing h_i = h1 + i*h2 (Kirsch–Mitzenmatcher), all numpy.
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def mix64(values: np.ndarray) -> np.ndarray:
    """splitmix64-style finalizer: turns (possibly sequential) int64 keys
    into well-distributed uint64 hashes for the probe family."""
    x = values.astype(np.uint64, copy=False) + _MIX
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _h2(h: np.ndarray) -> np.ndarray:
    """Second hash derived from the first: xorshift-multiply mix, forced odd
    so probe strides cycle the whole table."""
    x = h ^ (h >> np.uint64(33))
    x = x * _MIX
    x = x ^ (x >> np.uint64(29))
    return x | np.uint64(1)


class BloomFilter:
    """Fixed-size bit array + k double-hashed probes, all vectorized."""

    def __init__(self, num_bits: int, num_hashes: int):
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.bits = np.zeros((self.num_bits + 63) // 64, dtype=np.uint64)

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01) -> "BloomFilter":
        n = max(1, n)
        m = int(np.ceil(-n * np.log(fpr) / (np.log(2) ** 2)))
        k = max(1, int(round(m / n * np.log(2))))
        return cls(m, k)

    def _positions(self, hashes: np.ndarray, i: int) -> np.ndarray:
        h1 = hashes.astype(np.uint64, copy=False)
        return (h1 + np.uint64(i) * _h2(h1)) % np.uint64(self.num_bits)

    def add_many(self, hashes: np.ndarray) -> None:
        for i in range(self.num_hashes):
            pos = self._positions(hashes, i)
            word = (pos >> np.uint64(6)).astype(np.int64)
            bit = np.uint64(1) << (pos & np.uint64(63))
            np.bitwise_or.at(self.bits, word, bit)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean array: False ⇒ definitely absent; True ⇒ maybe present."""
        out = np.ones(len(hashes), dtype=bool)
        for i in range(self.num_hashes):
            pos = self._positions(hashes, i)
            word = (pos >> np.uint64(6)).astype(np.int64)
            bit = np.uint64(1) << (pos & np.uint64(63))
            out &= (self.bits[word] & bit) != 0
            if not out.any():
                break
        return out

    def nbytes(self) -> int:
        return self.bits.nbytes

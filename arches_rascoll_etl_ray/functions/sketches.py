"""Mergeable sketches for near-duplicate detection: MinHash, SimHash.

Public algorithms (Broder '97 resemblance / MinHash+LSH banding as in
Leskovec-Rajaraman-Ullman ch.3; Charikar '02 SimHash). All vectorized numpy,
seeded, process-stable.
"""

from __future__ import annotations

import numpy as np

MERSENNE61 = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    flat_hashes: np.ndarray, offsets: np.ndarray, num_perm: int = 128, seed: int = 1
) -> np.ndarray:
    """(num_docs, num_perm) uint64 MinHash signatures from ragged shingle
    hashes (see text.word_ngrams_hashes). Vectorized: one reduceat per
    permutation over the flat array."""
    a, b = _perm_params(num_perm, seed)
    n_docs = len(offsets) - 1
    sig = np.empty((n_docs, num_perm), dtype=np.uint64)
    h = flat_hashes & MERSENNE61  # keep products in range
    starts = offsets[:-1]
    empty = offsets[:-1] == offsets[1:]
    safe_starts = np.where(empty, 0, starts)
    for p in range(num_perm):
        # universal hash family (a*h + b) mod 2^61-1 — wraparound in uint64
        # is fine for *consistency*; we only need a deterministic family
        transformed = a[p] * h + b[p]
        mins = np.minimum.reduceat(transformed, safe_starts) if len(h) else np.empty(0, np.uint64)
        sig[:, p] = np.where(empty, np.uint64(0), mins)
    return sig


def lsh_band_hashes(sig: np.ndarray, num_bands: int = 32) -> np.ndarray:
    """(num_docs, num_bands) band bucket hashes: docs sharing any
    (band_id, band_hash) are near-dup candidates. r = num_perm/num_bands."""
    n_docs, num_perm = sig.shape
    assert num_perm % num_bands == 0
    r = num_perm // num_bands
    out = np.empty((n_docs, num_bands), dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    for band in range(num_bands):
        chunk = sig[:, band * r : (band + 1) * r]
        acc = np.full(n_docs, np.uint64(band + 1))
        for j in range(r):
            acc = (acc ^ chunk[:, j]) * mult
        out[:, band] = acc
    return out


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def simhash64(flat_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc from ragged feature hashes: sign-sum of bits.
    Near-dup docs differ in few bits (hamming distance)."""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(flat_hashes) == 0:
        return out
    bits = ((flat_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    contrib = bits * 2 - 1  # ±1
    empty = offsets[:-1] == offsets[1:]
    # safe starts (same guard as minhash_signatures): a trailing empty doc
    # would put an index == len(flat_hashes) into reduceat → IndexError
    safe_starts = np.where(empty, 0, offsets[:-1])
    sums = np.add.reduceat(contrib, safe_starts, axis=0)
    sig_bits = (sums > 0).astype(np.uint64)
    vals = (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    vals[empty] = 0
    return vals


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # vectorized popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


class UnionFind:
    """Driver-side union-find for clustering verified candidate pairs.
    Used only when the candidate set is provably small (post-LSH); the scale
    path is iterative min-label propagation via groupby."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo

    def roots(self) -> dict:
        return {x: self.find(x) for x in list(self.parent)}


def hll_sketch(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """HyperLogLog registers (Flajolet et al. '07, public algorithm) from
    64-bit hashes: register index = top p bits, value = 1 + leading zeros
    of the rest. Mergeable via elementwise max."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)) | np.uint64((1 << p) - 1)  # low bits set → bounded rho
    # leading zero count of `rest` via float trick would lose precision; use
    # bit_length: rho = 64 - p - floor(log2(rest_without_low))... simpler loop-free:
    rho = np.zeros(len(hashes), dtype=np.uint8)
    shifted = rest.copy()
    mask = np.ones(len(hashes), dtype=bool)
    for r in range(1, 64 - p + 2):
        top = (shifted >> np.uint64(63)) & np.uint64(1)
        newly = mask & (top == 1)
        rho[newly] = r
        mask &= top == 0
        if not mask.any():
            break
        shifted = shifted << np.uint64(1)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)

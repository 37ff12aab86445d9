"""Numeric helpers shared by the oracled fixed-point operators."""

from __future__ import annotations

import numpy as np


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Round half away from zero — DuckDB ROUND's semantics. np.round is
    half-to-EVEN, which diverges on exact *.5 values; the measured-margin
    ops (pagerank/ppl/hybrid cosine) round continuous quantities where the
    convention must match the SQL twin bit-for-bit even at the boundary."""
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))

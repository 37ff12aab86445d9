"""Bloom filter correctness/fpr + bloom-mode anti-join equivalence."""

import numpy as np
import pandas as pd

from arches_rascoll_etl_ray.functions.bloom import BloomFilter, mix64
from tests.conftest import SF_SMOKE


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(0)
    members = rng.integers(0, 2**62, size=100_000).astype(np.int64)
    bf = BloomFilter.for_capacity(len(members), fpr=0.01)
    bf.add_many(mix64(members))
    assert bf.contains_many(mix64(members)).all(), "false negative — never allowed"


def test_bloom_false_positive_rate():
    rng = np.random.default_rng(1)
    members = rng.integers(0, 2**62, size=200_000).astype(np.int64)
    others = rng.integers(0, 2**62, size=200_000).astype(np.int64)
    others = np.setdiff1d(others, members)
    bf = BloomFilter.for_capacity(len(members), fpr=0.01)
    bf.add_many(mix64(members))
    fpr = bf.contains_many(mix64(others)).mean()
    assert fpr <= 0.02, f"empirical fpr {fpr} > 2x the 1% design point"
    # sanity: the filter actually prunes (not degenerate all-true)
    assert fpr < 0.5


def test_bloom_sequential_keys_distribute():
    """Sequential ids (the common key shape) must not blow up fpr — the
    mix64 pre-hash is what guarantees this."""
    members = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    others = np.arange(5_000_000, 5_100_000, dtype=np.int64)
    bf = BloomFilter.for_capacity(len(members), fpr=0.01)
    bf.add_many(mix64(members))
    assert bf.contains_many(mix64(members)).all()
    assert bf.contains_many(mix64(others)).mean() <= 0.02


def test_anti_join_bloom_mode_matches_exact(monkeypatch):
    from arches_rascoll_etl_ray.pipelines.relational import q_anti_join

    def run():
        df = q_anti_join(SF_SMOKE).to_pandas()
        return df.sort_values("c_nationkey").reset_index(drop=True)

    exact = run()
    monkeypatch.setenv("ARER_ANTI_EXACT_LIMIT", "0")  # force the bloom path
    bloom = run()
    pd.testing.assert_frame_equal(exact, bloom, check_dtype=False)


def test_region_revenue_shuffle_mode_matches_broadcast(monkeypatch):
    """The dim-size broadcast→shuffle auto-switch must not change results."""
    from arches_rascoll_etl_ray.pipelines.relational import q_region_revenue

    def run():
        df = q_region_revenue(SF_SMOKE).to_pandas()
        return df.sort_values("r_name").reset_index(drop=True)

    broadcast = run()
    monkeypatch.setenv("ARER_BROADCAST_DIM_LIMIT", "0")  # force shuffle join
    shuffled = run()
    pd.testing.assert_frame_equal(broadcast, shuffled, check_dtype=False)

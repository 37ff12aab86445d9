"""shard_join + connected-components behavior pins.

shard_join replaces Ray 2.49's native Dataset.join, which (reproduced in
this env) crashes with ArrowInvalid when a hash partition receives zero rows
from one side and deadlocks when two hash-shuffle operators share one plan.
These tests pin the replacement's semantics, including the sparse-partition
cases the native operator fails on.
"""

import numpy as np
import pandas as pd
import ray.data

from arches_rascoll_etl_ray.pipelines.graph import attach_cluster_ids, connected_component_labels
from arches_rascoll_etl_ray.stages.shard_join import shard_join


def _left():
    return ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "x": [10, 20, 30, 40]}))


def _right():
    return ray.data.from_pandas(pd.DataFrame({"rid": [2, 3, 5], "t": ["b", "c", "e"]}))


def test_inner_join():
    out = shard_join(
        _left(), _right(), on="k", right_on="rid",
        left_cols=["k", "x"], right_cols=["rid", "t"], how="inner", num_shards=8,
    ).to_pandas().sort_values("k")
    assert list(out["k"].astype(int)) == [2, 3]
    assert list(out["t"]) == ["b", "c"]
    assert "rid" not in out.columns


def test_left_join_fills_nulls():
    out = shard_join(
        _left(), _right(), on="k", right_on="rid",
        left_cols=["k", "x"], right_cols=["rid", "t"], how="left", num_shards=8,
    ).to_pandas().sort_values("k")
    assert len(out) == 4
    assert out[out["k"] == 1]["t"].isna().all()


def test_semi_join():
    out = shard_join(
        _left(), _right(), on="k", right_on="rid",
        left_cols=["k", "x"], right_cols=["rid"], how="semi", num_shards=8,
    ).to_pandas().sort_values("k")
    assert list(out["k"].astype(int)) == [2, 3]
    assert list(out.columns) == ["k", "x"]


def test_sparse_partitions_and_skew():
    """Many shards, few keys — most shards see rows from only one side or
    none (the case that crashes the native join operator)."""
    left = ray.data.from_pandas(pd.DataFrame({"k": [100], "x": [1]}))
    right = ray.data.from_pandas(pd.DataFrame({"rid": [100, 999], "t": ["hit", "miss"]}))
    out = shard_join(
        left, right, on="k", right_on="rid",
        left_cols=["k", "x"], right_cols=["rid", "t"], how="inner", num_shards=64,
    ).to_pandas()
    assert len(out) == 1 and out.iloc[0]["t"] == "hit"


def test_duplicate_keys_cross_product():
    left = ray.data.from_pandas(pd.DataFrame({"k": [7, 7], "x": [1, 2]}))
    right = ray.data.from_pandas(pd.DataFrame({"rid": [7, 7], "t": ["a", "b"]}))
    out = shard_join(
        left, right, on="k", right_on="rid",
        left_cols=["k", "x"], right_cols=["rid", "t"], how="inner", num_shards=4,
    ).to_pandas()
    assert len(out) == 4  # 2×2


def test_connected_components_chain_and_star():
    # chain 1-2-3-4, star 10-{11,12}, isolated pair 20-21
    edges = ray.data.from_pandas(
        pd.DataFrame({"a": [1, 2, 3, 10, 10, 20], "b": [2, 3, 4, 11, 12, 21]})
    )
    labels = connected_component_labels(edges, num_partitions=8)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_attach_cluster_ids_singletons():
    edges = ray.data.from_pandas(pd.DataFrame({"a": [1], "b": [2]}))
    labels = connected_component_labels(edges, num_partitions=4)
    ids = ray.data.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3, 99]}))
    out = attach_cluster_ids(ids, "doc_id", labels, num_partitions=4).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 3, 99: 99}


def test_cc_empty_edges():
    edges = ray.data.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}))
    labels = connected_component_labels(edges)
    assert labels.count() == 0
    ids = ray.data.from_pandas(pd.DataFrame({"doc_id": [5, 6]}))
    out = attach_cluster_ids(ids, "doc_id", labels).to_pandas()
    assert dict(zip(out["doc_id"], out["cluster_id"])) == {5: 5, 6: 6}


def test_cc_distributed_path_matches_driver_path():
    """The edge-count gate must not change results: force the iterative
    distributed propagation (limit=0) and compare to the driver labeler."""
    edges = ray.data.from_pandas(
        pd.DataFrame({"a": [1, 2, 3, 10, 10, 20, 30], "b": [2, 3, 4, 11, 12, 21, 31]})
    )
    fast = {r["node"]: r["label"] for r in connected_component_labels(edges).take_all()}
    dist = {
        r["node"]: r["label"]
        for r in connected_component_labels(edges, driver_edge_limit=0).take_all()
    }
    assert fast == dist and fast[4] == 1 and fast[12] == 10


def test_left_join_int64_exact_above_2_53():
    """Regression: non-key int columns must survive the shuffle's schema
    union without a float64 round-trip (ids above 2^53 were silently
    corrupted before the nullable-Int64 tagging)."""
    big = (1 << 60) + 1
    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))
    right = ray.data.from_pandas(
        pd.DataFrame({"rid": [1, 3], "label": np.array([big, big + 2], dtype=np.int64)})
    )
    out = shard_join(
        left, right, on="k", right_on="rid",
        left_cols=["k"], right_cols=["rid", "label"], how="left", num_shards=4,
    ).to_pandas().sort_values("k")
    vals = [None if pd.isna(v) else int(v) for v in out["label"]]
    assert vals == [big, None, big + 2]


def test_attach_cluster_ids_shard_path_big_ids(monkeypatch):
    """The >limit shard-join attach path must be exact for ids above 2^53
    (the float64 null-promotion corrupted them before)."""
    big = (1 << 60) + 1
    edges = ray.data.from_pandas(
        pd.DataFrame({"a": [big], "b": [big + 2]})
    )
    labels = connected_component_labels(edges, num_partitions=4)
    ids = ray.data.from_pandas(pd.DataFrame({"doc_id": [big, big + 2, big + 4]}))
    monkeypatch.setenv("ARER_CC_DRIVER_LIMIT", "0")
    out = attach_cluster_ids(ids, "doc_id", labels, num_partitions=4).to_pandas()
    got = {int(k): int(v) for k, v in zip(out["doc_id"], out["cluster_id"])}
    assert got == {big: big, big + 2: big, big + 4: big + 4}


def test_cc_raises_when_unconverged():
    """Exhausting max_iters without a fixed point must raise, not silently
    return partial labels (a chain of length 6 needs >1 propagation round)."""
    import pytest

    edges = ray.data.from_pandas(
        pd.DataFrame({"a": [1, 2, 3, 4, 5], "b": [2, 3, 4, 5, 6]})
    )
    with pytest.raises(RuntimeError, match="no fixed point"):
        connected_component_labels(edges, driver_edge_limit=0, max_iters=1)


def test_shard_join_string_keys():
    """key_type='str': shard by SipHash of the string, join on the string
    itself (collision-safe equality); inner/left/semi/anti all exact."""
    left = ray.data.from_pandas(
        pd.DataFrame({"tok": ["apple", "banana", "cherry", "apple"], "n": [1, 2, 3, 4]})
    )
    right = ray.data.from_pandas(
        pd.DataFrame({"tok": ["apple", "cherry", "durian"], "df": [10, 30, 99]})
    )
    inner = shard_join(
        left, right, on="tok", right_on="tok",
        left_cols=["tok", "n"], right_cols=["tok", "df"],
        how="inner", num_shards=4, key_type="str",
    ).to_pandas().sort_values(["tok", "n"]).reset_index(drop=True)
    assert inner["tok"].tolist() == ["apple", "apple", "cherry"]
    assert [int(v) for v in inner["df"]] == [10, 10, 30]
    anti = shard_join(
        left, right, on="tok", right_on="tok",
        left_cols=["tok", "n"], right_cols=["tok"],
        how="anti", num_shards=4, key_type="str",
    ).to_pandas()
    assert anti["tok"].tolist() == ["banana"]

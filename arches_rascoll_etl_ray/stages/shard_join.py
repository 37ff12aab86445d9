"""Hash-partitioned equi-joins composed from union + shard groupby + a
vectorized per-shard pandas merge.

Why not ``Dataset.join``: Ray 2.49's hash-join operator (a) crashes with
``ArrowInvalid: No match ... FieldRef`` whenever a hash partition receives
zero rows from one side (the partition builder emits a zero-column table
into acero), and (b) deadlocks the streaming executor when two hash-shuffle
operators (join/join or join/hash-aggregate) share one plan — both
reproduced in this repo's test env (tests/test_shard_join.py pins the
working behavior of this replacement). The composition below uses only the
battle-tested sort-shuffle groupby path.

Shape: both sides are tagged and unioned, a constant-count `_shard` column
hash-partitions by key, and ONE pandas merge per shard joins vectorized —
never a per-key map_groups (the known Ray perf trap at high key
cardinality). Shuffle volume = both join inputs, the same as any hash join.

Keys must be int64 (every join in this repo is on int ids). Because blocks
from both sides concatenate during the shuffle, absent columns null-promote
(int64 → float64 in pandas); the merge restores int64 on the key columns and
callers restore any other exact dtypes they need downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

_DEFAULT_SHARDS = 64


def shard_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
    num_shards: int = _DEFAULT_SHARDS,
    right_suffix: str = "_r",
) -> ray.data.Dataset:
    """Equi-join on int64 keys. ``how`` ∈ {"inner", "left", "semi", "anti"}.

    - inner/left: pandas-merge semantics; overlapping non-key right columns
      get ``right_suffix``. The right key column is dropped from the output.
    - semi: left rows whose key appears in the right key set (no right
      columns in the output).
    - anti: left rows whose key does NOT appear in the right key set.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[left_cols].copy()
        k = out[on].to_numpy(dtype=np.int64)
        out["_side"] = np.int8(0)
        out["_shard"] = (k.astype(np.uint64) % np.uint64(num_shards)).astype(np.int32)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[right_cols].copy()
        k = out[right_on].to_numpy(dtype=np.int64)
        out["_side"] = np.int8(1)
        out["_shard"] = (k.astype(np.uint64) % np.uint64(num_shards)).astype(np.int32)
        return out

    lcols = list(left_cols)
    rcols = list(right_cols)

    def merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        # a shard whose rows all came from one side lacks the other side's
        # columns entirely (schema union happens per group) — reindex fills
        # the missing ones so empty selections stay well-formed
        side = g["_side"].to_numpy()
        lg = g[side == 0].reindex(columns=lcols).copy()
        lg[on] = lg[on].astype(np.int64)
        if how in ("semi", "anti"):
            rg_keys = g[side == 1]
            rkeys = (
                rg_keys[right_on].to_numpy(dtype=np.int64)
                if right_on in rg_keys.columns and len(rg_keys)
                else np.empty(0, dtype=np.int64)
            )
            mask = lg[on].isin(rkeys)
            return lg[mask] if how == "semi" else lg[~mask]
        rg = g[side == 1].reindex(columns=rcols).copy()
        rg[right_on] = rg[right_on].fillna(-1).astype(np.int64)
        merged = lg.merge(
            rg,
            left_on=on,
            right_on=right_on,
            how="inner" if how == "inner" else "left",
            suffixes=("", right_suffix),
        )
        drop_key = right_on if right_on != on else right_on + right_suffix
        if drop_key in merged.columns and drop_key != on:
            merged = merged.drop(columns=[drop_key])
        return merged

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )
    return tagged.groupby("_shard").map_groups(merge_shard, batch_format="pandas")

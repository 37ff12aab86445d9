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

Keys are int64 ids (default) or strings (``key_type="str"`` — e.g. the
vocabulary attach in q_term_importance_dist, where the join key is the token
itself; sharding uses the process-stable SipHash of the string and equality
is on the actual strings, so hash collisions cannot produce wrong matches).
Because blocks from both sides concatenate during the shuffle, absent
columns null-fill; to keep that exact, integer columns (keys included) ride
the shuffle as pandas nullable ``Int64`` (a float64 promotion would silently
corrupt ids above 2^53 — real at the 10^10-key scale this substrate
targets). Outputs may therefore carry ``Int64`` extension columns; callers
materializing a FINAL result must cast to plain int64 / Arrow (Ray can't
type pandas extension blocks in ``ds.schema()``, and the driver's oracle
canonicalization diverges on them).
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
    key_type: str = "int",
    salt: int = 1,
    post_merge=None,
) -> ray.data.Dataset:
    """Equi-join on int64 keys (``key_type="int"``) or string keys
    (``key_type="str"``). ``how`` ∈ {"inner", "left", "semi", "anti"}.

    - inner/left: pandas-merge semantics; overlapping non-key right columns
      get ``right_suffix``. The right key column is dropped from the output.
    - semi: left rows whose key appears in the right key set (no right
      columns in the output).
    - anti: left rows whose key does NOT appear in the right key set.
    - outer: full outer — unmatched rows from BOTH sides survive with the
      other side's columns null; the output key column `on` is coalesced
      from whichever side had the row. Int keys ride as nullable Int64 in
      the outer output (a right-only row has no left key, and a float64
      promotion would corrupt ids above 2^53).

    ``salt`` > 1 is the hot-key (skew) mode: each LEFT row lands in one of
    `salt` sub-shards of its key (spread by a second hash so one hot key's
    rows split ~evenly) while each RIGHT row is REPLICATED to all `salt`
    sub-shards — so a key whose left side is 10^8 rows no longer serializes
    one task. Replication factor on the right is exactly `salt`; size it to
    the observed skew (2–16), not the shard count. Correct for
    inner/left/semi/anti (every left row meets its key's full right set
    exactly once); rejected for outer, where a right row's "unmatched"
    status cannot be decided inside one sub-shard.

    ``post_merge`` (optional) runs INSIDE the per-shard group fn on the
    joined pandas frame, where the shard is guaranteed whole — the only
    place a block-local keyed reduce after the join is globally correct.
    (A downstream ``map_batches(..., batch_size=None)`` is NOT: Ray's
    dynamic block splitting slices map_groups output above
    target_max_block_size, so one key's rows can straddle two batches at
    scale.) Rejected with salt > 1, where a key's left rows intentionally
    split across sub-shards.
    """
    if post_merge is not None and salt > 1:
        raise ValueError(
            "post_merge is not supported with salt > 1 (keys split across sub-shards)"
        )
    if how not in ("inner", "left", "semi", "anti", "outer"):
        raise ValueError(f"unsupported how={how!r}")
    if key_type not in ("int", "str"):
        raise ValueError(f"unsupported key_type={key_type!r}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if salt > 1 and how == "outer":
        raise ValueError("salt > 1 is not supported for how='outer'")
    int_keys = key_type == "int"

    def _key_hash(s: pd.Series) -> np.ndarray:
        if int_keys:
            return s.to_numpy(dtype=np.int64).astype(np.uint64)
        from arches_rascoll_etl_ray.functions.hashing import stable_hash64

        return stable_hash64(s.to_numpy(dtype=object))

    def _shard_of(s: pd.Series) -> np.ndarray:
        return (_key_hash(s) % np.uint64(num_shards)).astype(np.int32)

    def _null_safe_ints(out: pd.DataFrame) -> pd.DataFrame:
        # EVERY int column (keys included — when on != right_on each side's
        # key is absent from the other side's blocks) rides the shuffle as
        # nullable Int64, so the schema-union null-fill stays exact: plain
        # int64 + null promotes to float64, silently corrupting values above
        # 2^53 (pinned by test_attach_cluster_ids_shard_path_big_ids)
        for c in out.columns:
            if pd.api.types.is_integer_dtype(out[c]) and not isinstance(
                out[c].dtype, pd.Int64Dtype
            ):
                out[c] = out[c].astype("Int64")
        return out

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[left_cols].copy()
        shard = _shard_of(out[on]).astype(np.int64)
        out = _null_safe_ints(out)
        out["_side"] = np.int8(0)
        if salt > 1:
            # spread rows (not keys) round-robin across the key's sub-shards
            # — a hot key's rows split ~evenly; any sub assignment yields
            # the same join output, so batching-dependent cycling is fine
            sub = np.arange(len(out), dtype=np.int64) % salt
            out["_shard"] = (shard * salt + sub).astype(np.int32)
        else:
            out["_shard"] = shard.astype(np.int32)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[right_cols].copy()
        shard = _shard_of(out[right_on]).astype(np.int64)
        out = _null_safe_ints(out)
        out["_side"] = np.int8(1)
        if salt > 1:
            # replicate every right row to all `salt` sub-shards of its key
            reps = []
            for sub in range(salt):
                r = out.copy()
                r["_shard"] = (shard * salt + sub).astype(np.int32)
                reps.append(r)
            return pd.concat(reps, ignore_index=True)
        out["_shard"] = shard.astype(np.int32)
        return out

    lcols = list(left_cols)
    rcols = list(right_cols)

    def merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        # a shard whose rows all came from one side lacks the other side's
        # columns entirely (schema union happens per group) — reindex fills
        # the missing ones so empty selections stay well-formed
        side = g["_side"].to_numpy()
        lg = g[side == 0].reindex(columns=lcols).copy()
        if int_keys:
            lg[on] = lg[on].astype(np.int64)
        if how in ("semi", "anti"):
            rg_keys = g[side == 1]
            rkeys = (
                rg_keys[right_on].to_numpy(dtype=np.int64 if int_keys else object)
                if right_on in rg_keys.columns and len(rg_keys)
                else np.empty(0, dtype=np.int64 if int_keys else object)
            )
            mask = lg[on].isin(rkeys)
            return lg[mask] if how == "semi" else lg[~mask]
        rg = g[side == 1].reindex(columns=rcols).copy()
        if how == "outer":
            if int_keys:
                # nullable keys on BOTH sides: an unmatched row leaves the
                # other side's key NA, and int64+NA would promote to float64
                lg[on] = lg[on].astype("Int64")
                rg[right_on] = rg[right_on].astype("Int64")
            merged = lg.merge(
                rg, left_on=on, right_on=right_on, how="outer", suffixes=("", right_suffix)
            )
            rk = right_on if right_on != on else right_on + right_suffix
            if rk in merged.columns and rk != on:
                merged[on] = merged[on].fillna(merged[rk])
                merged = merged.drop(columns=[rk])
            return merged
        if int_keys:
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
    group_fn = merge_shard if post_merge is None else (lambda g: post_merge(merge_shard(g)))
    return tagged.groupby("_shard").map_groups(group_fn, batch_format="pandas")

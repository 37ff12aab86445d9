"""Incremental materialized-view maintenance over the changefeed.

A GROUP BY aggregate (live-key count + an int64-sum measure per group) kept
in sync by folding per-epoch changefeed deltas — the view is NEVER
recomputed from the full table. Per delta row:

    I:  +1 / +measure  on the new row's group
    D:  -1 / -measure  on the old row's group
    U:  -old on the old group, +new on the new group (handles group moves)

Integer arithmetic makes the fold exact and order-independent, so the
incrementally-maintained view is bit-equal to a from-scratch aggregate of
the final state (the DuckDB oracle for `cdc_incremental_mv` checks exactly
that, and tests/test_changefeed.py checks it at EVERY epoch horizon).

Scale shape: the heavy side (the feed) is reduced inside `map_batches` to
per-batch (group, Δcount, Δsum) partials — one row per group per batch —
and only those partials reach the driver. The view state itself is bounded
by group cardinality, which is by definition driver-small for a
materialized GROUP BY view; a view too big for one machine should be a lake
table, not this class.

Reference analogue: the reference recomputes its summary CSVs from scratch
each run (arches_rascoll/ref_collection.py:401-420); this is the
incremental recast the continuous-CDC north star implies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def write_feed_as_changelog(feed: ray.data.Dataset, out_dir: str, lsn: int) -> int:
    """Render one changefeed as change-event shards a downstream CDCEngine
    can replay — the replication fan-out (primary lake → WAL → replica
    lake through the NORMAL upsert path, so the replica inherits the
    exactly-once manifests).

    Every row of one feed gets the SAME lsn tick: a feed has at most one
    row per key, so per-key LWW never sees a tie, and successive feeds use
    increasing ticks. Distributed + retry-idempotent: each task writes its
    own shard named by its content hash (a retried task rewrites the same
    bytes to the same name). Returns the lsn tick written.

    Assumes the base (un-evolved) event schema; replicate BEFORE applying
    an evolution spec on the replica, the same order the primary applied it.
    """
    import os

    import pyarrow.parquet as _pq

    from arches_rascoll_etl_ray.functions.hashing import table_content_sha256

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        dels = pa.compute.equal(t["op"], "D")
        blank = pa.array([""] * t.num_rows, pa.string())

        def img(col: str, typ) -> pa.Array:
            return pa.compute.if_else(dels, blank.cast(typ), t["new_" + col].cast(typ))

        ev = pa.table(
            {
                "lsn": pa.array([lsn] * t.num_rows, pa.int64()),
                "op": pa.compute.if_else(dels, "D", "U"),
                "repo": t["repo"],
                "path": t["path"],
                "commit": img("commit", pa.string()),
                "lang": img("lang", pa.string()),
                "content": img("content", pa.large_string()),
            }
        )
        sha = table_content_sha256(ev, ["repo", "path", "commit"])
        idx = int(sha[:12], 16) % 10**12
        name = f"changelog-{lsn:012d}-{lsn:012d}-{idx:012d}.parquet"
        tmp = os.path.join(out_dir, f".tmp-{name}")
        _pq.write_table(ev, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"rows": pa.array([ev.num_rows], pa.int64())})

    # consume the stats stream to drive the writes; nothing big returns
    feed.map_batches(write_shard, batch_format="pyarrow").count()
    return lsn


class IncrementalGroupAgg:
    """count(*) + sum(int64 measure) per group, maintained from changefeed
    deltas (CDCEngine.changefeed output schema: op, old_*/new_* images).

    Group keys are stored PREFIX-FREE encoded: "n" is the null group, a
    real value v is stored as "v" + v — no sentinel can ever collide with
    user data (SQL GROUP BY semantics for nulls; dict/JSON state stays
    string-keyed and `sorted()` never compares str with None). `to_table`
    decodes back to a null group_key. The per-batch partial groupby runs
    on utf-8 BYTES keys: pandas' string-key groupby hashes object strings
    as C strings and silently merges distinct groups at an embedded NUL
    byte, while bytes keys take the exact PyObject hashtable (verified on
    pandas 2.2.2)."""

    NULL_GROUP = "n"  # encoded-state key for the null group ("v"+value otherwise)

    def __init__(self, group_col: str, measure_col: str):
        self.group_col = group_col
        self.measure_col = measure_col
        # group -> [n_live_keys, sum_measure]
        self.state: dict[str, list[int]] = {}

    def apply(self, feed: ray.data.Dataset) -> None:
        """Fold one changefeed into the view."""
        g, m = self.group_col, self.measure_col
        new_g, old_g = "new_" + g, "old_" + g
        new_m, old_m = "new_" + m, "old_" + m
        null_grp = self.NULL_GROUP

        def _grp(series: pd.Series):
            # encode BEFORE the groupby: pandas' default dropna would
            # silently discard null-group deltas ("n" = null, "v"+value
            # otherwise — prefix-free, so no user value collides)
            arr = series.to_numpy(dtype=object)
            enc = pd.Series(arr, dtype=object).radd("v").to_numpy(dtype=object)
            return np.where(pd.isna(arr), null_grp, enc)

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            parts = []
            add = df[df["op"].isin(("I", "U"))]
            if len(add):
                parts.append(
                    pd.DataFrame(
                        {
                            "grp": _grp(add[new_g]),
                            "d_n": 1,
                            "d_m": pd.to_numeric(add[new_m]).astype("int64").to_numpy(),
                        }
                    )
                )
            sub = df[df["op"].isin(("D", "U"))]
            if len(sub):
                parts.append(
                    pd.DataFrame(
                        {
                            "grp": _grp(sub[old_g]),
                            "d_n": -1,
                            "d_m": -pd.to_numeric(sub[old_m]).astype("int64").to_numpy(),
                        }
                    )
                )
            if not parts:
                return pd.DataFrame(
                    {
                        "grp": pd.Series([], dtype=object),
                        "d_n": pd.Series([], dtype="int64"),
                        "d_m": pd.Series([], dtype="int64"),
                    }
                )
            cat = pd.concat(parts)
            # bytes keys: string-key groupby NUL-truncates object strings
            out = cat.groupby(cat["grp"].str.encode("utf-8"))[["d_n", "d_m"]].sum().reset_index()
            out["grp"] = out["grp"].str.decode("utf-8")
            return out[["grp", "d_n", "d_m"]]

        # stream the (≤ groups-per-batch)-row partials; the raw feed never
        # materializes on the driver
        for batch in feed.map_batches(partials, batch_format="pandas").iter_batches(
            batch_format="pandas"
        ):
            for grp, dn, dm in batch[["grp", "d_n", "d_m"]].itertuples(index=False):
                cur = self.state.setdefault(grp, [0, 0])
                cur[0] += int(dn)
                cur[1] += int(dm)
        # groups with no live keys left drop out of the view
        self.state = {k: v for k, v in self.state.items() if v[0] != 0}

    def to_table(self) -> pa.Table:
        keys = sorted(self.state)
        return pa.table(
            {
                "group_key": pa.array(
                    [None if k == self.NULL_GROUP else k[1:] for k in keys], pa.string()
                ),
                "n_keys": pa.array([self.state[k][0] for k in keys], pa.int64()),
                "sum_measure": pa.array([self.state[k][1] for k in keys], pa.int64()),
            }
        )

    # ------------------------------------------------- cross-run persistence

    applied_epoch: int = 0

    def save(self, path: str) -> None:
        """Persist the view state + applied-epoch watermark (atomic JSON),
        so the NEXT run folds only the epochs committed since."""
        import json
        import os

        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "group_col": self.group_col,
                    "measure_col": self.measure_col,
                    # state keys are prefix-free encoded ("n"/"v"+value);
                    # v1 states (raw keys + NUL sentinel) must not be
                    # silently reinterpreted — load() rejects them
                    "state_format": 2,
                    "applied_epoch": self.applied_epoch,
                    "state": self.state,
                },
                f,
            )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "IncrementalGroupAgg":
        import json

        with open(path) as f:
            d = json.load(f)
        if d.get("state_format") != 2:
            raise ValueError(
                f"incremental view state at {path} uses an old key encoding "
                "(pre-prefix-free) — rebuild the view (it is derived state)"
            )
        view = cls(d["group_col"], d["measure_col"])
        view.state = {k: [int(a), int(b)] for k, (a, b) in d["state"].items()}
        view.applied_epoch = int(d["applied_epoch"])
        return view


class IncrementalDistinctAgg:
    """count(DISTINCT value) per group, maintained from changefeed deltas —
    the deletion-safe distinct view. A plain sketch (HLL) cannot retract, so
    the state is a REFCOUNT per (group, value): I adds +1 to the new image's
    pair, D adds -1 to the old image's, U moves one ref from the old pair to
    the new (handling BOTH group moves and value moves); a value counts
    toward its group's distinct total while its refcount > 0. Integer
    refcounts make the fold exact and order-independent, so the incremental
    view is bit-equal to a from-scratch `count(DISTINCT ...)` of the final
    state (pinned at every epoch horizon in tests/test_changefeed.py).

    `value_map` (optional, vectorized, deterministic) derives the counted
    value from the raw column — a real deployment passes e.g. a domain
    extractor (distinct domains per language); it is applied to old and new
    images identically so retraction always hits the pair insertion hit.

    Scale shape: per-batch partials are (group, value, Δref) — one row per
    touched pair per batch; only those reach the driver. Driver state is
    bounded by live (group, value) cardinality, the right tool for
    bounded-domain views. For an unbounded value domain, derive distinct
    counts from the sharded postings store instead (pipelines/index.py
    SecondaryIndex: distinct count == per-value postings cardinality) —
    this class intentionally stays driver-small like IncrementalGroupAgg.

    Keys share IncrementalGroupAgg's hardening: prefix-free 'n'/'v'+value
    encoding (no null sentinel can collide with user data) and bytes-key
    pandas groupbys (the str path C-truncates at embedded NULs); state is
    a nested dict {group: {value: refcount}} so no separator byte exists
    to collide with either."""

    NULL_KEY = "n"  # encoded null ("v"+value otherwise), groups AND values

    def __init__(self, group_col: str, value_col: str, value_map=None):
        self.group_col = group_col
        self.value_col = value_col
        self.value_map = value_map
        # group -> {value -> refcount}
        self.state: dict[str, dict[str, int]] = {}

    def _enc(self, series: pd.Series, is_value: bool = False) -> np.ndarray:
        arr = series.to_numpy(dtype=object)
        if is_value and self.value_map is not None:
            arr = pd.Series(self.value_map(pd.Series(arr)), dtype=object).to_numpy(dtype=object)
        # str-render THEN null-mask on the pre-render array: a float NaN
        # becomes NULL_KEY, never the "vnan" a real "nan" string encodes to
        enc = pd.Series(arr, dtype=object).astype(str).radd("v").to_numpy(dtype=object)
        return np.where(pd.isna(arr), self.NULL_KEY, enc)

    def apply(self, feed: ray.data.Dataset) -> None:
        g, v = self.group_col, self.value_col
        enc = self._enc

        def img(df: pd.DataFrame, col: str, side: str) -> pd.Series:
            # key columns ride the feed BARE (they identify the row, so
            # old image == new image == the key); value columns are
            # old_/new_ prefixed (changefeed_schema, stages/merge.py)
            pref = side + "_" + col
            return df[pref] if pref in df.columns else df[col]

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            parts = []
            add = df[df["op"].isin(("I", "U"))]
            if len(add):
                parts.append(
                    pd.DataFrame(
                        {
                            "grp": enc(img(add, g, "new")),
                            "val": enc(img(add, v, "new"), True),
                            "d": 1,
                        }
                    )
                )
            sub = df[df["op"].isin(("D", "U"))]
            if len(sub):
                parts.append(
                    pd.DataFrame(
                        {
                            "grp": enc(img(sub, g, "old")),
                            "val": enc(img(sub, v, "old"), True),
                            "d": -1,
                        }
                    )
                )
            if not parts:
                return pd.DataFrame(
                    {
                        "grp": pd.Series([], dtype=object),
                        "val": pd.Series([], dtype=object),
                        "d": pd.Series([], dtype="int64"),
                    }
                )
            cat = pd.concat(parts)
            # bytes keys: pandas' str-key groupby NUL-truncates object strings
            out = (
                cat.groupby(
                    [cat["grp"].str.encode("utf-8"), cat["val"].str.encode("utf-8")]
                )["d"]
                .sum()
                .reset_index()
            )
            out["grp"] = out["grp"].str.decode("utf-8")
            out["val"] = out["val"].str.decode("utf-8")
            return out[["grp", "val", "d"]]

        for batch in feed.map_batches(partials, batch_format="pandas").iter_batches(
            batch_format="pandas"
        ):
            for grp, val, d in batch[["grp", "val", "d"]].itertuples(index=False):
                vals = self.state.setdefault(grp, {})
                nxt = vals.get(val, 0) + int(d)
                if nxt == 0:
                    vals.pop(val, None)
                else:
                    vals[val] = nxt
        self.state = {k: v for k, v in self.state.items() if v}

    def to_table(self) -> pa.Table:
        keys = sorted(self.state)
        return pa.table(
            {
                "group_key": pa.array(
                    [None if k == self.NULL_KEY else k[1:] for k in keys], pa.string()
                ),
                "n_distinct": pa.array([len(self.state[k]) for k in keys], pa.int64()),
            }
        )

    # ------------------------------------------------- cross-run persistence

    applied_epoch: int = 0

    def save(self, path: str) -> None:
        import json
        import os

        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "group_col": self.group_col,
                    "value_col": self.value_col,
                    "state_format": 2,
                    "has_value_map": self.value_map is not None,
                    "applied_epoch": self.applied_epoch,
                    "state": self.state,
                },
                f,
            )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, value_map=None) -> "IncrementalDistinctAgg":
        import json

        with open(path) as f:
            d = json.load(f)
        if d.get("state_format") != 2:
            raise ValueError(
                f"distinct view state at {path} uses an old key encoding — "
                "rebuild the view (it is derived state)"
            )
        if d.get("has_value_map", False) != (value_map is not None):
            raise ValueError(
                "distinct view state was saved with a different value_map "
                "presence — refcounts keyed on mapped values cannot be "
                "reinterpreted; rebuild the view"
            )
        view = cls(d["group_col"], d["value_col"], value_map=value_map)
        view.state = {
            g: {vk: int(r) for vk, r in vals.items()} for g, vals in d["state"].items()
        }
        view.applied_epoch = int(d["applied_epoch"])
        return view


def sync_view(engine, view: IncrementalGroupAgg, store_path: str | None = None) -> IncrementalGroupAgg:
    """Catch a view up to the engine's latest committed epoch by folding
    ONLY the changefeed since the view's applied-epoch watermark — the
    cross-run continuation of incremental maintenance. With `store_path`,
    the updated state is persisted atomically after the fold, so a crashed
    sync re-folds the same feed from the old watermark (the fold of a
    diff between the same two horizons is deterministic, and the save is
    all-or-nothing)."""
    latest = engine.checkpoint().epoch
    if latest > view.applied_epoch:
        view.apply(engine.changefeed(view.applied_epoch, latest))
        view.applied_epoch = latest
        if store_path is not None:
            view.save(store_path)
    return view

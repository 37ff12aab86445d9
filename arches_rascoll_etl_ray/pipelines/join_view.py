"""Incrementally-maintained JOIN view over two CDC lakes.

The missing piece between `IncrementalGroupAgg` (single-table aggregate
from one changefeed) and a real streaming warehouse: a denormalized
LEFT-JOIN view `A ⋈ B` kept current from BOTH lakes' changefeeds using
the classic delta decomposition

    Δ(A ⋈ B)  =  ΔA ⋈ B   ∪   A ⋈ ΔB

with every term partition-targeted — no side is ever rescanned:

  * The view stores one row per live LEFT row, partitioned by
    hash(join key) — i.e. by the RIGHT side's key.
  * ΔB (right-side churn): a changed/inserted/deleted right key touches
    exactly the view partition it hashes to; that partition rewrites its
    matching rows' right columns in place (insert fills previously
    dangling rows, delete nulls them — LEFT JOIN semantics).
  * ΔA (left-side churn): the feed's old/new images carry the OLD and
    NEW join-key values, so removal targets hash(old key)'s partition
    and insertion targets hash(new key)'s; the new rows' right columns
    come from a selective fold of ONLY the right-lake partitions the
    new join keys live in, AS OF the right sync horizon.

Consistency contract: after `sync(left_engine, right_engine)` the view
equals `LWW(A) @ epoch_a  LEFT JOIN  LWW(B) @ epoch_b` for the two
recorded watermarks — pinned against a from-scratch join in pytest at
every horizon, and against a DuckDB twin end-to-end
(`cdc_join_view` in cdc_queries.py).

Crash recovery pins the WINDOW pair like the other consumers: both
pending horizons are persisted before any partition write, and
re-applying a window is idempotent (remove-then-add by left key; right
updates SET columns to their horizon values).

Reference analogue: the reference denormalizes via one-shot pandas
merges (arches_rascoll/prov_acts.py:56-68); this is the continuously-
maintained recast.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from arches_rascoll_etl_ray.functions.hashing import (
    KEY_SEP,
    combine_key,
    key_hash64,
    stable_hash64,
)
from arches_rascoll_etl_ray.state.manifest import atomic_write_json


class IncrementalJoinView:
    """LEFT JOIN view of two CDC lakes, keyed by the left lake's primary
    key, joined on `join_col` (a left value column) = the right lake's
    `repo` key. Carries every value column of both sides, prefixed
    `a_` / `b_`."""

    def __init__(
        self, view_dir: str, join_col: str, num_partitions: int = 8, right_path: str = "state"
    ):
        self.view_dir = view_dir
        self.join_col = join_col
        self.num_partitions = num_partitions
        # the right lake's constant `path` component: a right key is its
        # `repo`; this pin lets ΔA-side lookups hash (repo, right_path) to
        # exactly the right partitions instead of folding all of them
        self.right_path = right_path
        os.makedirs(view_dir, exist_ok=True)
        meta = self._load_meta()
        if meta is not None:
            if (
                meta["join_col"] != join_col
                or meta["num_partitions"] != num_partitions
                or meta.get("right_path", "state") != right_path
                # stored a_key composites embed the separator: a view
                # written under a different KEY_SEP must be rejected
                or meta.get("key_sep") != KEY_SEP
            ):
                raise ValueError(
                    f"join view at {view_dir} was built with join_col="
                    f"{meta['join_col']!r} P={meta['num_partitions']} — layout pin"
                )
            self.applied_a = meta["applied_a"]
            self.applied_b = meta["applied_b"]
            self.pending_a = meta.get("pending_a")
            self.pending_b = meta.get("pending_b")
            self._columns = meta.get("columns")
        else:
            self.applied_a = 0
            self.applied_b = 0
            self.pending_a = None
            self.pending_b = None
            self._columns = None

    # ------------------------------------------------------------- state

    def _meta_path(self) -> str:
        return os.path.join(self.view_dir, "_joinview_meta.json")

    def _load_meta(self) -> dict | None:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def _save_meta(self) -> None:
        atomic_write_json(
            self._meta_path(),
            {
                "join_col": self.join_col,
                "num_partitions": self.num_partitions,
                "right_path": self.right_path,
                "key_sep": KEY_SEP,
                "applied_a": self.applied_a,
                "applied_b": self.applied_b,
                "pending_a": self.pending_a,
                "pending_b": self.pending_b,
                "columns": self._columns,
            },
        )

    def _part_file(self, part: int) -> str:
        return os.path.join(self.view_dir, f"part={part:03d}", "rows.parquet")

    @staticmethod
    def _val_cols(engine) -> list[str]:
        from arches_rascoll_etl_ray.stages.merge import CHANGEFEED_KEYS, lake_columns

        return [
            c
            for c in lake_columns(engine.cfg)
            if c not in CHANGEFEED_KEYS and c not in ("content_sha",)
        ]

    def _bpart(self, bkeys) -> np.ndarray:
        return (stable_hash64(pa.array(pd.Series(bkeys, dtype=object).fillna(""), pa.string()))
                % np.uint64(self.num_partitions)).astype(np.int32)

    # -------------------------------------------------------------- sync

    def sync(self, left_engine, right_engine) -> None:
        """Advance the view to both lakes' current epochs. A crashed sync
        left pending horizons — that exact window pair re-applies FIRST,
        idempotently, before a fresh pair advances to the heads."""
        from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

        with _WriterLock(self.view_dir):
            if (
                self.pending_a is not None
                and self.pending_b is not None
                and (self.pending_a > self.applied_a or self.pending_b > self.applied_b)
            ):
                self._apply_windows(left_engine, right_engine, self.pending_a, self.pending_b)
            cur_a = left_engine.checkpoint().epoch
            cur_b = right_engine.checkpoint().epoch
            if cur_a != self.applied_a or cur_b != self.applied_b:
                self._apply_windows(left_engine, right_engine, cur_a, cur_b)

    def _apply_windows(self, left_engine, right_engine, to_a: int, to_b: int) -> None:
        self.pending_a, self.pending_b = to_a, to_b
        self._save_meta()
        # B first: existing rows update to B@to_b, so A-adds (joined
        # against B@to_b below) and survivors agree on one right horizon
        self._apply_right(right_engine, to_b)
        self._apply_left(left_engine, right_engine, to_a, to_b)
        self.applied_a, self.applied_b = to_a, to_b
        self.pending_a = self.pending_b = None
        self._save_meta()

    # ---- right side: update matching rows' b-columns in place

    @staticmethod
    def _to_df(tbl: pa.Table) -> pd.DataFrame:
        """Arrow → pandas with integer columns as nullable Int64: the
        default conversion NaN-promotes nullable int64 to float64, which
        corrupts lsn values above 2^53 (the exact hazard
        merge.diff_partition_states guards against)."""
        int64 = pd.Int64Dtype()
        return tbl.to_pandas(
            types_mapper=lambda t: int64 if pa.types.is_integer(t) else None
        )

    def _apply_right(self, right_engine, to_b: int) -> None:
        bcols = self._val_cols(right_engine)
        feed = right_engine.changefeed(self.applied_b, to_b)
        P = self.num_partitions
        rp = self.right_path
        part_file = self._part_file
        bcol_names = ["b_" + c for c in bcols]
        write_part = self._write_part
        to_df = self._to_df

        def deltas(t: pa.Table) -> pa.Table:
            if t.num_rows and not pc.all(pc.equal(t["path"], pa.scalar(rp))).as_py():
                raise ValueError(
                    f"right lake rows carry path != {rp!r} — the view's "
                    "right_path pin does not match the right lake "
                    "(IncrementalJoinView(right_path=...))"
                )
            cols = {"b_key": t["repo"], "b_dead": pc.equal(t["op"], pa.scalar("D"))}
            for c in bcols:
                cols["b_" + c] = t["new_" + c]
            part = (stable_hash64(t["repo"]) % np.uint64(P)).astype(np.int32)
            return pa.table({**cols, "part": pa.array(part)})

        # the feed stays distributed: 'part' rides from the map side and
        # the groupby shuffles deltas straight to their partition rewrite
        ds = feed.map_batches(deltas, batch_format="pyarrow").materialize()
        if ds.count() == 0:
            return

        def rewrite(t: pa.Table) -> pa.Table:
            g = to_df(t)
            part = int(g["part"].iloc[0])
            pfile = part_file(part)
            empty = pa.table({"part": pa.array([], pa.int32())})
            if not os.path.exists(pfile):
                return empty
            cur = to_df(pq.read_table(pfile))
            g = g.drop_duplicates("b_key", keep="last").set_index("b_key")
            hit = cur["b_key"].isin(g.index)
            if not hit.any():
                return empty
            for c in bcol_names:
                vals = cur.loc[hit, "b_key"].map(g[c])
                dead = cur.loc[hit, "b_key"].map(g["b_dead"]).fillna(False)
                vals[dead.to_numpy(dtype=bool)] = None  # LEFT JOIN: delete nulls
                # Int64/object columns accept NA without dtype violation
                cur.loc[hit, c] = vals.astype(cur[c].dtype)
            write_part(pfile, cur)
            return pa.table({"part": pa.array([part], pa.int32())})

        ds.groupby("part").map_groups(rewrite, batch_format="pyarrow").count()

    # ---- left side: remove old rows, add new ones joined at B's horizon

    def _apply_left(self, left_engine, right_engine, to_a: int, to_b: int) -> None:
        acols = self._val_cols(left_engine)
        bcols = self._val_cols(right_engine)
        jcol = self.join_col
        P = self.num_partitions
        acol_names = ["a_" + c for c in acols]
        bcol_names = ["b_" + c for c in bcols]
        out_cols = ["a_key", "b_key"] + acol_names + bcol_names
        part_file = self._part_file
        write_part = self._write_part
        to_df = self._to_df
        # integer view columns by the two lakes' schemas: rem rows carry NA
        # in every value column, and a concat that float-promotes them
        # would corrupt int64 values above 2^53
        from arches_rascoll_etl_ray.stages.merge import empty_lake_table

        int_cols = {
            "a_" + f.name
            for f in empty_lake_table(left_engine.cfg).schema
            if pa.types.is_integer(f.type)
        } | {
            "b_" + f.name
            for f in empty_lake_table(right_engine.cfg).schema
            if pa.types.is_integer(f.type)
        }

        # pass 1 (ids only, driver-bounded by window churn): the distinct
        # new join keys, for the selective right-side fold AS OF to_b
        feed = left_engine.changefeed(self.applied_a, to_a)
        jv = feed.map_batches(
            lambda t: pa.table(
                {"op": t["op"], "new_j": pc.cast(t["new_" + jcol], pa.string())}
            ),
            batch_format="pyarrow",
        ).to_pandas()
        if jv.empty or "op" not in jv.columns:
            return
        # sorted(set(...)), not pd.unique: the array-path unique NUL-
        # truncates object strings (join values are user data), and a
        # sorted list keeps _fetch_right's fold filter input deterministic
        new_keys = sorted(set(jv.loc[jv["op"].isin(("I", "U")), "new_j"].dropna()))
        blookup = self._fetch_right(right_engine, to_b, new_keys) if len(new_keys) else {}
        lkp = pd.DataFrame.from_dict(blookup, orient="index")
        if len(lkp):
            lkp = lkp[[c for c in bcols if c in lkp.columns]].add_prefix("b_")
        lkp_ref = ray.put(lkp)

        # pass 2 (distributed): full delta rows built per batch — removals
        # to hash(old join key), adds to hash(new), b-columns via ONE
        # vectorized join against the broadcast lookup
        def build(t: pa.Table) -> pa.Table:
            cols = {
                "a_key": combine_key(t),
                "op": t["op"],
                "old_j": pc.cast(t["old_" + jcol], pa.string()),
                "new_j": pc.cast(t["new_" + jcol], pa.string()),
            }
            for c in acols:
                cols["a_" + c] = t["new_" + c]
            df = to_df(pa.table(cols))
            rem = df[df["op"].isin(("D", "U"))][["a_key", "old_j"]].copy()
            rem = rem.assign(part=self._bpart(rem["old_j"]), kind="rem")
            add = df[df["op"].isin(("I", "U"))].copy()
            lk = ray.get(lkp_ref)
            if len(lk):
                add = add.join(lk, on="new_j")
            for c in bcol_names:
                if c not in add.columns:
                    add[c] = None
            add = add.rename(columns={"new_j": "b_key"})
            add = add[out_cols].assign(part=self._bpart(add["b_key"]), kind="add")
            frames = [f for f in (rem, add) if len(f)]
            if not frames:
                return pa.table({"part": pa.array([], pa.int32())})
            allrows = pd.concat(frames, ignore_index=True)
            for c in int_cols:
                if c in allrows.columns:
                    allrows[c] = allrows[c].astype("Int64")  # exact, NA-safe
            return pa.Table.from_pandas(allrows, preserve_index=False)

        ds = feed.map_batches(build, batch_format="pyarrow").materialize()
        if ds.count() == 0:
            return

        def rewrite(t: pa.Table) -> pa.Table:
            g = to_df(t)
            part = int(g["part"].iloc[0])
            pfile = part_file(part)
            cur = (
                to_df(pq.read_table(pfile))
                if os.path.exists(pfile)
                else pd.DataFrame({c: pd.Series([], dtype=object) for c in out_cols})
            )
            rem_keys = set(g[g["kind"] == "rem"]["a_key"])
            adds = g[g["kind"] == "add"]
            add_keys = set(adds["a_key"])
            if rem_keys or add_keys:
                cur = cur[~(cur["a_key"].isin(rem_keys) | cur["a_key"].isin(add_keys))]
            frames = [f for f in (cur, adds[out_cols]) if len(f)]
            merged = pd.concat(frames, ignore_index=True) if frames else cur
            write_part(pfile, merged.sort_values(["a_key"], kind="mergesort"))
            return pa.table({"part": pa.array([part], pa.int32())})

        ds.groupby("part").map_groups(rewrite, batch_format="pyarrow").count()
        if self._columns != out_cols:
            self._columns = list(out_cols)
            self._save_meta()

    def _write_part(self, pfile: str, frame: pd.DataFrame) -> None:
        if len(frame) == 0:
            try:
                os.remove(pfile)
            except FileNotFoundError:
                pass
            return
        os.makedirs(os.path.dirname(pfile), exist_ok=True)
        tmp = pfile + f".tmp-{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(frame.reset_index(drop=True), preserve_index=False), tmp, compression="lz4")
        os.replace(tmp, pfile)

    def _fetch_right(self, right_engine, to_b: int, bkeys) -> dict:
        """b_key → {col: value} for live right rows at the to_b horizon —
        one Ray task per right partition the keys hash to."""
        from arches_rascoll_etl_ray.stages.merge import (
            fold_partition_tables,
            read_partition_state,
        )

        bkeys = [k for k in bkeys if isinstance(k, str)]
        if not bkeys:
            return {}
        cfg = right_engine.cfg
        bcols = self._val_cols(right_engine)
        ckpt = right_engine.checkpoint(to_b)
        # right partition = hash((repo, right_path)) — the same key hash
        # the write path uses, so only the partitions the keys live in fold
        kt = pa.table(
            {
                "repo": pa.array(bkeys, pa.string()),
                "path": pa.array([self.right_path] * len(bkeys), pa.string()),
            }
        )
        parts = np.unique(key_hash64(kt) % np.uint64(cfg.num_partitions)).tolist()
        key_ref = ray.put(pa.array(bkeys, pa.string()))

        rp = self.right_path

        @ray.remote(num_cpus=1)
        def fold_filter(part: int):
            info = ckpt.partitions.get(int(part))
            if not info:
                return {}
            folded = fold_partition_tables(cfg, read_partition_state(cfg, info))
            # path filter enforces the right_path pin (a repo-only match
            # against a wrong-path lake would resolve a nondeterministic
            # subset of keys — the hash targeted the wrong partitions)
            sel = folded.filter(
                pc.and_(
                    pc.is_in(folded["repo"], value_set=ray.get(key_ref)),
                    pc.equal(folded["path"], pa.scalar(rp)),
                )
            )
            reps = sel["repo"].to_pylist()
            cols = {c: sel[c].to_pylist() for c in bcols}
            return {r: {c: cols[c][i] for c in bcols} for i, r in enumerate(reps)}

        out: dict = {}
        for d in ray.get([fold_filter.remote(int(p)) for p in parts]):
            out.update(d)
        return out

    # ------------------------------------------------------------ reads

    def table(self) -> pa.Table:
        parts = []
        for part in range(self.num_partitions):
            f = self._part_file(part)
            if os.path.exists(f):
                parts.append(pq.read_table(f))
        if not parts:
            # schema-correct empty view (column list persisted at the last
            # apply; string-typed sentinel when the view never synced)
            cols = self._columns or ["a_key", "b_key"]
            return pa.table({c: pa.array([], pa.string()) for c in cols})
        out = pa.concat_tables(parts, promote_options="permissive")
        return out.take(pc.sort_indices(out, sort_keys=[("a_key", "ascending")]))

"""Secondary (inverted) index over one lake value column, maintained
incrementally from the changefeed.

The base lake is hash-partitioned by the PRIMARY key (repo, path), so a
query on any other column — "every live row whose `lang` is X" — must scan
all P partitions. A SecondaryIndex keeps a postings table value → keys,
partitioned by hash(value), so that query reads ONE index partition for the
exact key list and then folds only the base partitions those keys live in.

On-disk layout (its own directory, never inside the base lake):

    <index_dir>/_index_meta.json        {column, num_partitions, applied_epoch}
    <index_dir>/part=<i>/postings_<s>.parquet  (value, repo, path), sorted;
    s = key-hash sub-bucket (num_subshards of them) so one HOT value never
    concentrates its whole postings rewrite on a single sync task

Maintenance is delta-driven and NEVER rescans the table: per changefeed row
    I             → add   (new_value, key)
    D             → remove (old_value, key)
    U, value moved → remove old, add new
    U, value same  → nothing (lsn-only churn costs the index zero writes)
Each sync is one Ray `groupby(ipart).map_groups` over the delta stream —
only touched index partitions do any I/O, each rewritten atomically
(tmp→rename). Crash recovery pins the WINDOW, not just the watermark: an
intent (`pending_to`) is persisted before any partition write, so a sync
that died mid-apply is always re-applied over its ORIGINAL epoch window
first — set semantics make that replay idempotent (re-adding dedups,
re-removing is a no-op) — and only then does a fresh window advance to
the lake head. Without the intent, a retry would net-diff ACROSS the
crashed horizon and a posting the crashed attempt wrote for an
intermediate value would never be removed (the changefeed is an
endpoint diff; the intermediate value appears in neither image).

Consistency: the index carries an applied-epoch watermark and
`lookup_rows` reads the BASE LAKE AS OF that watermark (time-travel
checkpoint), so a lookup is always a consistent snapshot even while the
base lake advances ahead of the index.

Reference analogue: the reference builds one-shot in-memory dicts keyed by
secondary attributes for its joins (arches_rascoll/ref_collection.py:142,
prov_acts.py:56-68); this is the continuously-maintained, partitioned
recast the CDC north star implies.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from arches_rascoll_etl_ray.functions.hashing import (
    KEY_SEP,
    combine_key,
    key_hash64,
    stable_hash64,
)
from arches_rascoll_etl_ray.state.manifest import atomic_write_json


class SecondaryIndex:
    """Inverted index `column value → live (repo, path) keys` for one lake."""

    def __init__(
        self, index_dir: str, column: str, num_partitions: int = 16, num_subshards: int = 8
    ):
        self.index_dir = index_dir
        self.column = column
        self.num_partitions = num_partitions
        # postings within a value partition split into key-hash sub-files so
        # ONE hot value (half the corpus sharing a lang) never concentrates
        # its whole rewrite on a single sync task
        self.num_subshards = num_subshards
        os.makedirs(index_dir, exist_ok=True)
        meta = self._load_meta()
        if meta is not None:
            if (
                meta["column"] != column
                or meta["num_partitions"] != num_partitions
                or meta.get("num_subshards", 8) != num_subshards
                # postings dedup keys embed KEY_SEP: reject cross-separator reopen
                or meta.get("key_sep") != KEY_SEP
            ):
                raise ValueError(
                    f"index at {index_dir} was built on column={meta['column']!r} "
                    f"P={meta['num_partitions']} S={meta.get('num_subshards', 8)} — cannot "
                    f"reopen as column={column!r} P={num_partitions} S={num_subshards} "
                    "(physical layout pin, like the lake's own)"
                )
            self.applied_epoch = meta["applied_epoch"]
            self.pending_to = meta.get("pending_to")
        else:
            self.applied_epoch = 0
            self.pending_to = None

    # ------------------------------------------------------------- state

    def _meta_path(self) -> str:
        return os.path.join(self.index_dir, "_index_meta.json")

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
                "column": self.column,
                "num_partitions": self.num_partitions,
                "num_subshards": self.num_subshards,
                "key_sep": KEY_SEP,
                "applied_epoch": self.applied_epoch,
                "pending_to": self.pending_to,
            },
        )

    def _part_file(self, ipart: int, sub: int) -> str:
        return os.path.join(self.index_dir, f"part={ipart}", f"postings_{sub:02d}.parquet")

    def _postings_schema(self) -> pa.Schema:
        return pa.schema(
            [(self.column, pa.string()), ("repo", pa.string()), ("path", pa.string())]
        )

    def _base_column(self, engine) -> str:
        """The indexed column's CURRENT name in the base lake. The index is
        pinned to the column IDENTITY (the name at index creation), which
        survives an EvolutionSpec rename: postings files keep the original
        physical name (layout pin, like P/S), while changefeed reads and
        base-row filters follow the engine's evolved name. Postings values
        are untouched by a rename, so an index synced across the boundary
        is byte-identical to a from-scratch rebuild (pinned in pytest)."""
        spec = getattr(engine.cfg, "evolution", None)
        if spec and self.column in spec.renames:
            return spec.renames[self.column]
        return self.column

    # -------------------------------------------------------------- sync

    def sync(self, engine) -> int:
        """Fold the base lake's changefeed since this index's watermark.
        Returns the number of index partition rewrites (0 = already
        current). A sync that previously died mid-apply left a persisted
        `pending_to` intent — that exact window is idempotently re-applied
        FIRST, then a fresh window advances to the lake head (see the
        module docstring: net-diffing across the crashed horizon would
        strand postings the crashed attempt wrote for intermediate
        values)."""
        from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

        # single-writer guard on the INDEX dir (same flock+lease layering as
        # the lake's): two concurrent syncs would interleave their
        # read-modify-write postings rewrites and the loser's meta save
        # would silently drop the winner's removals
        with _WriterLock(self.index_dir):
            total = 0
            try:
                if self.pending_to is not None and self.pending_to > self.applied_epoch:
                    total += self._apply_window(engine, self.pending_to)
                cur = engine.checkpoint().epoch
                if cur != self.applied_epoch:
                    total += self._apply_window(engine, cur)
            except FileNotFoundError:
                # the base lake vacuumed the checkpoint this index's window
                # starts from (time-travel horizon = since the last vacuum):
                # the delta path is gone, so rebuild from scratch — epoch 0
                # is synthesized, never vacuumed
                return self._rebuild(engine)
            return total

    def _rebuild(self, engine) -> int:
        """From-scratch rebuild (the vacuumed-watermark fallback): clear
        every postings file, reset to epoch 0, apply one full window.
        Crash-safe at every boundary: files clear BEFORE any meta write, so
        a crash pre-meta leaves the old (vacuumed) watermark and the next
        sync re-enters this rebuild; a crash post-meta leaves
        (applied=0, pending=target) and the normal pending-window replay
        re-applies idempotently over the cleared files."""
        target = engine.checkpoint().epoch
        for i in range(self.num_partitions):
            for s in range(self.num_subshards):
                try:
                    os.remove(self._part_file(i, s))
                except FileNotFoundError:
                    pass
        self.applied_epoch = 0
        self.pending_to = None
        return self._apply_window(engine, target)

    def _apply_window(self, engine, to_epoch: int) -> int:
        """Apply ONE changefeed window (applied_epoch, to_epoch], persisting
        the intent before the first partition write. Distributed: deltas
        shuffle by index partition, one task rewrites each touched
        partition."""
        self.pending_to = to_epoch
        self._save_meta()
        feed = engine.changefeed(self.applied_epoch, to_epoch)
        col, P, S = self.column, self.num_partitions, self.num_subshards
        # the changefeed always speaks the CURRENT (evolved) schema, even
        # for a window spanning the evolution boundary (both diff sides are
        # folded through apply_evolution) — so resolve the rename here
        base_col = self._base_column(engine)
        new_c, old_c = "new_" + base_col, "old_" + base_col
        index_dir = self.index_dir
        schema = self._postings_schema()

        def deltas(t: pa.Table) -> pa.Table:
            op = t["op"]
            # adds: I always; U only when the indexed value moved
            moved = pc.fill_null(pc.not_equal(t[old_c], t[new_c]), True)
            add_mask = pc.or_(
                pc.equal(op, "I"), pc.and_(pc.equal(op, "U"), moved)
            )
            rem_mask = pc.or_(
                pc.equal(op, "D"), pc.and_(pc.equal(op, "U"), moved)
            )
            adds = t.filter(pc.and_(pc.fill_null(add_mask, False), pc.is_valid(t[new_c])))
            rems = t.filter(pc.and_(pc.fill_null(rem_mask, False), pc.is_valid(t[old_c])))
            val = pa.concat_arrays(
                [
                    pc.cast(adds[new_c], pa.string()).combine_chunks(),
                    pc.cast(rems[old_c], pa.string()).combine_chunks(),
                ]
            )
            out = pa.table(
                {
                    "value": val,
                    "repo": pa.concat_arrays(
                        [adds["repo"].combine_chunks(), rems["repo"].combine_chunks()]
                    ),
                    "path": pa.concat_arrays(
                        [adds["path"].combine_chunks(), rems["path"].combine_chunks()]
                    ),
                    "add": pa.array(
                        [True] * adds.num_rows + [False] * rems.num_rows, pa.bool_()
                    ),
                }
            )
            ipart = (stable_hash64(out["value"]) % np.uint64(P)).astype(np.int32)
            out = out.append_column("ipart", pa.array(ipart))
            # sub-bucket by KEY hash within the value partition: a hot value
            # (half the table sharing one lang) would otherwise concentrate
            # its entire postings rewrite on one task every sync
            sub = (key_hash64(out) % np.uint64(S)).astype(np.int32)
            return out.append_column("sub", pa.array(sub))

        def merge_one(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return pa.table({"ipart": pa.array([], pa.int32()), "rows": pa.array([], pa.int64())})
            ipart = int(group["ipart"][0].as_py())
            sub = int(group["sub"][0].as_py())
            pfile = os.path.join(index_dir, f"part={ipart}", f"postings_{sub:02d}.parquet")
            existing = (
                pq.read_table(pfile) if os.path.exists(pfile) else None
            )
            gkey = pc.binary_join_element_wise(
                pc.binary_join_element_wise(
                    pc.cast(group["value"], pa.string()),
                    group["repo"],
                    KEY_SEP,
                ),
                group["path"],
                KEY_SEP,
            )
            add_rows = group.filter(group["add"])
            rem_key = gkey.filter(pc.invert(group["add"].combine_chunks()))
            parts = []
            if existing is not None and existing.num_rows:
                ekey = pc.binary_join_element_wise(
                    pc.binary_join_element_wise(existing[col], existing["repo"], KEY_SEP),
                    existing["path"],
                    KEY_SEP,
                )
                keep = pc.invert(pc.is_in(ekey, value_set=rem_key))
                parts.append(existing.filter(keep))
            if add_rows.num_rows:
                parts.append(
                    pa.table(
                        {
                            col: pc.cast(add_rows["value"], pa.string()),
                            "repo": add_rows["repo"],
                            "path": add_rows["path"],
                        }
                    )
                )
            merged = pa.concat_tables(parts) if parts else pa.table(
                {f.name: pa.array([], f.type) for f in schema}
            )
            if merged.num_rows:
                # dedup (idempotent re-adds) + deterministic order
                mkey = pc.binary_join_element_wise(
                    pc.binary_join_element_wise(merged[col], merged["repo"], KEY_SEP),
                    merged["path"],
                    KEY_SEP,
                )
                import pandas as _pd

                first = ~_pd.Series(mkey.to_pandas()).duplicated().to_numpy()
                merged = merged.filter(pa.array(first))
                merged = merged.take(
                    pc.sort_indices(
                        merged,
                        sort_keys=[(col, "ascending"), ("repo", "ascending"), ("path", "ascending")],
                    )
                )
            if merged.num_rows == 0:
                # a sub-file whose postings all died: remove it so file-level
                # state equals a from-scratch rebuild's (and empty parquets
                # don't accumulate). The part= DIRECTORY is deliberately
                # left: a sibling sub-shard task of the SAME sync may be
                # between its makedirs and its tmp write, and an rmdir here
                # would yank the directory out from under it
                try:
                    os.remove(pfile)
                except FileNotFoundError:
                    pass
            else:
                os.makedirs(os.path.dirname(pfile), exist_ok=True)
                tmp = pfile + f".tmp-{os.getpid()}"
                pq.write_table(merged, tmp, compression="lz4")
                os.replace(tmp, pfile)
            return pa.table(
                {"ipart": pa.array([ipart], pa.int32()), "rows": pa.array([merged.num_rows], pa.int64())}
            )

        stats = (
            feed.map_batches(deltas, batch_format="pyarrow")
            .groupby(["ipart", "sub"])
            .map_groups(merge_one, batch_format="pyarrow")
        )
        touched = stats.count()
        self.applied_epoch = to_epoch
        self.pending_to = None
        self._save_meta()
        return touched

    # ------------------------------------------------------------ lookups

    def lookup_keys(self, value: str) -> pa.Table:
        """Exact key list for one indexed value: reads ONE index partition
        (its S key-hash sub-files) with a parquet predicate —
        O(postings/P), never the base table."""
        ipart = int(
            stable_hash64(pa.array([value], pa.string()))[0] % np.uint64(self.num_partitions)
        )
        empty = pa.table({"repo": pa.array([], pa.string()), "path": pa.array([], pa.string())})
        parts = [empty]
        for sub in range(self.num_subshards):
            pfile = self._part_file(ipart, sub)
            if not os.path.exists(pfile):
                continue
            try:
                t = pq.read_table(pfile, filters=[(self.column, "=", value)])
            except FileNotFoundError:
                # raced a concurrent sync emptying this sub-file (its remove
                # is not atomic with the exists() probe) — gone means empty
                continue
            parts.append(t.select(["repo", "path"]))
        out = pa.concat_tables(parts)
        return out.take(
            pc.sort_indices(out, sort_keys=[("repo", "ascending"), ("path", "ascending")])
        )

    def lookup_rows(self, engine, value: str) -> pa.Table:
        """Live base rows whose indexed column equals `value`, read AS OF
        this index's applied epoch (consistent even while the base lake
        advances). Folds ONLY the base partitions the postings name — one
        Ray task each — instead of scanning all of them.

        Returns a driver-side Table: sized for SELECTIVE values (the
        point-lookup shape). For a value matching a large fraction of the
        table, filter `engine.snapshot_dataset()` instead — that stays a
        streaming Dataset and never lands on the driver."""
        from arches_rascoll_etl_ray.stages.merge import (
            empty_lake_table,
            fold_partition_tables,
            read_partition_state,
        )

        keys = self.lookup_keys(value)
        cfg = engine.cfg
        if keys.num_rows == 0:
            return empty_lake_table(cfg)
        ckpt = engine.checkpoint(self.applied_epoch)
        kh = key_hash64(keys)
        parts = np.unique(kh % np.uint64(cfg.num_partitions)).tolist()
        key_set = combine_key(keys)

        @ray.remote(num_cpus=1)
        def fold_filter(part: int, key_set: pa.Array) -> pa.Table:
            info = ckpt.partitions.get(int(part))
            if not info:
                return empty_lake_table(cfg)
            folded = fold_partition_tables(cfg, read_partition_state(cfg, info))
            return folded.filter(pc.is_in(combine_key(folded), value_set=key_set))

        key_ref = ray.put(key_set)
        tables = ray.get([fold_filter.remote(int(p), key_ref) for p in parts])
        out = pa.concat_tables([t for t in tables if t.num_rows] or [empty_lake_table(cfg)])
        # horizon-matched lookups make this a no-op; kept as a cheap guard.
        # Cast: postings store values AS STRINGS, so an index on an int
        # column must compare the base column stringified, not raw. The
        # base column is read under its CURRENT (possibly renamed) name.
        base_col = self._base_column(engine)
        out = out.filter(pc.equal(pc.cast(out[base_col], pa.string()), value))
        return out.take(
            pc.sort_indices(out, sort_keys=[("repo", "ascending"), ("path", "ascending")])
        )

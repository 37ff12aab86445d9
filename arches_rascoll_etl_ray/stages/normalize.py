"""Stateless per-batch event normalization (zero-copy Arrow in/out).

One ``map_batches(batch_format="pyarrow")`` stage that:

1. projects raw change events onto the current evolved schema
   (renames / adds-with-default / type-widens / computed columns — the
   engine's recast of the reference's config-driven remapping,
   arches_rascoll/ref_collection.py:88-198),
2. attaches lineage (`content_sha` — the per-row invariant from
   BASELINE.json input_hint),
3. assigns the shuffle keys: `_key` (exact composite), `_part`
   (stable hash % P) and `_salt` (sub-partition for hot-key salting),
4. pre-reduces within the batch: per key keep only the max-LSN event
   (the map-side combiner that keeps a hot key's shuffle volume at
   ≤1 row per key per batch).

Everything is vectorized pyarrow.compute / numpy — the reference's
`iterrows()` row loop (ref_collection.py:92-94) is exactly what this stage
replaces.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arches_rascoll_etl_ray.config import COMPUTED_FNS, EngineConfig, EvolutionSpec, arrow_type
from arches_rascoll_etl_ray.functions.hashing import key_hash64

KEY_COLUMNS = ("repo", "path")
META_COLUMNS = ("_key", "_kh", "_part", "_salt")

VALID_OPS = ("I", "U", "D", "P")


def quarantine_invalid_rows(batch: pa.Table, lake_dir: str) -> pa.Table:
    """Dead-letter routing: split off events that can never merge correctly
    — unknown `op`, null key column, or null `lsn` — write them to
    ``<lake>/_quarantine/`` and return only the valid rows. Without this a
    malformed producer row would silently fold as data (an unknown op is
    'not a delete', i.e. an upsert).

    All-valid batches (the overwhelming path) pay one vectorized mask and
    zero I/O. Quarantine files are content-hash-named, so a retried task
    rewrites identical bytes (atomic replace) — same idempotency contract
    as the spill pieces. Read back via CDCEngine.quarantine_dataset()."""
    if batch.num_rows == 0:
        return batch
    ok = pc.and_kleene(
        pc.is_in(batch["op"], value_set=pa.array(list(VALID_OPS))),
        pc.and_kleene(
            pc.and_kleene(pc.is_valid(batch["repo"]), pc.is_valid(batch["path"])),
            pc.is_valid(batch["lsn"]),
        ),
    )
    ok = pc.fill_null(ok, False)
    if pc.all(ok).as_py():
        return batch
    import hashlib
    import io
    import os

    import pyarrow.parquet as _pq

    bad = batch.filter(pc.invert(ok))
    buf = io.BytesIO()
    _pq.write_table(bad, buf)
    payload = buf.getvalue()
    name = f"quarantine-{hashlib.sha256(payload).hexdigest()[:16]}.parquet"
    qdir = os.path.join(lake_dir, "_quarantine")
    os.makedirs(qdir, exist_ok=True)
    tmp = os.path.join(qdir, f".tmp-{name}-{os.getpid()}")
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, os.path.join(qdir, name))
    return batch.filter(ok)


def evolved_base_columns(spec: EvolutionSpec | None) -> list[str]:
    """Names of the lake's payload columns under the current spec."""
    cols = ["repo", "path", "commit", "lang", "content"]
    if spec is None:
        return cols
    cols = [spec.renames.get(c, c) for c in cols]
    for a in spec.adds:
        if a.name not in cols:
            cols.append(a.name)
    for c in spec.computed:
        if c.name not in cols:
            cols.append(c.name)
    return cols


def apply_evolution(table: pa.Table, spec: EvolutionSpec | None) -> pa.Table:
    """Project a table (events or an old snapshot) onto the evolved schema.

    Pure Arrow metadata ops + casts; no data copies except computed columns.
    """
    if spec is None:
        return table
    for old, new in spec.renames.items():
        if old in KEY_COLUMNS:
            raise ValueError(f"key column {old!r} cannot be renamed")
        if old in table.column_names:
            table = table.rename_columns([new if c == old else c for c in table.column_names])
    for a in spec.adds:
        if a.name not in table.column_names:
            typ = arrow_type(a.type)
            fill = pa.nulls(table.num_rows, typ) if a.default is None else pa.array([a.default] * table.num_rows, type=typ)
            table = table.append_column(a.name, fill)
    for col, typ_name in spec.widens.items():
        if col in table.column_names:
            typ = arrow_type(typ_name)
            if table.schema.field(col).type != typ:
                idx = table.schema.get_field_index(col)
                table = table.set_column(idx, col, table[col].cast(typ))
    for c in spec.computed:
        if c.name not in table.column_names and c.source in table.column_names:
            table = table.append_column(c.name, COMPUTED_FNS[c.fn](table[c.source]))
    return table


def _adjacent_neq_arrays(r: pa.Array, p: pa.Array) -> np.ndarray:
    """row i differs from row i+1 on the (repo, path) arrays — O(n)."""
    n = len(r)
    neq = pc.or_(
        pc.not_equal(r.slice(0, n - 1), r.slice(1, n)),
        pc.not_equal(p.slice(0, n - 1), p.slice(1, n)),
    )
    return neq.to_numpy(zero_copy_only=False).astype(bool)


def _adjacent_key_neq(table: pa.Table) -> np.ndarray:
    """row i differs from row i+1 on the (repo, path) key — O(n) compares."""
    return _adjacent_neq_arrays(
        table["repo"].combine_chunks(), table["path"].combine_chunks()
    )


def lww_reduce(table: pa.Table, lsn_col: str = "lsn") -> pa.Table:
    """Keep the max-`lsn` row per (repo, path) key — the associative/
    commutative last-writer-wins fold (replaces the reference's
    dict-overwrite-in-arrival-order, arches_rascoll/ref_collection.py:142).

    Sorts on the precomputed 64-bit key hash (`_kh`, integer sort — much
    cheaper than sorting composite strings), then drops a row only when BOTH
    its hash AND its exact key equal the next row's (adjacent compares are
    O(n)). A hash collision between distinct keys keeps both rows (never
    wrong, merely unreduced — the exactness guard below re-reduces), while a
    true same-key run keeps exactly its max-lsn row. Idempotent:
    re-reducing reduced output is a no-op."""
    n = table.num_rows
    if n <= 1:
        return table
    if "_kh" in table.column_names:
        idx = pc.sort_indices(table, sort_keys=[("_kh", "ascending"), (lsn_col, "ascending")])
    else:
        idx = pc.sort_indices(
            table, sort_keys=[("repo", "ascending"), ("path", "ascending"), (lsn_col, "ascending")]
        )
    # Select winner indices on the KEY columns only, then gather the wide
    # table once — sorting/taking the whole table first would move the
    # content payload twice (sort-take all n rows + filter), which at high
    # per-key update factors is the dominant DRAM cost of the merge reduce.
    r_sorted = pc.take(table["repo"], idx).combine_chunks()
    p_sorted = pc.take(table["path"], idx).combine_chunks()
    mask = np.append(_adjacent_neq_arrays(r_sorted, p_sorted), True)  # last row per key run
    kept = table.take(idx.filter(pa.array(mask)))
    if "_kh" not in kept.column_names or kept.num_rows <= 1:
        return kept
    # Exactness guard: if two kept rows share a hash (either a true 64-bit
    # collision of distinct keys, or the same key interleaved with a
    # colliding key), re-reduce just those rows with an exact key sort.
    kh = kept["_kh"].to_numpy(zero_copy_only=False)
    dup = np.r_[False, kh[1:] == kh[:-1]]
    if not dup.any():
        return kept
    sus = dup | np.r_[dup[1:], False]  # both members of each equal-hash pair
    clean = kept.filter(pa.array(~sus))
    suspect = kept.filter(pa.array(sus))
    sidx = pc.sort_indices(
        suspect, sort_keys=[("repo", "ascending"), ("path", "ascending"), (lsn_col, "ascending")]
    )
    suspect = suspect.take(sidx)
    suspect = suspect.filter(pa.array(np.append(_adjacent_key_neq(suspect), True)))
    return pa.concat_tables([clean, suspect], promote_options="permissive")


def patch_aware_reduce(table: pa.Table, lsn_col: str = "lsn") -> pa.Table:
    """LWW combiner that understands partial-update events (op 'P': a row
    that sets ONLY its non-null value columns — Debezium-style partial
    images). Full-image rows (I/U/D and base rows) reduce by plain LWW; a
    patch row survives iff it is NEWER than its key's full-image winner (an
    older patch is wholly overwritten by the newer full image). Patches are
    NOT collapsed here: per-column winners can only be resolved exactly at
    the final fold (stages.merge.resolve_patches) — collapsing two partial
    states would lose per-column LSNs, breaking associativity. With no 'P'
    rows this is exactly lww_reduce (one vectorized op-scan overhead), so
    every pre-reduce call site routes through it unconditionally."""
    if table.num_rows == 0 or "op" not in table.column_names:
        return lww_reduce(table, lsn_col)
    is_p = pc.fill_null(pc.equal(table["op"], pa.scalar("P")), False)
    if not pc.any(is_p).as_py():
        return lww_reduce(table, lsn_col)
    full = table.filter(pc.invert(is_p))
    patches = table.filter(is_p)
    # a patch that sets NOTHING (every value column null) is a defined
    # no-op — without this filter it would still bump the row's lsn and,
    # worse, resurrect a tombstoned key as an all-null row
    skip = set(KEY_COLUMNS) | set(META_COLUMNS) | {lsn_col, "op", "content_sha"}
    val_cols = [c for c in patches.column_names if c not in skip]
    if val_cols:
        sets_any = pc.is_valid(patches[val_cols[0]])
        for c in val_cols[1:]:
            sets_any = pc.or_(sets_any, pc.is_valid(patches[c]))
        patches = patches.filter(sets_any)
        if patches.num_rows == 0:
            return lww_reduce(full, lsn_col) if full.num_rows else full
    wf = lww_reduce(full, lsn_col) if full.num_rows else full
    if wf.num_rows == 0:
        return patches
    import pandas as _pd

    from arches_rascoll_etl_ray.functions.hashing import combine_key as _ck

    wk = _ck(wf).to_pandas()
    floor = _pd.Series(
        wf[lsn_col].to_numpy(zero_copy_only=False), index=wk.to_numpy()
    )
    # duplicate winner keys are impossible post-reduce; map is total where defined
    pk = _ck(patches).to_pandas()
    base_lsn = pk.map(floor).fillna(0).to_numpy(dtype=np.int64)
    keep = patches[lsn_col].to_numpy(zero_copy_only=False) > base_lsn
    surviving = patches.filter(pa.array(keep))
    if surviving.num_rows == 0:
        return wf
    return pa.concat_tables([wf, surviving], promote_options="permissive")


FORGET_FILE = "_forgotten_keys.json"


def forget_list_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, FORGET_FILE)


def load_forget_list(lake_dir: str) -> list[dict]:
    """Persisted GDPR-erasure entries: [{"repo", "path", "lsn"}] where lsn is
    the erasure cutoff — events for that key at or below it are dropped at
    ingest on EVERY future replay/rebuild/bootstrap, so erased data can never
    resurrect from the changelog. Missing file → no erasures (the
    overwhelming path: zero cost, zero behavior change)."""
    import json as _json

    p = forget_list_path(lake_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return _json.load(f)["entries"]


def save_forget_list(lake_dir: str, entries: list[dict]) -> None:
    import json as _json

    os.makedirs(lake_dir, exist_ok=True)
    p = forget_list_path(lake_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"version": 1, "entries": sorted(entries, key=lambda e: (e["repo"], e["path"]))}, f)
    os.replace(tmp, p)


def apply_forget_filter(batch: pa.Table, entries: list[dict]) -> pa.Table:
    """Drop rows for erased keys up to each entry's cutoff lsn. Operates on
    RAW (pre-evolution) key columns — key identity is partitioning identity
    and never evolves. One vectorized pass per entry: erasure lists are
    request-bounded (person-scale, not data-scale), so E masks over the
    batch beat building a hash join for E≈10. Null keys never match
    (quarantine owns those)."""
    if not entries or batch.num_rows == 0:
        return batch
    drop = None
    for e in entries:
        m = pc.and_(
            pc.and_(
                pc.equal(batch["repo"], pa.scalar(e["repo"])),
                pc.equal(batch["path"], pa.scalar(e["path"])),
            ),
            pc.less_equal(batch["lsn"], pa.scalar(int(e["lsn"]), pa.int64())),
        )
        m = pc.fill_null(m, False)
        drop = m if drop is None else pc.or_(drop, m)
    return batch.filter(pc.invert(drop))


def apply_row_filter(batch: pa.Table, row_filter: tuple | None) -> pa.Table:
    """Per-table (column, value) equality predicate over RAW (pre-evolution)
    column names — the staging-table projection of a multi-table job.
    Tombstones always pass (deletes carry no payload to test; dropping them
    would strand rows in the filtered lake)."""
    if row_filter is None or batch.num_rows == 0:
        return batch
    col, value = row_filter
    mask = pc.equal(batch[col], pa.scalar(value))
    mask = pc.fill_null(mask, False)
    if "op" in batch.column_names:
        mask = pc.or_(mask, pc.equal(batch["op"], pa.scalar("D")))
    return batch.filter(mask)


def make_normalize_fn(cfg: EngineConfig) -> Callable[[pa.Table], pa.Table]:
    spec = cfg.evolution
    num_parts = cfg.num_partitions
    num_salts = max(1, cfg.salt_partitions)
    row_filter = cfg.row_filter
    # loaded once at plan-build time (driver side, lease held): erasure
    # entries are static for the duration of a replay
    forgotten = load_forget_list(cfg.lake_dir)

    def normalize(batch: pa.Table) -> pa.Table:
        if cfg.quarantine_invalid:
            batch = quarantine_invalid_rows(batch, cfg.lake_dir)
        if forgotten:
            batch = apply_forget_filter(batch, forgotten)
        batch = apply_row_filter(batch, row_filter)
        batch = apply_evolution(batch, spec)
        # NOTE: the content_sha lineage column is computed at MERGE time on
        # the per-key winners only (stages/merge.py) — hashing every event
        # here would do updates-per-key × the useful work and ship 64 more
        # bytes per row through the shuffle.
        kh = key_hash64(batch)
        part = (kh % np.uint64(num_parts)).astype(np.int32)
        if num_salts > 1:
            # salt spreads a hot partition's events across sub-groups; any
            # single key's events land in multiple salts and are re-reduced
            # in the final per-partition merge (stale-salted-winner safe
            # because LWW is associative).
            salt = ((kh // np.uint64(num_parts)) % np.uint64(num_salts)).astype(np.int32)
        else:
            salt = np.zeros(len(kh), dtype=np.int32)
        # _key itself is NOT carried: the composite string (~bytes of
        # repo+path again) would double key bandwidth through the shuffle;
        # merge recombines it only for the small winner/prev sets.
        batch = batch.append_column("_kh", pa.array(kh))  # int sort key for LWW
        batch = batch.append_column("_part", pa.array(part))
        if num_salts > 1:
            batch = batch.append_column("_salt", pa.array(salt))
        # map-side combiner (patch-aware: 'P' rows must not collapse here)
        return patch_aware_reduce(batch)

    return normalize


def make_salted_reduce_fn() -> Callable[[pa.Table], pa.Table]:
    """Partial LWW reduce for one (_part, _salt) sub-group — the first stage
    of the two-stage skew-safe reduce (north-rule salted sub-partitioning)."""

    def reduce_group(group: pa.Table) -> pa.Table:
        return patch_aware_reduce(group)

    return reduce_group

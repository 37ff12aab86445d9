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

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arches_rascoll_etl_ray.config import COMPUTED_FNS, EngineConfig, EvolutionSpec, arrow_type
from arches_rascoll_etl_ray.functions.hashing import combine_key, sha256_hex_column, stable_hash64

KEY_COLUMNS = ("repo", "path")
META_COLUMNS = ("_key", "_part", "_salt")


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


def lww_reduce(table: pa.Table, lsn_col: str = "lsn", key_col: str = "_key") -> pa.Table:
    """Keep exactly the max-`lsn` row per key — the associative/commutative
    last-writer-wins fold (replaces the reference's dict-overwrite-in-
    arrival-order, arches_rascoll/ref_collection.py:142). Arrow sort on
    (key, lsn) + an adjacent-shift boundary mask; exact (no hash collisions:
    the composite key string is compared, not its hash)."""
    n = table.num_rows
    if n <= 1:
        return table
    idx = pc.sort_indices(
        table, sort_keys=[(key_col, "ascending"), (lsn_col, "ascending")]
    )
    table = table.take(idx)
    keys = table[key_col].combine_chunks()
    neq = pc.not_equal(keys.slice(0, n - 1), keys.slice(1, n)).to_numpy(zero_copy_only=False)
    # null-safe: composite keys are never null
    mask = np.append(neq.astype(bool), True)  # last row of each equal-key run
    return table.filter(pa.array(mask))


def make_normalize_fn(cfg: EngineConfig) -> Callable[[pa.Table], pa.Table]:
    spec = cfg.evolution
    num_parts = cfg.num_partitions
    num_salts = max(1, cfg.salt_partitions)

    def normalize(batch: pa.Table) -> pa.Table:
        batch = apply_evolution(batch, spec)
        # lineage column: sha256(content) — null for deletes
        content_col = spec.renames.get("content", "content") if spec else "content"
        if "content_sha" not in batch.column_names:
            batch = batch.append_column("content_sha", sha256_hex_column(batch[content_col]))
        key = combine_key(batch)
        kh = stable_hash64(key)
        part = (kh % np.uint64(num_parts)).astype(np.int32)
        if num_salts > 1:
            # salt spreads a hot partition's events across sub-groups; any
            # single key's events land in multiple salts and are re-reduced
            # in the final per-partition merge (stale-salted-winner safe
            # because LWW is associative).
            salt = ((kh // np.uint64(num_parts)) % np.uint64(num_salts)).astype(np.int32)
        else:
            salt = np.zeros(len(kh), dtype=np.int32)
        batch = batch.append_column("_key", key)
        batch = batch.append_column("_part", pa.array(part))
        batch = batch.append_column("_salt", pa.array(salt))
        # map-side combiner
        return lww_reduce(batch)

    return normalize


def make_salted_reduce_fn() -> Callable[[pa.Table], pa.Table]:
    """Partial LWW reduce for one (_part, _salt) sub-group — the first stage
    of the two-stage skew-safe reduce (north-rule salted sub-partitioning)."""

    def reduce_group(group: pa.Table) -> pa.Table:
        return lww_reduce(group)

    return reduce_group

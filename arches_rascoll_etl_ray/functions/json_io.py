"""JSON cell handling — the reference's S2/S3/M3 operators.

- `try_parse_json_column`: parse JSON strings, swallowing decode errors to
  null (reference `make_transformed_value`, arches_rascoll/
  ref_collection.py:74-85: "except json.JSONDecodeError → None").
- `stringify_nested_columns` / `revive_json_columns`: serialize nested
  Arrow columns to JSON strings and back — the reference's CSV-checkpoint
  round-trip (`save_data_to_csv_with_objects_as_json` /
  `make_objs_from_json_strings`, ref_collection.py:30-71), needed for
  text-format sinks (CSV/JSONL) where Parquet's native nesting is absent.
"""

from __future__ import annotations

import json

import pyarrow as pa


def try_parse_json_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Parse each JSON string; invalid JSON or null → null. Returns a
    string-keyed map-free representation: python-object parse → Arrow
    inferred array when homogeneous, else JSON-normalized strings."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = []
    for v in arr.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            out.append(json.loads(v))
        except (json.JSONDecodeError, TypeError):
            out.append(None)
    return pa.array(out)


def json_extract_int_column(arr: pa.Array | pa.ChunkedArray, key: str) -> pa.Array:
    """Extract an integer field from JSON-object strings (null-safe,
    error→null) — vectorized enough for metadata columns."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out: list[int | None] = []
    for v in arr.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            d = json.loads(v)
            val = d.get(key) if isinstance(d, dict) else None
            out.append(int(val) if val is not None else None)
        except (json.JSONDecodeError, TypeError, ValueError):
            out.append(None)
    return pa.array(out, pa.int64())


def stringify_nested_columns(table: pa.Table, columns: list[str]) -> pa.Table:
    """Nested (struct/list/map) columns → canonical JSON strings
    (sort_keys, compact separators — sha256-stable, unlike the reference's
    default dict ordering)."""
    for col in columns:
        if col not in table.column_names:
            continue
        vals = table[col].to_pylist()
        js = pa.array(
            [None if v is None else json.dumps(v, sort_keys=True, separators=(",", ":")) for v in vals],
            pa.string(),
        )
        table = table.set_column(table.schema.get_field_index(col), col, js)
    return table


def revive_json_columns(table: pa.Table, columns: list[str]) -> pa.Table:
    """Inverse of stringify: JSON strings → nested Arrow values."""
    for col in columns:
        if col not in table.column_names:
            continue
        revived = try_parse_json_column(table[col])
        table = table.set_column(table.schema.get_field_index(col), col, revived)
    return table

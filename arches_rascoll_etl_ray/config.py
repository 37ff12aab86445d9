"""Engine configuration and the schema-evolution spec.

The evolution spec is the engine's user-extension surface — the Ray-native
analogue of the reference's mapping-config dicts
(``arches_rascoll/general_configs.py:98-162``, registry at ``:933-943``):
declarative renames / adds-with-default / type-widens / computed columns,
applied by a generic Arrow projector (see ``stages/normalize.py``) instead of
a row loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa

# Canonical change-event schema (BASELINE.json input_hint + engine columns).
# `lsn` is the total-order commit sequence number that replaces the
# reference's dict-insertion-order last-writer-wins
# (arches_rascoll/ref_collection.py:142).
EVENT_FIELDS: list[tuple[str, pa.DataType]] = [
    ("lsn", pa.int64()),
    ("op", pa.string()),  # 'I' | 'U' | 'D'
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.large_string()),
]

EVENT_SCHEMA = pa.schema(EVENT_FIELDS)

# Lake-row schema: the base columns plus lineage columns. `content_sha` is the
# per-row invariant the north rule judges on (sha256 of content).
LAKE_BASE_COLUMNS = ["repo", "path", "commit", "lang", "content"]
LAKE_LINEAGE_COLUMNS = ["lsn", "content_sha"]

_ARROW_TYPE_NAMES: dict[str, pa.DataType] = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "timestamp[us]": pa.timestamp("us"),
}


def arrow_type(name: str) -> pa.DataType:
    return _ARROW_TYPE_NAMES[name]


@dataclass(frozen=True)
class ComputedColumn:
    """A derived column — the analogue of the reference's
    TILE_DATA_COPY_FLAG copy-from-column sentinel
    (arches_rascoll/ref_collection.py:189-195): the value is a pure function
    of another column, computed at merge time."""

    name: str
    source: str
    fn: str  # registered function name: 'sha256' | 'len' | 'identity'


@dataclass(frozen=True)
class AddColumn:
    name: str
    type: str  # arrow type name
    default: object = None


@dataclass(frozen=True)
class EvolutionSpec:
    """Declarative schema evolution, applied as Arrow casts/projections.

    Mirrors the reference's config-driven column remapping
    (arches_rascoll/ref_collection.py:88-198): `renames` ≈ the
    stage_field_prefix+targ_field renaming (ref_collection.py:104), `adds` ≈
    default_values (ref_collection.py:143-147), `widens` ≈ the declared
    per-column SQL types (general_configs.py:48-56), `computed` ≈ tile-data
    derived values (ref_collection.py:185-195).
    """

    version: int = 1
    renames: dict[str, str] = field(default_factory=dict)  # old -> new
    adds: tuple[AddColumn, ...] = ()
    widens: dict[str, str] = field(default_factory=dict)  # col -> arrow type name
    computed: tuple[ComputedColumn, ...] = ()

    def to_json(self) -> dict:
        return {
            "version": self.version,
            "renames": dict(self.renames),
            "adds": [vars(a) for a in self.adds],
            "widens": dict(self.widens),
            "computed": [vars(c) for c in self.computed],
        }

    @staticmethod
    def from_json(d: dict) -> "EvolutionSpec":
        return EvolutionSpec(
            version=d.get("version", 1),
            renames=dict(d.get("renames", {})),
            adds=tuple(AddColumn(**a) for a in d.get("adds", [])),
            widens=dict(d.get("widens", {})),
            computed=tuple(ComputedColumn(**c) for c in d.get("computed", [])),
        )


def _sha256_hex_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 hex per row — single implementation shared with the merge-time
    lineage column (functions/hashing.sha256_hex_column) so EvolutionSpec-
    computed shas can never diverge from engine-computed ones."""
    from arches_rascoll_etl_ray.functions.hashing import sha256_hex_column

    return sha256_hex_column(arr)


def _utf8_len_array(arr):
    import pyarrow.compute as pc

    return pc.cast(pc.utf8_length(arr), pa.int64())


COMPUTED_FNS: dict[str, Callable[[pa.ChunkedArray], pa.Array]] = {
    "sha256": _sha256_hex_array,
    "identity": lambda arr: arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr,
    "len": _utf8_len_array,
}


def register_computed_fn(name: str, fn: Callable) -> None:
    """User-extension hook: register a named column transform usable from
    EvolutionSpec.computed — the engine's analogue of the reference's
    `value_transform` callable in mapping configs
    (arches_rascoll/general_configs.py:98-162). Must be pure and
    deterministic (replays re-run it)."""
    if name in COMPUTED_FNS:
        raise ValueError(f"computed fn {name!r} already registered")
    COMPUTED_FNS[name] = fn


@dataclass
class EngineConfig:
    """Physical configuration of one CDC lake.

    num_partitions is the ONE partitioning decision reused across every
    stage (shuffle key, lake layout, manifest granularity). At 100 TB scale
    set it to a few × cluster cores (e.g. 4096); blocks hash to partitions by
    a stable 64-bit key hash so the layout is machine-independent.
    """

    lake_dir: str
    num_partitions: int = 32
    # salted sub-partitioning for hot keys (north-rule skew handling): when
    # salt_partitions > 1, a first groupby on (_part, _salt) does a partial
    # LWW reduce before the per-partition merge, bounding any one group to
    # ~1/salt of a hot partition's events.
    salt_partitions: int = 1
    batch_size: int = 8192
    # epoch shuffle implementation:
    #  - "spill": normalize tasks write per-partition delta pieces
    #    (deterministic, content-addressed names → retry-idempotent WAL);
    #    one merge task per partition reads its pieces. No all-to-all sort;
    #    scales linearly with cores/nodes over a shared filesystem.
    #  - "sort": groupby('_part').map_groups via Ray's sort shuffle —
    #    object-store only, no intermediate files; use when no shared
    #    filesystem exists.
    shuffle: str = "spill"
    # merge mode:
    #  - "rewrite": every epoch folds the delta into a fresh partition
    #    snapshot file (exact rows/sha per epoch; best when epochs are
    #    large relative to the partition).
    #  - "lsm": the north-star sorted-run design — each epoch appends a
    #    key-sorted run (tombstones included); reads fold base+runs by LWW;
    #    when runs reach lsm_compact_threshold the partition compacts into
    #    a new base. Best for high-frequency small epochs at 10^10 scale
    #    (write amplification O(1) per event until compaction).
    merge_mode: str = "rewrite"
    lsm_compact_threshold: int = 4
    # where spill pieces live. None → <lake_dir>/_delta. Pieces are
    # transient AND deterministically re-creatable from the changelog, so
    # they can safely sit on fast non-durable storage (tmpfs / local NVMe):
    # correctness only depends on manifests + checkpoints, which always live
    # in the lake dir.
    delta_root: str | None = None
    evolution: EvolutionSpec | None = None
    # optional (column, value) equality predicate applied to every event
    # before the fold — the multi-table analogue of the reference's per-
    # mapping-config staging tables (one source stream, N filtered lakes,
    # arches_rascoll/ref_collection.py:201-248). Intended for IMMUTABLE
    # discriminator columns (e.g. lang): tombstones ('D' events) always pass
    # the filter, since deletes carry no payload to test.
    row_filter: tuple | None = None
    # compute the per-partition content sha256 in each manifest (lineage);
    # costs one hash pass per rewritten partition.
    manifest_content_sha: bool = True
    # route malformed events (unknown op, null key column, null lsn) to
    # <lake>/_quarantine/ instead of folding them as data (an unknown op is
    # otherwise "not a delete", i.e. silently an upsert). Read back via
    # CDCEngine.quarantine_dataset(). Off by default: a trusted producer
    # shouldn't pay the per-batch validity mask.
    quarantine_invalid: bool = False
    # test-only: enable the one-shot merge fault hook (see stages/merge.py)
    fault_injection: bool = False

"""Per-partition write-ahead manifests — the exactly-once sink.

Generalizes the reference's two idempotence mechanisms — `NOT IN` anti-join
guards in generated SQL (arches_rascoll/ref_collection.py:305-314) and
file-existence checkpoints (ref_collection.py:227-235) — into an atomic
commit protocol per (partition, epoch):

    1. write data to   part=P/.tmp-data_epoch{E}.parquet
    2. os.replace  ->  part=P/data_epoch{E}.parquet          (atomic)
    3. write manifest tmp, os.replace -> manifest_epoch{E}.json  (commit record)

A retried Ray task for the same (partition, epoch) finds the manifest and
returns it unchanged — re-apply is a no-op. Because epoch inputs are a
deterministic LSN range, the skipped work is guaranteed identical.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass


@dataclass
class PartitionManifest:
    partition: int
    epoch: int
    applied_lsn: int          # watermark: max LSN folded into this snapshot
    start_lsn: int            # offset range of the epoch slice (lineage)
    end_lsn: int
    rows: int
    events_applied: int
    data_file: str            # relative to the lake dir (the base snapshot)
    content_sha: str | None   # digest over key-sorted folded rows (None until
                              # a rewrite/compaction makes it cheap to know)
    # LSM mode: key-sorted delta runs (relative paths, oldest→newest) not yet
    # compacted into the base; reads fold base+runs by max-LSN
    runs: list | None = None
    rows_exact: bool = True   # False when `rows` is the LSM upper-bound estimate
    # EvolutionSpec version the on-disk bytes were written under; snapshot
    # digests recompute when this lags the engine's current spec
    evolution_version: int = 1

    def to_json(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_json(d: dict) -> "PartitionManifest":
        return PartitionManifest(**d)


def partition_dir(lake_dir: str, partition: int) -> str:
    return os.path.join(lake_dir, f"part={partition:05d}")


def data_file_name(epoch: int) -> str:
    return f"data_epoch{epoch:09d}.parquet"


def manifest_path(lake_dir: str, partition: int, epoch: int) -> str:
    return os.path.join(partition_dir(lake_dir, partition), f"manifest_epoch{epoch:09d}.json")


def atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_manifest(lake_dir: str, partition: int, epoch: int) -> PartitionManifest | None:
    p = manifest_path(lake_dir, partition, epoch)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return PartitionManifest.from_json(json.load(f))
    except (json.JSONDecodeError, KeyError, TypeError, ValueError):
        # torn write → treat as uncommitted; the deterministic merge will
        # rewrite data + manifest identically
        return None


def write_manifest(lake_dir: str, m: PartitionManifest) -> None:
    os.makedirs(partition_dir(lake_dir, m.partition), exist_ok=True)
    atomic_write_json(manifest_path(lake_dir, m.partition, m.epoch), m.to_json())

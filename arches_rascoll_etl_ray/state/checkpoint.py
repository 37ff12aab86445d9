"""Epoch checkpoints: the driver-side commit record for a whole epoch.

A checkpoint maps every partition to its latest committed snapshot
(epoch, data file, applied-LSN watermark, row count, content sha) plus the
stream offset range consumed. Resume = load the max committed epoch and
continue from ``end_lsn + 1`` — the Ray-native analogue of the reference's
"if the CSV exists, read it instead of recomputing"
(arches_rascoll/ref_collection.py:227-235; places.py:89-96).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from arches_rascoll_etl_ray.state.manifest import PartitionManifest, atomic_write_json

_CKPT_RE = re.compile(r"^epoch_(\d{9})\.json$")


@dataclass
class Checkpoint:
    epoch: int = 0
    end_lsn: int = 0
    evolution_version: int = 1
    # partition -> committed snapshot info (only partitions that have data)
    partitions: dict[int, dict] = field(default_factory=dict)
    # per-epoch lineage/throughput metrics (north-star requirement):
    # {"epoch", "start_lsn", "end_lsn", "events_applied", "duration_sec",
    #  "events_per_sec", "partitions_touched"}
    metrics: dict = field(default_factory=dict)

    def applied_lsn(self, partition: int) -> int:
        info = self.partitions.get(partition)
        return info["applied_lsn"] if info else 0

    def snapshot_file(self, partition: int) -> str | None:
        info = self.partitions.get(partition)
        return info["data_file"] if info else None

    def advanced(
        self,
        epoch: int,
        end_lsn: int,
        manifests: list[PartitionManifest],
        evolution_version: int | None = None,
        metrics: dict | None = None,
    ) -> "Checkpoint":
        parts = dict(self.partitions)
        for m in manifests:
            parts[m.partition] = {
                "epoch": m.epoch,
                "applied_lsn": m.applied_lsn,
                "rows": m.rows,
                "data_file": m.data_file,
                "content_sha": m.content_sha,
                "runs": list(m.runs or []),
                "rows_exact": m.rows_exact,
                "evolution_version": m.evolution_version,
            }
        return Checkpoint(
            epoch=epoch,
            end_lsn=end_lsn,
            evolution_version=self.evolution_version if evolution_version is None else evolution_version,
            partitions=parts,
            metrics=metrics or {},
        )

    def to_json(self) -> dict:
        return {
            "epoch": self.epoch,
            "end_lsn": self.end_lsn,
            "evolution_version": self.evolution_version,
            "committed": True,
            "metrics": self.metrics,
            "partitions": {str(k): v for k, v in self.partitions.items()},
        }

    @staticmethod
    def from_json(d: dict) -> "Checkpoint":
        return Checkpoint(
            epoch=d["epoch"],
            end_lsn=d["end_lsn"],
            evolution_version=d.get("evolution_version", 1),
            partitions={int(k): v for k, v in d["partitions"].items()},
            metrics=d.get("metrics", {}),
        )


def checkpoint_dir(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_checkpoints")


def save_checkpoint(lake_dir: str, ckpt: Checkpoint) -> str:
    d = checkpoint_dir(lake_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"epoch_{ckpt.epoch:09d}.json")
    atomic_write_json(path, ckpt.to_json())
    return path


def load_checkpoint_at(lake_dir: str, epoch: int) -> Checkpoint:
    """The committed checkpoint for an EXACT epoch — the time-travel anchor.
    Epoch 0 is the empty lake. Raises FileNotFoundError when that epoch was
    never committed or its files were vacuumed away (vacuum deletes
    superseded data files AND every non-latest checkpoint JSON, so the
    time-travel horizon is 'since the last vacuum' — same contract as any
    lake-format VACUUM; pinned by tests/test_evolution.py)."""
    if epoch == 0:
        return Checkpoint()
    path = os.path.join(checkpoint_dir(lake_dir), f"epoch_{epoch:09d}.json")
    try:
        with open(path) as f:
            return Checkpoint.from_json(json.load(f))
    except OSError as e:
        raise FileNotFoundError(
            f"no committed checkpoint for epoch {epoch} at {path} "
            "(never committed, or vacuumed)"
        ) from e


def list_checkpoints(lake_dir: str) -> list[tuple[int, str]]:
    """(epoch, path) of every retained checkpoint JSON, ascending — the ONE
    place that knows the filename convention (load_latest_checkpoint,
    vacuum and metrics_history all route through it)."""
    d = checkpoint_dir(lake_dir)
    out: list[tuple[int, str]] = []
    if os.path.isdir(d):
        for name in os.listdir(d):
            m = _CKPT_RE.match(name)
            if m:
                out.append((int(m.group(1)), os.path.join(d, name)))
    return sorted(out)


def load_latest_checkpoint(lake_dir: str) -> Checkpoint:
    """Max committed *parseable* epoch, or the empty epoch-0 checkpoint.

    Checkpoints are written atomically (tmp+rename), but a disk-full or
    torn write can still leave an unparseable file; recovery falls back to
    the newest epoch that parses (replaying the skipped epoch is safe —
    manifests make it a no-op)."""
    candidates = list_checkpoints(lake_dir)
    for _, path in sorted(candidates, reverse=True):
        try:
            with open(path) as f:
                return Checkpoint.from_json(json.load(f))
        except (json.JSONDecodeError, KeyError, ValueError):
            continue  # torn/corrupt — fall back to the previous epoch
    return Checkpoint()

"""Per-partition LWW upsert merge — the heart of the CDC engine.

Recasts the reference's `prep_transformed_data` fold (group raw rows by
primary key, later rows overwrite earlier field values —
arches_rascoll/ref_collection.py:88-198, overwrite at :142) as a
key-partitioned, idempotent merge:

    events(partition) ──lww_reduce──> winners
    prev snapshot ──evolve/cast──> prev rows
    prev rows whose key ∈ winners are dropped   (upsert)
    winners with op != 'D' are appended          (delete = tombstone)
    result sorted by (repo, path)                (deterministic sha,
                                                  cf. ORDER BY at
                                                  ref_collection.py:415)
    atomic write + manifest                      (exactly-once,
                                                  cf. NOT IN guards at
                                                  ref_collection.py:305-314)

Runs inside ``groupby('_part').map_groups(batch_format='pyarrow')`` — one
task per touched partition per epoch. Partitioning assumption: one
partition's *epoch delta* (post-combiner: ≤ one row per touched key) fits in
a task's heap; the full snapshot is streamed from / to Parquet, and
`num_partitions` is sized so snapshot_rows/P stays bounded at scale.
"""

from __future__ import annotations

import os
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.functions.hashing import combine_key, table_content_sha256
from arches_rascoll_etl_ray.stages.normalize import apply_evolution, evolved_base_columns, lww_reduce
from arches_rascoll_etl_ray.state.manifest import (
    PartitionManifest,
    data_file_name,
    partition_dir,
    read_manifest,
    write_manifest,
)

STATS_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("epoch", pa.int64()),
        ("rows", pa.int64()),
        ("events_applied", pa.int64()),
        ("applied_lsn", pa.int64()),
        ("content_sha", pa.string()),
        ("data_file", pa.string()),
    ]
)


def _stats_row(m: PartitionManifest) -> pa.Table:
    return pa.Table.from_pylist(
        [
            {
                "partition": m.partition,
                "epoch": m.epoch,
                "rows": m.rows,
                "events_applied": m.events_applied,
                "applied_lsn": m.applied_lsn,
                "content_sha": m.content_sha or "",
                "data_file": m.data_file,
            }
        ],
        schema=STATS_SCHEMA,
    )


def lake_columns(cfg: EngineConfig) -> list[str]:
    return evolved_base_columns(cfg.evolution) + ["lsn", "content_sha"]


def make_merge_fn(
    cfg: EngineConfig,
    epoch: int,
    start_lsn: int,
    end_lsn: int,
    prev_partitions: dict[int, dict],
) -> Callable[[pa.Table], pa.Table]:
    """Build the per-group merge function for one epoch.

    `prev_partitions` (the previous checkpoint's partition map) is small —
    one dict entry per partition — and is closure-captured, i.e. shipped
    once per task, not per batch.
    """
    lake_dir = cfg.lake_dir
    out_cols = lake_columns(cfg)

    def merge(group: pa.Table) -> pa.Table:
        part = group["_part"][0].as_py()
        # Idempotent retry / resume guard: the manifest IS the commit record.
        existing = read_manifest(lake_dir, part, epoch)
        if existing is not None:
            return _stats_row(existing)

        prev = prev_partitions.get(part)
        watermark = prev["applied_lsn"] if prev else 0

        # Drop duplicate deliveries / already-applied events (the anti-join
        # idempotence semantics, generalized to an LSN watermark).
        if watermark > 0:
            group = group.filter(pc.greater(group["lsn"], pa.scalar(watermark, pa.int64())))

        pdir = partition_dir(lake_dir, part)
        os.makedirs(pdir, exist_ok=True)

        if group.num_rows == 0:
            # Pure duplicate delivery: commit a manifest that carries the
            # previous snapshot forward unchanged.
            m = PartitionManifest(
                partition=part,
                epoch=epoch,
                applied_lsn=watermark,
                start_lsn=start_lsn,
                end_lsn=end_lsn,
                rows=prev["rows"] if prev else 0,
                events_applied=0,
                data_file=prev["data_file"] if prev else "",
                content_sha=prev.get("content_sha") if prev else None,
            )
            write_manifest(lake_dir, m)
            return _stats_row(m)

        events_applied = group.num_rows
        winners = lww_reduce(group)

        prev_kept: pa.Table | None = None
        if prev and prev["data_file"]:
            prev_tbl = pq.read_table(os.path.join(lake_dir, prev["data_file"]))
            prev_tbl = apply_evolution(prev_tbl, cfg.evolution)
            prev_key = combine_key(prev_tbl)
            keep = pc.invert(pc.is_in(prev_key, value_set=winners["_key"].combine_chunks()))
            prev_kept = prev_tbl.filter(keep).select(out_cols)

        live = winners.filter(pc.not_equal(winners["op"], pa.scalar("D"))).select(out_cols)
        parts = [t for t in (prev_kept, live) if t is not None and t.num_rows > 0]
        if parts:
            result = pa.concat_tables(parts, promote_options="permissive")
        else:
            result = live  # empty, correct schema
        result = result.take(
            pc.sort_indices(result, sort_keys=[("repo", "ascending"), ("path", "ascending")])
        )

        applied_lsn = max(watermark, pc.max(group["lsn"]).as_py())
        fname = data_file_name(epoch)
        final_path = os.path.join(pdir, fname)
        tmp_path = os.path.join(pdir, "." + fname + ".tmp")
        pq.write_table(result, tmp_path, row_group_size=128 * 1024)
        os.replace(tmp_path, final_path)

        sha = None
        if cfg.manifest_content_sha:
            sha_cols = [c for c in result.column_names if c != evolved_content_col(cfg)]
            sha = table_content_sha256(result, sha_cols)

        m = PartitionManifest(
            partition=part,
            epoch=epoch,
            applied_lsn=applied_lsn,
            start_lsn=start_lsn,
            end_lsn=end_lsn,
            rows=result.num_rows,
            events_applied=events_applied,
            data_file=os.path.join(f"part={part:05d}", fname),
            content_sha=sha,
        )
        write_manifest(lake_dir, m)
        return _stats_row(m)

    return merge


def evolved_content_col(cfg: EngineConfig) -> str:
    spec = cfg.evolution
    return spec.renames.get("content", "content") if spec else "content"

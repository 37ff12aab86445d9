"""Change-log (binlog/WAL) source: LSN-range-pruned Parquet tailing.

Shards are named ``changelog-<startlsn>-<endlsn>[-<idx>].{parquet,csv}`` so an
epoch read prunes at the file level before any bytes move — the "prune at
the read" rule. Residual rows outside the epoch's (start, end] range are
filtered in the first map_batches pass. Parquet is the native format; CSV
shards (the reference's source format, arches_rascoll/ref_collection.py:210)
are supported with quoted-newline handling.
"""

from __future__ import annotations

import os
import re

_SHARD_RE = re.compile(r"^changelog-(\d+)-(\d+)(?:-\d+)?\.(parquet|csv)$")


def list_shards(changelog_dir: str) -> list[tuple[int, int, str]]:
    """Missing dir → no shards yet (lets `tail`/`status` start before the
    producer creates the WAL directory)."""
    if not os.path.isdir(changelog_dir):
        return []
    out = []
    for name in sorted(os.listdir(changelog_dir)):
        m = _SHARD_RE.match(name)
        if m:
            out.append((int(m.group(1)), int(m.group(2)), os.path.join(changelog_dir, name)))
    return out


def shards_for_range(changelog_dir: str, start_lsn: int, end_lsn: int) -> list[str]:
    """Files overlapping the half-open LSN range (start_lsn, end_lsn]."""
    return [p for lo, hi, p in list_shards(changelog_dir) if hi > start_lsn and lo <= end_lsn]


def max_available_lsn(changelog_dir: str) -> int:
    shards = list_shards(changelog_dir)
    return max((hi for _, hi, _ in shards), default=0)


def read_shard_dataset(files: list[str]):
    """Build a Dataset over changelog shard files (parquet or CSV)."""
    import ray.data

    if not files:
        raise ValueError("no changelog shards for requested LSN range")
    if files[0].endswith(".csv"):
        import pyarrow as pa
        from pyarrow import csv as pacsv

        return ray.data.read_csv(
            files,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
            convert_options=pacsv.ConvertOptions(
                column_types={"lsn": pa.int64()}, strings_can_be_null=True
            ),
        )
    return ray.data.read_parquet(files)

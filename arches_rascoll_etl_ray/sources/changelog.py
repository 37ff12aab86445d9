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


def _redact_shard(path: str, entries: list[dict]) -> int:
    """Rewrite ONE shard dropping events matching the erasure entries.
    Module-level so Ray ships the function. tmp+rename keeps a killed task
    from leaving a torn shard; the rewrite is deterministic, so retries
    converge on identical bytes. Returns events removed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from arches_rascoll_etl_ray.stages.normalize import apply_forget_filter

    if path.endswith(".csv"):
        import pyarrow.csv as pacsv

        t = pacsv.read_csv(
            path,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
            convert_options=pacsv.ConvertOptions(
                column_types={"lsn": pa.int64()}, strings_can_be_null=True
            ),
        )
    else:
        t = pq.read_table(path)
    kept = apply_forget_filter(t, entries)
    removed = t.num_rows - kept.num_rows
    if removed == 0:
        return 0
    tmp = path + ".tmp"
    if path.endswith(".csv"):
        kept.to_pandas().to_csv(tmp, index=False)
    else:
        pq.write_table(kept, tmp, row_group_size=64 * 1024, compression="lz4")
    os.replace(tmp, path)
    return removed


def redact_changelog(changelog_dir: str, entries: list[dict]) -> int:
    """GDPR redaction of the WAL itself — the producer-side half of key
    erasure (CDCEngine.forget erases the LAKE and bans re-ingest; this
    rewrites the retained changelog shards so the erased events' bytes are
    gone at the source too). Entries use the forget-list shape
    ({"repo", "path", "lsn"}: key equality AND lsn <= cutoff). One Ray task
    per shard, harvested in bounded waves; shard NAMES are preserved — a
    post-redaction shard's (lo, hi) range claim is a superset of its
    contents, which LSN pruning tolerates (it may read a shard needlessly,
    never skip one wrongly). After redaction a from-scratch replay WITHOUT
    any ban list converges to the post-erasure state, because the events no
    longer exist. Returns total events removed."""
    import ray as _ray

    if not entries:
        return 0
    files = [p for _, _, p in list_shards(changelog_dir)]
    if not files:
        return 0
    task = _ray.remote(num_cpus=1, max_retries=3, retry_exceptions=True)(_redact_shard)
    refs = [task.remote(p, entries) for p in files]
    removed = 0
    while refs:
        done, refs = _ray.wait(refs, num_returns=min(64, len(refs)))
        removed += sum(_ray.get(done))
    return removed


def compact_changelog(changelog_dir: str, out_dir: str, num_shards: int = 64) -> int:
    """Kafka-style log compaction of the WAL: write a new changelog that
    keeps, per key, only the max-LSN full image (I/U/D — tombstones are
    RETAINED so deletes still propagate) plus any newer partial-update 'P'
    events (collapsing patches would lose per-column LSNs — exactly
    stages.normalize.patch_aware_reduce's associative contract, which this
    reuses verbatim). Replaying the compacted log converges to the
    IDENTICAL final state (sha-pinned in tests) while bootstrap cost drops
    from O(events) to O(keys + live patches).

    Distributed shape: per-batch combiner (patch_aware_reduce — a key's
    events collapse map-side before the shuffle), one key-hash shard
    groupby (the engine's standard constant-shard exact reduce), and each
    shard task writes its own LSN-range-named output shard tmp+rename
    (retried tasks write a duplicate shard under a fresh suffix —
    duplicate delivery, which the LWW fold absorbs sha-identically).
    Original LSNs are preserved, so watermarks/epoch splits over the
    compacted log mean what they meant. Returns events written."""
    import uuid as _uuid

    import numpy as np
    import pyarrow as pa

    from arches_rascoll_etl_ray.functions.hashing import key_hash64
    from arches_rascoll_etl_ray.stages.normalize import patch_aware_reduce

    files = [p for _, _, p in list_shards(changelog_dir)]
    ds = read_shard_dataset(files)
    os.makedirs(out_dir, exist_ok=True)

    def pre(t: "pa.Table") -> "pa.Table":
        t = patch_aware_reduce(t)
        kh = key_hash64(t)
        t = t.append_column("_kh", pa.array(kh))  # int sort key for the reduce
        return t.append_column(
            "_shard", pa.array((kh % np.uint64(num_shards)).astype(np.int32))
        )

    def compact_shard(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = patch_aware_reduce(t.drop_columns(["_shard"])).drop_columns(["_kh"])
        if t.num_rows:
            lo = pc.min(t["lsn"]).as_py()
            hi = pc.max(t["lsn"]).as_py()
            suffix = _uuid.uuid4().int % 10**12
            p = os.path.join(out_dir, f"changelog-{lo:012d}-{hi:012d}-{suffix:012d}.parquet")
            pq.write_table(t, p + ".tmp", row_group_size=64 * 1024, compression="lz4")
            os.replace(p + ".tmp", p)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    stats = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(compact_shard, batch_format="pyarrow")
    )
    return int(stats.sum("n") or 0)

"""Bootstrap (initial load + CDC handoff) conformance.

The contract: bootstrap(snapshot_at_H, as_of_lsn=H) followed by tailing
the changelog from H must land byte-identically (content sha) on the
same final state as replaying the WHOLE changelog from scratch — the
snapshot+binlog-position handoff every CDC deployment starts with.
"""

import pyarrow.parquet as pq
import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clog_boot"))
    return ensure_changelog(root, num_files=300, num_events=3000, seed=31, num_shards=8)


def test_bootstrap_handoff_equals_full_replay(changelog, tmp_path):
    # ground truth: full replay
    full = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "full"), num_partitions=8))
    full.replay(changelog, events_per_epoch=1000)
    want_sha = full.snapshot_sha256()

    # source-of-snapshot: an independent lake stopped at lsn H
    H = 1500
    src = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "src"), num_partitions=8))
    src.apply_epoch(changelog, end_lsn=H)
    snap = src.snapshot_table()

    # bootstrap a fresh lake from that snapshot (as a pyarrow Table), then tail
    boot = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "boot"), num_partitions=8))
    ckpt = boot.bootstrap(snap, as_of_lsn=H)
    assert ckpt.epoch == 1 and ckpt.end_lsn == H
    assert sum(i["rows"] for i in ckpt.partitions.values()) == snap.num_rows
    boot.replay(changelog, events_per_epoch=700)
    assert boot.snapshot_sha256() == want_sha

    # and from a parquet path (the export/import route), different partition
    # count from the source lake to prove the load re-partitions
    p = str(tmp_path / "snap.parquet")
    pq.write_table(snap, p)
    boot2 = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "boot2"), num_partitions=5))
    boot2.bootstrap(p, as_of_lsn=H)
    boot2.replay(changelog, events_per_epoch=1000)
    full5 = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "full5"), num_partitions=5))
    full5.replay(changelog, events_per_epoch=1000)
    assert boot2.snapshot_sha256() == full5.snapshot_sha256()


def test_bootstrap_guards(changelog, tmp_path):
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    with pytest.raises(ValueError, match="as_of_lsn"):
        eng.bootstrap(None, as_of_lsn=0)
    eng.apply_epoch(changelog, max_events=500)
    import pyarrow as pa

    t = pa.table({"repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["l"], "content": ["x"]})
    with pytest.raises(ValueError, match="empty lake"):
        eng.bootstrap(t, as_of_lsn=10)


def test_bootstrap_rerun_same_args_is_idempotent(changelog, tmp_path):
    """Crash simulation: a bootstrap whose checkpoint commit never landed
    re-runs with the same as_of_lsn and converges (manifests no-op)."""
    import os

    H = 1000
    src = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "src"), num_partitions=4))
    src.apply_epoch(changelog, end_lsn=H)
    snap = src.snapshot_table()

    lake = str(tmp_path / "boot")
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    eng.bootstrap(snap, as_of_lsn=H)
    sha1 = eng.snapshot_sha256()
    # roll the checkpoint back to simulate a crash after merges, before commit
    for f in os.listdir(os.path.join(lake, "_checkpoints")):
        os.remove(os.path.join(lake, "_checkpoints", f))
    eng2 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    eng2.bootstrap(snap, as_of_lsn=H)
    assert eng2.snapshot_sha256() == sha1


def test_bootstrap_multiblock_snapshot_loses_no_rows(changelog, tmp_path):
    """Regression: every bootstrap row shares one lsn, so the spill piece
    name must incorporate the KEY hash — an lsn-only content hash collapses
    to two names per partition (row-count parity) and later blocks' atomic
    replace silently destroyed earlier blocks' pieces."""
    src = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "src"), num_partitions=8))
    src.apply_epoch(changelog, end_lsn=2000)
    snap = src.snapshot_table().drop_columns(["lsn"])  # generic snapshot: constant-lsn load

    # four parquet files → four read blocks → four spill calls per partition
    paths = []
    step = -(-snap.num_rows // 4)
    for i in range(4):
        part = snap.slice(i * step, step)
        p = str(tmp_path / f"snap_{i}.parquet")
        pq.write_table(part, p)
        paths.append(p)

    boot = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "boot"), num_partitions=2))
    ckpt = boot.bootstrap(paths, as_of_lsn=2000)
    assert sum(i["rows"] for i in ckpt.partitions.values()) == snap.num_rows
    got = boot.snapshot_table()
    assert got.num_rows == snap.num_rows
    assert sorted(zip(*[got[c].to_pylist() for c in ("repo", "path", "content")])) == sorted(
        zip(*[snap[c].to_pylist() for c in ("repo", "path", "content")])
    )

"""WAL log compaction (Kafka-style): the compacted changelog must replay
to the sha-identical final state with strictly fewer events, retain
tombstones (deletes still propagate), and keep patch chains uncollapsed
(per-column LWW still exact through a compacted log)."""

import pandas as pd
import pyarrow.compute as pc

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import (
    ensure_changelog,
    write_changelog_shards,
)
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine
from arches_rascoll_etl_ray.sources.changelog import (
    compact_changelog,
    list_shards,
    max_available_lsn,
)


def _count_events(clog):
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(p).metadata.num_rows for _, _, p in list_shards(clog))


def test_compacted_log_replays_sha_identical_with_fewer_events(tmp_path):
    clog = ensure_changelog(
        str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8
    )
    a = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_a"), num_partitions=4))
    a.replay(clog, events_per_epoch=1000)

    out = str(tmp_path / "clog_compacted")
    written = compact_changelog(clog, out)
    assert 0 < written < _count_events(clog)  # genuinely compacted
    assert max_available_lsn(out) == max_available_lsn(clog)  # lsns preserved

    b = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_b"), num_partitions=4))
    b.replay(out, events_per_epoch=10_000)
    assert b.snapshot_sha256() == a.snapshot_sha256()


def test_compaction_retains_tombstones_and_patch_chains(tmp_path):
    # key k1: updated then deleted (tombstone must survive compaction);
    # key k2: full image then TWO patches setting different columns (both
    # must survive — collapsing would lose the commit fragment)
    df = pd.DataFrame(
        {
            "lsn": [1, 2, 3, 4, 5, 6],
            "op": ["U", "U", "D", "U", "P", "P"],
            "repo": ["r1", "r1", "r1", "r2", "r2", "r2"],
            "path": ["a", "a", "a", "b", "b", "b"],
            "commit": ["c1", "c2", None, "c4", "c5", None],
            "lang": ["py", "py", None, "go", None, "rs"],
            "content": ["v1", "v2", None, "base", None, None],
        }
    )
    clog = str(tmp_path / "clog")
    write_changelog_shards(df, clog, num_shards=2)

    out = str(tmp_path / "compacted")
    written = compact_changelog(clog, out, num_shards=4)
    # k1 → its lsn-3 tombstone; k2 → lsn-4 full image + both newer patches
    assert written == 4
    import pyarrow.parquet as pq

    rows = []
    for _, _, p in list_shards(out):
        rows.extend(pq.read_table(p).to_pylist())
    by_key = {}
    for r in rows:
        by_key.setdefault((r["repo"], r["path"]), []).append((r["lsn"], r["op"]))
    assert sorted(by_key[("r1", "a")]) == [(3, "D")]
    assert sorted(by_key[("r2", "b")]) == [(4, "U"), (5, "P"), (6, "P")]

    # and both logs fold to the same final state (per-column patch LWW)
    a = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_a"), num_partitions=2))
    a.replay(clog, events_per_epoch=100)
    b = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_b"), num_partitions=2))
    b.replay(out, events_per_epoch=100)
    assert b.snapshot_sha256() == a.snapshot_sha256()
    snap = b.snapshot_table()
    row = snap.filter(pc.equal(snap["repo"], "r2")).to_pylist()[0]
    assert row["commit"] == "c5" and row["lang"] == "rs"  # fragments merged


def test_replay_epochs_with_zero_events_in_range(tmp_path):
    """Regression: the batched-spill plan crashed (NameError on the
    crashed-attempt fallback import) on any epoch whose LSN slice contained
    zero events — exactly what a compacted log produces, since survivors
    cluster at high LSNs. Empty epochs must commit cleanly and the final
    state must match a single-epoch replay."""
    df = pd.DataFrame(
        {
            "lsn": [901, 902, 903],
            "op": ["U", "U", "U"],
            "repo": ["r1", "r2", "r3"],
            "path": ["a", "b", "c"],
            "commit": ["c1", "c2", "c3"],
            "lang": ["py", "go", "rs"],
            "content": ["x", "y", "z"],
        }
    )
    clog = str(tmp_path / "clog")
    write_changelog_shards(df, clog, num_shards=1)

    a = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_a"), num_partitions=2))
    a.replay(clog, events_per_epoch=100)  # epochs 1..9 empty, epoch 10 full
    b = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_b"), num_partitions=2))
    b.replay(clog, events_per_epoch=10_000)
    assert a.snapshot_table().num_rows == 3
    assert a.snapshot_sha256() == b.snapshot_sha256()


def test_replay_gap_epochs_sort_plan(tmp_path):
    """Same WAL-gap contract through the object-store sort plan."""
    df = pd.DataFrame(
        {
            "lsn": [901, 902, 903],
            "op": ["U", "U", "U"],
            "repo": ["r1", "r2", "r3"],
            "path": ["a", "b", "c"],
            "commit": ["c1", "c2", "c3"],
            "lang": ["py", "go", "rs"],
            "content": ["x", "y", "z"],
        }
    )
    clog = str(tmp_path / "clog")
    write_changelog_shards(df, clog, num_shards=1)
    a = CDCEngine(
        EngineConfig(lake_dir=str(tmp_path / "lake_a"), num_partitions=2, shuffle="sort")
    )
    a.replay(clog, events_per_epoch=100)
    assert a.snapshot_table().num_rows == 3
    b = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_b"), num_partitions=2))
    b.replay(clog, events_per_epoch=10_000)
    assert a.snapshot_sha256() == b.snapshot_sha256()

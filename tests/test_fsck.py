"""CDCEngine.fsck: the distributed integrity audit must pass on a healthy
lake (rewrite and LSM modes, during and after runs) and flag each corruption
class — missing files, torn parquet, tampered rows, watermark violations."""

import os

import pyarrow.parquet as pq

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine


def _lake(tmp_path, **cfg):
    clog = ensure_changelog(
        str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8
    )
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4, **cfg))
    eng.replay(clog, events_per_epoch=1000)
    return eng


def _part_file(eng, part=None):
    ckpt = eng.checkpoint()
    items = sorted(ckpt.partitions.items())
    for p, info in items:
        if info.get("data_file") and info["rows"] > 0 and (part is None or p == part):
            return p, os.path.join(eng.cfg.lake_dir, info["data_file"])
    raise AssertionError("no non-empty partition")


def test_fsck_clean_lake_all_ok(tmp_path):
    eng = _lake(tmp_path)
    t = eng.fsck().to_pandas().set_index("partition")
    assert (t["ok"] == 1).all()
    assert t["rows"].sum() == eng.snapshot_table().num_rows


def test_fsck_clean_lsm_lake_with_pending_runs(tmp_path):
    eng = _lake(tmp_path, merge_mode="lsm", lsm_compact_threshold=100)
    ckpt = eng.checkpoint()
    assert any(i.get("runs") for i in ckpt.partitions.values())  # runs pending
    t = eng.fsck().to_pandas()
    assert (t["ok"] == 1).all()
    eng.compact()
    t2 = eng.fsck().to_pandas()
    assert (t2["ok"] == 1).all()


def test_fsck_flags_missing_and_torn_files(tmp_path):
    eng = _lake(tmp_path)
    p1, f1 = _part_file(eng)
    os.remove(f1)
    t = eng.fsck().to_pandas().set_index("partition")
    assert t.loc[p1, "files_ok"] == 0 and t.loc[p1, "ok"] == 0
    assert (t.drop(index=p1)["ok"] == 1).all()

    eng2 = _lake(tmp_path / "b")
    p2, f2 = _part_file(eng2)
    with open(f2, "wb") as f:
        f.write(b"not a parquet file")
    t2 = eng2.fsck().to_pandas().set_index("partition")
    assert t2.loc[p2, "files_ok"] == 0 and t2.loc[p2, "ok"] == 0


def test_fsck_flags_tampered_rows_and_watermark(tmp_path):
    import pyarrow as pa
    import pyarrow.compute as pc

    eng = _lake(tmp_path)
    p, f = _part_file(eng)
    tbl = pq.read_table(f)

    # tamper a non-content column: the recorded content_sha must not match
    tampered = tbl.set_column(
        tbl.schema.get_field_index("commit"),
        "commit",
        pa.array(["deadbeef"] * tbl.num_rows, tbl["commit"].type),
    )
    pq.write_table(tampered, f)
    t = eng.fsck().to_pandas().set_index("partition")
    assert t.loc[p, "sha_ok"] == 0 and t.loc[p, "ok"] == 0

    # restore, then push one row's lsn past the committed watermark
    pq.write_table(tbl, f)
    assert eng.fsck().to_pandas()["ok"].all()
    bumped = tbl.set_column(
        tbl.schema.get_field_index("lsn"),
        "lsn",
        pc.add(tbl["lsn"], pa.scalar(10_000_000, pa.int64())),
    )
    pq.write_table(bumped, f)
    t2 = eng.fsck().to_pandas().set_index("partition")
    assert t2.loc[p, "watermark_ok"] == 0 and t2.loc[p, "ok"] == 0


def test_fsck_flags_misrouted_key(tmp_path):
    import pyarrow as pa

    eng = _lake(tmp_path)
    p, f = _part_file(eng)
    tbl = pq.read_table(f)
    # rewrite the first row's key to one that hashes elsewhere (with P=4 at
    # 300 files, some repo in the lake routes to a different partition)
    other = None
    for q, g in [(_part_file(eng, part=q)) for q in range(4) if q != p]:
        ot = pq.read_table(g)
        if ot.num_rows:
            other = ot["repo"][0].as_py(), ot["path"][0].as_py()
            break
    assert other is not None
    repo = tbl["repo"].to_pylist()
    path = tbl["path"].to_pylist()
    repo[0], path[0] = other
    tampered = tbl.set_column(
        tbl.schema.get_field_index("repo"), "repo", pa.array(repo, tbl["repo"].type)
    ).set_column(
        tbl.schema.get_field_index("path"), "path", pa.array(path, tbl["path"].type)
    )
    pq.write_table(tampered, f)
    t = eng.fsck().to_pandas().set_index("partition")
    assert t.loc[p, "routing_ok"] == 0 and t.loc[p, "ok"] == 0


def test_repair_partition_heals_tampered_file(tmp_path):
    """fsck→repair round trip: tamper a partition file, fsck flags it,
    repair rebuilds from the changelog and fsck goes green with the
    snapshot byte-identical to the pre-tamper state."""
    import pyarrow as pa

    clog = ensure_changelog(
        str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8
    )
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.replay(clog, events_per_epoch=1000)
    before = eng.snapshot_table().to_pandas()
    sha_before = eng.snapshot_sha256()

    p, f = _part_file(eng)
    tbl = pq.read_table(f)
    tampered = tbl.set_column(
        tbl.schema.get_field_index("commit"), "commit",
        pa.array(["deadbeef"] * tbl.num_rows, tbl["commit"].type),
    )
    pq.write_table(tampered, f)
    t = eng.fsck().to_pandas().set_index("partition")
    assert t.loc[p, "sha_ok"] == 0

    assert eng.repair_partition(clog, p) is True
    t2 = eng.fsck().to_pandas()
    assert (t2["ok"] == 1).all()
    assert eng.snapshot_sha256() == sha_before
    assert eng.snapshot_table().to_pandas().equals(before)


def test_repair_partition_healthy_noop_and_guards(tmp_path):
    import pytest

    eng = _lake(tmp_path)
    clog = ensure_changelog(  # same params as _lake: returns the cached dir
        str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8
    )
    p, _ = _part_file(eng)
    sha = eng.snapshot_sha256()
    assert eng.repair_partition(clog, p) is True  # healthy: verified no-op swap
    assert eng.snapshot_sha256() == sha

    lsm = _lake(tmp_path / "lsm", merge_mode="lsm", lsm_compact_threshold=100)
    pl = next(
        q for q, i in lsm.checkpoint().partitions.items() if i.get("runs")
    )
    with pytest.raises(ValueError, match="compact"):
        lsm.repair_partition(clog, pl)


def test_repair_partition_refuses_trimmed_history(tmp_path):
    """expire() removed rows the changelog would resurrect: the rebuild's
    sha differs from the commit record, so repair must refuse, leaving
    the (tampered) file in place rather than installing a wrong state."""
    import pytest
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    clog = ensure_changelog(
        str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8
    )
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.replay(clog, events_per_epoch=2000)
    dropped = eng.expire(max_available_lsn(clog) // 2)
    assert dropped > 0
    p, f = _part_file(eng)
    with pytest.raises(ValueError, match="history insufficient"):
        eng.repair_partition(clog, p)


def test_repair_partition_heals_lsm_lake_after_compact(tmp_path):
    """LSM mode: a compacted partition tampered after compaction heals too
    (the rebuild compacts its own run before verification — without that,
    LSM lakes could never self-heal; review find)."""
    import pyarrow as pa

    clog = ensure_changelog(
        str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8
    )
    eng = CDCEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"), num_partitions=4,
            merge_mode="lsm", lsm_compact_threshold=100,
        )
    )
    eng.replay(clog, events_per_epoch=1000)
    eng.compact()
    sha_before = eng.snapshot_sha256()

    p, f = _part_file(eng)
    tbl = pq.read_table(f)
    pq.write_table(
        tbl.set_column(
            tbl.schema.get_field_index("commit"), "commit",
            pa.array(["deadbeef"] * tbl.num_rows, tbl["commit"].type),
        ),
        f,
    )
    assert eng.fsck().to_pandas().set_index("partition").loc[p, "sha_ok"] == 0
    assert eng.repair_partition(clog, p) is True
    assert (eng.fsck().to_pandas()["ok"] == 1).all()
    assert eng.snapshot_sha256() == sha_before


def test_list_shards_ignores_tmp_names(tmp_path):
    """The repair spill's crash-atomicity rests on this contract: a task
    killed mid-write leaves only a ``*.parquet.tmp`` name, which the shard
    regex must never surface as a readable shard."""
    from arches_rascoll_etl_ray.sources.changelog import list_shards

    d = tmp_path / "clog"
    d.mkdir()
    (d / "changelog-000000000001-000000000050-000000000007.parquet").write_bytes(b"x")
    (d / "changelog-000000000051-000000000099-000000000008.parquet.tmp").write_bytes(b"x")
    shards = list_shards(str(d))
    assert len(shards) == 1 and shards[0][:2] == (1, 50)

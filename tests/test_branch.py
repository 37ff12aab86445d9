"""Lake branching (CDCEngine.branch): fork-at-horizon correctness,
reconvergence with straight-line replay, and isolation between the fork and
its source (the cdc_branch DuckDB oracle runs in tests/test_queries_oracle.py)."""

import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine


def _changelog(tmp_path):
    return ensure_changelog(
        str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8
    )


def _sorted_rows(eng, epoch=None):
    return eng.snapshot_table(epoch=epoch).to_pandas().reset_index(drop=True)


def test_branch_matches_time_travel_horizon(tmp_path):
    clog = _changelog(tmp_path)
    src = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "src"), num_partitions=4))
    src.replay(clog, events_per_epoch=1000)  # 4 epochs

    br = src.branch(str(tmp_path / "br"), epoch=2)
    assert br.checkpoint().end_lsn == 2000
    assert _sorted_rows(br).equals(_sorted_rows(src, epoch=2))
    # same partition count: the digest itself must agree with time travel
    assert br.snapshot_sha256() == src.snapshot_sha256(epoch=2)


def test_branch_continue_reconverges_sha_identical(tmp_path):
    clog = _changelog(tmp_path)
    src = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "src"), num_partitions=4))
    src.replay(clog, events_per_epoch=1000)
    straight_sha = src.snapshot_sha256()

    br = src.branch(str(tmp_path / "br"), epoch=2)
    br.replay(clog, events_per_epoch=500)  # different epoch slicing on purpose
    assert br.snapshot_sha256() == straight_sha
    assert br.lag(clog)["lag_events"] == 0


def test_branch_isolation_and_latest_default(tmp_path):
    clog = _changelog(tmp_path)
    src = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "src"), num_partitions=4))
    src.replay(clog, events_per_epoch=2000)
    src_sha = src.snapshot_sha256()

    br = src.branch(str(tmp_path / "br"))  # default: latest horizon
    assert br.snapshot_sha256() == src_sha

    # divergent writes on the branch leave the source untouched
    clog2 = ensure_changelog(
        str(tmp_path / "clog2"), num_files=300, num_events=4800, seed=11, num_shards=8
    )
    br.replay(clog2, events_per_epoch=400)
    assert br.snapshot_sha256() != src_sha
    assert src.snapshot_sha256() == src_sha
    assert src.checkpoint().epoch == 2


def test_branch_empty_lake_raises(tmp_path):
    src = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "src"), num_partitions=4))
    with pytest.raises(FileNotFoundError):
        # an empty lake has no committed epochs at all
        src.branch(str(tmp_path / "br"), epoch=1)
    with pytest.raises(ValueError, match="empty"):
        src.branch(str(tmp_path / "br"))  # latest = the epoch-0 stub


def test_branch_lsm_lake_with_pending_runs(tmp_path):
    """Fork an LSM lake while sorted runs are still uncompacted: the branch
    must capture the FOLDED state (snapshot_dataset folds base+runs), and
    continued tailing on the branch reconverges with the straight-line
    rewrite-mode replay's rows."""
    clog = _changelog(tmp_path)
    src = CDCEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "src"), num_partitions=4,
            merge_mode="lsm", lsm_compact_threshold=100,
        )
    )
    src.replay(clog, events_per_epoch=500)  # 8 epochs of runs, none compacted
    assert any(i.get("runs") for i in src.checkpoint().partitions.values())

    br = src.branch(str(tmp_path / "br"), epoch=4)
    assert _sorted_rows(br).equals(_sorted_rows(src, epoch=4))

    br.replay(clog, events_per_epoch=1000)
    straight = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "ref"), num_partitions=4))
    straight.replay(clog, events_per_epoch=2000)
    assert _sorted_rows(br).equals(_sorted_rows(straight))

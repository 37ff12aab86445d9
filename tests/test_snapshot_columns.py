"""Column-pruned snapshot reads across all three read shapes."""
import pyarrow as pa
import pytest

from arches_rascoll_etl_ray.config import EngineConfig, EvolutionSpec
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine


def _clog(tmp_path):
    return ensure_changelog(
        str(tmp_path / "clog"), num_files=200, num_events=2500, seed=7, num_shards=4
    )


def test_snapshot_columns_fast_lsm_and_evolution(tmp_path):
    clog = _clog(tmp_path)
    # fast path (no evolution, no runs): footer-level projection
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.replay(clog, events_per_epoch=1000)
    full = eng.snapshot_dataset().select_columns(["repo", "lsn"]).to_pandas()
    pruned = eng.snapshot_dataset(columns=["repo", "lsn"]).to_pandas()
    assert sorted(pruned.columns) == ["lsn", "repo"]
    assert pruned.sort_values(["repo", "lsn"]).reset_index(drop=True).equals(
        full.sort_values(["repo", "lsn"]).reset_index(drop=True)
    )
    with pytest.raises(ValueError):
        eng.snapshot_dataset(columns=["nope"])

    # LSM path with pending runs
    lsm = CDCEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake_lsm"), num_partitions=4,
            merge_mode="lsm", lsm_compact_threshold=100_000,
        )
    )
    lsm.replay(clog, events_per_epoch=1000)
    assert any(i.get("runs") for i in lsm.checkpoint().partitions.values())
    p2 = lsm.snapshot_dataset(columns=["repo", "lsn"]).to_pandas()
    assert p2.sort_values(["repo", "lsn"]).reset_index(drop=True).equals(
        full.sort_values(["repo", "lsn"]).reset_index(drop=True)
    )

    # evolution path: prune a RENAMED column after projection
    ev = CDCEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake_ev"), num_partitions=4,
            evolution=EvolutionSpec(version=2, renames={"lang": "language"}),
        )
    )
    ev.replay(clog, events_per_epoch=1000)
    p3 = ev.snapshot_dataset(columns=["repo", "language"]).to_pandas()
    assert sorted(p3.columns) == ["language", "repo"]
    assert len(p3) == len(full)

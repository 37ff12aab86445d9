"""LSM merge mode (north-star sorted-run design): run append + threshold
compaction + explicit compact() all reconverge to the rewrite-mode state."""

import os

import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog, generate_changelog, write_changelog_shards
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine
from tests.test_cdc_replay import BASE_COLS, assert_matches_fold


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lsmlog"))
    return ensure_changelog(root, num_files=300, num_events=3600, seed=31, num_shards=12)


def _engines(tmp_path, changelog, epochs, threshold=4):
    lsm = CDCEngine(
        EngineConfig(lake_dir=str(tmp_path / "lsm"), num_partitions=4, merge_mode="lsm",
                     lsm_compact_threshold=threshold)
    )
    rw = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "rw"), num_partitions=4))
    per = 3600 // epochs
    lsm.replay(changelog, events_per_epoch=per)
    rw.replay(changelog, events_per_epoch=per)
    return lsm, rw


def test_lsm_equals_rewrite_before_compaction(changelog, tmp_path):
    lsm, rw = _engines(tmp_path, changelog, epochs=3, threshold=10)  # never compacts
    ckpt = lsm.checkpoint()
    assert any(i["runs"] for i in ckpt.partitions.values())  # runs pending
    assert lsm.snapshot_table().select(BASE_COLS).equals(rw.snapshot_table().select(BASE_COLS))
    assert lsm.snapshot_sha256() == rw.snapshot_sha256()  # fold-on-the-fly digest
    assert_matches_fold(lsm, changelog)


def test_lsm_threshold_compaction(changelog, tmp_path):
    lsm, rw = _engines(tmp_path, changelog, epochs=6, threshold=3)  # compacts twice
    ckpt = lsm.checkpoint()
    # after 6 epochs with threshold 3: every partition compacted at epochs 3 and 6
    assert all(not i["runs"] for i in ckpt.partitions.values())
    assert all(i["rows_exact"] for i in ckpt.partitions.values())
    assert lsm.snapshot_table().equals(rw.snapshot_table())
    assert lsm.snapshot_sha256() == rw.snapshot_sha256()


def test_explicit_compact(changelog, tmp_path):
    lsm, rw = _engines(tmp_path, changelog, epochs=3, threshold=10)
    before = lsm.snapshot_table()
    n = lsm.compact()
    assert n > 0
    ckpt = lsm.checkpoint()
    assert all(not i["runs"] for i in ckpt.partitions.values())
    assert lsm.snapshot_table().equals(before)
    assert lsm.snapshot_sha256() == rw.snapshot_sha256()
    assert lsm.compact() == 0  # idempotent no-op when nothing pending


def test_lsm_resume_and_vacuum(changelog, tmp_path):
    lake = str(tmp_path / "resume")
    cfg = EngineConfig(lake_dir=lake, num_partitions=4, merge_mode="lsm", lsm_compact_threshold=3)
    e1 = CDCEngine(cfg)
    e1.apply_epoch(changelog, max_events=1200)
    e2 = CDCEngine(cfg)  # fresh open resumes
    e2.replay(changelog, events_per_epoch=600)
    assert_matches_fold(e2, changelog)
    removed = e2.vacuum()
    assert removed >= 0
    assert_matches_fold(e2, changelog)


def test_lsm_export_folds_runs(changelog, tmp_path):
    lsm, _ = _engines(tmp_path, changelog, epochs=3, threshold=10)
    out = str(tmp_path / "exp")
    lsm.export_snapshot(out)
    import glob

    import pyarrow.parquet as pq

    rows = sum(pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(out, "part-*.parquet")))
    assert rows == lsm.snapshot_table().num_rows


def test_lsm_delete_tombstones_persist_across_runs(tmp_path):
    """A delete in a later run must mask an insert in an earlier run."""
    import pandas as pd

    rows = [
        (1, "I", "r", "a.py", "c1", "py", "v1"),
        (2, "I", "r", "b.py", "c2", "py", "v1"),
        (3, "D", "r", "a.py", None, None, None),
        (4, "U", "r", "b.py", "c3", "py", "v2"),
    ]
    df = pd.DataFrame(rows, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"])
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=1)
    eng = CDCEngine(
        EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2, merge_mode="lsm",
                     lsm_compact_threshold=10)
    )
    eng.replay(d, events_per_epoch=2)  # epoch1: two inserts; epoch2: delete+update
    t = eng.snapshot_table()
    got = {(r["repo"], r["path"]): r["commit"] for r in t.to_pylist()}
    assert got == {("r", "b.py"): "c3"}

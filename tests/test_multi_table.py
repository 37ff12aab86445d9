"""Multi-table job runner: N logical tables from one changelog with a
shared epoch read, per-table filters/evolution, and per-table crash heal."""

import os

import duckdb
import pyarrow as pa

from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.multi import MultiTableJob

BASE_COLS = ["repo", "path", "commit", "lang", "content"]


def _fold_sql(changelog_dir: str, where: str = "TRUE") -> pa.Table:
    con = duckdb.connect()
    try:
        return con.execute(
            f"""
            WITH f AS (
              SELECT * FROM read_parquet('{changelog_dir}/changelog-*.parquet')
              WHERE ({where}) OR op = 'D'
            ), last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
              FROM f
            )
            SELECT repo, path, "commit", lang, content
            FROM last WHERE rn = 1 AND op <> 'D'
            ORDER BY repo, path
            """
        ).arrow()
    finally:
        con.close()


def _job(root):
    return MultiTableJob.for_root(
        str(root),
        {
            "all_files": dict(num_partitions=4),
            "python_files": dict(num_partitions=4, row_filter=("lang", "python")),
        },
    )


def _assert_tables_match(job, clog):
    for name, where in (("all_files", "TRUE"), ("python_files", "lang = 'python'")):
        mine = job.engines[name].snapshot_table().select(BASE_COLS)
        oracle = _fold_sql(clog, where)
        assert mine.cast(oracle.schema).equals(oracle), f"table {name} != filtered fold"


def test_two_tables_from_one_log(tmp_path):
    clog = ensure_changelog(str(tmp_path / "clog"), num_files=300, num_events=3000, seed=9, num_shards=8)
    job = _job(tmp_path / "lakes")
    ckpts = job.replay(clog, events_per_epoch=800)
    assert all(c.end_lsn == 3000 for c in ckpts.values())
    assert all(c.metrics.get("shared_read") for c in ckpts.values())
    _assert_tables_match(job, clog)
    py = job.engines["python_files"].snapshot_table()
    assert py.num_rows > 0
    assert set(py["lang"].to_pylist()) == {"python"}


def test_multi_table_resume_after_partial_commit(tmp_path):
    """Crash between per-table commits of one shared epoch: one table's
    checkpoint is behind on resume; the catch-up pass heals it."""
    clog = ensure_changelog(str(tmp_path / "clog"), num_files=300, num_events=3000, seed=9, num_shards=8)
    root = tmp_path / "lakes"
    job = _job(root)
    job.replay(clog, events_per_epoch=1000)

    # simulate the crash: drop python_files' LAST checkpoint (epoch 3)
    ckdir = os.path.join(str(root), "python_files", "_checkpoints")
    last = sorted(os.listdir(ckdir))[-1]
    os.remove(os.path.join(ckdir, last))
    assert job.engines["python_files"].checkpoint().end_lsn < 3000

    job2 = _job(root)
    ckpts = job2.replay(clog)
    assert all(c.end_lsn == 3000 for c in ckpts.values())
    _assert_tables_match(job2, clog)


def test_multi_table_incremental_append(tmp_path):
    """New shards after a replay: the next shared replay picks up only the
    tail for every table."""
    from arches_rascoll_etl_ray.datagen.changelog_gen import (
        generate_changelog,
        write_changelog_shards,
    )

    df = generate_changelog(200, 2000, seed=4)
    clog = str(tmp_path / "clog")
    write_changelog_shards(df.iloc[:1200], clog, num_shards=4)
    job = _job(tmp_path / "lakes")
    job.replay(clog, events_per_epoch=600)
    write_changelog_shards(df.iloc[1200:], clog, num_shards=2)
    ckpts = job.replay(clog, events_per_epoch=600)
    assert all(c.end_lsn == 2000 for c in ckpts.values())
    _assert_tables_match(job, clog)

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


def test_multi_table_mixed_modes_and_evolution(tmp_path):
    """One job, three tables with different physical/logical configs: plain
    rewrite, LSM with mid-replay compaction, and a row-filtered table under
    a v2 evolution spec — all fed by the same shared-read epoch loop."""
    from arches_rascoll_etl_ray.config import AddColumn, ComputedColumn, EvolutionSpec

    spec_v2 = EvolutionSpec(
        version=2,
        renames={"lang": "language"},
        adds=(AddColumn(name="size_bytes", type="int64", default=None),),
        computed=(ComputedColumn(name="content_len", source="content", fn="len"),),
    )
    clog = ensure_changelog(str(tmp_path / "clog"), num_files=300, num_events=3000, seed=9, num_shards=8)
    job = MultiTableJob.for_root(
        str(tmp_path / "lakes"),
        {
            "plain": dict(num_partitions=4),
            "lsm": dict(num_partitions=4, merge_mode="lsm", lsm_compact_threshold=2),
            "py_v2": dict(num_partitions=4, row_filter=("lang", "python"), evolution=spec_v2),
        },
    )
    job.replay(clog, events_per_epoch=600)

    base = _fold_sql(clog, "TRUE")
    for name in ("plain", "lsm"):
        mine = job.engines[name].snapshot_table().select(BASE_COLS)
        assert mine.cast(base.schema).equals(base), f"{name} != fold"

    py = job.engines["py_v2"].snapshot_table()
    assert "language" in py.column_names and "content_len" in py.column_names
    oracle = _fold_sql(clog, "lang = 'python'")
    mine = py.select(["repo", "path", "commit", "language", "content"]).rename_columns(BASE_COLS)
    assert mine.cast(oracle.schema).equals(oracle)
    import pyarrow.compute as pc

    lens = pc.utf8_length(py["content"])
    assert pc.all(pc.equal(py["content_len"], pc.cast(lens, py["content_len"].type))).as_py()

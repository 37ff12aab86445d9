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


def test_consistent_snapshot_aligned_and_diverged(tmp_path):
    """Cross-table consistent read: aligned tables serve their live state;
    after ONE table advances past the others (more WAL arrives, only that
    table replays), the consistent view serves the advanced table AS OF
    the shared watermark — its pre-advance state — never a torn join."""
    import pandas as pd

    from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    clog = ensure_changelog(
        str(tmp_path / "clog"), num_files=200, num_events=2500, seed=7, num_shards=4
    )
    job = _job(tmp_path / "tables")
    job.replay(clog, events_per_epoch=1000)

    wm = job.consistency_watermark()
    assert wm == max_available_lsn(clog)
    views = job.consistent_snapshot()
    assert set(views) == {"all_files", "python_files"}
    live_rows = {n: job.engines[n].snapshot_table().num_rows for n in views}
    assert {n: v.count() for n, v in views.items()} == live_rows

    # diverge: new WAL arrives, only all_files replays it
    top = max_available_lsn(clog)
    write_changelog_shards(
        pd.DataFrame(
            {
                "lsn": [top + 1],
                "op": ["U"],
                "repo": ["divergent_repo"],
                "path": ["x.py"],
                "commit": ["c9"],
                "lang": ["python"],
                "content": ["new"],
            }
        ),
        clog,
        num_shards=1,
    )
    job.engines["all_files"].replay(clog, events_per_epoch=10_000)
    assert job.consistency_watermark() == top  # python_files still at top

    views2 = job.consistent_snapshot()
    # the advanced table serves its RETAINED pre-advance horizon: the new
    # key is visible live but NOT in the consistent view
    live = job.engines["all_files"].snapshot_table()
    assert "divergent_repo" in set(live["repo"].to_pylist())
    asof = views2["all_files"].to_arrow_refs()
    asof_repos = set()
    import ray as _ray

    for r in asof:
        asof_repos.update(_ray.get(r)["repo"].to_pylist())
    assert "divergent_repo" not in asof_repos
    assert views2["all_files"].count() == live_rows["all_files"]

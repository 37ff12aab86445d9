"""Changefeed + incremental-view conformance.

The changefeed's contract is COMPLETENESS: applying the delta stream
(a→b) onto the state at `a` must reproduce the state at `b` exactly —
the downstream-sync property. The incremental view's contract is
EQUIVALENCE AT EVERY HORIZON: the delta-folded aggregate equals a
from-scratch aggregate of the snapshot after each epoch, not just the last.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine
from arches_rascoll_etl_ray.pipelines.incremental import IncrementalGroupAgg

BASE_COLS = ["repo", "path", "commit", "lang", "content"]


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clog_feed"))
    return ensure_changelog(root, num_files=300, num_events=3000, seed=11, num_shards=8)


@pytest.fixture(scope="module")
def engine(changelog, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake_feed"))
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8))
    eng.replay(changelog, events_per_epoch=1000)  # epochs 1..3
    return eng


def _snap(eng: CDCEngine, epoch=None) -> pd.DataFrame:
    t = eng.snapshot_table(epoch=epoch).select(BASE_COLS + ["lsn"])
    return t.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)


def _apply_feed(state: pd.DataFrame, feed: pa.Table) -> pd.DataFrame:
    """Reference downstream-sync: apply I/U/D rows onto a key-indexed copy."""
    f = feed.to_pandas()
    idx = state.set_index(["repo", "path"])
    dels = f[f["op"] == "D"]
    idx = idx.drop(index=list(zip(dels["repo"], dels["path"])), errors="raise")
    ups = f[f["op"].isin(["I", "U"])]
    new = pd.DataFrame(
        {
            "commit": ups["new_commit"].to_numpy(),
            "lang": ups["new_lang"].to_numpy(),
            "content": ups["new_content"].to_numpy(),
            "lsn": ups["new_lsn"].to_numpy(),
        },
        index=pd.MultiIndex.from_arrays([ups["repo"], ups["path"]]),
    )
    idx = idx.drop(index=new.index, errors="ignore")
    out = pd.concat([idx, new]).reset_index(names=["repo", "path"])
    return out.sort_values(["repo", "path"]).reset_index(drop=True)[
        BASE_COLS + ["lsn"]
    ]


def test_feed_from_empty_is_full_snapshot(engine):
    feed = engine.changefeed(0).to_arrow_refs()
    import ray

    feed = pa.concat_tables([ray.get(r) for r in feed], promote_options="permissive")
    assert set(feed["op"].to_pylist()) <= {"I"}
    snap = _snap(engine)
    assert feed.num_rows == len(snap)
    got = (
        feed.select(["repo", "path", "new_commit", "new_lang", "new_content"])
        .rename_columns(["repo", "path", "commit", "lang", "content"])
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, snap[BASE_COLS], check_dtype=False)


@pytest.mark.parametrize("a,b", [(1, 2), (2, 3), (1, 3)])
def test_feed_apply_reconverges(engine, a, b):
    from arches_rascoll_etl_ray.stages.merge import changefeed_schema

    batches = list(engine.changefeed(a, b).iter_batches(batch_format="pyarrow"))
    schema = changefeed_schema(engine.cfg)
    feed = (
        pa.concat_tables(batches, promote_options="permissive")
        if batches
        else pa.table({f.name: pa.array([], f.type) for f in schema})
    )
    replayed = _apply_feed(_snap(engine, epoch=a), feed)
    expected = _snap(engine, epoch=b)
    pd.testing.assert_frame_equal(replayed, expected, check_dtype=False)


def test_quiet_feed_is_empty(engine):
    assert engine.changefeed(3, 3).count() == 0


def test_feed_ops_are_consistent(engine):
    batches = list(engine.changefeed(1, 3).iter_batches(batch_format="pyarrow"))
    feed = pa.concat_tables(batches, promote_options="permissive")
    df = feed.to_pandas()
    ins = df[df["op"] == "I"]
    assert ins["old_lsn"].isna().all() and ins["new_lsn"].notna().all()
    dels = df[df["op"] == "D"]
    assert dels["new_lsn"].isna().all() and dels["old_lsn"].notna().all()
    ups = df[df["op"] == "U"]
    assert (ups["new_lsn"] > ups["old_lsn"]).all()
    # keys are unique in a feed
    assert not df.duplicated(["repo", "path"]).any()


def test_lookup_point_read(engine):
    """lookup() folds exactly one partition and must agree with the full
    snapshot row-for-row, including absence after deletes."""
    snap = engine.snapshot_table().to_pandas()
    some = snap.sample(5, random_state=7)
    for _, row in some.iterrows():
        got = engine.lookup(row["repo"], row["path"])
        assert got.num_rows == 1
        assert got["commit"][0].as_py() == row["commit"]
        assert got["content"][0].as_py() == row["content"]
    assert engine.lookup("no-such-repo", "nope").num_rows == 0
    # AS-OF: a key's epoch-1 state can differ from its latest
    old = engine.snapshot_table(epoch=1).to_pandas().set_index(["repo", "path"])
    k = some.iloc[0]
    got_old = engine.lookup(k["repo"], k["path"], epoch=1)
    if (k["repo"], k["path"]) in old.index:
        assert got_old.num_rows == 1
        assert got_old["commit"][0].as_py() == old.loc[(k["repo"], k["path"]), "commit"]
    else:
        assert got_old.num_rows == 0


def test_changefeed_across_compaction_is_empty(changelog, tmp_path):
    """Compaction rewrites files but not state: the feed across a
    compaction epoch must be EMPTY (no key's lsn changed)."""
    eng = CDCEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake_lsm"),
            num_partitions=8,
            merge_mode="lsm",
            lsm_compact_threshold=100,  # keep runs pending until explicit compact
        )
    )
    eng.replay(changelog, events_per_epoch=1000)
    pre = eng.checkpoint().epoch
    assert eng.compact() > 0
    post = eng.checkpoint().epoch
    assert post == pre + 1
    assert eng.changefeed(pre, post).count() == 0


def test_changefeed_emits_evolved_columns(changelog, tmp_path):
    """With an evolution spec active, the feed's old_/new_ images use the
    EVOLVED column names, same projection rule as every other read."""
    from arches_rascoll_etl_ray.config import AddColumn, EvolutionSpec

    spec = EvolutionSpec(
        version=2,
        renames={"lang": "language"},
        adds=(AddColumn(name="size_bytes", type="int64", default=None),),
        computed=(),
    )
    eng = CDCEngine(
        EngineConfig(lake_dir=str(tmp_path / "lake_evo"), num_partitions=4, evolution=spec)
    )
    eng.replay(changelog, events_per_epoch=1500)
    batches = list(eng.changefeed(0).iter_batches(batch_format="pyarrow"))
    cols = set(batches[0].column_names)
    assert {"old_language", "new_language", "old_size_bytes", "new_size_bytes"} <= cols
    assert "old_lang" not in cols


def test_changefeed_across_evolution_boundary(changelog, tmp_path):
    """Feed between an epoch committed under spec v1 and one committed
    under spec v2: both horizons project through the CURRENT spec, so the
    diff is well-formed and matches a snapshot-level diff exactly."""
    from arches_rascoll_etl_ray.config import EvolutionSpec

    lake = str(tmp_path / "lake_evo_feed")
    e1 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4, evolution=None))
    e1.apply_epoch(changelog, max_events=1500)  # epoch 1, spec v1
    spec = EvolutionSpec(version=2, renames={"lang": "language"}, adds=(), computed=())
    e2 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4, evolution=spec))
    e2.apply_epoch(changelog)  # epoch 2, spec v2

    batches = list(e2.changefeed(1, 2).iter_batches(batch_format="pyarrow"))
    feed = pa.concat_tables(batches, promote_options="permissive").to_pandas()
    assert "new_language" in feed.columns and "old_language" in feed.columns

    # snapshot-level diff (both horizons read through v2) must agree on the
    # changed-key set and ops
    s1 = e2.snapshot_table(epoch=1).to_pandas().set_index(["repo", "path"])["lsn"]
    s2 = e2.snapshot_table(epoch=2).to_pandas().set_index(["repo", "path"])["lsn"]
    joined = pd.concat([s1.rename("a"), s2.rename("b")], axis=1)
    changed = joined[joined["a"].isna() | joined["b"].isna() | (joined["a"] != joined["b"])]
    expect_ops = np.where(
        changed["a"].isna(), "I", np.where(changed["b"].isna(), "D", "U")
    )
    got = feed.set_index(["repo", "path"])["op"].sort_index()
    want = pd.Series(expect_ops, index=changed.index, name="op").sort_index()
    pd.testing.assert_series_equal(got, want)


def test_replication_reconverges_sha_exact(changelog, tmp_path):
    """Primary → changefeed → WAL render → replica upsert replay: the two
    lakes' content digests must be identical after every replicated epoch
    (deletes, updates and quiet partitions included)."""
    from arches_rascoll_etl_ray.pipelines.incremental import write_feed_as_changelog

    primary = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "p"), num_partitions=8))
    replica = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "r"), num_partitions=8))
    wal = str(tmp_path / "wal")
    prev = 0
    while True:
        ckpt = primary.apply_epoch(changelog, max_events=800)
        if ckpt.epoch == prev:
            break
        write_feed_as_changelog(primary.changefeed(prev, ckpt.epoch), wal, lsn=ckpt.epoch)
        replica.apply_epoch(wal)
        prev = ckpt.epoch
        p = primary.snapshot_table().select(BASE_COLS)
        r = replica.snapshot_table().select(BASE_COLS)
        assert p.equals(r.cast(p.schema)), f"replica diverged at epoch {ckpt.epoch}"
    assert prev >= 3  # the loop really replicated multiple epochs


def test_view_sync_across_runs(changelog, tmp_path):
    """A persisted view resumes from its applied-epoch watermark: the
    second sync folds only the NEW epochs' deltas, and a reloaded view is
    byte-equal to the live one."""
    from arches_rascoll_etl_ray.pipelines.incremental import (
        IncrementalGroupAgg,
        sync_view,
    )

    lake = str(tmp_path / "lake_sync")
    store = str(tmp_path / "view.json")
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8))
    eng.apply_epoch(changelog, max_events=1200)  # epoch 1

    view = IncrementalGroupAgg("lang", "lsn")
    sync_view(eng, view, store)
    assert view.applied_epoch == 1

    eng.apply_epoch(changelog, max_events=1200)  # epoch 2
    eng.apply_epoch(changelog)  # epoch 3 (rest)

    # "next run": reload from disk, catch up only epochs 2..3
    view2 = IncrementalGroupAgg.load(store)
    assert view2.applied_epoch == 1 and view2.state == view.state
    sync_view(eng, view2, store)
    assert view2.applied_epoch == 3

    snap = eng.snapshot_table().to_pandas()
    expect = (
        snap.groupby("lang")
        .agg(n_keys=("lang", "size"), sum_measure=("lsn", "sum"))
        .reset_index()
        .rename(columns={"lang": "group_key"})
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    got = view2.to_table().to_pandas()
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    # and the persisted copy equals the live one
    view3 = IncrementalGroupAgg.load(store)
    assert view3.state == view2.state and view3.applied_epoch == 3


def test_incremental_view_matches_recompute_at_every_epoch(changelog, tmp_path):
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_mv"), num_partitions=8))
    view = IncrementalGroupAgg(group_col="lang", measure_col="lsn")
    prev = 0
    while True:
        ckpt = eng.apply_epoch(changelog, max_events=700)
        if ckpt.epoch == prev:
            break
        view.apply(eng.changefeed(prev, ckpt.epoch))
        prev = ckpt.epoch
        snap = eng.snapshot_table().to_pandas()
        expect = (
            snap.groupby("lang")
            .agg(n_keys=("lang", "size"), sum_measure=("lsn", "sum"))
            .reset_index()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        got = view.to_table().to_pandas().rename(columns={"group_key": "lang"})
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_diff_preserves_lsn_above_2_53(tmp_path):
    """Regression: the pre-merge Int64 cast keeps lsn exact — a float64
    round-trip would make 2**53 and 2**53 + 1 compare equal (missed
    update) and corrupt emitted values."""
    from arches_rascoll_etl_ray.stages.merge import diff_partition_states

    cfg = EngineConfig(lake_dir=str(tmp_path / "lake_diff53"))
    big = 2**53
    mk = lambda lsns, shas: pa.table(
        {
            "repo": pa.array(["r"] * len(lsns)),
            "path": pa.array([f"f{i}" for i in range(len(lsns))]),
            "commit": pa.array(["c"] * len(lsns)),
            "lang": pa.array(["py"] * len(lsns)),
            "content": pa.array(["x"] * len(lsns), pa.large_string()),
            "lsn": pa.array(lsns, pa.int64()),
            "content_sha": pa.array(shas),
        }
    )
    # f0 updated (lsn big -> big+1, adjacent doubles in float64), f1
    # unchanged, f2 deleted, f3 inserted
    old = mk([big, 7, 5], ["a", "b", "c"])
    new = mk([big + 1, 7], ["a2", "b"])
    ins = mk([big + 3], ["d"]).set_column(1, "path", pa.array(["f3"]))
    new = pa.concat_tables([new, ins])
    feed = diff_partition_states(cfg, old, new).to_pandas().set_index("path")
    assert set(feed.index) == {"f0", "f2", "f3"}  # f1 emits nothing
    assert feed.loc["f0", "op"] == "U" and feed.loc["f0", "new_lsn"] == big + 1
    assert feed.loc["f0", "old_lsn"] == big
    assert feed.loc["f2", "op"] == "D"
    assert feed.loc["f3", "op"] == "I" and feed.loc["f3", "new_lsn"] == big + 3


def test_incremental_view_null_group(tmp_path):
    """Null group keys form their own group (SQL GROUP BY semantics) via
    the reserved sentinel — no TypeError in to_table, no silent merge with
    a literal 'null' group across JSON save/load."""
    import ray

    view = IncrementalGroupAgg(group_col="lang", measure_col="lsn")
    feed = ray.data.from_arrow(
        pa.table(
            {
                "op": ["I", "I", "I", "D"],
                "new_lang": pa.array([None, "null", "py", None], pa.string()),
                "old_lang": pa.array([None, None, None, None], pa.string()),
                "new_lsn": pa.array([5, 7, 9, None], pa.int64()),
                "old_lsn": pa.array([None, None, None, 3], pa.int64()),
            }
        )
    )
    view.apply(feed)
    t = view.to_table().to_pandas()
    by_key = {(None if pd.isna(k) else k): (n, s) for k, n, s in t.itertuples(index=False)}
    # the real string 'null' and the actual NULL group stay distinct;
    # the D delta (old group NULL) nets the NULL group to 0 keys? no —
    # I(+1, lsn 5) and D(-1, lsn 3) net n=0, so NULL drops from the view
    assert by_key == {"null": (1, 7), "py": (1, 9)}
    # keep a live NULL group and round-trip it through JSON
    view.apply(
        ray.data.from_arrow(
            pa.table(
                {
                    "op": ["I"],
                    "new_lang": pa.array([None], pa.string()),
                    "old_lang": pa.array([None], pa.string()),
                    "new_lsn": pa.array([11], pa.int64()),
                    "old_lsn": pa.array([None], pa.int64()),
                }
            )
        )
    )
    p = str(tmp_path / "view.json")
    view.save(p)
    loaded = IncrementalGroupAgg.load(p)
    assert loaded.state == view.state
    t2 = loaded.to_table().to_pandas()
    nulls = t2[t2["group_key"].isna()]
    assert len(nulls) == 1 and nulls.iloc[0]["sum_measure"] == 11


def test_incremental_view_nul_bearing_groups_stay_distinct():
    """Regression: pandas' string-key groupby hashes object strings as C
    strings and merges distinct groups at an embedded NUL. The partial
    groupby now runs on utf-8 BYTES keys (exact PyObject hashtable), and a
    user value equal to the old sentinel text cannot collide with the null
    group (prefix-free 'n'/'v'+value state encoding)."""
    import ray

    view = IncrementalGroupAgg(group_col="lang", measure_col="lsn")
    feed = ray.data.from_arrow(
        pa.table(
            {
                "op": ["I", "I", "I", "I"],
                "new_lang": pa.array(["g\x00a", "g\x00b", "g\x00a", "\x1f<null>"], pa.string()),
                "old_lang": pa.array([None] * 4, pa.string()),
                "new_lsn": pa.array([1, 2, 4, 8], pa.int64()),
                "old_lsn": pa.array([None] * 4, pa.int64()),
            }
        )
    )
    view.apply(feed)
    t = view.to_table().to_pandas()
    by_key = {k: (n, s) for k, n, s in t.itertuples(index=False)}
    assert by_key == {"g\x00a": (2, 5), "g\x00b": (1, 2), "\x1f<null>": (1, 8)}


def test_distinct_view_matches_recompute_at_every_epoch(changelog, tmp_path):
    """Refcounted distinct view: incremental fold ≡ from-scratch
    count(DISTINCT repo) per lang at every epoch horizon (deletes and
    updates retract refs; a (lang, repo) pair only leaves the view when its
    last file does)."""
    from arches_rascoll_etl_ray.pipelines.incremental import IncrementalDistinctAgg

    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_dv"), num_partitions=8))
    view = IncrementalDistinctAgg(group_col="lang", value_col="repo")
    prev = 0
    while True:
        ckpt = eng.apply_epoch(changelog, max_events=700)
        if ckpt.epoch == prev:
            break
        view.apply(eng.changefeed(prev, ckpt.epoch))
        prev = ckpt.epoch
        snap = eng.snapshot_table().to_pandas()
        expect = (
            snap.groupby("lang")["repo"]
            .nunique()
            .reset_index()
            .rename(columns={"repo": "n_distinct"})
            .sort_values("lang")
            .reset_index(drop=True)
        )
        got = view.to_table().to_pandas().rename(columns={"group_key": "lang"})
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_distinct_view_refcounts_and_nulls(tmp_path):
    """Refcount semantics under value/group moves, NUL-bearing values, and
    null groups/values; save/load pins the value_map presence."""
    import ray

    from arches_rascoll_etl_ray.pipelines.incremental import IncrementalDistinctAgg

    def feed(rows):
        ops, og, ov, ng, nv = (list(x) for x in zip(*rows))
        return ray.data.from_arrow(
            pa.table(
                {
                    "op": pa.array(ops, pa.string()),
                    "old_lang": pa.array(og, pa.string()),
                    "old_repo": pa.array(ov, pa.string()),
                    "new_lang": pa.array(ng, pa.string()),
                    "new_repo": pa.array(nv, pa.string()),
                }
            )
        )

    view = IncrementalDistinctAgg(group_col="lang", value_col="repo")
    # two files in (py, r1), one in (py, r\x00a), one null-group, one null value
    view.apply(
        feed(
            [
                ("I", None, None, "py", "r1"),
                ("I", None, None, "py", "r1"),
                ("I", None, None, "py", "r\x00a"),
                ("I", None, None, None, "rX"),
                ("I", None, None, "py", None),
            ]
        )
    )
    t = {r["group_key"]: r["n_distinct"] for r in view.to_table().to_pylist()}
    assert t == {"py": 3, None: 1}  # r1, r\x00a, NULL-value bucket
    # delete ONE of the two (py, r1) files: r1 must remain distinct-live
    view.apply(feed([("D", "py", "r1", None, None)]))
    t = {r["group_key"]: r["n_distinct"] for r in view.to_table().to_pylist()}
    assert t["py"] == 3
    # move the last (py, r1) ref to (go, r1): py loses r1, go gains it
    view.apply(feed([("U", "py", "r1", "go", "r1")]))
    t = {r["group_key"]: r["n_distinct"] for r in view.to_table().to_pylist()}
    assert t == {"py": 2, "go": 1, None: 1}
    # persistence round-trip + value_map presence pin
    p = str(tmp_path / "dv.json")
    view.save(p)
    back = IncrementalDistinctAgg.load(p)
    assert back.state == view.state
    with pytest.raises(ValueError, match="value_map"):
        IncrementalDistinctAgg.load(p, value_map=lambda s: s)


def test_distinct_view_sync_store_and_crash_window(changelog, tmp_path):
    """sync_view is duck-typed over the distinct view: persisted watermark
    resumes mid-history, and a crash BEFORE save (simulated by discarding
    the synced view) re-folds the same window from the old watermark and
    converges to the identical state — the fold of a diff between two
    horizons is deterministic."""
    from arches_rascoll_etl_ray.pipelines.incremental import (
        IncrementalDistinctAgg,
        sync_view,
    )

    lake = str(tmp_path / "lake_dsync")
    store = str(tmp_path / "dview.json")
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8))
    eng.apply_epoch(changelog, max_events=1200)  # epoch 1

    view = IncrementalDistinctAgg("lang", "repo")
    sync_view(eng, view, store)
    assert view.applied_epoch == 1

    eng.apply_epoch(changelog, max_events=1200)  # epoch 2
    eng.apply_epoch(changelog)  # epoch 3 (rest)

    # crash window: sync WITHOUT persisting (store untouched at epoch 1)
    crashed = IncrementalDistinctAgg.load(store)
    sync_view(eng, crashed, store_path=None)
    assert crashed.applied_epoch == 3

    # "next run": reload the epoch-1 store, re-fold the same 2..3 window
    view2 = IncrementalDistinctAgg.load(store)
    assert view2.applied_epoch == 1
    sync_view(eng, view2, store)
    assert view2.applied_epoch == 3 and view2.state == crashed.state

    snap = eng.snapshot_table().to_pandas()
    expect = (
        snap.groupby("lang")["repo"]
        .nunique()
        .reset_index()
        .rename(columns={"lang": "group_key", "repo": "n_distinct"})
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(view2.to_table().to_pandas(), expect, check_dtype=False)

"""Secondary-index conformance.

Contracts:
- EQUIVALENCE AT EVERY HORIZON: after each sync, lookup_keys(v) equals
  the key set of the full snapshot filtered to column==v, for every live
  value (and the empty set for a value never written).
- CONSISTENT LOOKUPS: lookup_rows reads the base lake AS OF the index's
  watermark, so an index that lags the lake still answers consistently.
- IDEMPOTENT REPLAY: re-syncing the same epoch window (crash between
  partition writes and the watermark commit) converges to identical
  postings bytes.
- INCREMENTAL == REBUILD: the delta-maintained index equals a fresh
  index synced once over the whole history.
"""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine
from arches_rascoll_etl_ray.pipelines.index import SecondaryIndex


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clog_idx"))
    return ensure_changelog(root, num_files=300, num_events=3000, seed=23, num_shards=8)


def _snap_keys(eng, value, epoch=None):
    t = eng.snapshot_table(epoch=epoch)
    df = t.to_pandas()
    df = df[df["lang"] == value][["repo", "path"]]
    return sorted(map(tuple, df.to_numpy()))


def _index_keys(idx, value):
    t = idx.lookup_keys(value)
    return sorted(map(tuple, t.to_pandas().to_numpy()))


def _postings_digest(idx):
    out = {}
    for i in range(idx.num_partitions):
        for s in range(idx.num_subshards):
            f = idx._part_file(i, s)
            if os.path.exists(f):
                out[(i, s)] = pq.read_table(f).to_pandas().to_csv(index=False)
    return out


def test_index_matches_snapshot_at_every_horizon(changelog, tmp_path):
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8))
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=4)
    langs = set()
    while True:
        before = eng.checkpoint().epoch
        ckpt = eng.apply_epoch(changelog, max_events=1000)
        if ckpt.epoch == before:
            break
        idx.sync(eng)
        assert idx.applied_epoch == ckpt.epoch
        snap = eng.snapshot_table().to_pandas()
        langs.update(snap["lang"].dropna().unique())
        for v in sorted(langs):
            assert _index_keys(idx, v) == _snap_keys(eng, v), f"epoch {ckpt.epoch} lang {v}"
        assert _index_keys(idx, "no-such-lang") == []
    assert eng.checkpoint().epoch >= 3  # the loop actually exercised epochs


def test_lookup_rows_consistent_while_lake_advances(changelog, tmp_path):
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8))
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=4)
    eng.apply_epoch(changelog, max_events=1500)
    idx.sync(eng)
    frozen_epoch = idx.applied_epoch
    # advance the lake PAST the index watermark
    eng.apply_epoch(changelog, max_events=1500)
    assert eng.checkpoint().epoch > frozen_epoch
    snap_then = eng.snapshot_table(epoch=frozen_epoch).to_pandas()
    for v in sorted(snap_then["lang"].dropna().unique()):
        rows = idx.lookup_rows(eng, v).to_pandas()
        want = (
            snap_then[snap_then["lang"] == v]
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        got = rows[want.columns.tolist()].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
    # and a fresh sync catches the index up to the lake head
    idx.sync(eng)
    assert idx.applied_epoch == eng.checkpoint().epoch


def test_sync_replay_is_idempotent(changelog, tmp_path):
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8))
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=4)
    eng.apply_epoch(changelog, max_events=1500)
    idx.sync(eng)
    mid_epoch = idx.applied_epoch
    eng.apply_epoch(changelog, max_events=1500)
    idx.sync(eng)
    digest = _postings_digest(idx)
    # crash simulation: watermark rolled back, same window re-applied
    idx.applied_epoch = mid_epoch
    idx._save_meta()
    idx.sync(eng)
    assert _postings_digest(idx) == digest


def test_incremental_equals_rebuild(changelog, tmp_path):
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8))
    inc = SecondaryIndex(str(tmp_path / "inc"), column="lang", num_partitions=4)
    while True:
        before = eng.checkpoint().epoch
        if eng.apply_epoch(changelog, max_events=1000).epoch == before:
            break
        inc.sync(eng)
    fresh = SecondaryIndex(str(tmp_path / "fresh"), column="lang", num_partitions=4)
    fresh.sync(eng)
    assert _postings_digest(inc) == _postings_digest(fresh)


def test_reopen_with_different_layout_rejected(changelog, tmp_path):
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8))
    eng.apply_epoch(changelog, max_events=1000)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=4)
    idx.sync(eng)
    with pytest.raises(ValueError, match="physical layout pin"):
        SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=8)
    with pytest.raises(ValueError, match="physical layout pin"):
        SecondaryIndex(str(tmp_path / "idx"), column="commit", num_partitions=4)
    # same layout reopens and remembers its watermark
    again = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=4)
    assert again.applied_epoch == idx.applied_epoch


def test_lookup_absent_value_empty_schema(changelog, tmp_path):
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8))
    eng.apply_epoch(changelog, max_events=1000)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=4)
    idx.sync(eng)
    rows = idx.lookup_rows(eng, "never-written")
    assert rows.num_rows == 0
    assert set(eng.snapshot_table().schema.names) == set(rows.schema.names)


def test_crash_mid_sync_then_lake_advances_no_stale_postings(tmp_path):
    """Regression (review finding): a sync to e1 that crashed AFTER its
    partition writes but BEFORE the watermark commit, followed by the lake
    advancing to e2, must not strand the intermediate value's posting —
    the persisted pending-window intent forces the retry to re-apply
    (w, e1] exactly before advancing, instead of net-diffing (w, e2]
    (whose endpoint images never mention the intermediate value)."""
    import json

    import pandas as pd

    from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards

    events = [
        (1, "I", "r", "x", "c1", "v1", "body1"),  # lang v1 at epoch 1
        (2, "U", "r", "x", "c2", "v2", "body2"),  # lang v2 at epoch 2
        (3, "U", "r", "x", "c3", "v3", "body3"),  # lang v3 at epoch 3
    ]
    df = pd.DataFrame(
        events, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=1)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2))
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=2)

    eng.apply_epoch(d, max_events=1)  # epoch 1: lang v1
    idx.sync(eng)
    eng.apply_epoch(d, max_events=1)  # epoch 2: lang v2
    idx.sync(eng)  # partitions now hold (v2, key)
    # simulate the crash: partition writes landed, watermark commit didn't —
    # meta rolls back to applied=1 with the pending intent for epoch 2
    meta_path = idx._meta_path()
    meta = json.load(open(meta_path))
    meta["applied_epoch"], meta["pending_to"] = 1, 2
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    eng.apply_epoch(d)  # epoch 3: lang v3 — the lake advances past the crash
    idx2 = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=2)
    assert idx2.pending_to == 2
    idx2.sync(eng)
    assert idx2.applied_epoch == eng.checkpoint().epoch and idx2.pending_to is None
    assert _index_keys(idx2, "v2") == []  # the stale intermediate posting is gone
    assert _index_keys(idx2, "v3") == [("r", "x")]
    # and the healed index equals a from-scratch rebuild
    fresh = SecondaryIndex(str(tmp_path / "fresh"), column="lang", num_partitions=2)
    fresh.sync(eng)
    assert _postings_digest(idx2) == _postings_digest(fresh)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _streams(draw):
    n = draw(st.integers(min_value=2, max_value=30))
    keys = [("r/a", "x"), ("r/b", "y"), ("r/c", "z")]
    langs = ["v1", "v2", "v3"]
    ev = []
    for lsn in range(1, n + 1):
        repo, path = keys[draw(st.integers(min_value=0, max_value=2))]
        op = draw(st.sampled_from(["I", "U", "D"]))
        if op == "D":
            ev.append((lsn, "D", repo, path, None, None, None))
        else:
            lang = langs[draw(st.integers(min_value=0, max_value=2))]
            ev.append((lsn, op, repo, path, f"c{lsn}", lang, f"b{lsn}"))
    split = draw(st.integers(min_value=1, max_value=n))
    return ev, split


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_streams())
def test_index_property_incremental_equals_rebuild_and_snapshot(tmp_path_factory, case):
    """For ANY stream and epoch split: per-epoch-synced postings equal a
    one-shot rebuild AND the snapshot filter, for every value ever written."""
    events, split = case
    tmp = tmp_path_factory.mktemp("idx_prop")
    from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards

    df = pd.DataFrame(
        events, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp / "log")
    write_changelog_shards(df, d, num_shards=2)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp / "lake"), num_partitions=3))
    inc = SecondaryIndex(str(tmp / "inc"), column="lang", num_partitions=2)
    while True:
        before = eng.checkpoint().epoch
        if eng.apply_epoch(d, max_events=split).epoch == before:
            break
        inc.sync(eng)
    fresh = SecondaryIndex(str(tmp / "fresh"), column="lang", num_partitions=2)
    fresh.sync(eng)
    assert _postings_digest(inc) == _postings_digest(fresh)
    for v in ("v1", "v2", "v3"):
        assert _index_keys(inc, v) == _snap_keys(eng, v), v


def test_sync_rebuilds_after_base_vacuum(changelog, tmp_path):
    """vacuum() trims non-latest checkpoints, so a lagging index's window
    start is gone — sync must detect it and fall back to a from-scratch
    rebuild instead of raising forever."""
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8))
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=4)
    eng.apply_epoch(changelog, max_events=1000)
    idx.sync(eng)
    lagged_at = idx.applied_epoch
    eng.apply_epoch(changelog)  # lake advances…
    eng.vacuum()                # …and the index's watermark checkpoint dies
    idx.sync(eng)               # would raise FileNotFoundError without the fallback
    assert idx.applied_epoch == eng.checkpoint().epoch > lagged_at
    for v in sorted(eng.snapshot_table().to_pandas()["lang"].dropna().unique()):
        assert _index_keys(idx, v) == _snap_keys(eng, v), v
    fresh = SecondaryIndex(str(tmp_path / "fresh"), column="lang", num_partitions=4)
    fresh.sync(eng)
    assert _postings_digest(idx) == _postings_digest(fresh)


def test_concurrent_sync_rejected(changelog, tmp_path):
    """Two writers on one index dir: the second sync is rejected while the
    first holds the flock (same single-writer contract as the lake)."""
    from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.apply_epoch(changelog, max_events=500)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=2)
    with _WriterLock(idx.index_dir):  # simulate a concurrent sync in flight
        with pytest.raises(RuntimeError, match="one writer"):
            idx.sync(eng)
    idx.sync(eng)  # lock released: proceeds normally
    assert idx.applied_epoch == eng.checkpoint().epoch


def test_index_survives_evolution_rename(changelog, tmp_path):
    """Incremental ≡ rebuild across a schema-evolution boundary: the index
    (created on `lang`) keeps syncing after the engine reopens under a
    spec renaming lang→language — the sync window SPANS the rename — and
    its postings are byte-identical to a fresh index built wholly under
    v2. Lookups filter the base rows under the NEW name."""
    from arches_rascoll_etl_ray.config import AddColumn, ComputedColumn, EvolutionSpec

    spec_v2 = EvolutionSpec(
        version=2,
        renames={"lang": "language"},
        adds=(AddColumn(name="size_bytes", type="int64", default=None),),
        computed=(ComputedColumn(name="content_len", source="content", fn="len"),),
    )
    lake = str(tmp_path / "lake")
    e1 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8, evolution=None))
    inc = SecondaryIndex(str(tmp_path / "inc"), column="lang", num_partitions=4)
    e1.apply_epoch(changelog, max_events=1500)
    inc.sync(e1)
    e2 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8, evolution=spec_v2))
    while True:
        before = e2.checkpoint().epoch
        if e2.apply_epoch(changelog, max_events=800).epoch == before:
            break
        inc.sync(e2)
    fresh = SecondaryIndex(str(tmp_path / "fresh"), column="lang", num_partitions=4)
    fresh.sync(e2)
    assert _postings_digest(inc) == _postings_digest(fresh)
    # lookups agree with a full-scan filter of the evolved snapshot
    snap = e2.snapshot_table().to_pandas()
    for v in sorted(snap["language"].dropna().unique()):
        want = sorted(map(tuple, snap[snap["language"] == v][["repo", "path"]].to_numpy()))
        assert _index_keys(inc, v) == want, f"language {v}"
        rows = inc.lookup_rows(e2, v).to_pandas()
        assert sorted(map(tuple, rows[["repo", "path"]].to_numpy())) == want
        assert "content_len" in rows.columns  # evolved columns ride through

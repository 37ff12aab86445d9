"""CDCEngine.forget: GDPR-style key erasure. Contracts pinned here:
the live row leaves the lake and fsck stays green; a from-scratch replay
with the persisted ban list reconverges to the post-erasure sha (no
resurrection, both shuffle plans); an event NEWER than the cutoff
re-admits the key on both the incremental and from-scratch paths; repair
of a tampered partition verifies against the post-erasure manifest; and
re-running forget heals a crash between the list save and the rewrite."""

import os
import shutil

import pyarrow.compute as pc

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine
from arches_rascoll_etl_ray.stages.normalize import (
    forget_list_path,
    load_forget_list,
    save_forget_list,
)


def _replayed(tmp_path, name="lake", **cfg):
    clog = ensure_changelog(
        str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8
    )
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / name), num_partitions=4, **cfg))
    eng.replay(clog, events_per_epoch=1000)
    return eng, clog


def _some_live_key(eng):
    snap = eng.snapshot_table()
    return snap["repo"][0].as_py(), snap["path"][0].as_py()


def _has_key(eng, repo, path):
    snap = eng.snapshot_table()
    m = pc.and_(
        pc.equal(snap["repo"], repo),
        pc.equal(snap["path"], path),
    )
    return pc.sum(pc.cast(m, "int64")).as_py() or 0


def test_forget_erases_live_row_and_fsck_stays_green(tmp_path):
    eng, _ = _replayed(tmp_path)
    repo, path = _some_live_key(eng)
    rows_before = eng.snapshot_table().num_rows

    erased = eng.forget([(repo, path)])
    assert erased == 1
    assert _has_key(eng, repo, path) == 0
    assert eng.snapshot_table().num_rows == rows_before - 1
    rep = eng.fsck().to_pandas()
    assert (rep["ok"] == 1).all()
    # idempotent: a second forget of the same key is a no-op rewrite
    assert eng.forget([(repo, path)]) == 0


def test_replay_with_ban_list_reconverges_no_resurrection(tmp_path):
    eng, clog = _replayed(tmp_path)
    repo, path = _some_live_key(eng)
    eng.forget([(repo, path)])
    want = eng.snapshot_sha256()

    for name, cfg in (("lake_b", {}), ("lake_c", {"shuffle": "sort"})):
        lake_b = str(tmp_path / name)
        fresh = CDCEngine(EngineConfig(lake_dir=lake_b, num_partitions=4, **cfg))
        shutil.copyfile(forget_list_path(eng.cfg.lake_dir), forget_list_path(lake_b))
        fresh.replay(clog, events_per_epoch=1000)
        assert _has_key(fresh, repo, path) == 0
        assert fresh.snapshot_sha256() == want, name


def test_event_newer_than_cutoff_readmits_key(tmp_path):
    import pandas as pd

    from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    eng, clog = _replayed(tmp_path)
    repo, path = _some_live_key(eng)
    eng.forget([(repo, path)])
    cutoff = load_forget_list(eng.cfg.lake_dir)[0]["lsn"]

    top = max_available_lsn(clog)
    assert cutoff == top
    write_changelog_shards(
        pd.DataFrame(
            {
                "lsn": [top + 1],
                "op": ["U"],
                "repo": [repo],
                "path": [path],
                "commit": ["post-erasure"],
                "lang": ["py"],
                "content": ["fresh consent"],
            }
        ),
        clog,
        num_shards=1,
    )
    eng.replay(clog, events_per_epoch=10_000)
    assert _has_key(eng, repo, path) == 1

    # from-scratch replay with the same ban list converges to the same sha
    lake_b = str(tmp_path / "lake_b")
    fresh = CDCEngine(EngineConfig(lake_dir=lake_b, num_partitions=4))
    shutil.copyfile(forget_list_path(eng.cfg.lake_dir), forget_list_path(lake_b))
    fresh.replay(clog, events_per_epoch=10_000)
    assert fresh.snapshot_sha256() == eng.snapshot_sha256()


def test_repair_verifies_post_erasure_state(tmp_path):
    eng, clog = _replayed(tmp_path)
    repo, path = _some_live_key(eng)
    eng.forget([(repo, path)])
    sha = eng.snapshot_sha256()

    # tamper EVERY partition's data file byte-wise, then heal them all: the
    # rebuild must replay through the ban list to hit the recorded shas
    ckpt = eng.checkpoint()
    for part, info in sorted(ckpt.partitions.items()):
        if not info.get("data_file"):
            continue
        with open(os.path.join(eng.cfg.lake_dir, info["data_file"]), "r+b") as f:
            f.seek(50)
            f.write(b"\x00\x00\x00\x00")
        assert eng.repair_partition(clog, part) is True
    assert (eng.fsck().to_pandas()["ok"] == 1).all()
    assert eng.snapshot_sha256() == sha


def test_rerun_heals_crash_between_save_and_rewrite(tmp_path):
    eng, _ = _replayed(tmp_path)
    repo, path = _some_live_key(eng)
    # simulate the documented crash window: ban persisted, rewrite never ran
    save_forget_list(
        eng.cfg.lake_dir,
        [{"repo": repo, "path": path, "lsn": eng.checkpoint().end_lsn}],
    )
    assert _has_key(eng, repo, path) == 1  # lake still shows the row
    erased = eng.forget([(repo, path)])  # re-run = heal
    assert erased == 1
    assert _has_key(eng, repo, path) == 0
    assert (eng.fsck().to_pandas()["ok"] == 1).all()


def test_forget_changefeed_deltas_and_index_sync(tmp_path):
    from arches_rascoll_etl_ray.pipelines.index import SecondaryIndex

    eng, _ = _replayed(tmp_path)
    repo, path = _some_live_key(eng)
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=4)
    idx.sync(eng)
    snap = eng.snapshot_table()
    m = pc.and_(pc.equal(snap["repo"], repo), pc.equal(snap["path"], path))
    lang = snap.filter(m)["lang"][0].as_py()
    keys0 = idx.lookup_keys(lang)
    assert any(
        r == repo and p == path
        for r, p in zip(keys0["repo"].to_pylist(), keys0["path"].to_pylist())
    )

    epoch0 = eng.checkpoint().epoch
    eng.forget([(repo, path)])
    # downstream contract: erasure rides the changefeed as a pure delete
    feed = eng.changefeed(epoch0, epoch0 + 1).take_all()
    assert len(feed) == 1 and feed[0]["op"] == "D"
    assert feed[0]["repo"] == repo and feed[0]["path"] == path
    # and a changefeed-synced index drops the posting through normal sync
    idx.sync(eng)
    keys1 = idx.lookup_keys(lang)
    assert not any(
        r == repo and p == path
        for r, p in zip(keys1["repo"].to_pylist(), keys1["path"].to_pylist())
    )
    assert len(keys1) == len(keys0) - 1


def test_vacuum_after_forget_leaves_no_trace_in_data_files(tmp_path):
    """The full privacy guarantee: forget() + vacuum() leaves NO retained
    lake data/run file containing the erased key's bytes (pre-erasure
    epochs' files and checkpoints are gone, so time travel cannot
    resurrect it either). The ban list itself retains the key IDENTITY by
    design — a suppression list needs the identifier to suppress."""
    eng, _ = _replayed(tmp_path)
    repo, path = _some_live_key(eng)
    eng.forget([(repo, path)])
    eng.vacuum()

    hits = []
    for root, _dirs, files in os.walk(eng.cfg.lake_dir):
        for f in files:
            p = os.path.join(root, f)
            if f.endswith(".json") or "_forgotten_keys" in f:
                continue
            with open(p, "rb") as fh:
                blob = fh.read()
            # parquet dictionaries store raw strings: a plain substring scan
            # finds the key if ANY retained row (or stats entry) carries it
            if repo.encode() in blob and path.encode() in blob:
                hits.append(p)
    assert hits == [], hits

    # time travel to any pre-erasure epoch is gone with its checkpoints
    import pytest

    with pytest.raises(Exception):
        eng.checkpoint(epoch=1)


def test_redact_changelog_removes_source_bytes_and_replays_clean(tmp_path):
    """The producer-side half: after forget + redact_changelog, the erased
    events' bytes are gone from the WAL shards themselves, and a
    from-scratch replay WITHOUT any ban list converges to the post-erasure
    sha (the events no longer exist to resurrect)."""
    from arches_rascoll_etl_ray.sources.changelog import list_shards, redact_changelog

    eng, clog = _replayed(tmp_path)
    repo, path = _some_live_key(eng)
    eng.forget([(repo, path)])
    want = eng.snapshot_sha256()
    entries = load_forget_list(eng.cfg.lake_dir)

    removed = redact_changelog(clog, entries)
    assert removed > 0
    assert redact_changelog(clog, entries) == 0  # idempotent

    # the key pair's bytes are gone from every shard
    for _, _, p in list_shards(clog):
        with open(p, "rb") as fh:
            blob = fh.read()
        assert not (repo.encode() in blob and path.encode() in blob), p

    # no ban list needed anymore: the redacted WAL replays to the same state
    fresh = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_r"), num_partitions=4))
    fresh.replay(clog, events_per_epoch=1000)
    assert _has_key(fresh, repo, path) == 0
    assert fresh.snapshot_sha256() == want


def test_forget_lsm_mode_folds_runs_and_targets_one_partition(tmp_path):
    """LSM lakes (the small-epoch 10^10 regime) erase too: pending sorted
    runs fold into the rewritten base, and only the erased key's routed
    partition rewrites — the other partitions' committed files are
    untouched (forget cost is O(1/P of the lake), not a full rewrite)."""
    eng, _ = _replayed(tmp_path, merge_mode="lsm", lsm_compact_threshold=100_000)
    repo, path = _some_live_key(eng)
    before = {
        p: (i.get("data_file"), tuple(i.get("runs") or []))
        for p, i in eng.checkpoint().partitions.items()
    }
    assert any(r for _, r in before.values())  # runs genuinely pending

    erased = eng.forget([(repo, path)])
    assert erased == 1
    assert _has_key(eng, repo, path) == 0
    after = eng.checkpoint().partitions
    changed = [
        p for p, (df, runs) in before.items()
        if (after[p].get("data_file"), tuple(after[p].get("runs") or [])) != (df, runs)
    ]
    assert len(changed) == 1  # only the routed partition rewrote
    assert not after[changed[0]].get("runs")  # its runs folded away
    assert (eng.fsck().to_pandas()["ok"] == 1).all()

"""End-to-end CDC conformance: replay / resume / duplicate & out-of-order
delivery / deletes all reconverge to the DuckDB fold of the same log
(FIXTURES.md F2; north-rule sha256-equality gate)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import (
    ensure_changelog,
    generate_changelog,
    write_changelog_shards,
)
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine

BASE_COLS = ["repo", "path", "commit", "lang", "content"]


def duckdb_fold(changelog_dir: str) -> pa.Table:
    con = duckdb.connect()
    try:
        return con.execute(
            f"""
            WITH last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
              FROM read_parquet('{changelog_dir}/changelog-*.parquet')
            )
            SELECT repo, path, "commit", lang, content
            FROM last WHERE rn = 1 AND op <> 'D'
            ORDER BY repo, path
            """
        ).arrow()
    finally:
        con.close()


def assert_matches_fold(engine: CDCEngine, changelog_dir: str):
    mine = engine.snapshot_table().select(BASE_COLS)
    oracle = duckdb_fold(changelog_dir)
    mine = mine.cast(oracle.schema)
    assert mine.equals(oracle), "lake snapshot != per-key max-LSN fold of the log"


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clog"))
    return ensure_changelog(root, num_files=400, num_events=4000, seed=7, num_shards=8)


def test_single_epoch_replay(changelog, tmp_lake):
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    ckpt = eng.replay(changelog)
    assert ckpt.epoch == 1
    assert_matches_fold(eng, changelog)


def test_multi_epoch_equals_single_epoch(changelog, tmp_path):
    lake_a, lake_b = str(tmp_path / "a"), str(tmp_path / "b")
    ea = CDCEngine(EngineConfig(lake_dir=lake_a, num_partitions=8))
    eb = CDCEngine(EngineConfig(lake_dir=lake_b, num_partitions=8))
    ea.replay(changelog)
    eb.replay(changelog, events_per_epoch=1000)
    assert eb.checkpoint().epoch == 4
    assert ea.snapshot_table().equals(eb.snapshot_table())
    assert ea.snapshot_sha256() == eb.snapshot_sha256()


def test_resume_from_mid_checkpoint(changelog, tmp_lake):
    """Kill-and-resume: apply half, then a fresh engine object resumes from
    the committed checkpoint and reconverges."""
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng.apply_epoch(changelog, max_events=2000)
    assert eng.lag(changelog)["lag_events"] == 2000
    eng2 = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng2.replay(changelog, events_per_epoch=1500)
    assert_matches_fold(eng2, changelog)


def test_reapplying_same_epoch_is_noop(changelog, tmp_lake):
    """Exactly-once: re-running an already-committed LSN range changes
    nothing (manifest guard — reference NOT-IN analogue)."""
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng.replay(changelog)
    sha = eng.snapshot_sha256()
    # same end_lsn again: no new events -> checkpoint unchanged
    ckpt = eng.apply_epoch(changelog)
    assert ckpt.epoch == 1
    assert eng.snapshot_sha256() == sha


def test_duplicate_and_out_of_order_delivery(tmp_path):
    """FIXTURES.md F2 adversarial cases: duplicated LSNs and bounded
    out-of-order delivery within an epoch must not change the final state."""
    df = generate_changelog(100, 1500, seed=11)
    rng = np.random.default_rng(0)
    dup = df.sample(frac=0.2, random_state=3)
    messy = pd.concat([df, dup]).sample(frac=1.0, random_state=4).reset_index(drop=True)

    clean_dir, messy_dir = str(tmp_path / "clean"), str(tmp_path / "messy")
    write_changelog_shards(df, clean_dir, num_shards=4)
    write_changelog_shards(messy, messy_dir, num_shards=4)

    ec = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lc"), num_partitions=4))
    em = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lm"), num_partitions=4))
    ec.replay(clean_dir)
    em.replay(messy_dir)  # single epoch covers the full disorder window
    assert ec.snapshot_table().equals(em.snapshot_table())
    assert ec.snapshot_sha256() == em.snapshot_sha256()


def test_delete_semantics(tmp_path):
    """delete, update-after-delete (reinsert wins), delete-of-missing-key."""
    rows = [
        (1, "I", "r/a", "f.py", "c1", "python", "v1"),
        (2, "U", "r/a", "f.py", "c2", "python", "v2"),
        (3, "D", "r/a", "f.py", None, None, None),
        (4, "D", "r/b", "never.py", None, None, None),  # delete of missing key
        (5, "I", "r/a", "g.py", "c3", "python", "v1"),
        (6, "D", "r/a", "g.py", None, None, None),
        (7, "I", "r/a", "g.py", "c4", "python", "v3"),  # reinsert after delete
    ]
    df = pd.DataFrame(rows, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"])
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=1)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2))
    eng.replay(d, events_per_epoch=3)  # split so deletes cross epochs
    t = eng.snapshot_table()
    got = {(r["repo"], r["path"]): (r["commit"], r["content"]) for r in t.to_pylist()}
    assert got == {("r/a", "g.py"): ("c4", "v3")}


def test_sort_plan_and_salted_path_equal_spill(changelog, tmp_path):
    """All three physical plans — spill (default), sort-shuffle, and the
    salted two-stage sort-shuffle (north-rule skew handling) — must be
    semantically identical (stale-salted-winner bug guard)."""
    e1 = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "l1"), num_partitions=4))
    e2 = CDCEngine(
        EngineConfig(lake_dir=str(tmp_path / "l2"), num_partitions=4, shuffle="sort")
    )
    e3 = CDCEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "l3"), num_partitions=4, shuffle="sort", salt_partitions=4
        )
    )
    for e in (e1, e2, e3):
        e.replay(changelog, events_per_epoch=1500)
    assert e1.snapshot_table().equals(e2.snapshot_table())
    assert e1.snapshot_table().equals(e3.snapshot_table())
    assert e1.snapshot_sha256() == e2.snapshot_sha256() == e3.snapshot_sha256()


def test_vacuum_keeps_live_snapshot(changelog, tmp_lake):
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng.replay(changelog, events_per_epoch=1000)
    before = eng.snapshot_table()
    removed = eng.vacuum()
    assert removed > 0
    assert eng.snapshot_table().equals(before)


def test_lineage_metrics(changelog, tmp_lake):
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng.apply_epoch(changelog, max_events=2500)
    lag = eng.lag(changelog)
    assert lag["applied_end_lsn"] == 2500
    assert lag["lag_events"] == 1500
    ckpt = eng.checkpoint()
    for part, info in ckpt.partitions.items():
        assert info["applied_lsn"] <= 2500
        assert info["data_file"].startswith(f"part={part:05d}/")


def test_reopen_with_different_partition_count_rejected(changelog, tmp_lake):
    """num_partitions is pinned at lake creation — a mismatched reopen would
    silently scatter keys across partitions (found by crash-probe)."""
    CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8)).replay(changelog)
    with pytest.raises(ValueError, match="num_partitions"):
        CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=4))


def test_cli_roundtrip(tmp_path):
    """CLI surface: generate → replay → status → export in-process."""
    from arches_rascoll_etl_ray.__main__ import main

    clog, lake, out = str(tmp_path / "clog"), str(tmp_path / "lake"), str(tmp_path / "exp")
    assert main(["generate", "--out", clog, "--files", "100", "--events", "800"]) == 0
    assert main(["replay", "--lake", lake, "--partitions", "4", "--changelog", clog]) == 0
    assert main(["status", "--lake", lake, "--partitions", "4", "--changelog", clog]) == 0
    assert main(["export", "--lake", lake, "--partitions", "4", "--out", out]) == 0
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert files
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    assert rows == sum(i["rows"] for i in eng.checkpoint().partitions.values())


def test_csv_changelog_source(tmp_path):
    """Reference's CSV source (S1): replay from CSV shards equals replay
    from parquet shards (content includes embedded newlines)."""
    df = generate_changelog(120, 1000, seed=13)
    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    write_changelog_shards(df, pdir, num_shards=3)
    write_changelog_shards(df, cdir, num_shards=3, fmt="csv")
    ep = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lp"), num_partitions=4))
    ec = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lc"), num_partitions=4))
    ep.replay(pdir, events_per_epoch=400)
    ec.replay(cdir, events_per_epoch=400)
    a = ep.snapshot_table().select(BASE_COLS)
    b = ec.snapshot_table().select(BASE_COLS)
    assert a.cast(b.schema).equals(b)


def test_tail_follows_appended_shards(tmp_path):
    """Continuous tail: new shards appearing mid-tail are applied."""
    import threading
    import time as _t

    df = generate_changelog(80, 900, seed=21)
    d = str(tmp_path / "log")
    write_changelog_shards(df.iloc[:500], d, num_shards=2)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))

    def append_later():
        _t.sleep(0.8)
        write_changelog_shards(df.iloc[500:], d, num_shards=2)

    t = threading.Thread(target=append_later)
    t.start()
    ckpt = eng.tail(d, poll_interval_s=0.3, idle_polls=4)
    t.join()
    assert ckpt.end_lsn == 900
    assert_matches_fold(eng, d)
    assert ckpt.metrics["events_per_sec"] > 0  # lineage metrics present


def test_export_formats(tmp_path):
    df = generate_changelog(60, 400, seed=22)
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=2)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2))
    eng.replay(d)
    for fmt, ext in (("csv", "csv"), ("jsonl", "jsonl")):
        out = str(tmp_path / f"exp_{fmt}")
        n = eng.export_snapshot(out, fmt=fmt)
        assert n == sum(i["rows"] for i in eng.checkpoint().partitions.values())
        files = [f for f in os.listdir(out) if f.endswith(ext)]
        assert files
    with pytest.raises(ValueError):
        eng.export_snapshot(str(tmp_path / "x"), fmt="xml")


def test_export_parallel_deterministic(tmp_path):
    """export_snapshot fans out one Ray task per partition; two independent
    exports of the same lake must produce byte-identical files and markers
    (same bytes, same .done contents — the timing-free equivalence check for
    the parallelized path), and a partial export must resume by writing only
    the missing partitions."""
    import hashlib

    df = generate_changelog(120, 900, seed=31)
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=2)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8))
    eng.replay(d)

    def digest(out):
        return {
            f: hashlib.sha256(open(os.path.join(out, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(out))
        }

    out1, out2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    n1 = eng.export_snapshot(out1, fmt="jsonl")
    n2 = eng.export_snapshot(out2, fmt="jsonl")
    assert n1 == n2 == sum(i["rows"] for i in eng.checkpoint().partitions.values())
    assert digest(out1) == digest(out2)
    # partial resume: delete some outputs+markers, re-export fills only those
    victims = [f for f in sorted(os.listdir(out1)) if f.endswith(".jsonl")][:3]
    kept_mtime = {}
    for f in os.listdir(out1):
        p = os.path.join(out1, f)
        if f in victims or f.replace(".done", "") in victims:
            os.remove(p)
        else:
            kept_mtime[f] = os.path.getmtime(p)
    n3 = eng.export_snapshot(out1, fmt="jsonl")
    assert n3 == n1
    assert digest(out1) == digest(out2)
    for f, m in kept_mtime.items():  # untouched partitions were not rewritten
        assert os.path.getmtime(os.path.join(out1, f)) == m


def test_corrupt_checkpoint_falls_back(changelog, tmp_lake):
    """A torn/truncated latest checkpoint must not brick the lake: resume
    falls back to the newest parseable epoch and replays the gap."""
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng.replay(changelog, events_per_epoch=1000)
    sha = eng.snapshot_sha256()
    ckpt_dir = os.path.join(tmp_lake, "_checkpoints")
    latest = sorted(os.listdir(ckpt_dir))[-1]
    with open(os.path.join(ckpt_dir, latest), "w") as f:
        f.write('{"epoch": 4, "end_l')  # torn write
    eng2 = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    assert eng2.checkpoint().epoch == 3  # fell back
    eng2.replay(changelog, events_per_epoch=1000)  # replays epoch 4
    assert eng2.snapshot_sha256() == sha
    assert_matches_fold(eng2, changelog)


def test_corrupt_manifest_rewritten(changelog, tmp_lake):
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng.apply_epoch(changelog, max_events=2000)
    # corrupt one partition manifest of a *pending* epoch scenario:
    # simulate by truncating an existing manifest then re-reading
    from arches_rascoll_etl_ray.state.manifest import read_manifest

    mpath = None
    for name in os.listdir(tmp_lake):
        if name.startswith("part="):
            cands = [f for f in os.listdir(os.path.join(tmp_lake, name)) if f.startswith("manifest")]
            if cands:
                mpath = os.path.join(tmp_lake, name, cands[0])
                part = int(name.split("=")[1])
                break
    with open(mpath, "w") as f:
        f.write("{broken")
    assert read_manifest(tmp_lake, part, 1) is None  # treated as uncommitted


def test_hot_key_stress(tmp_path):
    """50% of all events hit ONE key: correctness must hold and the
    combiner must keep the hot partition's delta bounded."""
    import pandas as pd

    n = 4000
    rng = np.random.default_rng(5)
    hot = rng.random(n) < 0.5
    fids = np.where(hot, 0, rng.integers(1, 200, size=n))
    rows = []
    for lsn, fid in enumerate(fids, start=1):
        rows.append((lsn, "U" if lsn > 200 else "I", f"org/r{fid % 20}", f"f{fid}.py", f"c{lsn}", "py", f"v{lsn}"))
    df = pd.DataFrame(rows, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"])
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=8)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.replay(d, events_per_epoch=1000)
    assert_matches_fold(eng, d)


def test_vacuum_after_crash_window_does_not_brick(changelog, tmp_lake):
    """Review-found bug: manifests committed but checkpoint lost (torn
    write) + vacuum used to delete the data files while leaving the
    manifests — resume then referenced deleted files. Fixed: vacuum removes
    non-committed-epoch manifests together with unreferenced data."""
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng.replay(changelog, events_per_epoch=1000)  # epochs 1..4
    sha = eng.snapshot_sha256()
    # simulate the crash window: epoch-4 checkpoint lost, manifests remain
    os.remove(os.path.join(tmp_lake, "_checkpoints", "epoch_000000004.json"))
    eng2 = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    assert eng2.checkpoint().epoch == 3
    eng2.vacuum()  # used to brick here
    ckpt = eng2.replay(changelog, events_per_epoch=1000)  # redo epoch 4
    assert ckpt.epoch == 4
    assert eng2.snapshot_sha256() == sha
    assert_matches_fold(eng2, changelog)
    eng2.snapshot_table()  # all referenced files must exist


def test_single_writer_lock(changelog, tmp_lake):
    from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng.apply_epoch(changelog, max_events=1000)  # lock released after
    with _WriterLock(tmp_lake):
        with pytest.raises(RuntimeError, match="another writer"):
            eng.apply_epoch(changelog, max_events=1000)
    # released → works again
    eng.replay(changelog, events_per_epoch=1000)
    assert_matches_fold(eng, changelog)


def test_merge_task_failure_retried_exactly_once(changelog, tmp_lake):
    """Every merge task fails once (injected) and Ray retries it — the
    replay must still commit every epoch and reconverge to the fold.
    Exercises the real task-retry + manifest-idempotency path end-to-end."""
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=4, fault_injection=True))
    fault_dir = os.path.join(tmp_lake, "_fault_once")
    os.makedirs(fault_dir, exist_ok=True)
    ckpt = eng.replay(changelog, events_per_epoch=2000)
    assert ckpt.epoch == 2
    assert len(os.listdir(fault_dir)) == 8  # 4 partitions × 2 epochs each faulted once
    assert_matches_fold(eng, changelog)


def test_time_travel_snapshots(changelog, tmp_lake):
    """snapshot_*(epoch=k) reads the lake AS OF any retained committed
    epoch: shas and tables match what was observed live at each epoch;
    epoch 0 is the empty lake; an uncommitted epoch raises."""
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    live_shas, live_rows = {}, {}
    for _ in range(4):
        ckpt = eng.apply_epoch(changelog, max_events=1000)
        live_shas[ckpt.epoch] = eng.snapshot_sha256()
        live_rows[ckpt.epoch] = eng.snapshot_table().num_rows
    assert eng.checkpoint().epoch == 4
    for ep in (1, 2, 3, 4):
        assert eng.snapshot_sha256(epoch=ep) == live_shas[ep]
        assert eng.snapshot_table(epoch=ep).num_rows == live_rows[ep]
    # as-of read through the Dataset path too
    assert eng.snapshot_dataset(epoch=2).count() == live_rows[2]
    # epoch 0 = empty lake; future epoch = never committed
    assert eng.snapshot_table(epoch=0).num_rows == 0
    with pytest.raises(FileNotFoundError):
        eng.checkpoint(epoch=99)
    # vacuum trims the horizon: old epochs' superseded files AND their
    # checkpoint JSONs are gone, so time travel to them raises the documented
    # FileNotFoundError up front (not a raw missing-parquet error later, nor
    # a silently-wrong snapshot_sha256 fast-path digest); the latest epoch
    # still reads exactly
    eng.vacuum()
    assert eng.snapshot_sha256(epoch=4) == live_shas[4]
    for ep in (1, 2, 3):
        with pytest.raises(FileNotFoundError):
            eng.checkpoint(epoch=ep)
        with pytest.raises(FileNotFoundError):
            eng.snapshot_sha256(epoch=ep)


def test_writer_lease(tmp_path):
    """Shared-FS multi-driver story: a live foreign lease rejects a second
    writer; an EXPIRED foreign lease is stolen; a same-host lease whose pid
    is dead is stolen immediately (crash-resume never waits out the TTL);
    clean exit releases our lease but never deletes a foreign one."""
    import json
    import socket
    import time

    from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    lease = os.path.join(lake, "_writer.lease")

    def put(owner, expires_in):
        with open(lease, "w") as f:
            json.dump(
                {"owner": owner, "acquired_at": time.time(),
                 "expires_at": time.time() + expires_in}, f,
            )

    # live cross-host lease → rejected (flock can't see other hosts)
    put("otherhost:1:beef", 3600)
    with pytest.raises(RuntimeError, match="leased by otherhost:1"):
        with _WriterLock(lake):
            pass
    assert json.load(open(lease))["owner"] == "otherhost:1:beef"  # untouched

    # expired cross-host lease → stolen; clean exit removes OUR lease
    put("otherhost:1:beef", -5)
    with _WriterLock(lake) as wl:
        assert json.load(open(lease))["owner"] == wl.owner
        old = json.load(open(lease))["expires_at"]
        time.sleep(0.01)
        wl.renew()
        assert json.load(open(lease))["expires_at"] > old
    assert not os.path.exists(lease)

    # same-host dead pid with a FUTURE expiry → stolen immediately
    dead = 1
    while _pid_alive(dead := dead + 1) and dead < 99999:
        pass
    put(f"{socket.gethostname()}:{dead}:cafe", 3600)
    with _WriterLock(lake):
        assert json.load(open(lease))["owner"] != f"{socket.gethostname()}:{dead}:cafe"
    # replay end-to-end still works with the lease layer in place
    df = generate_changelog(40, 200, seed=5)
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=1)
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=2))
    eng.replay(d)
    assert not os.path.exists(lease)


def _pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def test_tail_on_commit_keeps_consumer_in_sync(tmp_path):
    """The tail's on_commit hook runs after EVERY committed epoch (even
    when replay catches up internally within one poll) — here a
    SecondaryIndex stays live through a mid-tail shard append and ends
    equal to the final snapshot. events_per_epoch=300 over 900 events
    guarantees >=3 epochs regardless of how the append races the polls,
    so the assertion is timing-independent."""
    import threading
    import time as _t

    from arches_rascoll_etl_ray.pipelines.index import SecondaryIndex

    df = generate_changelog(80, 900, seed=29)
    d = str(tmp_path / "log")
    write_changelog_shards(df.iloc[:500], d, num_shards=2)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=2)
    syncs = []

    def on_commit(engine, ckpt):
        idx.sync(engine)
        syncs.append(ckpt.epoch)

    def append_later():
        _t.sleep(0.8)
        write_changelog_shards(df.iloc[500:], d, num_shards=2)

    t = threading.Thread(target=append_later)
    t.start()
    eng.tail(d, poll_interval_s=0.3, idle_polls=4, events_per_epoch=300, on_commit=on_commit)
    t.join()
    assert len(syncs) >= 3  # one hook call per committed epoch, 900/300
    assert idx.applied_epoch == eng.checkpoint().epoch
    snap = eng.snapshot_table().to_pandas()
    for v in sorted(snap["lang"].dropna().unique()):
        got = sorted(map(tuple, idx.lookup_keys(v).to_pandas().to_numpy()))
        want = sorted(map(tuple, snap[snap["lang"] == v][["repo", "path"]].to_numpy()))
        assert got == want, v


def test_metrics_history_per_epoch(tmp_path):
    df = generate_changelog(60, 600, seed=33)
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=2)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2))
    eng.replay(d, events_per_epoch=200)
    hist = eng.metrics_history()
    assert [h["epoch"] for h in hist] == [1, 2, 3]
    # events_applied counts post-combine winner rows (distinct LSNs that
    # reached a merge), so it is ≤ raw events but positive for every epoch
    assert all(h["events_applied"] >= 1 for h in hist)
    assert all(h["partitions_touched"] >= 1 for h in hist)
    assert all(h["end_lsn"] == (i + 1) * 200 for i, h in enumerate(hist))


def test_lease_steal_cas_exactly_one_winner(tmp_path):
    """Fenced steal: two stealers acting on the SAME expired-lease
    observation race through the link(2) claim — exactly one wins; the
    loser gets a clean error and the winner's lease is never clobbered.
    A stealer holding a STALE observation (lease already replaced) aborts
    and removes its claim."""
    import json
    import time

    from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    lease = os.path.join(lake, "_writer.lease")
    expired = json.dumps(
        {"owner": "otherhost:1:beef", "acquired_at": time.time() - 100,
         "expires_at": time.time() - 5}
    ).encode()
    with open(lease, "wb") as f:
        f.write(expired)

    a = _WriterLock(lake)
    b = _WriterLock(lake)
    # simulate the race: A links its claim (step inside _steal_cas) but we
    # freeze it pre-rename by linking manually through the same primitives
    import hashlib

    digest = hashlib.sha256(expired).hexdigest()[:16]
    claim = f"{lease}.steal-{digest}"
    assert a._link_create(claim)  # A holds the claim, pre-rename
    with pytest.raises(RuntimeError, match="lost the steal race"):
        b._steal_cas(expired)
    # A completes: verify-unchanged then rename into place
    assert a._read_lease_bytes() == expired
    os.replace(claim, lease)
    assert json.load(open(lease))["owner"] == a.owner
    # B retries from scratch: now sees A's LIVE lease → rejected, not stolen
    with pytest.raises(RuntimeError, match="leased by"):
        b._acquire_lease()
    # C acts on the STALE (pre-steal) observation after the claim is gone:
    # the verify step catches the changed lease and removes C's claim
    c = _WriterLock(lake)
    with pytest.raises(RuntimeError, match="changed during steal"):
        c._steal_cas(expired)
    assert not os.path.exists(claim)
    assert json.load(open(lease))["owner"] == a.owner  # never clobbered


def test_lease_steal_cas_concurrent_processes(tmp_path):
    """True concurrency: N processes all try to steal the same expired
    cross-host lease at once — exactly one acquires."""
    import json
    import multiprocessing as mp
    import time

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    lease = os.path.join(lake, "_writer.lease")
    with open(lease, "w") as f:
        json.dump(
            {"owner": "otherhost:1:beef", "acquired_at": time.time() - 100,
             "expires_at": time.time() - 5}, f,
        )
    ctx = mp.get_context("spawn")
    with ctx.Pool(6) as pool:
        results = pool.map(_try_steal, [(lake, i) for i in range(6)])
    winners = [r for r in results if r[0]]
    assert len(winners) == 1, f"expected exactly one winner, got {results}"
    assert json.load(open(lease))["owner"] == winners[0][1]


def test_lease_stale_claim_aged_out(tmp_path):
    """A crashed stealer's leaked claim older than STALE_CLAIM_SEC is
    removed and the steal proceeds."""
    import hashlib
    import json
    import time

    from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    lease = os.path.join(lake, "_writer.lease")
    expired = json.dumps(
        {"owner": "otherhost:1:beef", "acquired_at": 0, "expires_at": 1}
    ).encode()
    with open(lease, "wb") as f:
        f.write(expired)
    digest = hashlib.sha256(expired).hexdigest()[:16]
    claim = f"{lease}.steal-{digest}"
    with open(claim, "w") as f:
        f.write("{}")
    old = time.time() - 120
    os.utime(claim, (old, old))
    wl = _WriterLock(lake)
    wl._acquire_lease()
    assert json.load(open(lease))["owner"] == wl.owner
    assert not os.path.exists(claim)


def _try_steal(args):
    lake, _ = args
    import json
    import os as _os

    from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

    wl = _WriterLock(lake)
    # distinct synthetic owners (same host+pid via Pool would otherwise
    # collide in identity-based checks)
    wl.owner = f"host{_os.getpid()}:{_os.getpid()}:{args[1]:04x}"
    try:
        wl._acquire_lease()
        got = json.load(open(_os.path.join(lake, "_writer.lease")))["owner"]
        return (got == wl.owner, wl.owner)
    except RuntimeError:
        return (False, wl.owner)


def test_lease_steal_of_released_lease_reacquires(tmp_path):
    """A stealer whose observed (expired) lease vanishes before its claim
    lands — holder released cleanly — must acquire via create-if-absent,
    not fail with 'changed during steal' (and never rename over a racing
    first-writer)."""
    import json
    import time

    from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    lease = os.path.join(lake, "_writer.lease")
    expired = json.dumps(
        {"owner": "otherhost:1:beef", "acquired_at": 0, "expires_at": time.time() - 5}
    ).encode()
    with open(lease, "wb") as f:
        f.write(expired)
    wl = _WriterLock(lake)
    os.remove(lease)  # holder's clean release lands after our read
    wl._steal_cas(expired)
    assert json.load(open(lease))["owner"] == wl.owner
    # and no claim debris
    assert not [f for f in os.listdir(lake) if ".steal-" in f]


def test_lineage_from_manifests(changelog, tmp_lake, tmp_path):
    """CDCEngine.lineage(): per-partition lineage sourced from the commit
    records alone must (a) agree with a recomputed truth over the log, and
    (b) be identical whether the replay ran one-shot or split across two
    engine sessions (resume) — manifests are the lineage, not run history."""
    eng = CDCEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=8))
    eng.replay(changelog, events_per_epoch=1000)
    lin = eng.lineage()
    assert lin.column_names == [
        "partition", "applied_lsn", "events_applied",
        "live_rows", "epochs_active", "first_epoch", "last_epoch",
    ]

    # truth recomputed from the raw log + the engine's own hash
    import pyarrow.compute as pc

    from arches_rascoll_etl_ray.functions.hashing import key_hash64
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    con = duckdb.connect()
    log = con.execute(
        f"SELECT * FROM read_parquet('{changelog}/changelog-*.parquet') ORDER BY lsn"
    ).arrow()
    con.close()
    part = (key_hash64(log) % np.uint64(8)).astype(np.int64)
    lsn = log["lsn"].to_numpy(zero_copy_only=False)
    d = lin.to_pydict()
    by_part = {p: i for i, p in enumerate(d["partition"])}
    live = duckdb_fold(changelog)
    live_part = (key_hash64(live) % np.uint64(8)).astype(np.int64)
    for p in range(8):
        m = part == p
        if not m.any():
            assert p not in by_part
            continue
        i = by_part[p]
        assert d["applied_lsn"][i] == int(lsn[m].max())
        assert d["live_rows"][i] == int((live_part == p).sum())
        assert d["epochs_active"][i] == len(np.unique((lsn[m] - 1) // 1000))

    # resume split: epochs 1-2 in one engine, rest in a fresh engine
    lake2 = str(tmp_path / "lake2")
    eng2a = CDCEngine(EngineConfig(lake_dir=lake2, num_partitions=8))
    avail = max_available_lsn(changelog)
    eng2a.apply_epoch(changelog, max_events=1000)
    eng2a.apply_epoch(changelog, max_events=1000)
    eng2b = CDCEngine(EngineConfig(lake_dir=lake2, num_partitions=8))
    eng2b.replay(changelog, events_per_epoch=1000)
    lin2 = eng2b.lineage()
    assert lin.equals(lin2)


def test_repartition_to_preserves_state_and_tailing(changelog, tmp_path):
    """Online partition-count migration: after consuming half the log at
    P=8, repartition_to(P=16) must (a) preserve the snapshot sha exactly,
    (b) keep tailing from the same position, and (c) land on the identical
    final state a from-scratch P=16 replay produces."""
    src = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "p8"), num_partitions=8))
    src.apply_epoch(changelog, max_events=2000)
    mid_tbl = src.snapshot_table()  # globally key-sorted — layout-independent

    dst = src.repartition_to(str(tmp_path / "p16"), 16)
    assert dst.cfg.num_partitions == 16
    assert dst.snapshot_table().equals(mid_tbl)
    lin = dst.lineage()
    assert lin.num_rows <= 16 and lin.num_rows > 8  # keys actually spread

    # tail the remaining half on the NEW lake
    dst.replay(changelog, events_per_epoch=1000)
    assert_matches_fold(dst, changelog)

    # from-scratch P=16 replay of the full log — byte-identical final state
    ref = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "ref16"), num_partitions=16))
    ref.replay(changelog, events_per_epoch=1000)
    assert dst.snapshot_sha256() == ref.snapshot_sha256()

    # guards: same count is a no-op error; empty source refuses
    with pytest.raises(ValueError, match="equals the current"):
        dst.repartition_to(str(tmp_path / "x"), 16)
    empty = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "empty"), num_partitions=8))
    with pytest.raises(ValueError, match="empty"):
        empty.repartition_to(str(tmp_path / "y"), 16)


def test_repartition_lsm_lake_with_evolution(changelog, tmp_path):
    """repartition_to must survive the two stateful wrinkles: an LSM-mode
    source (uncompacted runs fold on read) and an active evolution spec
    (the bootstrap's spill re-applies apply_evolution to ALREADY-evolved
    rows — idempotence by construction: renamed names absent, added
    columns present with their migrated values)."""
    from arches_rascoll_etl_ray.config import AddColumn, ComputedColumn, EvolutionSpec

    spec = EvolutionSpec(
        version=2,
        renames={"lang": "language"},
        adds=(AddColumn(name="mirrored", type="bool", default=False),),
        computed=(ComputedColumn(name="content_len", source="content", fn="len"),),
    )
    src = CDCEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "p8"), num_partitions=8,
            merge_mode="lsm", lsm_compact_threshold=4, evolution=spec,
        )
    )
    src.replay(changelog, events_per_epoch=1500)  # 3 epochs → runs pending
    mid = src.snapshot_table()
    assert "language" in mid.column_names and "content_len" in mid.column_names

    dst = src.repartition_to(str(tmp_path / "p16"), 16)
    assert dst.snapshot_table().equals(mid)

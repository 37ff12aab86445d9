"""export_changefeed: the transactional outbox. Pinned: window files +
_COMMITTED + cursor land in the right order and a re-call is a no-op; a
consumer applying committed windows in name order reproduces the live
snapshot exactly; a crashed window re-runs to identical content."""

import glob
import json
import os

import pyarrow.parquet as pq

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine


def _replayed(tmp_path):
    clog = ensure_changelog(
        str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8
    )
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.replay(clog, events_per_epoch=1000)
    return eng


def _apply_windows(out_dir):
    """The outbox consumer: fold committed windows' deltas in name order."""
    state = {}
    for wdir in sorted(glob.glob(os.path.join(out_dir, "deltas-*"))):
        assert os.path.exists(os.path.join(wdir, "_COMMITTED"))
        for f in sorted(glob.glob(os.path.join(wdir, "part-*.parquet"))):
            for r in pq.read_table(f).to_pylist():
                k = (r["repo"], r["path"])
                if r["op"] == "D":
                    state.pop(k, None)
                else:
                    state[k] = {
                        c[len("new_"):]: v for c, v in r.items() if c.startswith("new_")
                    }
    return state


def test_export_windows_consumer_reproduces_snapshot(tmp_path):
    eng = _replayed(tmp_path)
    out = str(tmp_path / "outbox")

    total = eng.export_changefeed(out)
    snap = eng.snapshot_table()
    assert total == snap.num_rows  # first window = full snapshot as inserts
    assert json.load(open(os.path.join(out, "_cursor.json")))["epoch"] == eng.checkpoint().epoch
    assert eng.export_changefeed(out) == 0  # no new epochs → no-op

    # advance the lake (an erasure epoch → one D delta) and export again
    repo, path = snap["repo"][0].as_py(), snap["path"][0].as_py()
    eng.forget([(repo, path)])
    total2 = eng.export_changefeed(out)
    assert total2 == 1
    windows = sorted(glob.glob(os.path.join(out, "deltas-*")))
    assert len(windows) == 2

    # the consumer contract: applying all committed windows in order
    # reproduces the live snapshot key-for-key, column-for-column
    state = _apply_windows(out)
    final = eng.snapshot_table().to_pylist()
    assert len(state) == len(final)
    for r in final:
        got = state[(r["repo"], r["path"])]
        for c, v in r.items():
            if c not in ("repo", "path"):
                assert got[c] == v, (c, r["repo"], r["path"])


def test_export_crashed_window_reruns_to_identical_content(tmp_path):
    eng = _replayed(tmp_path)
    out = str(tmp_path / "outbox")
    eng.export_changefeed(out)
    wdir = sorted(glob.glob(os.path.join(out, "deltas-*")))[0]
    f = sorted(glob.glob(os.path.join(wdir, "part-*.parquet")))[0]
    want = pq.read_table(f)

    # simulate a crash mid-window: one partition's file never landed and
    # neither _COMMITTED nor the cursor advanced
    os.remove(f)
    os.remove(f + ".done")
    os.remove(os.path.join(wdir, "_COMMITTED"))
    os.remove(os.path.join(out, "_cursor.json"))

    total = eng.export_changefeed(out)  # rerun redoes ONLY the missing part
    assert total == eng.snapshot_table().num_rows
    assert pq.read_table(f).equals(want)  # deterministic bytes → same deltas
    assert os.path.exists(os.path.join(wdir, "_COMMITTED"))


def test_export_jsonl_format(tmp_path):
    eng = _replayed(tmp_path)
    out = str(tmp_path / "outbox")
    total = eng.export_changefeed(out, fmt="jsonl")
    assert total == eng.snapshot_table().num_rows
    rows = []
    for f in sorted(glob.glob(os.path.join(out, "deltas-*", "part-*.jsonl"))):
        with open(f) as fh:
            rows.extend(json.loads(line) for line in fh if line.strip())
    assert len(rows) == total
    assert all(r["op"] == "I" for r in rows)  # first window = inserts
    assert {"repo", "path"} <= set(rows[0])

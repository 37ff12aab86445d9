"""Incremental join-view conformance (pipelines/join_view.py).

Contract: after every sync, the view equals
    LWW(A) @ applied_a  LEFT JOIN  LWW(B) @ applied_b
— checked by a from-scratch pandas join of the two snapshots at EVERY
interleaved horizon, including right-side deletes (null-out), right
inserts arriving AFTER left rows referenced them (dangling fill-in),
left updates that MOVE a row's join key across view partitions, and the
crash-window replay.
"""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.functions.hashing import KEY_SEP
from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine
from arches_rascoll_etl_ray.pipelines.join_view import IncrementalJoinView


def _clog(tmp_path, rows, name, path_const):
    df = pd.DataFrame(
        {
            "lsn": np.arange(1, len(rows) + 1, dtype=np.int64),
            "op": [r[0] for r in rows],
            "repo": [r[1] for r in rows],
            "path": [path_const] * len(rows),
            "commit": [r[2] for r in rows],
            "lang": [r[3] for r in rows],
            "content": [r[4] for r in rows],
        }
    )
    d = str(tmp_path / name)
    write_changelog_shards(df, d, num_shards=2)
    return d


def _expected(a_eng, b_eng, ea, eb):
    a = a_eng.snapshot_table(epoch=ea).to_pandas()
    b = b_eng.snapshot_table(epoch=eb).to_pandas()
    j = a.merge(
        b[["repo", "commit", "lang", "content"]].rename(
            columns={"repo": "lang", "commit": "b_commit", "lang": "b_lang", "content": "b_content"}
        ),
        on="lang",
        how="left",
    )
    out = j[["repo", "path", "lang", "content", "b_commit", "b_lang", "b_content"]]
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def _got(view):
    t = view.table().to_pandas()
    if "a_key" not in t.columns or not len(t):
        return pd.DataFrame(
            columns=["repo", "path", "lang", "content", "b_commit", "b_lang", "b_content"]
        )
    rp = t["a_key"].str.split(KEY_SEP, n=1, expand=True)
    out = pd.DataFrame(
        {
            "repo": rp[0],
            "path": rp[1],
            "lang": t["b_key"],
            "content": t["a_content"],
            "b_commit": t["b_commit"],
            "b_lang": t["b_lang"],
            "b_content": t["b_content"],
        }
    )
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


# left rows: (op, repo, commit, lang=FK to right repo, content)
A1 = [
    ("U", "e1", "1", "u1", "va1"),
    ("U", "e2", "2", "u2", "va2"),
    ("U", "e3", "3", "u9", "va3"),  # dangling: u9 arrives in B later
]
A2 = [
    ("U", "e1", "4", "u2", "va1b"),  # join-key MOVE u1 -> u2
    ("D", "e2", "5", "u2", None),    # left delete
    ("U", "e4", "6", "u1", "va4"),
]
B1 = [
    ("U", "u1", "c1", "x", "vb1"),
    ("U", "u2", "c2", "y", "vb2"),
]
B2 = [
    ("U", "u2", "c3", "y2", "vb2b"),  # right update -> in-place col rewrite
    ("D", "u1", "c4", None, None),    # right delete -> null-out
    ("U", "u9", "c5", "z", "vb9"),    # late right insert fills dangling e3
]


def test_join_view_equivalence_at_every_horizon(tmp_path):
    a_dir = _clog(tmp_path, A1 + A2, "a", "e")
    b_dir = _clog(tmp_path, B1 + B2, "b", "state")
    a_eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "la"), num_partitions=3))
    b_eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lb"), num_partitions=3))
    view = IncrementalJoinView(str(tmp_path / "v"), join_col="lang", num_partitions=3)
    while True:
        ea0, eb0 = a_eng.checkpoint().epoch, b_eng.checkpoint().epoch
        ea = a_eng.apply_epoch(a_dir, max_events=3).epoch
        eb = b_eng.apply_epoch(b_dir, max_events=2).epoch
        view.sync(a_eng, b_eng)
        pd.testing.assert_frame_equal(
            _got(view), _expected(a_eng, b_eng, ea, eb), check_dtype=False
        )
        if ea == ea0 and eb == eb0:
            break
    got = _got(view)
    # the named semantics actually happened
    assert got.loc[got["repo"] == "e3", "b_content"].iloc[0] == "vb9"  # dangling filled
    assert got.loc[got["repo"] == "e4", "b_commit"].isna().all()  # u1 deleted -> nulls
    assert got.loc[got["repo"] == "e1", "b_content"].iloc[0] == "vb2b"  # key move + B update
    assert "e2" not in set(got["repo"])  # left delete


def test_join_view_crash_window_replay(tmp_path):
    a_dir = _clog(tmp_path, A1 + A2, "a", "e")
    b_dir = _clog(tmp_path, B1 + B2, "b", "state")
    a_eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "la"), num_partitions=3))
    b_eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lb"), num_partitions=3))
    a_eng.apply_epoch(a_dir, max_events=100)
    b_eng.apply_epoch(b_dir, max_events=100)
    view = IncrementalJoinView(str(tmp_path / "v"), join_col="lang", num_partitions=3)
    view.sync(a_eng, b_eng)
    clean = _got(view)
    files = {
        p: pq.read_table(view._part_file(p)).to_pandas().to_csv(index=False)
        for p in range(3)
        if os.path.exists(view._part_file(p))
    }
    # crash simulation: watermarks rolled back with intents persisted
    view.applied_a = view.applied_b = 0
    view.pending_a = a_eng.checkpoint().epoch
    view.pending_b = b_eng.checkpoint().epoch
    view._save_meta()
    reopened = IncrementalJoinView(str(tmp_path / "v"), join_col="lang", num_partitions=3)
    reopened.sync(a_eng, b_eng)
    pd.testing.assert_frame_equal(_got(reopened), clean, check_dtype=False)
    after = {
        p: pq.read_table(view._part_file(p)).to_pandas().to_csv(index=False)
        for p in range(3)
        if os.path.exists(view._part_file(p))
    }
    assert after == files


def test_join_view_layout_pin(tmp_path):
    d = str(tmp_path / "v")
    IncrementalJoinView(d, join_col="lang", num_partitions=3)._save_meta()
    with pytest.raises(ValueError, match="layout pin"):
        IncrementalJoinView(d, join_col="commit", num_partitions=3)
    with pytest.raises(ValueError, match="layout pin"):
        IncrementalJoinView(d, join_col="lang", num_partitions=5)


def test_join_view_int_columns_stay_int64(tmp_path):
    """Delete-bearing windows must not float-promote integer view columns
    (lsn > 2^53 corruption hazard): after right deletes land, the stored
    parquet schema keeps int64, and _to_df round-trips exactly."""
    import pyarrow as pa

    big = 2**53
    t = pa.table({"x": pa.array([big + 1, None], pa.int64())})
    df = IncrementalJoinView._to_df(t)
    assert str(df["x"].dtype) == "Int64"
    assert int(df["x"].iloc[0]) == big + 1  # a float64 path would land on 2**53

    a_dir = _clog(tmp_path, A1 + A2, "a", "e")
    b_dir = _clog(tmp_path, B1 + B2, "b", "state")
    a_eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "la"), num_partitions=3))
    b_eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lb"), num_partitions=3))
    a_eng.apply_epoch(a_dir, max_events=100)
    b_eng.apply_epoch(b_dir, max_events=100)  # includes the u1 delete
    view = IncrementalJoinView(str(tmp_path / "v"), join_col="lang", num_partitions=3)
    view.sync(a_eng, b_eng)
    for p in range(3):
        f = view._part_file(p)
        if os.path.exists(f):
            sch = pq.read_schema(f)
            assert sch.field("a_lsn").type == "int64", f
            assert sch.field("b_lsn").type == "int64", f


def test_join_view_right_path_pin_guard(tmp_path):
    """A right_path pin that doesn't match the right lake's actual path
    fails loudly on the first right window, not with silently dangling
    rows."""
    a_dir = _clog(tmp_path, A1, "a", "e")
    b_dir = _clog(tmp_path, B1, "b", "state")
    a_eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "la"), num_partitions=3))
    b_eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lb"), num_partitions=3))
    a_eng.apply_epoch(a_dir, max_events=100)
    b_eng.apply_epoch(b_dir, max_events=100)
    view = IncrementalJoinView(
        str(tmp_path / "v"), join_col="lang", num_partitions=3, right_path="WRONG"
    )
    import ray.exceptions

    with pytest.raises((ValueError, ray.exceptions.RayTaskError), match="right_path"):
        view.sync(a_eng, b_eng)

"""Partial-update ('P') event conformance.

Semantics under test (stages/normalize.patch_aware_reduce +
stages/merge.resolve_patches): a P row sets ONLY its non-null value
columns; a full image (I/U) newer than a patch wholly overwrites it; a
patch newer than the last full image overrides just its set columns; a
patch after a delete (or on a never-written key) creates the row from its
fragments with the unset columns null; the folded row's lsn is the max
contributing lsn and content_sha is recomputed from the FINAL content.

The gate is a property test against a trivial dict fold of the same
semantics, across BOTH merge modes (rewrite folds at write time, LSM
resolves at read time through run files), epoch splits, duplicate
delivery and shuffled arrival — plus mode-equality of the full snapshot
sha.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine

KEYS = [("r/a", "x.py"), ("r/a", "y.py"), ("r/b", "x.py"), ("hot/r", "w.c")]
VAL_COLS = ("commit", "lang", "content")


@st.composite
def patch_streams(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    events = []
    for lsn in range(1, n + 1):
        repo, path = KEYS[draw(st.integers(min_value=0, max_value=len(KEYS) - 1))]
        op = draw(st.sampled_from(["I", "U", "D", "P", "P"]))  # patch-heavy
        if op == "D":
            events.append((lsn, "D", repo, path, None, None, None))
        elif op == "P":
            # a random subset of value columns; 0 = the all-null no-op patch
            mask = draw(st.integers(min_value=0, max_value=7))
            vals = [
                (f"{c}-p{lsn}" if (mask >> i) & 1 else None)
                for i, c in enumerate(VAL_COLS)
            ]
            events.append((lsn, "P", repo, path, *vals))
        else:
            events.append((lsn, op, repo, path, f"c{lsn}", "python", f"full-{lsn}"))
    dup_idx = draw(st.lists(st.integers(min_value=0, max_value=n - 1), max_size=8))
    events = events + [events[i] for i in dup_idx]
    events = draw(st.permutations(events))
    return events


def dict_fold(events) -> dict:
    """Patch semantics in a dozen lines: the oracle the engine must match."""
    state: dict = {}
    seen = set()
    for e in sorted(events, key=lambda e: e[0]):
        lsn, op, repo, path = e[0], e[1], e[2], e[3]
        if lsn in seen:  # duplicate delivery of the same event
            continue
        seen.add(lsn)
        k = (repo, path)
        if op == "D":
            state.pop(k, None)
        elif op == "P":
            if all(v is None for v in e[4:]):
                continue  # all-null patch: defined no-op
            cur = state.get(k, dict.fromkeys(VAL_COLS))
            for c, v in zip(VAL_COLS, e[4:]):
                if v is not None:
                    cur[c] = v
            state[k] = cur
        else:
            state[k] = dict(zip(VAL_COLS, e[4:]))
    return {k: tuple(v[c] for c in VAL_COLS) for k, v in state.items()}


def _replay(events, tmp, mode: str, parts=3, epochs=2):
    df = pd.DataFrame(
        events, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp / f"log_{mode}")
    write_changelog_shards(df, d, num_shards=2)
    kw = {"merge_mode": "lsm", "lsm_compact_threshold": 3} if mode == "lsm" else {}
    eng = CDCEngine(
        EngineConfig(lake_dir=str(tmp / f"lake_{mode}"), num_partitions=parts, **kw)
    )
    eng.replay(d, events_per_epoch=max(1, len(df) // epochs))
    return eng


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(patch_streams())
def test_patch_replay_equals_dict_fold_both_modes(tmp_path_factory, events):
    want = dict_fold(events)
    tmp = tmp_path_factory.mktemp("patch_prop")
    shas = {}
    for mode in ("rewrite", "lsm"):
        eng = _replay(events, tmp, mode)
        got = {
            (r["repo"], r["path"]): (r["commit"], r["lang"], r["content"])
            for r in eng.snapshot_table().to_pylist()
        }
        assert got == want, mode
        shas[mode] = eng.snapshot_sha256()
    assert shas["rewrite"] == shas["lsm"]


def test_patch_overrides_only_set_columns(tmp_path):
    events = [
        (1, "I", "r", "f", "c1", "python", "hello"),
        (2, "P", "r", "f", None, None, "patched"),
    ]
    eng = _replay(events, tmp_path, "rewrite", parts=2, epochs=1)
    row = eng.snapshot_table().to_pylist()[0]
    assert (row["commit"], row["lang"], row["content"]) == ("c1", "python", "patched")
    assert row["lsn"] == 2
    import hashlib

    assert row["content_sha"] == hashlib.sha256(b"patched").hexdigest()


def test_newer_full_image_discards_older_patch(tmp_path):
    events = [
        (1, "I", "r", "f", "c1", "python", "v1"),
        (2, "P", "r", "f", None, "go", None),
        (3, "U", "r", "f", "c3", "rust", "v3"),
    ]
    eng = _replay(events, tmp_path, "rewrite", parts=2, epochs=1)
    row = eng.snapshot_table().to_pylist()[0]
    assert (row["commit"], row["lang"], row["content"]) == ("c3", "rust", "v3")


def test_patch_creates_and_resurrects(tmp_path):
    events = [
        (1, "P", "new", "k", None, "python", None),  # create from fragment
        (2, "I", "dead", "k", "c2", "go", "body"),
        (3, "D", "dead", "k", None, None, None),
        (4, "P", "dead", "k", "c4", None, None),  # resurrect with only commit
    ]
    eng = _replay(events, tmp_path, "rewrite", parts=2, epochs=2)
    rows = {(r["repo"], r["path"]): r for r in eng.snapshot_table().to_pylist()}
    assert rows[("new", "k")]["lang"] == "python"
    assert rows[("new", "k")]["commit"] is None
    assert rows[("new", "k")]["content"] is None
    assert rows[("dead", "k")]["commit"] == "c4"
    assert rows[("dead", "k")]["lang"] is None  # the delete really cleared it


def test_cross_epoch_patch_on_prev_snapshot(tmp_path):
    """The rewrite path must source base images from the PREVIOUS epoch's
    snapshot when an epoch contains only patches for a key."""
    events = [
        (1, "I", "r", "f", "c1", "python", "v1"),
        (2, "P", "r", "f", None, None, "v2-patch"),
        (3, "P", "r", "f", None, "go", None),
    ]
    for mode in ("rewrite", "lsm"):
        eng = _replay(events, tmp_path, mode, parts=2, epochs=3)  # ~1 event/epoch
        row = eng.snapshot_table().to_pylist()[0]
        assert (row["commit"], row["lang"], row["content"]) == ("c1", "go", "v2-patch"), mode


def test_salted_path_keeps_patches(tmp_path):
    """Salted sub-partitioning pre-reduces per (_part, _salt) group — two
    patches on one key landing in different salt groups must both survive
    to the final resolve."""
    events = [(1, "I", "r", "f", "c1", "python", "v1")] + [
        (i, "P", "r", "f", None, None, f"v{i}") for i in range(2, 12)
    ] + [(12, "P", "r", "f", None, "go", None)]
    df = pd.DataFrame(
        events, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=2)
    eng = CDCEngine(
        EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2, salt_partitions=4)
    )
    eng.replay(d, events_per_epoch=len(df))
    row = eng.snapshot_table().to_pylist()[0]
    assert (row["commit"], row["lang"], row["content"]) == ("c1", "go", "v11")


def test_patches_across_schema_evolution(tmp_path):
    """Patches compose with evolution casts: renamed columns patch under
    their new name, computed columns recompute only when their source was
    set, constant adds stay at their default."""
    from arches_rascoll_etl_ray.config import AddColumn, ComputedColumn, EvolutionSpec

    spec = EvolutionSpec(
        version=2,
        renames={"lang": "language"},
        adds=(AddColumn(name="mirrored", type="bool", default=False),),
        computed=(ComputedColumn(name="content_len", source="content", fn="len"),),
    )
    events = [
        (1, "I", "r", "f", "c1", "python", "abcd"),
        (2, "P", "r", "f", None, "go", None),       # sets language only
        (3, "P", "r", "f", None, None, "xyzXYZ"),   # sets content (+ len)
    ]
    df = pd.DataFrame(
        events, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=1)
    eng = CDCEngine(
        EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2, evolution=spec)
    )
    eng.replay(d, events_per_epoch=1)  # every event its own epoch
    row = eng.snapshot_table().to_pylist()[0]
    assert row["language"] == "go"
    assert row["content"] == "xyzXYZ"
    assert row["content_len"] == 6  # recomputed with the patched content
    assert row["commit"] == "c1"
    assert row["mirrored"] is False
    assert row["lsn"] == 3


def test_secondary_index_and_changefeed_over_patches(tmp_path):
    """The changefeed diffs RESOLVED states, so downstream consumers (the
    secondary index here) see patched columns as ordinary updates."""
    from arches_rascoll_etl_ray.pipelines.index import SecondaryIndex

    events = [
        (1, "I", "r", "a", "c1", "python", "v1"),
        (2, "I", "r", "b", "c2", "go", "v2"),
        (3, "P", "r", "a", None, "rust", None),  # lang move via patch
        (4, "P", "r", "b", None, None, "v2b"),   # lsn-only-ish churn for the index
    ]
    df = pd.DataFrame(
        events, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=1)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2))
    idx = SecondaryIndex(str(tmp_path / "idx"), column="lang", num_partitions=2)
    eng.apply_epoch(d, max_events=2)
    idx.sync(eng)
    eng.apply_epoch(d)
    idx.sync(eng)
    assert [tuple(r.values()) for r in idx.lookup_keys("rust").to_pylist()] == [("r", "a")]
    assert [tuple(r.values()) for r in idx.lookup_keys("python").to_pylist()] == []
    assert [tuple(r.values()) for r in idx.lookup_keys("go").to_pylist()] == [("r", "b")]
    rows = idx.lookup_rows(eng, "go").to_pylist()
    assert rows[0]["content"] == "v2b"


def test_patches_through_sort_shuffle_plan(tmp_path):
    """The groupby('_part') sort-shuffle plan shares apply_partition_merge,
    so patches must fold identically to the spill plan (sha-equal)."""
    events = [
        (1, "I", "r", "f", "c1", "python", "v1"),
        (2, "P", "r", "f", None, None, "v2-patch"),
        (3, "I", "q", "g", "c3", "go", "v3"),
        (4, "P", "q", "g", None, "rust", None),
        (5, "P", "r", "f", None, "zig", None),
    ]
    df = pd.DataFrame(
        events, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=2)
    shas = {}
    for plan in ("spill", "sort"):
        eng = CDCEngine(
            EngineConfig(lake_dir=str(tmp_path / f"lake_{plan}"), num_partitions=2, shuffle=plan)
        )
        eng.replay(d, events_per_epoch=3)
        shas[plan] = eng.snapshot_sha256()
        row = {(r["repo"], r["path"]): r for r in eng.snapshot_table().to_pylist()}
        assert (row[("r", "f")]["commit"], row[("r", "f")]["lang"], row[("r", "f")]["content"]) == ("c1", "zig", "v2-patch"), plan
        assert (row[("q", "g")]["commit"], row[("q", "g")]["lang"], row[("q", "g")]["content"]) == ("c3", "rust", "v3"), plan
    assert shas["spill"] == shas["sort"]


def test_all_null_patch_is_noop(tmp_path):
    """A 'P' row that sets nothing (every value column null) is a defined
    no-op: it neither bumps the row's lsn nor resurrects a tombstoned key."""
    events = [
        (1, "I", "r", "live", "c1", "python", "v1"),
        (2, "P", "r", "live", None, None, None),   # sets nothing
        (3, "I", "r", "dead", "c3", "go", "v3"),
        (4, "D", "r", "dead", None, None, None),
        (5, "P", "r", "dead", None, None, None),   # must NOT resurrect
    ]
    for mode in ("rewrite", "lsm"):
        eng = _replay(events, tmp_path, mode, parts=2, epochs=2)
        rows = {(r["repo"], r["path"]): r for r in eng.snapshot_table().to_pylist()}
        assert set(rows) == {("r", "live")}, mode
        assert rows[("r", "live")]["lsn"] == 1, mode  # lsn not bumped
        assert rows[("r", "live")]["content"] == "v1"

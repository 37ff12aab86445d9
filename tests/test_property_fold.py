"""Property-based conformance: for ANY event stream (random ops, duplicate
LSN deliveries, shuffled order, deletes of missing keys, re-inserts), the
engine's replay equals the reference-semantics fold (per-key max-LSN,
deletes win, dropped) computed by a trivial dict loop."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine

KEYS = [("r/a", "x.py"), ("r/a", "y.py"), ("r/b", "x.py"), ("r/b", "z.md"), ("hot/r", "w.c")]


@st.composite
def change_streams(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    events = []
    for lsn in range(1, n + 1):
        ki = draw(st.integers(min_value=0, max_value=len(KEYS) - 1))
        op = draw(st.sampled_from(["I", "U", "D"]))
        repo, path = KEYS[ki]
        if op == "D":
            events.append((lsn, "D", repo, path, None, None, None))
        else:
            events.append((lsn, op, repo, path, f"c{lsn}", "python", f"content-{repo}-{path}-v{lsn}"))
    # duplicate a subset of deliveries and shuffle the arrival order
    dup_idx = draw(st.lists(st.integers(min_value=0, max_value=n - 1), max_size=10))
    events = events + [events[i] for i in dup_idx]
    events = draw(st.permutations(events))
    return events


def dict_fold(events) -> dict:
    """The reference's semantics in five lines: max-LSN wins per key
    (arches_rascoll/ref_collection.py:142 generalized), D is a tombstone."""
    state: dict = {}
    for lsn, op, repo, path, commit, lang, content in sorted(events, key=lambda e: e[0]):
        state[(repo, path)] = (lsn, op, commit, content)
    return {
        k: (v[2], v[3]) for k, v in state.items() if v[1] != "D"
    }


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(change_streams())
def test_replay_equals_dict_fold(tmp_path_factory, events):
    tmp = tmp_path_factory.mktemp("prop")
    df = pd.DataFrame(
        events, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp / "log")
    write_changelog_shards(df, d, num_shards=2)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp / "lake"), num_partitions=3))
    # epoch split in the middle of the stream exercises cross-epoch dedup
    eng.replay(d, events_per_epoch=max(1, len(df) // 2))
    got = {
        (r["repo"], r["path"]): (r["commit"], r["content"])
        for r in eng.snapshot_table().to_pylist()
    }
    assert got == dict_fold(events)

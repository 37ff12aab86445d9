"""Schema evolution: renames / adds / widens / computed applied as Arrow
casts at merge time (SURVEY.md §2.11, FIXTURES.md F3)."""

import pandas as pd
import pyarrow as pa
import pytest

from arches_rascoll_etl_ray.config import AddColumn, ComputedColumn, EngineConfig, EvolutionSpec
from arches_rascoll_etl_ray.datagen.changelog_gen import generate_changelog, write_changelog_shards
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine
from arches_rascoll_etl_ray.stages.normalize import apply_evolution, evolved_base_columns

SPEC_V2 = EvolutionSpec(
    version=2,
    renames={"lang": "language"},
    adds=(AddColumn(name="mirrored", type="bool", default=False),),
    widens={},
    computed=(ComputedColumn(name="content_len", source="content", fn="len"),),
)


def test_projector_renames_adds_computed():
    t = pa.table({"repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["py"], "content": ["abcd"]})
    out = apply_evolution(t, SPEC_V2)
    assert "language" in out.column_names and "lang" not in out.column_names
    assert out["mirrored"].to_pylist() == [False]
    assert out["content_len"].to_pylist() == [4]


def test_projector_widen_casts():
    spec = EvolutionSpec(version=2, widens={"n": "int64"})
    t = pa.table({"n": pa.array([1, 2], pa.int32())})
    out = apply_evolution(t, spec)
    assert out.schema.field("n").type == pa.int64()


def test_key_rename_rejected():
    t = pa.table({"repo": ["r"], "path": ["p"]})
    with pytest.raises(ValueError):
        apply_evolution(t, EvolutionSpec(version=2, renames={"repo": "origin"}))


def test_evolved_base_columns():
    assert evolved_base_columns(SPEC_V2) == [
        "repo", "path", "commit", "language", "content", "mirrored", "content_len",
    ]


def test_mid_stream_evolution_matches_full_v2_replay(tmp_path):
    """FIXTURES.md F3 acceptance: epochs 1..k under v1, k+1..n under v2 ==
    a single v2-from-scratch replay (old snapshots cast up at merge time)."""
    df = generate_changelog(150, 2000, seed=5)
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=4)

    lake_mid = str(tmp_path / "mid")
    e1 = CDCEngine(EngineConfig(lake_dir=lake_mid, num_partitions=4, evolution=None))
    e1.apply_epoch(d, max_events=1000)
    e1b = CDCEngine(EngineConfig(lake_dir=lake_mid, num_partitions=4, evolution=SPEC_V2))
    e1b.replay(d, events_per_epoch=500)

    lake_full = str(tmp_path / "full")
    e2 = CDCEngine(EngineConfig(lake_dir=lake_full, num_partitions=4, evolution=SPEC_V2))
    e2.replay(d)

    a, b = e1b.snapshot_table(), e2.snapshot_table()
    assert a.column_names == b.column_names
    assert a.equals(b)


def test_spec_json_roundtrip():
    d = SPEC_V2.to_json()
    assert EvolutionSpec.from_json(d) == SPEC_V2


def test_register_computed_fn(tmp_path):
    import pyarrow.compute as pc

    from arches_rascoll_etl_ray.config import COMPUTED_FNS, register_computed_fn

    if "upper3" not in COMPUTED_FNS:
        register_computed_fn("upper3", lambda arr: pc.utf8_upper(pc.utf8_slice_codeunits(arr, 0, 3)))
    with pytest.raises(ValueError):
        register_computed_fn("upper3", lambda arr: arr)
    spec = EvolutionSpec(version=3, computed=(ComputedColumn(name="tag", source="lang", fn="upper3"),))
    t = pa.table({"repo": ["r"], "path": ["p"], "lang": ["python"], "content": ["x"], "commit": ["c"]})
    out = apply_evolution(t, spec)
    assert out["tag"].to_pylist() == ["PYT"]


def test_untouched_partition_snapshot_is_evolved(tmp_path):
    """Review-found bug: snapshot fast paths skipped apply_evolution, so a
    partition untouched after a spec change leaked its old schema."""
    import pandas as pd

    from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards

    # epoch 1 touches many keys; epoch 2 touches ONE key — with P=4 some
    # partitions are guaranteed untouched post-evolution
    rows = [(i, "I", f"r{i % 7}", f"f{i}.py", f"c{i}", "py", f"v{i}") for i in range(1, 41)]
    rows += [(41, "U", "r1", "f8.py", "c41", "py", "v41")]
    df = pd.DataFrame(rows, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"])
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=2)

    lake = str(tmp_path / "lake")
    CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4, evolution=None)).apply_epoch(
        d, max_events=40
    )
    evolved = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4, evolution=SPEC_V2))
    evolved.replay(d)

    full = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "full"), num_partitions=4, evolution=SPEC_V2))
    full.replay(d)

    t = evolved.snapshot_table()
    assert "lang" not in t.column_names and "language" in t.column_names
    assert t.column_names == full.snapshot_table().column_names
    assert t.equals(full.snapshot_table())
    # digest recomputes for stale-evolution partitions -> matches full v2 replay
    assert evolved.snapshot_sha256() == full.snapshot_sha256()
    # dataset fast path evolved too
    ds_cols = evolved.snapshot_dataset().schema().names
    assert "language" in ds_cols and "lang" not in ds_cols


def test_compact_refreshes_stale_evolution_partitions(tmp_path):
    """compact() rewrites partitions whose on-disk schema predates the
    current spec, so snapshot digests stop re-folding them on every call."""
    import pandas as pd

    from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards

    rows = [(i, "I", f"r{i % 5}", f"f{i}.py", f"c{i}", "py", f"v{i}") for i in range(1, 31)]
    df = pd.DataFrame(rows, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"])
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=2)
    lake = str(tmp_path / "lake")
    CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4, evolution=None)).replay(d)
    ev = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4, evolution=SPEC_V2))
    from arches_rascoll_etl_ray.stages.merge import spec_version

    stale = [
        p for p, i in ev.checkpoint().partitions.items()
        if i.get("evolution_version", 1) != spec_version(ev.cfg)
    ]
    assert stale  # all partitions written under v1
    before = ev.snapshot_table()
    n = ev.compact()
    assert n == len(stale)
    after = ev.checkpoint()
    assert all(i.get("evolution_version", 1) == 2 for i in after.partitions.values())
    assert ev.snapshot_table().equals(before)

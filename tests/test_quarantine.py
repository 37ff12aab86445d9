"""Dead-letter routing: malformed events (unknown op, null key, null lsn)
must be quarantined — never folded as data — and the replay must converge
to the fold of the VALID rows only, in BOTH shuffle plans."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine

BASE_COLS = ["repo", "path", "commit", "lang", "content"]


@pytest.fixture(scope="module")
def mixed_changelog(tmp_path_factory):
    """300 valid events over 40 keys + 9 malformed rows interleaved."""
    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame(
        {
            "lsn": np.arange(1, n + 1, dtype=np.int64),
            "op": np.where(rng.random(n) < 0.1, "D", "U").astype(object),
            "repo": [f"repo{int(k)}" for k in rng.integers(0, 8, n)],
            "path": [f"f{int(k)}.py" for k in rng.integers(0, 5, n)],
            "commit": [f"c{i}" for i in range(n)],
            "lang": ["py"] * n,
            "content": [f"body-{i}" for i in range(n)],
        }
    )
    bad = pd.DataFrame(
        {
            "lsn": np.array([301, 302, 303, 304, 305, 306, 307, 308, 309], dtype=np.int64),
            "op": ["X", "upsert", None, "U", "U", "D", "", "Z", "U"],
            "repo": ["r", "r", "r", None, "r", None, "r", "r", "r"],
            "path": ["p", "p", "p", "p", None, "p", "p", "p", None],
            "commit": ["b"] * 9,
            "lang": ["py"] * 9,
            "content": ["junk"] * 9,
        }
    )
    full = pd.concat([df, bad]).reset_index(drop=True)
    out = str(tmp_path_factory.mktemp("clog_mixed"))
    write_changelog_shards(full, out, num_shards=4)
    return out, df


@pytest.mark.parametrize("shuffle", ["spill", "sort"])
def test_quarantine_routes_malformed(mixed_changelog, tmp_path, shuffle):
    clog, valid = mixed_changelog
    eng = CDCEngine(
        EngineConfig(
            lake_dir=str(tmp_path / f"lake_{shuffle}"),
            num_partitions=4,
            shuffle=shuffle,
            quarantine_invalid=True,
        )
    )
    eng.replay(clog, events_per_epoch=120)

    # snapshot == LWW fold of the VALID rows only
    last = valid.sort_values("lsn").drop_duplicates(["repo", "path"], keep="last")
    expect = (
        last[last["op"] != "D"]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)[BASE_COLS]
    )
    got = eng.snapshot_table().select(BASE_COLS).to_pandas()
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)

    q = eng.quarantine_dataset().to_pandas().sort_values("lsn").reset_index(drop=True)
    assert len(q) == 9
    assert set(q["lsn"]) == set(range(301, 310))


def test_quarantine_off_by_default(mixed_changelog, tmp_path):
    """Without the flag nothing is quarantined (trusted-producer fast
    path); the engine still completes the replay."""
    clog, _ = mixed_changelog
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake_off"), num_partitions=4))
    eng.replay(clog, events_per_epoch=200)
    assert eng.quarantine_dataset().count() == 0


def test_quarantine_files_idempotent(mixed_changelog, tmp_path):
    """Re-replaying the same epochs (fresh engine object, same lake) must
    not duplicate quarantine rows: content-hash names make rewrites
    idempotent and committed epochs are not re-read."""
    import os

    clog, _ = mixed_changelog
    lake = str(tmp_path / "lake_idem")
    eng = CDCEngine(
        EngineConfig(lake_dir=lake, num_partitions=4, quarantine_invalid=True)
    )
    eng.replay(clog, events_per_epoch=120)
    n_files = len(os.listdir(os.path.join(lake, "_quarantine")))
    n_rows = eng.quarantine_dataset().count()
    # reopen + replay again: no new LSNs -> no-op, quarantine unchanged
    eng2 = CDCEngine(
        EngineConfig(lake_dir=lake, num_partitions=4, quarantine_invalid=True)
    )
    eng2.replay(clog, events_per_epoch=120)
    assert len(os.listdir(os.path.join(lake, "_quarantine"))) == n_files
    assert eng2.quarantine_dataset().count() == n_rows

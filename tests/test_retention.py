"""Retention (expire) conformance: expire(min_lsn) must drop exactly the
live rows with lsn < min_lsn, skip provably-fresh partitions via footer
statistics without advancing the epoch, surface expirations as op-'D'
changefeed deltas, and be a no-op when re-run at the same horizon."""

import pyarrow.compute as pc
import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clog_ttl"))
    return ensure_changelog(root, num_files=300, num_events=3000, seed=47, num_shards=8)


@pytest.mark.parametrize("mode", ["rewrite", "lsm"])
def test_expire_drops_exactly_stale_rows(changelog, tmp_path, mode):
    kw = {"merge_mode": "lsm", "lsm_compact_threshold": 10} if mode == "lsm" else {}
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / f"lake_{mode}"), num_partitions=8, **kw))
    eng.replay(changelog, events_per_epoch=1000)
    before = eng.snapshot_table()
    H = 1500
    want = before.filter(pc.greater_equal(before["lsn"], H))
    stale = before.num_rows - want.num_rows
    assert stale > 0  # the fixture actually exercises a drop
    epoch0 = eng.checkpoint().epoch

    dropped = eng.expire(H)
    assert dropped == stale
    after = eng.snapshot_table()
    assert after.to_pydict() == want.to_pydict()
    assert eng.checkpoint().epoch == epoch0 + 1

    # changefeed across the expire epoch: pure deletes of the expired keys
    feed = eng.changefeed(epoch0, epoch0 + 1).take_all()
    assert len(feed) == stale
    assert all(r["op"] == "D" for r in feed)

    # re-running at the same horizon is a no-op (footer-stat skip)
    assert eng.expire(H) == 0
    assert eng.checkpoint().epoch == epoch0 + 1


def test_expire_fresh_lake_is_footer_stat_noop(changelog, tmp_path):
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.replay(changelog, events_per_epoch=3000)
    epoch0 = eng.checkpoint().epoch
    assert eng.expire(1) == 0  # nothing can be older than lsn 1
    assert eng.checkpoint().epoch == epoch0


def test_expire_resolves_pending_patches_first(tmp_path):
    """Expire folds base+runs (resolving 'P' partial images) BEFORE the
    horizon filter, so a key patched after the horizon survives with its
    patched columns even when the patch still sits in an unmerged LSM run."""
    import pandas as pd

    from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards

    events = [
        (1, "I", "r", "old", "c1", "python", "stale"),   # last write < H → drop
        (2, "I", "r", "hot", "c2", "go", "base"),
        (3, "P", "r", "hot", None, None, "patched"),     # lsn 3 >= H → row survives
    ]
    df = pd.DataFrame(
        events, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path / "log")
    write_changelog_shards(df, d, num_shards=1)
    eng = CDCEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            num_partitions=2,
            merge_mode="lsm",
            lsm_compact_threshold=99,  # runs stay pending — expire does the fold
        )
    )
    eng.replay(d, events_per_epoch=1)
    dropped = eng.expire(3)
    assert dropped == 1
    rows = eng.snapshot_table().to_pylist()
    assert len(rows) == 1
    assert (rows[0]["path"], rows[0]["commit"], rows[0]["content"]) == ("hot", "c2", "patched")

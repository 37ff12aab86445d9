"""Crash-resume edge cases around manifest idempotency (review findings):

1. A crashed epoch attempt leaves per-partition manifests but no committed
   checkpoint. A resume reuses the epoch NUMBER over a (possibly wider) LSN
   range — the manifests must only short-circuit when their (start_lsn,
   end_lsn) matches the current attempt, else events are silently lost.
2. A crashed attempt with a WIDER range leaves delta pieces beyond the
   resume's end_lsn — those events must not be folded into the narrower
   epoch (applied_lsn would exceed the committed end_lsn).
3. export_snapshot .done markers record the partition's epoch; a re-export
   into the same directory after new epochs commit must refresh stale files.
"""

import glob
import os

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import ensure_changelog
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine
from tests.test_cdc_replay import assert_matches_fold


def _changelog(tmp_path):
    return ensure_changelog(str(tmp_path / "clog"), num_files=300, num_events=4000, seed=11, num_shards=8)


def _drop_checkpoint(lake_dir: str, epoch: int) -> None:
    p = os.path.join(lake_dir, "_checkpoints", f"epoch_{epoch:09d}.json")
    os.remove(p)


def test_crash_resume_wider_range_remerges(tmp_path):
    """Crashed epoch-2 attempt covered (2000, 3000]; resume re-slices epoch 2
    as (2000, 4000]. Without the range check the narrower manifests no-op the
    merge and events 3001..4000 vanish."""
    clog = _changelog(tmp_path)
    lake = str(tmp_path / "lake")
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    eng.apply_epoch(clog, end_lsn=2000)

    # "crashed" attempt: full epoch-2 merge over the narrow range, then the
    # checkpoint commit is lost (crash between partition merges and commit)
    eng.apply_epoch(clog, end_lsn=3000)
    from arches_rascoll_etl_ray.state.manifest import read_manifest as _rm

    crashed_total = sum(_rm(lake, p, 2).events_applied for p in range(4))
    _drop_checkpoint(lake, 2)
    assert eng.checkpoint().epoch == 1

    # resume: epoch 2 again, now over everything available (default end_lsn)
    ckpt = eng.apply_epoch(clog)
    assert ckpt.epoch == 2 and ckpt.end_lsn == 4000
    for info in ckpt.partitions.values():
        assert info["applied_lsn"] <= 4000
    assert_matches_fold(eng, clog)

    # metrics exactness: the resume read BOTH the crashed attempt's
    # (2000,3000] pieces and its own (2000,4000] pieces. events_applied
    # counts DISTINCT lsns reaching the fold (the spill pre-folds map-side,
    # so it is a winners metric, bounded by the raw event count) — the
    # overlap between the two piece sets must not double-count.
    from arches_rascoll_etl_ray.state.manifest import read_manifest

    def _epoch2_total(lake_dir):
        return sum(
            m.events_applied
            for m in (read_manifest(lake_dir, p, 2) for p in range(4))
            if m is not None
        )

    resumed_total = _epoch2_total(lake)
    # crash-free twin: same changelog, same epoch bounds, fresh lake
    clean_lake = str(tmp_path / "lake_clean")
    clean = CDCEngine(EngineConfig(lake_dir=clean_lake, num_partitions=4))
    clean.apply_epoch(clog, end_lsn=2000)
    clean.apply_epoch(clog)
    clean_total = _epoch2_total(clean_lake)
    # the crashed (2000,3000] winners overlap the resume's (2000,4000]
    # winners heavily; raw-row counting would approach crashed+clean
    assert resumed_total <= 2000
    assert clean_total <= resumed_total < crashed_total + clean_total, (
        f"events_applied double-counted: resumed={resumed_total} "
        f"clean={clean_total} crashed={crashed_total}"
    )


def test_leftover_wider_pieces_clipped(tmp_path):
    """Delta pieces from a crashed attempt with a WIDER range must not leak
    LSNs beyond the resume epoch's end_lsn into the fold."""
    clog = _changelog(tmp_path)
    lake = str(tmp_path / "lake")
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    eng.apply_epoch(clog, end_lsn=2000)

    # crashed attempt spilled epoch 2 over (2000, 4000] but never merged
    eng._spill_epoch(clog, 2, 2000, 4000)
    # resume slices epoch 2 narrower: (2000, 3000]
    ckpt = eng.apply_epoch(clog, end_lsn=3000)
    assert ckpt.epoch == 2 and ckpt.end_lsn == 3000
    for info in ckpt.partitions.values():
        assert info["applied_lsn"] <= 3000, "crashed-attempt pieces leaked past end_lsn"

    # the tail still arrives via epoch 3; lake converges to the full fold
    eng.apply_epoch(clog)
    assert_matches_fold(eng, clog)


def test_export_reexport_refreshes_stale_partitions(tmp_path):
    """Re-exporting into the same directory after new epochs must rewrite
    partitions whose committed epoch advanced (stale .done markers)."""
    clog = _changelog(tmp_path)
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "export")
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    eng.apply_epoch(clog, end_lsn=2000)
    n1 = eng.export_snapshot(out)
    assert n1 == eng.snapshot_table().num_rows

    eng.apply_epoch(clog)  # epoch 2: more upserts/deletes
    n2 = eng.export_snapshot(out)
    assert n2 == eng.snapshot_table().num_rows

    import duckdb

    con = duckdb.connect()
    try:
        exported = con.execute(
            f"SELECT count(*) FROM read_parquet('{glob.escape(out)}/part-*.parquet')"
        ).fetchone()[0]
    finally:
        con.close()
    assert exported == n2, "stale per-partition export files survived re-export"


def test_concurrent_reader_sees_committed_snapshots_only(tmp_path):
    """Snapshot isolation: while a writer replays epochs, a reader using its
    own engine handle must always see a CONSISTENT committed snapshot —
    every read resolves through a committed checkpoint, and pre-vacuum data
    files for that epoch stay on disk, so a pinned re-read of the same
    epoch returns the identical digest."""
    import threading

    clog = _changelog(tmp_path)
    lake = str(tmp_path / "lake")
    writer = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    writer.apply_epoch(clog, max_events=500)  # lake exists before reads start

    done = threading.Event()
    errors: list[str] = []

    def write_rest():
        try:
            writer.replay(clog, events_per_epoch=500)
        finally:
            done.set()

    t = threading.Thread(target=write_rest)
    t.start()
    reader = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    observed: list[tuple[int, str]] = []
    try:
        while not done.is_set() or len(observed) < 3:
            ck = reader.checkpoint()
            sha = reader.snapshot_sha256(epoch=ck.epoch)
            again = reader.snapshot_sha256(epoch=ck.epoch)
            if sha != again:
                errors.append(f"epoch {ck.epoch}: non-deterministic pinned read")
            observed.append((ck.epoch, sha))
            if done.is_set() and len(observed) >= 3:
                break
    finally:
        t.join()
    assert not errors, errors
    # epochs observed ascend (no torn/rolled-back state ever visible)
    epochs = [e for e, _ in observed]
    assert epochs == sorted(epochs)
    # one sha per epoch — a committed epoch's digest never changes
    by_epoch = {}
    for e, s in observed:
        assert by_epoch.setdefault(e, s) == s, f"epoch {e} digest changed mid-run"
    final = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    assert final.checkpoint().end_lsn == 4000
    assert_matches_fold(final, clog)

"""Driver-checkable queries that exercise the REAL CDC engine.

`cdc_events_upsert` routes the driver's `events` table through the full
engine (changelog → normalize → partition → LWW merge → manifested lake →
snapshot) and is oracle-checked by DuckDB window SQL — so the engine's core
fold itself sits behind the correctness gate, not just a reimplementation.

`cdc_replay_synthetic` replays the deterministic synthetic changelog
(FIXTURES.md F1/F2) and returns the final lake table (rows-only check:
non-SQL-expressible because the log is generated, not a registered view).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import (
    changelog_from_events_table,
    ensure_changelog,
    write_changelog_shards,
)
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}

_CACHE_ROOT = os.path.join(tempfile.gettempdir(), "arches_rascoll_etl_ray_cache")


def _fresh_lake(tag: str) -> str:
    d = os.path.join(_CACHE_ROOT, "lakes", tag)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def _events_changelog(sf_dir: str, tag: str) -> str:
    """Cached changelog shards derived from the driver's events table."""
    clog_dir = os.path.join(_CACHE_ROOT, f"events_clog_{tag}")
    marker = os.path.join(clog_dir, "_GENERATED")
    if not os.path.exists(marker):
        shutil.rmtree(clog_dir, ignore_errors=True)
        df = changelog_from_events_table(sf_dir)
        write_changelog_shards(df, clog_dir, num_shards=8)
        with open(marker, "w") as f:
            f.write(sf_dir + "\n")
    return clog_dir


def cdc_events_upsert(sf_dir: str):
    """Events table → change stream keyed by user (LSN = (ts, event_id)
    order) → engine replay in 4 epochs → final per-user state."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"events_{tag}"), num_partitions=8))
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    per_epoch = max(1, max_available_lsn(clog_dir) // 4)
    eng.replay(clog_dir, events_per_epoch=per_epoch)
    snap = eng.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_events_upsert"] = cdc_events_upsert
ORACLE_SQL["cdc_events_upsert"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    )
    SELECT 'user' || CAST(user_id AS VARCHAR) AS user_key,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           printf('%.6f', value) AS last_value_str
    FROM last WHERE rn = 1 AND event_type <> 'delete'
"""


def cdc_events_upsert_lsm(sf_dir: str):
    """Same fold as cdc_events_upsert but through the LSM merge mode:
    sorted-run appends per epoch, threshold-triggered compaction mid-replay,
    explicit full compaction at the end. Shares the upsert oracle — LSM and
    rewrite modes must produce the identical final state."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    eng = CDCEngine(
        EngineConfig(
            lake_dir=_fresh_lake(f"events_lsm_{tag}"),
            num_partitions=8,
            merge_mode="lsm",
            lsm_compact_threshold=3,
        )
    )
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    per_epoch = max(1, max_available_lsn(clog_dir) // 6)  # 6 epochs → compactions fire
    eng.replay(clog_dir, events_per_epoch=per_epoch)
    eng.compact()
    snap = eng.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_events_upsert_lsm"] = cdc_events_upsert_lsm
ORACLE_SQL["cdc_events_upsert_lsm"] = ORACLE_SQL["cdc_events_upsert"]


def cdc_events_evolution(sf_dir: str):
    """Mid-stream schema evolution over the DRIVER's events table, oracle-
    checked: first half of the stream committed under spec v1, the engine
    reopened with spec v2 (rename lang→language, add size_bytes, computed
    content_len) for the rest. The final snapshot must equal a full-v2 fold
    — DuckDB expresses that directly."""
    from arches_rascoll_etl_ray.config import AddColumn, ComputedColumn, EvolutionSpec

    spec_v2 = EvolutionSpec(
        version=2,
        renames={"lang": "language"},
        adds=(AddColumn(name="size_bytes", type="int64", default=None),),
        computed=(ComputedColumn(name="content_len", source="content", fn="len"),),
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    avail = max_available_lsn(clog_dir)
    lake = _fresh_lake(f"events_evo_{tag}")
    e1 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8, evolution=None))
    e1.apply_epoch(clog_dir, max_events=max(1, avail // 2))
    e2 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8, evolution=spec_v2))
    e2.replay(clog_dir, events_per_epoch=max(1, avail // 4))
    snap = e2.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["language"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
            "content_len": pc.cast(snap["content_len"], pa.int64()),
        }
    )


QUERIES["cdc_events_evolution"] = cdc_events_evolution
ORACLE_SQL["cdc_events_evolution"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    )
    SELECT 'user' || CAST(user_id AS VARCHAR) AS user_key,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           printf('%.6f', value) AS last_value_str,
           CAST(length(printf('%.6f', value)) AS BIGINT) AS content_len
    FROM last WHERE rn = 1 AND event_type <> 'delete'
"""


def cdc_multi_table(sf_dir: str):
    """Multi-table job (reference's 9-config staging loop,
    ref_collection.py:201-248) through the driver's events table: ONE
    shared-read epoch loop feeds two lakes — all events, and a
    purchases-only table via row_filter. Output = union of both final
    states tagged by table, oracle-checked."""
    from arches_rascoll_etl_ray.pipelines.multi import MultiTableJob
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    root = _fresh_lake(f"events_multi_{tag}")
    job = MultiTableJob.for_root(
        root,
        {
            "all_events": dict(num_partitions=8),
            "purchases": dict(num_partitions=8, row_filter=("lang", "purchase")),
        },
    )
    avail = max_available_lsn(clog_dir)
    job.replay(clog_dir, events_per_epoch=max(1, avail // 4))

    parts = []
    for name in ("all_events", "purchases"):
        snap = job.engines[name].snapshot_table()
        parts.append(
            pa.table(
                {
                    "table_name": pa.array([name] * snap.num_rows),
                    "user_key": snap["repo"],
                    "last_event_id": pc.cast(snap["commit"], pa.int64()),
                    "last_event_type": snap["lang"],
                    "last_value_str": pc.cast(snap["content"], pa.string()),
                }
            )
        )
    return pa.concat_tables(parts)


QUERIES["cdc_multi_table"] = cdc_multi_table
ORACLE_SQL["cdc_multi_table"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), all_last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    ), purch_last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered WHERE event_type = 'purchase' OR event_type = 'delete'
    )
    SELECT 'all_events' AS table_name,
           'user' || CAST(user_id AS VARCHAR) AS user_key,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           printf('%.6f', value) AS last_value_str
    FROM all_last WHERE rn = 1 AND event_type <> 'delete'
    UNION ALL
    SELECT 'purchases', 'user' || CAST(user_id AS VARCHAR),
           CAST(event_id AS BIGINT), event_type, printf('%.6f', value)
    FROM purch_last WHERE rn = 1 AND event_type <> 'delete'
"""


def cdc_changefeed(sf_dir: str):
    """Changefeed between two committed epochs through the REAL engine:
    first half of the events change stream committed as epoch 1, the rest
    as epoch 2, then `changefeed(1, 2)` emits one row per user whose live
    state changed (op I/U/D with before/after images). Oracle: FULL OUTER
    JOIN of the two LWW horizons in DuckDB."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    avail = max_available_lsn(clog_dir)
    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"events_feed_{tag}"), num_partitions=8))
    eng.apply_epoch(clog_dir, max_events=max(1, avail // 2))  # epoch 1
    eng.apply_epoch(clog_dir)  # epoch 2 = everything else
    feed = eng.changefeed(1, 2)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_key": t["repo"],
                "op": t["op"],
                "old_event_id": pc.cast(t["old_commit"], pa.int64()),
                "new_event_id": pc.cast(t["new_commit"], pa.int64()),
                "new_event_type": t["new_lang"],
                "new_value_str": pc.cast(t["new_content"], pa.string()),
            }
        )

    return feed.map_batches(project, batch_format="pyarrow")


QUERIES["cdc_changefeed"] = cdc_changefeed
ORACLE_SQL["cdc_changefeed"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), old_state AS (
      SELECT * FROM (
        SELECT user_id, event_id, event_type, value, lsn,
               row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
        FROM ordered WHERE lsn <= (SELECT count(*) // 2 FROM events)
      ) WHERE rn = 1 AND event_type <> 'delete'
    ), new_state AS (
      SELECT * FROM (
        SELECT user_id, event_id, event_type, value, lsn,
               row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
        FROM ordered
      ) WHERE rn = 1 AND event_type <> 'delete'
    )
    SELECT 'user' || CAST(coalesce(o.user_id, n.user_id) AS VARCHAR) AS user_key,
           CASE WHEN o.user_id IS NULL THEN 'I'
                WHEN n.user_id IS NULL THEN 'D'
                ELSE 'U' END AS op,
           CAST(o.event_id AS BIGINT) AS old_event_id,
           CAST(n.event_id AS BIGINT) AS new_event_id,
           n.event_type AS new_event_type,
           CASE WHEN n.user_id IS NULL THEN NULL
                ELSE printf('%.6f', n.value) END AS new_value_str
    FROM old_state o FULL OUTER JOIN new_state n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL OR o.lsn <> n.lsn
"""


def cdc_incremental_mv(sf_dir: str):
    """Incrementally-maintained GROUP BY view: replay the events change
    stream in 4 epochs; after EACH epoch fold only that epoch's changefeed
    into the view (pipelines/incremental.py) — the view is never recomputed
    from the table. Output = live-user count and exact int64 sum of the
    last event id per last event type; the oracle aggregates the final LWW
    state from scratch, so any drift in the delta fold is a hash mismatch."""
    from arches_rascoll_etl_ray.pipelines.incremental import IncrementalGroupAgg
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    avail = max_available_lsn(clog_dir)
    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"events_mv_{tag}"), num_partitions=8))
    view = IncrementalGroupAgg(group_col="lang", measure_col="commit")
    per = max(1, avail // 4)
    prev = 0
    while True:
        ckpt = eng.apply_epoch(clog_dir, max_events=per)
        if ckpt.epoch == prev:
            break
        view.apply(eng.changefeed(prev, ckpt.epoch))
        prev = ckpt.epoch
    t = view.to_table()
    return pa.table(
        {
            "group_key": t["group_key"],
            "n_users": t["n_keys"],
            "sum_event_id": t["sum_measure"],
        }
    )


def cdc_distinct_mv(sf_dir: str):
    """Deletion-safe incrementally-maintained DISTINCT-count view: replay
    the events change stream in 4 epochs; after each epoch fold only that
    epoch's changefeed into an IncrementalDistinctAgg (refcount per
    (group, value) pair — a sketch can't retract, refcounts can). The
    counted value is a derived bucket (event_id mod 97, the stand-in for a
    real deployment's domain/bucket extractor) so pairs genuinely collide
    and refcounts matter; updates move refs across BOTH groups and values.
    The oracle recomputes count(DISTINCT ...) from the final LWW state from
    scratch — any retraction drift is a hash mismatch."""
    from arches_rascoll_etl_ray.pipelines.incremental import IncrementalDistinctAgg
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    avail = max_available_lsn(clog_dir)
    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"events_dmv_{tag}"), num_partitions=8))

    def bucket(s):
        import pandas as pd

        return pd.to_numeric(s, errors="coerce").astype("Int64") % 97

    view = IncrementalDistinctAgg(group_col="lang", value_col="commit", value_map=bucket)
    per = max(1, avail // 4)
    prev = 0
    while True:
        ckpt = eng.apply_epoch(clog_dir, max_events=per)
        if ckpt.epoch == prev:
            break
        view.apply(eng.changefeed(prev, ckpt.epoch))
        prev = ckpt.epoch
    return view.to_table()


QUERIES["cdc_distinct_mv"] = cdc_distinct_mv
ORACLE_SQL["cdc_distinct_mv"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    )
    SELECT event_type AS group_key,
           CAST(count(DISTINCT event_id % 97) AS BIGINT) AS n_distinct
    FROM last WHERE rn = 1 AND event_type <> 'delete'
    GROUP BY event_type
"""


QUERIES["cdc_incremental_mv"] = cdc_incremental_mv
ORACLE_SQL["cdc_incremental_mv"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    )
    SELECT event_type AS group_key,
           count(*) AS n_users,
           CAST(sum(CAST(event_id AS BIGINT)) AS BIGINT) AS sum_event_id
    FROM last WHERE rn = 1 AND event_type <> 'delete'
    GROUP BY event_type
"""


def cdc_replicate(sf_dir: str):
    """Changefeed-driven replication: replay the events change stream into
    a PRIMARY lake in 3 epochs; after each epoch, render that epoch's
    changefeed as change events (pipelines.incremental.write_feed_as_changelog)
    and replay them into a REPLICA lake through the normal upsert engine.
    The replica's final state must equal the primary's — the oracle is the
    same LWW SQL that checks the primary (cdc_events_upsert), and
    tests/test_changefeed.py pins full content-sha equality of the two
    lakes."""
    from arches_rascoll_etl_ray.pipelines.incremental import write_feed_as_changelog
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    avail = max_available_lsn(clog_dir)
    primary = CDCEngine(
        EngineConfig(lake_dir=_fresh_lake(f"events_repl_p_{tag}"), num_partitions=8)
    )
    replica = CDCEngine(
        EngineConfig(lake_dir=_fresh_lake(f"events_repl_r_{tag}"), num_partitions=8)
    )
    feed_dir = _fresh_lake(f"events_repl_wal_{tag}")
    per = max(1, avail // 3)
    prev = 0
    while True:
        ckpt = primary.apply_epoch(clog_dir, max_events=per)
        if ckpt.epoch == prev:
            break
        write_feed_as_changelog(primary.changefeed(prev, ckpt.epoch), feed_dir, lsn=ckpt.epoch)
        replica.apply_epoch(feed_dir)
        prev = ckpt.epoch

    snap = replica.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_replicate"] = cdc_replicate
ORACLE_SQL["cdc_replicate"] = ORACLE_SQL["cdc_events_upsert"]


def cdc_time_travel(sf_dir: str):
    """AS-OF read through the real engine: replay the events change stream
    in 4 epochs, then `snapshot_dataset(epoch=2)` — the committed state at
    the epoch-2 LSN horizon, read from retained checkpoints without any
    replay. Oracle: the LWW fold of the events table truncated at the same
    horizon (2 · ⌊n/4⌋ events)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    avail = max_available_lsn(clog_dir)
    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"events_tt_{tag}"), num_partitions=8))
    eng.replay(clog_dir, events_per_epoch=max(1, avail // 4))

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_key": t["repo"],
                "last_event_id": pc.cast(t["commit"], pa.int64()),
                "last_event_type": t["lang"],
                "last_value_str": pc.cast(t["content"], pa.string()),
            }
        )

    return eng.snapshot_dataset(epoch=2).map_batches(project, batch_format="pyarrow")


QUERIES["cdc_time_travel"] = cdc_time_travel
ORACLE_SQL["cdc_time_travel"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
      WHERE lsn <= least((SELECT count(*) FROM events),
                         2 * greatest(1, (SELECT count(*) // 4 FROM events)))
    )
    SELECT 'user' || CAST(user_id AS VARCHAR) AS user_key,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           printf('%.6f', value) AS last_value_str
    FROM last WHERE rn = 1 AND event_type <> 'delete'
"""


def cdc_replay_synthetic(sf_dir: str):
    """Full F2 synthetic replay (scaled by sf via event count). Rows-only
    driver check; the sha-exactness gate for this path lives in
    tests/test_cdc_replay.py against the DuckDB fold of the same log."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    scale = {"sf0.001": (300, 3000), "sf0.01": (2000, 30000), "sf0.1": (20000, 300000)}.get(
        tag, (300, 3000)
    )
    clog = ensure_changelog(_CACHE_ROOT, num_files=scale[0], num_events=scale[1], seed=42)
    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"synth_{tag}"), num_partitions=16))
    eng.replay(clog, events_per_epoch=max(1, scale[1] // 4))
    return eng.snapshot_table()


QUERIES["cdc_replay_synthetic"] = cdc_replay_synthetic


def cdc_evolution_replay(sf_dir: str):
    """Mid-stream schema evolution through the real engine: first half of
    the synthetic log under spec v1, second half (and the old snapshots,
    cast at merge time) under spec v2 (rename lang→language, add
    size_bytes, computed content_len). Rows-only driver check; the
    equivalence-to-full-v2-replay gate lives in tests/test_evolution.py."""
    from arches_rascoll_etl_ray.config import AddColumn, ComputedColumn, EvolutionSpec

    spec_v2 = EvolutionSpec(
        version=2,
        renames={"lang": "language"},
        adds=(AddColumn(name="size_bytes", type="int64", default=None),),
        computed=(ComputedColumn(name="content_len", source="content", fn="len"),),
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    scale = {"sf0.001": (300, 3000), "sf0.01": (2000, 30000), "sf0.1": (20000, 300000)}.get(
        tag, (300, 3000)
    )
    clog = ensure_changelog(_CACHE_ROOT, num_files=scale[0], num_events=scale[1], seed=42)
    lake = _fresh_lake(f"evo_{tag}")
    e1 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8, evolution=None))
    e1.apply_epoch(clog, max_events=scale[1] // 2)
    e2 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8, evolution=spec_v2))
    e2.replay(clog, events_per_epoch=scale[1] // 4)
    return e2.snapshot_table()


QUERIES["cdc_evolution_replay"] = cdc_evolution_replay


def cdc_secondary_index(sf_dir: str):
    """Secondary-index lookup through the real engine: replay the events
    change stream into the lake in 3 epochs, keep a changefeed-maintained
    inverted index on the `lang` column (event_type) in sync after EVERY
    epoch — so the query exercises incremental maintenance, not a one-shot
    build — then answer "all live users whose last event was a click" by
    reading ONE index partition for the key list and folding only the base
    partitions those keys live in (pipelines/index.SecondaryIndex).

    Oracle: the LWW window SQL restricted to event_type='click' — the
    index must return exactly the rows a full-scan filter would."""
    from arches_rascoll_etl_ray.pipelines.index import SecondaryIndex
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    lake = _fresh_lake(f"events_sidx_{tag}")
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8))
    # a SIBLING of the lake dir — index.py's layout contract forbids
    # nesting the index inside the base lake
    idx = SecondaryIndex(
        _fresh_lake(f"events_sidx_idx_{tag}"), column="lang", num_partitions=4
    )
    per = max(1, max_available_lsn(clog_dir) // 3)
    while True:
        before = eng.checkpoint().epoch
        if eng.apply_epoch(clog_dir, max_events=per).epoch == before:
            break
        idx.sync(eng)
    rows = idx.lookup_rows(eng, "click")
    return pa.table(
        {
            "user_key": rows["repo"],
            "last_event_id": pc.cast(rows["commit"], pa.int64()),
            "last_event_type": rows["lang"],
            "last_value_str": pc.cast(rows["content"], pa.string()),
        }
    )


def cdc_index_evolution(sf_dir: str):
    """Changefeed-maintained secondary index surviving a schema-evolution
    boundary: the first epoch commits under spec v1 with the index synced
    on `lang`; the engine then reopens under spec v2 (rename
    lang→language, add size_bytes, computed content_len) and the SAME
    index keeps syncing per epoch — the sync window spans the rename, so
    the index must follow the column identity through the evolved
    changefeed (new_language/old_language), and the final lookup filters
    the base rows under the NEW name. Oracle: full-v2 LWW fold restricted
    to event_type='click'. Incremental≡rebuild postings equality across
    the boundary is pinned in tests/test_secondary_index.py."""
    from arches_rascoll_etl_ray.config import AddColumn, ComputedColumn, EvolutionSpec
    from arches_rascoll_etl_ray.pipelines.index import SecondaryIndex
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    spec_v2 = EvolutionSpec(
        version=2,
        renames={"lang": "language"},
        adds=(AddColumn(name="size_bytes", type="int64", default=None),),
        computed=(ComputedColumn(name="content_len", source="content", fn="len"),),
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    lake = _fresh_lake(f"events_idxevo_{tag}")
    idx = SecondaryIndex(
        _fresh_lake(f"events_idxevo_idx_{tag}"), column="lang", num_partitions=4
    )
    avail = max_available_lsn(clog_dir)
    e1 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8, evolution=None))
    e1.apply_epoch(clog_dir, max_events=max(1, avail // 2))
    idx.sync(e1)
    e2 = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=8, evolution=spec_v2))
    while True:
        before = e2.checkpoint().epoch
        if e2.apply_epoch(clog_dir, max_events=max(1, avail // 4)).epoch == before:
            break
        idx.sync(e2)
    rows = idx.lookup_rows(e2, "click")
    return pa.table(
        {
            "user_key": rows["repo"],
            "last_event_id": pc.cast(rows["commit"], pa.int64()),
            "last_event_type": rows["language"],
            "last_value_str": pc.cast(rows["content"], pa.string()),
            "content_len": pc.cast(rows["content_len"], pa.int64()),
        }
    )


QUERIES["cdc_index_evolution"] = cdc_index_evolution
ORACLE_SQL["cdc_index_evolution"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    )
    SELECT 'user' || CAST(user_id AS VARCHAR) AS user_key,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           printf('%.6f', value) AS last_value_str,
           CAST(length(printf('%.6f', value)) AS BIGINT) AS content_len
    FROM last WHERE rn = 1 AND event_type = 'click'
"""


def cdc_dedup_incremental(sf_dir: str):
    """Incremental near-dup maintenance from the changefeed (CDC ×
    training-data composition, pipelines/dedup_index.py): the documents
    table replays as a two-phase change stream — inserts, then updates
    that copy a neighbor's text (manufacturing dup pairs that only exist
    AFTER the update) and deletes — in 4 epochs, with the MinHash-LSH
    index synced after every epoch. No sync ever rescans the corpus: each
    window sketches only its own deltas, removes the changed docs'
    buckets/edges, and verifies new candidates against texts read from
    the lake AS OF the sync horizon. Output = final verified pair set,
    which must equal the batch exact-Jaccard(≥0.5, word 3-gram) pairs
    over the final live corpus — the DuckDB twin below computes exactly
    that (LSH recall is 1.0 at this threshold on this corpus: every
    qualifying pair is ≥0.9, same argument as training.q_dedup_clusters)."""
    from arches_rascoll_etl_ray.datagen.changelog_gen import (
        near_dup_changelog_from_documents,
        write_changelog_shards,
    )
    from arches_rascoll_etl_ray.pipelines.dedup_index import KEY_SEP, IncrementalNearDup
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = os.path.join(_CACHE_ROOT, f"docs_neardup_clog_{tag}")
    marker = os.path.join(clog_dir, "_GENERATED")
    if not os.path.exists(marker):
        shutil.rmtree(clog_dir, ignore_errors=True)
        write_changelog_shards(near_dup_changelog_from_documents(sf_dir), clog_dir, num_shards=8)
        with open(marker, "w") as f:
            f.write(sf_dir + "\n")

    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"docs_neardup_{tag}"), num_partitions=8))
    idx = IncrementalNearDup(_fresh_lake(f"docs_neardup_idx_{tag}"), num_partitions=8)
    per = max(1, max_available_lsn(clog_dir) // 4)
    while True:
        before = eng.checkpoint().epoch
        if eng.apply_epoch(clog_dir, max_events=per).epoch == before:
            break
        idx.sync(eng)
    edges = idx.edges_table().to_pandas()
    ia = edges["a"].str.split(KEY_SEP, n=1).str[0].str[3:].astype(np.int64)
    ib = edges["b"].str.split(KEY_SEP, n=1).str[0].str[3:].astype(np.int64)
    a = np.minimum(ia.to_numpy(), ib.to_numpy())
    b = np.maximum(ia.to_numpy(), ib.to_numpy())
    order = np.lexsort((b, a))
    return pa.table({"a": pa.array(a[order], pa.int64()), "b": pa.array(b[order], pa.int64())})


def cdc_join_view(sf_dir: str):
    """Incrementally-maintained LEFT-JOIN view across TWO CDC lakes
    (pipelines/join_view.py): an event-keyed lake (one immutable row per
    event, carrying its user as a foreign-key column) joined to the
    user-keyed LWW lake, both replayed in 3 epochs with the view synced
    after every epoch pair via Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB — every term
    partition-targeted from the two changefeeds' images, no side ever
    rescanned. User churn (updates + deletes) exercises the ΔB in-place
    column rewrite and the LEFT-JOIN null-out; the oracle is the plain
    SQL join of the two final states."""
    from arches_rascoll_etl_ray.pipelines.join_view import IncrementalJoinView

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # A: event-keyed changelog (every event an insert; lang = user FK)
    a_dir = os.path.join(_CACHE_ROOT, f"events_byid_clog_{tag}")
    marker = os.path.join(a_dir, "_GENERATED")
    if not os.path.exists(marker):
        import pandas as pd

        shutil.rmtree(a_dir, ignore_errors=True)
        ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
        ev = ev.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        df = pd.DataFrame(
            {
                "lsn": np.arange(1, len(ev) + 1, dtype=np.int64),
                "op": np.full(len(ev), "U", dtype=object),
                "repo": ("ev" + ev["event_id"].astype(str)).to_numpy(dtype=object),
                "path": np.full(len(ev), "e", dtype=object),
                "commit": ev["event_id"].astype(str).to_numpy(dtype=object),
                "lang": ("user" + ev["user_id"].astype(str)).to_numpy(dtype=object),
                "content": ev["value"].map(lambda v: f"{v:.6f}").to_numpy(dtype=object),
            }
        )
        write_changelog_shards(df, a_dir, num_shards=8)
        with open(marker, "w") as f:
            f.write(sf_dir + "\n")
    b_dir = _events_changelog(sf_dir, tag)  # user-keyed LWW stream

    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    a_eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"jv_a_{tag}"), num_partitions=8))
    b_eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"jv_b_{tag}"), num_partitions=8))
    view = IncrementalJoinView(
        _fresh_lake(f"jv_view_{tag}"), join_col="lang", num_partitions=8, right_path="state"
    )
    per_a = max(1, max_available_lsn(a_dir) // 3)
    per_b = max(1, max_available_lsn(b_dir) // 3)
    while True:
        ea0, eb0 = a_eng.checkpoint().epoch, b_eng.checkpoint().epoch
        ea = a_eng.apply_epoch(a_dir, max_events=per_a).epoch
        eb = b_eng.apply_epoch(b_dir, max_events=per_b).epoch
        view.sync(a_eng, b_eng)
        if ea == ea0 and eb == eb0:
            break
    t = view.table().to_pandas()
    return pa.table(
        {
            "event_id": pa.array(t["a_commit"].astype(np.int64), pa.int64()),
            "user_key": pa.array(t["b_key"].to_numpy(dtype=object), pa.string()),
            "event_value": pa.array(t["a_content"].to_numpy(dtype=object), pa.string()),
            "user_last_type": pa.array(t["b_lang"].to_numpy(dtype=object), pa.string()),
            "user_last_value": pa.array(t["b_content"].to_numpy(dtype=object), pa.string()),
        }
    )


QUERIES["cdc_join_view"] = cdc_join_view
ORACLE_SQL["cdc_join_view"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    ), users AS (
      SELECT user_id, event_type, value FROM last
      WHERE rn = 1 AND event_type <> 'delete'
    )
    SELECT CAST(e.event_id AS BIGINT) AS event_id,
           'user' || CAST(e.user_id AS VARCHAR) AS user_key,
           printf('%.6f', e.value) AS event_value,
           u.event_type AS user_last_type,
           printf('%.6f', u.value) AS user_last_value
    FROM events e LEFT JOIN users u ON u.user_id = e.user_id
"""


QUERIES["cdc_dedup_incremental"] = cdc_dedup_incremental
ORACLE_SQL["cdc_dedup_incremental"] = r"""
    WITH final AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 7 = 3 AND p.text IS NOT NULL THEN p.text
                  ELSE d.text END AS text
      FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1
      WHERE NOT (d.doc_id % 11 = 5 AND d.doc_id % 7 <> 3)
    ), toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      FROM final
    ), gsets AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) = 0 THEN []
                    WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_transform(range(1, len(w) - 1),
                                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
               END) AS g
      FROM toks
    ), pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             len(list_intersect(a.g, b.g)) AS inter,
             len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS uni
      FROM gsets a JOIN gsets b ON a.doc_id < b.doc_id
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
    FROM pairs WHERE uni > 0 AND 2 * inter >= uni
"""


QUERIES["cdc_secondary_index"] = cdc_secondary_index
ORACLE_SQL["cdc_secondary_index"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    )
    SELECT 'user' || CAST(user_id AS VARCHAR) AS user_key,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           printf('%.6f', value) AS last_value_str
    FROM last WHERE rn = 1 AND event_type = 'click'
"""


def cdc_events_patch(sf_dir: str):
    """Partial-image upserts through the real engine: every third
    non-delete event is a 'P' patch setting ONLY the value column
    (datagen.patch_changelog_from_events_table), so the final per-user
    state mixes columns from different events — commit/event_type from the
    last FULL image, value from the last patch above it, patch-created
    users with null commit/type. Replayed in 3 epochs so patches cross
    snapshot boundaries (the prev-snapshot base-image path), oracle-checked
    by the per-column arg_max SQL below."""
    from arches_rascoll_etl_ray.datagen.changelog_gen import (
        patch_changelog_from_events_table,
        write_changelog_shards,
    )
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = os.path.join(_CACHE_ROOT, f"events_patch_clog_{tag}")
    marker = os.path.join(clog_dir, "_GENERATED")
    if not os.path.exists(marker):
        shutil.rmtree(clog_dir, ignore_errors=True)
        write_changelog_shards(patch_changelog_from_events_table(sf_dir), clog_dir, num_shards=8)
        with open(marker, "w") as f:
            f.write(sf_dir + "\n")
    eng = CDCEngine(
        EngineConfig(lake_dir=_fresh_lake(f"events_patch_{tag}"), num_partitions=8)
    )
    per = max(1, max_available_lsn(clog_dir) // 3)
    eng.replay(clog_dir, events_per_epoch=per)
    snap = eng.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_events_patch"] = cdc_events_patch
ORACLE_SQL["cdc_events_patch"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), k AS (
      SELECT *, CASE WHEN event_type = 'delete' THEN 'D'
                     WHEN event_id % 3 = 0 THEN 'P' ELSE 'F' END AS kind
      FROM ordered
    ), f AS (
      SELECT user_id,
             max(lsn) FILTER (WHERE kind <> 'P') AS full_lsn,
             arg_max(kind, lsn) FILTER (WHERE kind <> 'P') AS full_kind,
             arg_max(event_id, lsn) FILTER (WHERE kind <> 'P') AS full_eid,
             arg_max(event_type, lsn) FILTER (WHERE kind <> 'P') AS full_et,
             arg_max(value, lsn) FILTER (WHERE kind <> 'P') AS full_val
      FROM k GROUP BY user_id
    ), p AS (
      SELECT k.user_id, arg_max(k.value, k.lsn) AS p_val
      FROM k LEFT JOIN f ON k.user_id = f.user_id
      WHERE k.kind = 'P' AND k.lsn > coalesce(f.full_lsn, 0)
      GROUP BY k.user_id
    )
    SELECT 'user' || CAST(u.user_id AS VARCHAR) AS user_key,
           CASE WHEN f.full_kind = 'F' THEN CAST(f.full_eid AS BIGINT) END AS last_event_id,
           CASE WHEN f.full_kind = 'F' THEN f.full_et END AS last_event_type,
           CASE WHEN p.user_id IS NOT NULL THEN printf('%.6f', p.p_val)
                WHEN f.full_kind = 'F' THEN printf('%.6f', f.full_val) END AS last_value_str
    FROM (SELECT DISTINCT user_id FROM k) u
    LEFT JOIN f ON u.user_id = f.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    WHERE f.full_kind = 'F' OR p.user_id IS NOT NULL
"""


def cdc_bootstrap_handoff(sf_dir: str):
    """Initial load + CDC handoff through the real engine: an independent
    lake replays the events stream to the half-way LSN and exports its
    snapshot; a FRESH lake bootstraps from that snapshot (CDCEngine.bootstrap,
    per-row lsns preserved) and tails the remaining events; the result must
    equal a full-history replay — oracle-checked by the same LWW window SQL
    as cdc_events_upsert (and sha-pinned against a from-scratch replay in
    tests/test_bootstrap.py)."""
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    avail = max_available_lsn(clog_dir)
    half = max(1, avail // 2)
    src = CDCEngine(
        EngineConfig(lake_dir=_fresh_lake(f"events_bootsrc_{tag}"), num_partitions=8)
    )
    src.apply_epoch(clog_dir, end_lsn=half)
    boot = CDCEngine(
        EngineConfig(lake_dir=_fresh_lake(f"events_boot_{tag}"), num_partitions=8)
    )
    boot.bootstrap(src.snapshot_table(), as_of_lsn=half)
    boot.replay(clog_dir, events_per_epoch=max(1, (avail - half) // 2))
    snap = boot.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_bootstrap_handoff"] = cdc_bootstrap_handoff
ORACLE_SQL["cdc_bootstrap_handoff"] = ORACLE_SQL["cdc_events_upsert"]


def cdc_retention(sf_dir: str):
    """Retention through the real engine: full replay of the events stream,
    then expire(min_lsn = avail//2) — live rows whose last write predates
    the half-way commit position are dropped via the per-partition footer-
    pruned rewrite. Oracle: the LWW window SQL with the same lsn-horizon
    predicate."""
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    avail = max_available_lsn(clog_dir)
    eng = CDCEngine(
        EngineConfig(lake_dir=_fresh_lake(f"events_ttl_{tag}"), num_partitions=8)
    )
    eng.replay(clog_dir, events_per_epoch=max(1, avail // 2))
    eng.expire(avail // 2)
    snap = eng.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_retention"] = cdc_retention
ORACLE_SQL["cdc_retention"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    )
    SELECT 'user' || CAST(user_id AS VARCHAR) AS user_key,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           printf('%.6f', value) AS last_value_str
    FROM last
    WHERE rn = 1 AND event_type <> 'delete'
      AND lsn >= (SELECT count(*) // 2 FROM events)
"""


def cdc_lineage(sf_dir: str):
    """Per-partition lineage surface (the north star names it verbatim:
    "every partition emits lineage (offset ranges, applied-LSN watermark)").

    Replays the events changelog through the real engine, then reads the
    lineage table from the COMMIT RECORDS alone (CDCEngine.lineage() — one
    metadata task per partition, no data reads). The DuckDB oracle has to
    reproduce the engine's key→partition routing bit-for-bit, so it runs
    the generated SQL twin of functions.hashing.key_hash64 (FNV-1a-style
    byte fold + separator boundary + splitmix64 finalizer, chained one step
    per subselect) over 'user'||user_id / 'state' — the strongest oracle in
    the suite: a single hash-bit deviation reroutes a key and flips four
    columns at once.

    Exposes the crash-exact columns only: `events_applied` (the API's
    folded-winner count) is batch-boundary-dependent by design (the
    map-side LWW combiner collapses superseded events before the shuffle),
    so it has no deterministic SQL twin."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"lineage_{tag}"), num_partitions=8))
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    per_epoch = max(1, max_available_lsn(clog_dir) // 4)
    eng.replay(clog_dir, events_per_epoch=per_epoch)
    lin = eng.lineage()
    return lin.select(["partition", "applied_lsn", "live_rows", "epochs_active"])


def _lineage_oracle_sql() -> str:
    from arches_rascoll_etl_ray.functions.hashing import key_hash64_sql

    hashed = key_hash64_sql(
        "SELECT lsn, user_id, event_type, 'user' || CAST(user_id AS VARCHAR) AS repo"
        " FROM ordered",
        "repo",
        "state",
        ["lsn", "user_id", "event_type"],
    )
    return f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (ORDER BY ts, event_id) AS lsn
      FROM events
    ), parts AS (
      SELECT CAST(kh % 8 AS BIGINT) AS partition, lsn, user_id, event_type
      FROM ({hashed})
    ), pe AS (
      SELECT greatest(1, count(*) // 4) AS v FROM events
    ), last AS (
      SELECT partition, user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM parts
    ), live AS (
      SELECT partition, count(*) AS live_rows
      FROM last WHERE rn = 1 AND event_type <> 'delete'
      GROUP BY partition
    ), agg AS (
      SELECT partition,
             max(lsn) AS applied_lsn,
             count(DISTINCT (lsn - 1) // (SELECT v FROM pe)) AS epochs_active
      FROM parts GROUP BY partition
    )
    SELECT a.partition, a.applied_lsn,
           coalesce(l.live_rows, 0) AS live_rows, a.epochs_active
    FROM agg a LEFT JOIN live l USING (partition)
    """


QUERIES["cdc_lineage"] = cdc_lineage
ORACLE_SQL["cdc_lineage"] = _lineage_oracle_sql()


def cdc_repartition(sf_dir: str):
    """Online partition-count migration behind the correctness gate: the
    events changelog replays into an 8-partition lake, `repartition_to`
    migrates the live state to 16 partitions (snapshot→bootstrap, one
    distributed pass), and the MIGRATED lake's snapshot is checked against
    the same LWW window SQL as cdc_events_upsert — the migration must be
    invisible to every reader."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    lake8 = _fresh_lake(f"repart8_{tag}")
    lake16 = _fresh_lake(f"repart16_{tag}")
    eng = CDCEngine(EngineConfig(lake_dir=lake8, num_partitions=8))
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    per_epoch = max(1, max_available_lsn(clog_dir) // 4)
    eng.replay(clog_dir, events_per_epoch=per_epoch)
    dst = eng.repartition_to(lake16, 16)
    snap = dst.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_repartition"] = cdc_repartition
ORACLE_SQL["cdc_repartition"] = ORACLE_SQL["cdc_events_upsert"]


def cdc_branch(sf_dir: str):
    """Lake branching behind the correctness gate: replay the full events
    changelog into the primary (4 epochs), fork a branch at epoch 2's
    committed horizon, then tail the branch with a DIVERGENT continuation —
    the post-fork remainder with every 'update' event dropped. The branch's
    final state must equal the LWW fold over (events ≤ fork LSN) ∪
    (post-fork events that are not updates) — while the primary, checked by
    its own sha against a straight-line replay in tests, is untouched by
    the branch's writes."""
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    max_lsn = max_available_lsn(clog_dir)
    per_epoch = max(1, max_lsn // 4)
    primary = CDCEngine(
        EngineConfig(lake_dir=_fresh_lake(f"branch_src_{tag}"), num_partitions=8)
    )
    primary.replay(clog_dir, events_per_epoch=per_epoch)

    br = primary.branch(_fresh_lake(f"branch_dst_{tag}"), epoch=2)
    fork_lsn = br.checkpoint().end_lsn
    assert fork_lsn == 2 * per_epoch  # the oracle's h must be this value

    # divergent continuation: the remainder with updates dropped, original
    # lsns retained (gaps are fine — epochs range over lsn VALUES). Read it
    # from the CACHED changelog shards (file-level lsn pruning + row filter)
    # instead of re-deriving/re-sorting the whole events table.
    import pyarrow.parquet as _pq

    from arches_rascoll_etl_ray.sources.changelog import list_shards

    tbls = [
        _pq.read_table(p, filters=[("lsn", ">", fork_lsn)])
        for lo, hi, p in sorted(list_shards(clog_dir))
        if hi > fork_lsn
    ]
    cont_t = pa.concat_tables(tbls)
    cont_t = cont_t.filter(pc.not_equal(cont_t["lang"], pa.scalar("update")))
    cont = cont_t.to_pandas()
    cont_dir = os.path.join(_CACHE_ROOT, f"branch_cont_{tag}")
    shutil.rmtree(cont_dir, ignore_errors=True)
    write_changelog_shards(cont, cont_dir, num_shards=4)
    br.replay(cont_dir, events_per_epoch=per_epoch)

    snap = br.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_branch"] = cdc_branch
ORACLE_SQL["cdc_branch"] = """
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), h AS (
      SELECT 2 * greatest(1, CAST(count(*) AS BIGINT) // 4) AS h FROM ordered
    ), br AS (
      SELECT o.* FROM ordered o, h WHERE o.lsn <= h.h OR o.event_type <> 'update'
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM br
    )
    SELECT 'user' || CAST(user_id AS VARCHAR) AS user_key,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           printf('%.6f', value) AS last_value_str
    FROM last WHERE rn = 1 AND event_type <> 'delete'
"""


def cdc_fsck(sf_dir: str):
    """The integrity audit behind the correctness gate: replay the events
    changelog, run the distributed fsck, and let DuckDB re-derive what a
    HEALTHY lake must report — per-partition live-row counts through the
    bit-exact key_hash64 SQL routing twin, with every invariant flag green.
    (The corruption-detection side — each flag actually tripping — is
    pinned in tests/test_fsck.py, which tampers real lake files.)"""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"fsck_{tag}"), num_partitions=8))
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    per_epoch = max(1, max_available_lsn(clog_dir) // 4)
    eng.replay(clog_dir, events_per_epoch=per_epoch)
    return eng.fsck()


def _fsck_oracle_sql() -> str:
    from arches_rascoll_etl_ray.functions.hashing import key_hash64_sql

    hashed = key_hash64_sql(
        "SELECT lsn, user_id, event_type, 'user' || CAST(user_id AS VARCHAR) AS repo"
        " FROM ordered",
        "repo",
        "state",
        ["lsn", "user_id", "event_type"],
    )
    return f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (ORDER BY ts, event_id) AS lsn
      FROM events
    ), parts AS (
      SELECT CAST(kh % 8 AS BIGINT) AS partition, lsn, user_id, event_type
      FROM ({hashed})
    ), last AS (
      SELECT partition, user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM parts
    ), live AS (
      SELECT partition, CAST(count(*) AS BIGINT) AS rows
      FROM last WHERE rn = 1 AND event_type <> 'delete'
      GROUP BY partition
    ), allp AS (
      SELECT DISTINCT partition FROM parts
    )
    SELECT p.partition, coalesce(l.rows, 0) AS rows,
           CAST(1 AS BIGINT) AS files_ok, CAST(1 AS BIGINT) AS routing_ok,
           CAST(1 AS BIGINT) AS watermark_ok, CAST(1 AS BIGINT) AS rows_ok,
           CAST(1 AS BIGINT) AS sha_ok, CAST(1 AS BIGINT) AS ok
    FROM allp p LEFT JOIN live l USING (partition)
    """


QUERIES["cdc_fsck"] = cdc_fsck
ORACLE_SQL["cdc_fsck"] = _fsck_oracle_sql()


# Erased user ids for cdc_forget — module constants so the SQL twin is a
# pure literal; small ids exist at every scale factor.
_FORGET_USER_IDS = (1, 2, 3)


def cdc_forget(sf_dir: str):
    """GDPR-style key erasure over the events lake: replay the full change
    stream in 4 epochs, then `forget()` three users (cutoff = the whole
    applied history, so every trace of them leaves the live state and the
    persisted ban blocks any replay/rebuild from resurrecting them — see
    CDCEngine.forget / tests/test_forget.py). The snapshot read back AFTER
    the erasure epoch is the answer; the oracle recomputes the LWW fold
    from scratch excluding the erased users, so both the rewrite and the
    manifest recommit are hash-checked. Reference analogue: the reference's
    whole-table delete-and-reload is the only erasure story
    (arches_rascoll/ref_collection.py:201-248); this is its targeted,
    replay-safe recast."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    eng = CDCEngine(EngineConfig(lake_dir=_fresh_lake(f"events_forget_{tag}"), num_partitions=8))
    from arches_rascoll_etl_ray.sources.changelog import max_available_lsn

    per_epoch = max(1, max_available_lsn(clog_dir) // 4)
    eng.replay(clog_dir, events_per_epoch=per_epoch)
    eng.forget([(f"user{u}", "state") for u in _FORGET_USER_IDS])
    snap = eng.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_forget"] = cdc_forget
ORACLE_SQL["cdc_forget"] = f"""
    WITH ordered AS (
      SELECT *, row_number() OVER (ORDER BY ts, event_id) AS lsn FROM events
    ), last AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
      FROM ordered
    )
    SELECT 'user' || CAST(user_id AS VARCHAR) AS user_key,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           printf('%.6f', value) AS last_value_str
    FROM last
    WHERE rn = 1 AND event_type <> 'delete'
      AND user_id NOT IN {_FORGET_USER_IDS!r}
"""


def cdc_log_compaction(sf_dir: str):
    """Kafka-style WAL log compaction: compact the events change stream
    (keep per key only the max-LSN image, tombstones retained, patch
    chains preserved — sources/changelog.py compact_changelog), then
    replay ONLY the compacted log into a fresh lake. The oracle is the
    plain LWW fold of the ORIGINAL stream — compaction must be invisible
    to the final state while bootstrap cost drops from O(events) to
    O(keys). Reference analogue: the reference re-reads its full staging
    dump every run (arches_rascoll/ref_collection.py:201-248); compaction
    is the incremental engine's answer to that re-read."""
    from arches_rascoll_etl_ray.sources.changelog import compact_changelog, max_available_lsn

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    clog_dir = _events_changelog(sf_dir, tag)
    compacted = _fresh_lake(f"events_clog_compact_{tag}")  # fresh scratch dir
    compact_changelog(clog_dir, compacted)
    eng = CDCEngine(
        EngineConfig(lake_dir=_fresh_lake(f"events_logcompact_{tag}"), num_partitions=8)
    )
    per_epoch = max(1, max_available_lsn(compacted) // 2)
    eng.replay(compacted, events_per_epoch=per_epoch)
    snap = eng.snapshot_table()
    return pa.table(
        {
            "user_key": snap["repo"],
            "last_event_id": pc.cast(snap["commit"], pa.int64()),
            "last_event_type": snap["lang"],
            "last_value_str": pc.cast(snap["content"], pa.string()),
        }
    )


QUERIES["cdc_log_compaction"] = cdc_log_compaction
ORACLE_SQL["cdc_log_compaction"] = ORACLE_SQL["cdc_events_upsert"]

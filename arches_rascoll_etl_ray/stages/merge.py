"""Per-partition LWW upsert merge — the heart of the CDC engine.

Recasts the reference's `prep_transformed_data` fold (group raw rows by
primary key, later rows overwrite earlier field values —
arches_rascoll/ref_collection.py:88-198, overwrite at :142) as a
key-partitioned, idempotent merge:

    events(partition) ──lww_reduce──> winners
    prev snapshot ──evolve/cast──> prev rows
    prev rows whose key ∈ winners are dropped   (upsert)
    winners with op != 'D' are appended          (delete = tombstone)
    result sorted by (repo, path)                (deterministic sha,
                                                  cf. ORDER BY at
                                                  ref_collection.py:415)
    atomic write + manifest                      (exactly-once,
                                                  cf. NOT IN guards at
                                                  ref_collection.py:305-314)

Two physical plans feed it (EngineConfig.shuffle):

- "spill" (default): normalize tasks write per-partition DELTA PIECES with
  deterministic content-addressed names (`piece-<minlsn>-<maxlsn>.parquet`)
  under `_delta/epoch=N/part=P/` — a retry-idempotent write-ahead log of the
  epoch — then ONE merge task per touched partition reads its pieces. No
  all-to-all sort; both sides embarrassingly parallel. Partitioning
  assumption: a shared filesystem (or object store) visible to all workers.
- "sort": `groupby('_part').map_groups(merge)` through Ray's sort shuffle —
  no intermediate files, object store only.

Partitioning assumption for both: one partition's *epoch delta*
(post-combiner: ≤ one row per touched key per input block) fits in a task's
heap; the snapshot streams from/to Parquet, and `num_partitions` is sized so
snapshot_rows/P stays bounded at scale.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.functions.hashing import combine_key, sha256_hex_column, table_content_sha256
from arches_rascoll_etl_ray.stages.normalize import (
    apply_evolution,
    evolved_base_columns,
    patch_aware_reduce,
)
from arches_rascoll_etl_ray.state.manifest import (
    PartitionManifest,
    data_file_name,
    partition_dir,
    read_manifest,
    write_manifest,
)

STATS_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("epoch", pa.int64()),
        ("rows", pa.int64()),
        ("events_applied", pa.int64()),
        ("applied_lsn", pa.int64()),
        ("content_sha", pa.string()),
        ("data_file", pa.string()),
        ("runs", pa.string()),       # ';'-joined relative run paths (LSM)
        ("rows_exact", pa.bool_()),
        ("evolution_version", pa.int64()),
    ]
)


def _stats_row(m: PartitionManifest) -> pa.Table:
    return pa.Table.from_pylist(
        [
            {
                "partition": m.partition,
                "epoch": m.epoch,
                "rows": m.rows,
                "events_applied": m.events_applied,
                "applied_lsn": m.applied_lsn,
                "content_sha": m.content_sha or "",
                "data_file": m.data_file,
                "runs": ";".join(m.runs or []),
                "rows_exact": m.rows_exact,
                "evolution_version": m.evolution_version,
            }
        ],
        schema=STATS_SCHEMA,
    )


def manifest_from_stats_row(r: dict, start_lsn: int, end_lsn: int) -> PartitionManifest:
    return PartitionManifest(
        partition=r["partition"],
        epoch=r["epoch"],
        applied_lsn=r["applied_lsn"],
        start_lsn=start_lsn,
        end_lsn=end_lsn,
        rows=r["rows"],
        events_applied=r["events_applied"],
        data_file=r["data_file"],
        content_sha=r["content_sha"] or None,
        runs=[x for x in r.get("runs", "").split(";") if x],
        rows_exact=r.get("rows_exact", True),
        evolution_version=r.get("evolution_version", 1),
    )


def spec_version(cfg: EngineConfig) -> int:
    return cfg.evolution.version if cfg.evolution else 1


def lake_columns(cfg: EngineConfig) -> list[str]:
    return evolved_base_columns(cfg.evolution) + ["lsn", "content_sha"]


def empty_lake_table(cfg: EngineConfig) -> pa.Table:
    """Schema-correct empty snapshot (lsn is int64, not a stringly-typed
    placeholder; added columns keep their declared types)."""
    from arches_rascoll_etl_ray.config import arrow_type

    spec = cfg.evolution
    types: dict[str, pa.DataType] = {
        "lsn": pa.int64(),
        "content_sha": pa.string(),
        (spec.renames.get("content", "content") if spec else "content"): pa.large_string(),
    }
    if spec:
        for a in spec.adds:
            types[a.name] = arrow_type(a.type)
        for c in spec.computed:
            if c.fn == "len":
                types[c.name] = pa.int64()
    return pa.table(
        {c: pa.array([], types.get(c, pa.string())) for c in lake_columns(cfg)}
    )


def evolved_content_col(cfg: EngineConfig) -> str:
    spec = cfg.evolution
    return spec.renames.get("content", "content") if spec else "content"


# ------------------------------------------------------------------ LSM fold


def write_lake_file(table: pa.Table, tmp_path: str) -> None:
    """Lake parquet writer: lz4 — measurably faster to encode AND to decode
    than the snappy default for this payload; the lake is re-read every
    epoch (prev snapshot) so decode speed compounds."""
    pq.write_table(table, tmp_path, row_group_size=128 * 1024, compression="lz4")


def run_file_name(epoch: int) -> str:
    return f"run_epoch{epoch:09d}.parquet"


def fold_partition_tables(cfg: EngineConfig, tables: list[pa.Table]) -> pa.Table:
    """LWW fold of a partition's base + runs: max-LSN row per key wins,
    tombstones ('D') dropped, result key-sorted. Base rows (no `op`) are
    treated as live."""
    out_cols = lake_columns(cfg)
    prepped = []
    for t in tables:
        if t.num_rows == 0:
            continue
        t = apply_evolution(t, cfg.evolution)
        if "op" not in t.column_names:
            t = t.append_column("op", pa.array(["U"] * t.num_rows, pa.string()))
        prepped.append(t.select(out_cols + ["op"]))
    if not prepped:
        return empty_lake_table(cfg)
    allt = pa.concat_tables(prepped, promote_options="permissive")
    winners = resolve_patches(cfg, patch_aware_reduce(allt))
    live = winners.filter(pc.not_equal(winners["op"], pa.scalar("D"))).select(out_cols)
    return live.take(
        pc.sort_indices(live, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    )


def resolve_patches(
    cfg: EngineConfig, reduced: pa.Table, prev_tbl: pa.Table | None = None
) -> pa.Table:
    """Final per-column LWW resolution of partial-update ('P') events —
    Debezium-style partial images where a patch row sets only its non-null
    value columns.

    Input is `patch_aware_reduce` output: full-image winners (tombstones
    included) plus every surviving patch (each already newer than its key's
    full winner). `prev_tbl` (rewrite mode) supplies base images for keys
    whose only events this epoch were patches. Per patched key the output
    row takes, for each value column, the value of the max-LSN patch that
    SET it, else the base image's value (all-null base when the key was
    tombstoned or never existed — a patch resurrects/creates the row with
    its fragments). Row lsn = max contributing lsn; content_sha is
    recomputed from the final content so lineage stays a function of state,
    not of event shape. No-op (zero copies) when no 'P' rows are present.

    Runs inside one per-partition merge task on the patched subset only —
    never on the full partition."""
    if reduced.num_rows == 0 or "op" not in reduced.column_names:
        return reduced
    is_p = pc.fill_null(pc.equal(reduced["op"], pa.scalar("P")), False)
    if not pc.any(is_p).as_py():
        return reduced

    keys = list(CHANGEFEED_KEYS)
    out_cols = lake_columns(cfg)
    content_col = evolved_content_col(cfg)
    val_cols = [c for c in out_cols if c not in keys and c not in ("lsn", "content_sha")]

    wf = reduced.filter(pc.invert(is_p))
    patches = reduced.filter(is_p)
    pkey = combine_key(patches)
    if isinstance(pkey, pa.ChunkedArray):
        pkey = pkey.combine_chunks()

    # base images for patched keys: this round's full winners first (they
    # supersede prev), else the previous snapshot's row
    base_parts = []
    # one key materialization + membership test over the winners; reused
    # inverted below for the untouched rows (the dominant string cost here)
    wf_in_pkey = pc.is_in(combine_key(wf), value_set=pkey)
    wf_patched = wf.filter(wf_in_pkey)
    if wf_patched.num_rows:
        base_parts.append(wf_patched.select(keys + ["lsn", "op"] + val_cols))
    if prev_tbl is not None and prev_tbl.num_rows:
        covered = combine_key(wf_patched)
        if isinstance(covered, pa.ChunkedArray):
            covered = covered.combine_chunks()
        pvk = combine_key(prev_tbl)
        need = pc.and_(
            pc.is_in(pvk, value_set=pkey), pc.invert(pc.is_in(pvk, value_set=covered))
        )
        prev_sel = prev_tbl.filter(need)
        if prev_sel.num_rows:
            prev_sel = prev_sel.append_column(
                "op", pa.array(["U"] * prev_sel.num_rows, pa.string())
            )
            base_parts.append(prev_sel.select(keys + ["lsn", "op"] + val_cols))

    # Per-column last-non-null setter per key, entirely in Arrow: a stable
    # lsn sort (ties keep arrival order, matching the former pandas
    # mergesort + keep="last") then a grouped `last` with skip_nulls=True
    # (null = "column not set" in a partial image). Patched large_string
    # content never round-trips through pandas object dtype.
    template = empty_lake_table(cfg).schema
    psel = patches.select(keys + ["lsn"] + val_cols)
    # cast to the lake schema up front: an all-null value column arrives
    # typed `null`, for which Acero's hash_last has no kernel
    psel = pa.table(
        {
            c: pc.cast(psel[c], template.field(c).type if c in template.names else psel.schema.field(c).type)
            for c in psel.column_names
        }
    )
    psel = psel.take(pc.sort_indices(psel, sort_keys=[("lsn", "ascending")]))
    skip = pc.ScalarAggregateOptions(skip_nulls=True)
    agg = psel.group_by(keys, use_threads=False).aggregate(
        [(c, "last", skip) for c in val_cols] + [("lsn", "max")]
    )

    bt = None
    base_pos = None
    if base_parts:
        bt = pa.concat_tables(base_parts, promote_options="permissive")
        # a tombstoned base contributes no values — the patch creates anew
        # (keys are disjoint across base_parts, so dropping 'D' rows is
        # equivalent to null-masking their value columns)
        bt = bt.filter(pc.not_equal(pc.fill_null(bt["op"], "U"), pa.scalar("D")))
        if bt.num_rows:
            # per-group gather position into the base table; null where the
            # key has no base row (take maps null indices to null values)
            base_pos = pc.index_in(combine_key(agg), value_set=combine_key(bt))
        else:
            bt = None

    # assemble with the lake's exact column types (Arrow `last`/`max`
    # preserve input types, so these casts are no-ops except across
    # evolution-widened columns)
    arrays: dict[str, pa.Array | pa.ChunkedArray] = {}
    for c in keys:
        arrays[c] = pc.cast(agg[c], template.field(c).type)
    arrays["lsn"] = pc.cast(agg["lsn_max"], pa.int64())
    for c in val_cols:
        col = agg[f"{c}_last"]
        if bt is not None and c in bt.column_names:
            # coalesce is exactly the inherit rule: a patch "sets" a column
            # iff non-null, so null here means fall back to the base image
            col = pc.coalesce(col, pc.take(bt[c], base_pos))
        arrays[c] = pc.cast(col, template.field(c).type)
    arrays["content_sha"] = sha256_hex_column(arrays[content_col])
    patched = pa.table({c: arrays[c] for c in out_cols})
    patched = patched.append_column("op", pa.array(["U"] * patched.num_rows, pa.string()))

    # untouched full winners ride through unchanged (content_sha ensured so
    # both sides share one schema)
    if "content_sha" not in wf.column_names:
        wf = wf.append_column("content_sha", sha256_hex_column(wf[content_col]))
    rest = wf.filter(pc.invert(wf_in_pkey))
    return pa.concat_tables(
        [rest.select(out_cols + ["op"]), patched], promote_options="permissive"
    )


def read_partition_state(cfg: EngineConfig, info: dict) -> list[pa.Table]:
    """Base + run tables for a partition, oldest first."""
    tables = []
    if info.get("data_file"):
        tables.append(pq.read_table(os.path.join(cfg.lake_dir, info["data_file"])))
    for r in info.get("runs") or []:
        tables.append(pq.read_table(os.path.join(cfg.lake_dir, r)))
    return tables


# --------------------------------------------------------------- changefeed

CHANGEFEED_KEYS = ["repo", "path"]


def changefeed_schema(cfg: EngineConfig) -> pa.Schema:
    """Schema of the delta stream between two committed epochs: the key
    columns, an op ('I' insert / 'U' update / 'D' delete), and each lake
    value column twice — its before-image (`old_*`, null for inserts) and
    after-image (`new_*`, null for deletes)."""
    lake = empty_lake_table(cfg).schema
    fields = [pa.field("repo", pa.string()), pa.field("path", pa.string()),
              pa.field("op", pa.string())]
    for name in lake.names:
        if name in CHANGEFEED_KEYS:
            continue
        t = lake.field(name).type
        fields.append(pa.field("old_" + name, t))
        fields.append(pa.field("new_" + name, t))
    return pa.schema(fields)


def diff_partition_states(cfg: EngineConfig, old: pa.Table, new: pa.Table) -> pa.Table:
    """Key-aligned diff of one partition's folded state at two horizons.

    A key present only in `new` is an insert; only in `old` a delete; in
    both with a different `lsn` an update (every applied event bumps the
    winner's lsn, so lsn inequality IS state change). Same-lsn rows are
    untouched and emit nothing. Runs inside one per-partition task — both
    sides are that partition's own state, never another partition's."""
    val_cols = [c for c in lake_columns(cfg) if c not in CHANGEFEED_KEYS]
    schema = changefeed_schema(cfg)
    lake = empty_lake_table(cfg).schema
    int_cols = [c for c in val_cols if pa.types.is_integer(lake.field(c).type)]
    o = old.select(CHANGEFEED_KEYS + val_cols).to_pandas()
    n = new.select(CHANGEFEED_KEYS + val_cols).to_pandas()
    # nullable Int64 BEFORE the outer merge: plain int64 NaN-promotes to
    # float64 on unmatched keys, so lsn values above 2^53 would compare
    # equal when they differ and round-trip corrupted through the final
    # cast back to int64
    for c in int_cols:
        o[c] = o[c].astype("Int64")
        n[c] = n[c].astype("Int64")
    o = o.rename(columns={c: "old_" + c for c in val_cols})
    n = n.rename(columns={c: "new_" + c for c in val_cols})
    m = o.merge(n, on=CHANGEFEED_KEYS, how="outer", indicator=True, sort=False)
    both = m["_merge"].to_numpy() == "both"
    # Int64 `!=` yields NA where either side is missing — only on
    # non-`both` rows, which `~both` already marks changed
    lsn_diff = (m["old_lsn"] != m["new_lsn"]).fillna(False).to_numpy(dtype=bool)
    changed = ~both | lsn_diff
    m = m[changed]
    merge_tag = m["_merge"].to_numpy()
    m = m.drop(columns=["_merge"])
    m["op"] = np.where(merge_tag == "right_only", "I", np.where(merge_tag == "left_only", "D", "U"))
    m = m.sort_values(CHANGEFEED_KEYS, kind="mergesort")
    return pa.Table.from_pandas(
        m[[f.name for f in schema]], schema=schema, preserve_index=False
    )


def _apply_lsm_merge(
    cfg: EngineConfig,
    epoch: int,
    start_lsn: int,
    end_lsn: int,
    prev: dict | None,
    part: int,
    winners: pa.Table,
    events_applied: int,
    watermark: int,
    applied_lsn: int,
) -> PartitionManifest:
    """Sorted-run append (north-star LSM design): the epoch's winners —
    tombstones included — become one key-sorted run file; no base read. When
    `lsm_compact_threshold` runs accumulate, the partition compacts:
    base+runs fold into a fresh base (exact rows + content sha)."""
    pdir = partition_dir(cfg.lake_dir, part)
    out_cols = lake_columns(cfg)

    if "content_sha" not in winners.column_names:
        winners = winners.append_column(
            "content_sha", sha256_hex_column(winners[evolved_content_col(cfg)])
        )
    run_tbl = winners.select(out_cols + ["op"])
    run_tbl = run_tbl.take(
        pc.sort_indices(run_tbl, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    )

    prev_runs = list(prev.get("runs") or []) if prev else []
    prev_base = prev.get("data_file", "") if prev else ""
    prev_rows = prev.get("rows", 0) if prev else 0

    if len(prev_runs) + 1 >= cfg.lsm_compact_threshold:
        # compaction: fold everything into a new base
        tables = read_partition_state(cfg, prev or {}) + [run_tbl]
        folded = fold_partition_tables(cfg, tables)
        fname = data_file_name(epoch)
        tmp = os.path.join(pdir, "." + fname + ".tmp")
        write_lake_file(folded, tmp)
        os.replace(tmp, os.path.join(pdir, fname))
        sha = None
        if cfg.manifest_content_sha:
            sha_cols = [c for c in folded.column_names if c != evolved_content_col(cfg)]
            sha = table_content_sha256(folded, sha_cols)
        m = PartitionManifest(
            partition=part, epoch=epoch, applied_lsn=applied_lsn,
            start_lsn=start_lsn, end_lsn=end_lsn, rows=folded.num_rows,
            events_applied=events_applied,
            data_file=os.path.join(f"part={part:05d}", fname),
            content_sha=sha, runs=[], rows_exact=True,
            evolution_version=spec_version(cfg),
        )
    else:
        fname = run_file_name(epoch)
        tmp = os.path.join(pdir, "." + fname + ".tmp")
        write_lake_file(run_tbl, tmp)
        os.replace(tmp, os.path.join(pdir, fname))
        live_in_run = pc.sum(
            pc.cast(pc.not_equal(run_tbl["op"], pa.scalar("D")), pa.int64())
        ).as_py() or 0
        m = PartitionManifest(
            partition=part, epoch=epoch, applied_lsn=applied_lsn,
            start_lsn=start_lsn, end_lsn=end_lsn,
            rows=prev_rows + live_in_run,  # upper-bound estimate until compaction
            events_applied=events_applied,
            data_file=prev_base, content_sha=None,
            runs=prev_runs + [os.path.join(f"part={part:05d}", fname)],
            rows_exact=False,
            evolution_version=(prev.get("evolution_version", 1) if prev else spec_version(cfg)),
        )
    write_manifest(cfg.lake_dir, m)
    return m


def compact_partition(
    cfg: EngineConfig, epoch: int, end_lsn: int, info: dict, part: int
) -> PartitionManifest:
    """Fold one partition's base+runs into a fresh base (explicit
    compaction). Task retries and crash re-runs are safe by DETERMINISM
    (same fold → same bytes → atomic replace) — deliberately NO manifest
    fast-path: expire_partition shares the epoch counter and the
    zero-event manifest shape, so honoring an existing same-epoch manifest
    could silently adopt a crashed expire's FILTERED rewrite and drop rows
    the caller never asked to expire."""
    pdir = partition_dir(cfg.lake_dir, part)
    os.makedirs(pdir, exist_ok=True)
    folded = fold_partition_tables(cfg, read_partition_state(cfg, info))
    fname = data_file_name(epoch)
    tmp = os.path.join(pdir, "." + fname + ".tmp")
    write_lake_file(folded, tmp)
    os.replace(tmp, os.path.join(pdir, fname))
    sha = None
    if cfg.manifest_content_sha:
        sha_cols = [c for c in folded.column_names if c != evolved_content_col(cfg)]
        sha = table_content_sha256(folded, sha_cols)
    m = PartitionManifest(
        partition=part, epoch=epoch, applied_lsn=info.get("applied_lsn", 0),
        start_lsn=end_lsn, end_lsn=end_lsn, rows=folded.num_rows,
        events_applied=0, data_file=os.path.join(f"part={part:05d}", fname),
        content_sha=sha, runs=[], rows_exact=True,
        evolution_version=spec_version(cfg),
    )
    write_manifest(cfg.lake_dir, m)
    return m


def expire_partition(
    cfg: EngineConfig, epoch: int, end_lsn: int, info: dict, part: int, min_lsn: int
) -> tuple[PartitionManifest, int] | None:
    """Retention rewrite of ONE partition: fold base+runs and drop live rows
    whose lsn < min_lsn (rows not touched since the retention horizon).
    Returns (manifest, rows_dropped) — the drop counted on the FOLDED state,
    since LSM manifests only estimate row counts while runs are pending —
    or None when the partition provably has nothing to drop, decided from
    the parquet FOOTER's lsn column statistics alone (no data read), so an
    expire over a mostly-fresh lake costs one footer read per partition.
    Task retries and crash re-runs are safe by DETERMINISM (same fold →
    same bytes → atomic replace), NOT by a manifest fast-path: compact and
    expire share the epoch counter and the zero-event manifest shape, so
    honoring an existing same-epoch manifest here could silently adopt a
    crashed compact's UNFILTERED rewrite (or a crashed expire at a
    different horizon) and skip the retention."""
    if (
        not info.get("runs")
        and info.get("data_file")
        and info.get("evolution_version", 1) == spec_version(cfg)
    ):
        pf = pq.ParquetFile(os.path.join(cfg.lake_dir, info["data_file"]))
        idx = pf.schema_arrow.names.index("lsn")
        mins = [
            pf.metadata.row_group(g).column(idx).statistics.min
            for g in range(pf.metadata.num_row_groups)
        ]
        if mins and all(m is not None and m >= min_lsn for m in mins):
            return None  # nothing older than the horizon lives here
    pdir = partition_dir(cfg.lake_dir, part)
    os.makedirs(pdir, exist_ok=True)
    folded = fold_partition_tables(cfg, read_partition_state(cfg, info))
    live_before = folded.num_rows
    folded = folded.filter(pc.greater_equal(folded["lsn"], pa.scalar(min_lsn, pa.int64())))
    fname = data_file_name(epoch)
    tmp = os.path.join(pdir, "." + fname + ".tmp")
    write_lake_file(folded, tmp)
    os.replace(tmp, os.path.join(pdir, fname))
    sha = None
    if cfg.manifest_content_sha:
        sha_cols = [c for c in folded.column_names if c != evolved_content_col(cfg)]
        sha = table_content_sha256(folded, sha_cols)
    m = PartitionManifest(
        partition=part, epoch=epoch, applied_lsn=info.get("applied_lsn", 0),
        start_lsn=end_lsn, end_lsn=end_lsn, rows=folded.num_rows,
        events_applied=0, data_file=os.path.join(f"part={part:05d}", fname),
        content_sha=sha, runs=[], rows_exact=True,
        evolution_version=spec_version(cfg),
    )
    write_manifest(cfg.lake_dir, m)
    return m, live_before - folded.num_rows


def forget_partition(
    cfg: EngineConfig, epoch: int, end_lsn: int, info: dict, part: int, entries: list[dict]
) -> tuple[PartitionManifest, int]:
    """GDPR-erasure rewrite of ONE partition: fold base+runs and drop live
    rows matching any forget entry (key equality AND row lsn <= that entry's
    cutoff — a row REWRITTEN after the erasure point stays). Same commit
    shape as expire_partition: fresh base file, runs folded away, manifest
    with recomputed rows/content_sha so fsck/repair verify the post-erasure
    state. Retries/crash re-runs are safe by determinism (same fold → same
    bytes → atomic replace), not by a manifest fast-path — see
    expire_partition's note on the shared zero-event epoch shape."""
    from arches_rascoll_etl_ray.stages.normalize import apply_forget_filter

    pdir = partition_dir(cfg.lake_dir, part)
    os.makedirs(pdir, exist_ok=True)
    folded = fold_partition_tables(cfg, read_partition_state(cfg, info))
    live_before = folded.num_rows
    folded = apply_forget_filter(folded, entries)
    fname = data_file_name(epoch)
    tmp = os.path.join(pdir, "." + fname + ".tmp")
    write_lake_file(folded, tmp)
    os.replace(tmp, os.path.join(pdir, fname))
    sha = None
    if cfg.manifest_content_sha:
        sha_cols = [c for c in folded.column_names if c != evolved_content_col(cfg)]
        sha = table_content_sha256(folded, sha_cols)
    m = PartitionManifest(
        partition=part, epoch=epoch, applied_lsn=info.get("applied_lsn", 0),
        start_lsn=end_lsn, end_lsn=end_lsn, rows=folded.num_rows,
        events_applied=0, data_file=os.path.join(f"part={part:05d}", fname),
        content_sha=sha, runs=[], rows_exact=True,
        evolution_version=spec_version(cfg),
    )
    write_manifest(cfg.lake_dir, m)
    return m, live_before - folded.num_rows


# ---------------------------------------------------------------- core merge


def apply_partition_merge(
    cfg: EngineConfig,
    epoch: int,
    start_lsn: int,
    end_lsn: int,
    prev: dict | None,
    part: int,
    events: pa.Table,
) -> PartitionManifest:
    """Fold one partition's epoch events into its snapshot. Idempotent per
    (partition, epoch, lsn-range): the manifest is the commit record, but it
    only counts as committed when its (start_lsn, end_lsn) matches THIS
    epoch's range — a crash-resume may reuse the epoch number over a wider
    range, and honoring the narrower crashed-attempt manifest would silently
    skip the extra events while the checkpoint commits the wider end_lsn."""
    lake_dir = cfg.lake_dir
    existing = read_manifest(lake_dir, part, epoch)
    if existing is not None and existing.start_lsn == start_lsn and existing.end_lsn == end_lsn:
        return existing

    watermark = prev["applied_lsn"] if prev else 0
    if events.num_rows:
        # slice to (watermark, end_lsn]: leftover delta pieces from a crashed
        # attempt with a wider LSN range must not leak into this epoch
        # (applied_lsn would exceed the committed end_lsn). min/max
        # short-circuit: in the common case the whole table is in range.
        mm = pc.min_max(events["lsn"])
        if (watermark > 0 and mm["min"].as_py() <= watermark) or mm["max"].as_py() > end_lsn:
            mask = pc.and_(
                pc.greater(events["lsn"], pa.scalar(watermark, pa.int64())),
                pc.less_equal(events["lsn"], pa.scalar(end_lsn, pa.int64())),
            )
            events = events.filter(mask)

    pdir = partition_dir(lake_dir, part)
    os.makedirs(pdir, exist_ok=True)

    if events.num_rows == 0:
        m = PartitionManifest(
            partition=part,
            epoch=epoch,
            applied_lsn=watermark,
            start_lsn=start_lsn,
            end_lsn=end_lsn,
            rows=prev["rows"] if prev else 0,
            events_applied=0,
            data_file=prev["data_file"] if prev else "",
            content_sha=prev.get("content_sha") if prev else None,
            runs=list(prev.get("runs") or []) if prev else [],
            rows_exact=prev.get("rows_exact", True) if prev else True,
            evolution_version=prev.get("evolution_version", 1) if prev else spec_version(cfg),
        )
        write_manifest(lake_dir, m)
        return m

    out_cols = lake_columns(cfg)
    # count DISTINCT lsns, not raw rows: a crash-resume can leave both a
    # crashed attempt's overlapping-range piece and the re-spilled piece for
    # the same LSNs on disk (different names, both in range) — the LWW fold
    # dedups the rows so state stays exact, but a raw num_rows here would
    # double-count them in the manifest/checkpoint metrics
    events_applied = pc.count_distinct(events["lsn"]).as_py()
    winners = patch_aware_reduce(events)
    applied_lsn = max(watermark, pc.max(events["lsn"]).as_py())

    if cfg.merge_mode == "lsm":
        # patches ride into the run file raw (op 'P'); the read-side fold
        # resolves them against base+runs (resolve_patches in
        # fold_partition_tables), the same merge-on-read contract tombstones
        # already use
        return _apply_lsm_merge(
            cfg, epoch, start_lsn, end_lsn, prev, part,
            winners, events_applied, watermark, applied_lsn,
        )

    prev_kept: pa.Table | None = None
    prev_tbl: pa.Table | None = None
    if prev and prev["data_file"]:
        prev_tbl = pq.read_table(os.path.join(lake_dir, prev["data_file"]))
        prev_tbl = apply_evolution(prev_tbl, cfg.evolution)
    winners = resolve_patches(cfg, winners, prev_tbl=prev_tbl)
    if prev_tbl is not None:
        prev_key = combine_key(prev_tbl)
        winner_keys = combine_key(winners)  # recombined here, not shuffled
        if isinstance(winner_keys, pa.ChunkedArray):
            winner_keys = winner_keys.combine_chunks()
        keep = pc.invert(pc.is_in(prev_key, value_set=winner_keys))
        prev_kept = prev_tbl.filter(keep).select(out_cols)

    live = winners.filter(pc.not_equal(winners["op"], pa.scalar("D")))
    if "content_sha" not in live.column_names:
        # lineage (per-row sha256 invariant) computed on winners only
        live = live.append_column(
            "content_sha", sha256_hex_column(live[evolved_content_col(cfg)])
        )
    live = live.select(out_cols)
    tables = [t for t in (prev_kept, live) if t is not None and t.num_rows > 0]
    result = pa.concat_tables(tables, promote_options="permissive") if tables else live
    result = result.take(
        pc.sort_indices(result, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    )

    fname = data_file_name(epoch)
    final_path = os.path.join(pdir, fname)
    tmp_path = os.path.join(pdir, "." + fname + ".tmp")
    write_lake_file(result, tmp_path)
    os.replace(tmp_path, final_path)

    sha = None
    if cfg.manifest_content_sha:
        sha_cols = [c for c in result.column_names if c != evolved_content_col(cfg)]
        sha = table_content_sha256(result, sha_cols)

    m = PartitionManifest(
        partition=part,
        epoch=epoch,
        applied_lsn=applied_lsn,
        start_lsn=start_lsn,
        end_lsn=end_lsn,
        rows=result.num_rows,
        events_applied=events_applied,
        data_file=os.path.join(f"part={part:05d}", fname),
        content_sha=sha,
        evolution_version=spec_version(cfg),
    )
    write_manifest(lake_dir, m)
    return m


# ------------------------------------------------------- sort-shuffle plan


def make_merge_fn(
    cfg: EngineConfig,
    epoch: int,
    start_lsn: int,
    end_lsn: int,
    prev_partitions: dict[int, dict],
) -> Callable[[pa.Table], pa.Table]:
    """groupby('_part').map_groups merge for the 'sort' shuffle plan.
    `prev_partitions` is one small dict entry per partition — shipped once
    per task via closure, not per batch."""

    def merge(group: pa.Table) -> pa.Table:
        part = group["_part"][0].as_py()
        m = apply_partition_merge(
            cfg, epoch, start_lsn, end_lsn, prev_partitions.get(part), part, group
        )
        return _stats_row(m)

    return merge


# ------------------------------------------------------- spill-shuffle plan


def touched_parts_from_delta(cfg, epoch: int) -> list[int]:
    """Partition ids with delta pieces on disk for `epoch` — the
    crashed-attempt fallback shared by replay, apply_epoch and bootstrap
    (pieces may exist from a prior attempt whose spill stats were lost)."""
    droot = delta_dir(cfg, epoch)
    if not os.path.isdir(droot):
        return []
    return sorted(
        int(name.split("=")[1]) for name in os.listdir(droot) if name.startswith("part=")
    )


def delta_dir(cfg_or_lake, epoch: int, part: int | None = None) -> str:
    if isinstance(cfg_or_lake, EngineConfig):
        root = cfg_or_lake.delta_root or os.path.join(cfg_or_lake.lake_dir, "_delta")
    else:  # lake dir string
        root = os.path.join(cfg_or_lake, "_delta")
    d = os.path.join(root, f"epoch={epoch:09d}")
    return d if part is None else os.path.join(d, f"part={part:05d}")


_SPILL_STATS_SCHEMA = pa.schema([("partition", pa.int32()), ("rows", pa.int64())])
_MULTI_SPILL_STATS_SCHEMA = pa.schema(
    [("epoch", pa.int64()), ("partition", pa.int32()), ("rows", pa.int64())]
)




def _ipc_options() -> "pa.ipc.IpcWriteOptions":
    """Piece codec, default UNCOMPRESSED (ARER_PIECE_CODEC=lz4 to change).
    Measured on the 20M-event replay: lz4 pieces raised 8→32 scaling
    efficiency to 0.94 but HALVED absolute throughput at both levels (the
    per-piece lz4 frames cost more CPU than the DRAM bytes they save here);
    IPC write without compression is close to memcpy. On clusters where
    pieces cross a real network or slow disk, flip the env."""
    codec = os.environ.get("ARER_PIECE_CODEC", "none")
    if codec == "none":
        return pa.ipc.IpcWriteOptions()
    return pa.ipc.IpcWriteOptions(compression=codec)

def make_multi_epoch_spill_fn(
    cfg: EngineConfig, epoch_bounds: list[tuple[int, int, int]]
) -> Callable[[pa.Table], pa.Table]:
    """Fused map side of the spill plan for ONE OR MORE contiguous epochs:
    LSN slice → evolution → key hash → ONE sort on (_epoch, _part, _kh, lsn)
    → within-(epoch,batch) LWW combiner → run-sliced per-(epoch,partition)
    Arrow-IPC pieces.

    `epoch_bounds` is [(epoch, start_lsn, end_lsn), ...] ascending and
    contiguous. Spilling several epochs in one Dataset execution amortizes
    the executor's fixed startup and keeps the read at full parallelism —
    per-epoch piece CONTENT is byte-identical to per-epoch spilling because
    the combiner never drops across an epoch boundary.

    One sort/take materializes the block exactly once (sorting per concern
    would copy the full block per pass). The combiner drops a row only when
    hash AND exact (repo, path) match the next row within the same epoch —
    collisions keep both rows, the merge-side exact reduce settles them.
    Piece names derive from the slice's (min,max) LSN — deterministic for a
    deterministic epoch slice, so task retries overwrite identical bytes
    (atomic replace)."""
    from arches_rascoll_etl_ray.functions.hashing import key_hash64

    spec = cfg.evolution
    num_parts = cfg.num_partitions
    # loaded once at plan-build time (driver side, lease held): erasure
    # entries are static for the duration of a replay
    from arches_rascoll_etl_ray.stages.normalize import load_forget_list

    forgotten = load_forget_list(cfg.lake_dir)
    start_lsn = epoch_bounds[0][1]
    end_lsn = epoch_bounds[-1][2]
    epoch_ids = np.array([ep for ep, _, _ in epoch_bounds], dtype=np.int64)
    epoch_ends = np.array([e for _, _, e in epoch_bounds], dtype=np.int64)
    multi = len(epoch_bounds) > 1

    def spill(batch: pa.Table) -> pa.Table:
        # LSN slice with an all-in-range short-circuit (whole shards usually
        # fall inside the range; only boundary shards pay the filter)
        if batch.num_rows:
            mm = pc.min_max(batch["lsn"])
            if mm["min"].as_py() <= start_lsn or mm["max"].as_py() > end_lsn:
                mask = pc.and_(
                    pc.greater(batch["lsn"], pa.scalar(start_lsn, pa.int64())),
                    pc.less_equal(batch["lsn"], pa.scalar(end_lsn, pa.int64())),
                )
                batch = batch.filter(mask)
        if batch.num_rows == 0:
            return pa.Table.from_pylist([], schema=_MULTI_SPILL_STATS_SCHEMA)

        if cfg.quarantine_invalid:
            from arches_rascoll_etl_ray.stages.normalize import quarantine_invalid_rows

            batch = quarantine_invalid_rows(batch, cfg.lake_dir)
            if batch.num_rows == 0:
                return pa.Table.from_pylist([], schema=_MULTI_SPILL_STATS_SCHEMA)

        if cfg.row_filter is not None:
            from arches_rascoll_etl_ray.stages.normalize import apply_row_filter

            batch = apply_row_filter(batch, cfg.row_filter)
            if batch.num_rows == 0:
                return pa.Table.from_pylist([], schema=_MULTI_SPILL_STATS_SCHEMA)

        if forgotten:
            from arches_rascoll_etl_ray.stages.normalize import apply_forget_filter

            batch = apply_forget_filter(batch, forgotten)
            if batch.num_rows == 0:
                return pa.Table.from_pylist([], schema=_MULTI_SPILL_STATS_SCHEMA)

        batch = apply_evolution(batch, spec)
        kh = key_hash64(batch)
        part = (kh % np.uint64(num_parts)).astype(np.int32)
        lsn_np = batch["lsn"].to_numpy(zero_copy_only=False)
        ep = epoch_ids[np.searchsorted(epoch_ends, lsn_np, side="left")]
        # Sort indices from the SMALL columns only, run the combiner on a
        # key-column gather, and take the wide table ONCE for surviving
        # rows. The content payload dominates batch bytes; the former
        # full-width take + filter moved it twice for rows the combiner
        # was about to drop (same move as lww_reduce's winner-first
        # gather). Output rows/order/bytes are identical.
        sort_cols: dict[str, object] = {"_part": pa.array(part), "_kh": pa.array(kh), "lsn": batch["lsn"]}
        if multi:
            sort_cols = {"_ep": pa.array(ep), **sort_cols}
            sort_keys = [
                ("_ep", "ascending"), ("_part", "ascending"),
                ("_kh", "ascending"), ("lsn", "ascending"),
            ]
        else:
            sort_keys = [("_part", "ascending"), ("_kh", "ascending"), ("lsn", "ascending")]
        idx = pc.sort_indices(pa.table(sort_cols), sort_keys=sort_keys)
        idx_np = idx.to_numpy(zero_copy_only=False)

        n = batch.num_rows
        if n > 1:
            # combiner: drop superseded same-key rows (exactness not needed
            # here — merge re-reduces; collisions merely stay unreduced).
            # Never across an epoch boundary: each epoch's pieces must equal
            # what a per-epoch spill would have written.
            from arches_rascoll_etl_ray.stages.normalize import _adjacent_neq_arrays

            neq = _adjacent_neq_arrays(
                pc.take(batch["repo"], idx).combine_chunks(),
                pc.take(batch["path"], idx).combine_chunks(),
            )
            if multi:
                ep_sorted = ep[idx_np]
                neq = neq | (ep_sorted[1:] != ep_sorted[:-1])
            # a partial-update row never supersedes what's beneath it: a
            # row whose same-key successor is a 'P' patch must survive to
            # the merge-side resolve (patch_aware_reduce has the same rule)
            p_flags = pc.fill_null(pc.equal(batch["op"], pa.scalar("P")), False)
            if pc.any(p_flags).as_py():
                neq = neq | p_flags.to_numpy(zero_copy_only=False)[idx_np][1:]
            keep_sorted = idx_np[np.append(neq, True)]
        else:
            keep_sorted = idx_np

        parts = part[keep_sorted]
        eps = ep[keep_sorted] if multi else None
        if multi:
            change = np.r_[True, (parts[1:] != parts[:-1]) | (eps[1:] != eps[:-1])]
        else:
            change = np.r_[True, parts[1:] != parts[:-1]]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(parts)]
        # ONE wide gather, survivors only; _part/_ep are encoded by the
        # piece directory — never materialized as table columns at all
        piece_tbl = batch.take(pa.array(keep_sorted)).append_column(
            "_kh", pa.array(kh[keep_sorted])
        )
        out = []
        lsn_sorted = lsn_np[keep_sorted]
        kh_sorted = kh[keep_sorted].astype(np.uint64)
        for s, e in zip(starts, ends):
            sub = piece_tbl.slice(s, e - s)
            part_id = int(parts[s])
            epoch = int(eps[s]) if multi else int(epoch_ids[0])
            lsns = lsn_sorted[s:e]
            lo, hi = int(lsns.min()), int(lsns.max())
            # content-hash suffix: (lo,hi) alone is NOT unique under
            # duplicate-LSN delivery split across blocks — two slices with
            # the same range but different membership must not share a name.
            # The hash mixes the KEY hash per row, not just the lsn:
            # bootstrap loads every row at ONE constant lsn, where an
            # lsn-only xor would collapse to two possible names per
            # partition (row-count parity) and os.replace would silently
            # destroy earlier blocks' pieces. Same slice → same name
            # (retry-idempotent overwrite); different row sets collide with
            # ~2^-64 probability, and a duplicate piece would merely be
            # duplicate delivery, which the LWW fold already absorbs.
            khs = kh_sorted[s:e]
            lh = int(np.bitwise_xor.reduce(
                (lsns.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
                * np.uint64(0xBF58476D1CE4E5B9)
                ^ (khs + np.uint64(0x94D049BB133111EB)) * np.uint64(0xFF51AFD7ED558CCD)
            )) if len(lsns) else 0
            pdir = delta_dir(cfg, epoch, part_id)
            os.makedirs(pdir, exist_ok=True)
            # Arrow IPC, uncompressed: pieces are transient (deleted at
            # epoch commit) and sit on fast local storage — encode speed is
            # all that matters, and IPC write is close to memcpy
            fname = f"piece-{lo:012d}-{hi:012d}-{lh & 0xFFFFFFFFFFFFFFFF:016x}.arrow"
            # per-writer tmp: concurrent tasks must never interleave writes
            # into the same tmp file
            tmp = os.path.join(pdir, f".{fname}.tmp.{os.getpid()}")
            with pa.OSFile(tmp, "wb") as sink:
                with pa.ipc.new_file(sink, sub.schema, options=_ipc_options()) as writer:
                    writer.write_table(sub)
            os.replace(tmp, os.path.join(pdir, fname))
            out.append({"epoch": epoch, "partition": part_id, "rows": e - s})
        return pa.Table.from_pylist(out, schema=_MULTI_SPILL_STATS_SCHEMA)

    return spill


def make_normalize_spill_fn(
    cfg: EngineConfig, epoch: int, start_lsn: int, end_lsn: int
) -> Callable[[pa.Table], pa.Table]:
    """Single-epoch spill fn (see make_multi_epoch_spill_fn)."""
    return make_multi_epoch_spill_fn(cfg, [(epoch, start_lsn, end_lsn)])


def _manifest_to_info(m: PartitionManifest) -> dict:
    """The checkpoint's per-partition info dict for a committed manifest
    (mirrors Checkpoint.advanced)."""
    return {
        "epoch": m.epoch,
        "applied_lsn": m.applied_lsn,
        "rows": m.rows,
        "data_file": m.data_file,
        "content_sha": m.content_sha,
        "runs": list(m.runs or []),
        "rows_exact": m.rows_exact,
        "evolution_version": m.evolution_version,
    }


def merge_partition_epoch_chain(
    cfg: EngineConfig,
    epoch_bounds: list[tuple[int, int, int]],
    prev: dict | None,
    part: int,
) -> list[PartitionManifest]:
    """Apply several consecutive epochs to ONE partition inside one Ray
    task. Partitions are independent, but a partition's epochs are strictly
    ordered — chaining them here removes the global all-partitions barrier
    between epochs (the driver only needs every epoch's manifests before
    committing that epoch's checkpoint, and manifests land as each link of
    the chain finishes)."""
    manifests = []
    info = prev
    for epoch, start_lsn, end_lsn in epoch_bounds:
        m = merge_partition_from_pieces(cfg, epoch, start_lsn, end_lsn, info, part)
        manifests.append(m)
        info = _manifest_to_info(m)
    return manifests


def merge_partition_from_pieces(
    cfg: EngineConfig,
    epoch: int,
    start_lsn: int,
    end_lsn: int,
    prev: dict | None,
    part: int,
) -> PartitionManifest:
    """Reduce side of the spill plan: read this partition's delta pieces and
    fold them into the snapshot. Runs as one Ray task per touched partition
    (raw task, not Dataset — the reduce input is a set of files this task
    owns exclusively, not a Dataset shuffle output)."""
    if cfg.fault_injection:
        # test-only: fail each (epoch, partition) once via a shared-fs flag
        # dir (env vars don't reach already-running workers) so Ray's task
        # retry exercises the idempotent-manifest path for real
        fault_dir = os.path.join(cfg.lake_dir, "_fault_once")
        if os.path.isdir(fault_dir):
            marker = os.path.join(fault_dir, f"fault_{epoch}_{part}")
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("1")
                raise RuntimeError(f"injected fault for epoch={epoch} part={part}")
    d = delta_dir(cfg, epoch, part)
    pieces = sorted(os.listdir(d)) if os.path.isdir(d) else []

    def _in_range(name: str) -> bool:
        # piece-<lo>-<hi>-<hash>.<ext>: skip pieces wholly outside this
        # epoch's (start_lsn, end_lsn] — leftovers from a crashed attempt
        # that sliced the same epoch number over a different LSN range.
        try:
            parts = name.split("-")
            lo, hi = int(parts[1]), int(parts[2].split(".")[0])
        except (IndexError, ValueError):
            return True  # unknown name: read it; the LSN filter still guards
        return hi > start_lsn and lo <= end_lsn

    tables = []
    for f in pieces:
        if not _in_range(f):
            continue
        if f.endswith(".arrow"):
            with pa.memory_map(os.path.join(d, f), "r") as src:
                tables.append(pa.ipc.open_file(src).read_all())
        elif f.endswith(".parquet"):  # older pieces
            tables.append(pq.read_table(os.path.join(d, f)))
    events = (
        pa.concat_tables(tables, promote_options="permissive")
        if tables
        else pa.table({"lsn": pa.array([], pa.int64())})  # empty → prev carried
    )
    return apply_partition_merge(cfg, epoch, start_lsn, end_lsn, prev, part, events)

"""Multi-table job runner: one change log fanned into N logical lake tables.

The reference's driver loops 9 mapping configs over one source extract,
writing 9 staging tables (arches_rascoll/ref_collection.py:201-248, the
config loop at :212). The Ray-native analogue: N `EngineConfig`s (each its
own lake dir, evolution spec, optional row_filter) driven by ONE epoch loop
that reads each epoch's changelog slice ONCE and spills it into every
table's delta pieces in the same map pass — source read amplification 1,
not N. Merges then run per (table, partition) as independent Ray tasks, and
each table commits its own checkpoint (per-table exactly-once: a crash
between table commits is healed by the per-table catch-up pass on resume).
"""

from __future__ import annotations

import os

import pyarrow as pa

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine, _WriterLock
from arches_rascoll_etl_ray.sources.changelog import max_available_lsn
from arches_rascoll_etl_ray.state.checkpoint import Checkpoint, save_checkpoint

_MULTI_STATS_SCHEMA = pa.schema(
    [("table", pa.string()), ("partition", pa.int32()), ("rows", pa.int64())]
)


class MultiTableJob:
    """N named tables over one changelog. `specs` maps table name →
    EngineConfig; lake dirs must be distinct (use `for_root` to derive them
    from one root directory)."""

    def __init__(self, specs: dict[str, EngineConfig]):
        if len({cfg.lake_dir for cfg in specs.values()}) != len(specs):
            raise ValueError("each table spec needs a distinct lake_dir")
        self.engines: dict[str, CDCEngine] = {
            name: CDCEngine(cfg) for name, cfg in specs.items()
        }

    @classmethod
    def for_root(cls, root: str, table_cfgs: dict[str, dict]) -> "MultiTableJob":
        specs = {
            name: EngineConfig(lake_dir=os.path.join(root, name), **kwargs)
            for name, kwargs in table_cfgs.items()
        }
        return cls(specs)

    def checkpoints(self) -> dict[str, Checkpoint]:
        return {name: eng.checkpoint() for name, eng in self.engines.items()}

    def replay(self, changelog_dir: str, events_per_epoch: int | None = None) -> dict[str, Checkpoint]:
        """Advance every table to the end of the log with a shared read.

        Phase 1 (catch-up): tables whose committed end_lsn lags the furthest
        table replay individually to the max committed LSN — this heals a
        crash that landed between per-table commits of a shared epoch.
        Phase 2 (aligned): epochs over (max_committed, available] read each
        changelog slice once and spill it into every table.
        """
        from contextlib import ExitStack

        from arches_rascoll_etl_ray.stages.merge import make_normalize_spill_fn

        with ExitStack() as stack:
            # canonical global lock order (sorted by lake path): two jobs
            # sharing lakes but constructed with different table orders
            # would otherwise deadlock each other
            for eng in sorted(self.engines.values(), key=lambda e: e.cfg.lake_dir):
                stack.enter_context(_WriterLock(eng.cfg.lake_dir))

            ckpts = {n: e.checkpoint() for n, e in self.engines.items()}
            front = max(c.end_lsn for c in ckpts.values())
            for name, eng in self.engines.items():
                if ckpts[name].end_lsn < front:
                    ckpts[name] = eng._apply_next_epoch(changelog_dir, end_lsn=front)

            avail = max_available_lsn(changelog_dir)
            bounds: list[tuple[int, int]] = []
            s = front
            while s < avail:
                e = avail if events_per_epoch is None else min(avail, s + events_per_epoch)
                bounds.append((s, e))
                s = e

            any_engine = next(iter(self.engines.values()))
            for start_lsn, end_lsn in bounds:
                import time as _time

                t_epoch = _time.perf_counter()
                epochs = {n: ckpts[n].epoch + 1 for n in self.engines}
                spill_fns = {
                    n: make_normalize_spill_fn(eng.cfg, epochs[n], start_lsn, end_lsn)
                    for n, eng in self.engines.items()
                }

                def fused_spill(batch: pa.Table, fns=spill_fns) -> pa.Table:
                    out = []
                    for name, fn in fns.items():
                        stats = fn(batch).select(["partition", "rows"])
                        out.append(
                            stats.add_column(0, "table", pa.array([name] * stats.num_rows))
                        )
                    merged = pa.concat_tables(out) if out else None
                    return (
                        merged.cast(_MULTI_STATS_SCHEMA)
                        if merged is not None and merged.num_rows
                        else pa.Table.from_pylist([], schema=_MULTI_STATS_SCHEMA)
                    )

                ds = any_engine._build_epoch_ds(changelog_dir, start_lsn, end_lsn)
                stats = ds.map_batches(
                    fused_spill, batch_format="pyarrow", batch_size=None
                ).take_all()

                duration_spill = _time.perf_counter() - t_epoch
                for name, eng in self.engines.items():
                    touched = sorted(
                        {r["partition"] for r in stats if r["table"] == name}
                    )
                    manifests = eng._merge_epoch(
                        epochs[name], start_lsn, end_lsn, touched, ckpts[name]
                    )
                    ckpts[name] = ckpts[name].advanced(
                        epochs[name],
                        end_lsn,
                        manifests,
                        evolution_version=(
                            eng.cfg.evolution.version if eng.cfg.evolution else 1
                        ),
                        metrics={
                            "epoch": epochs[name],
                            "start_lsn": start_lsn,
                            "end_lsn": end_lsn,
                            "events_applied": sum(m.events_applied for m in manifests),
                            "duration_sec": round(_time.perf_counter() - t_epoch, 3),
                            "spill_sec": round(duration_spill, 3),
                            "partitions_touched": len(manifests),
                            "shared_read": True,
                        },
                    )
                    save_checkpoint(eng.cfg.lake_dir, ckpts[name])
                    eng._cleanup_delta(epochs[name])
            return ckpts

    def consistency_watermark(self) -> int:
        """The highest LSN at which EVERY table has a committed horizon —
        min over tables' committed end_lsn. Tables advance through shared
        epoch bounds (and phase-1 catch-up lands exactly on the shared
        front), so each table has a checkpoint AT this LSN."""
        return min(eng.checkpoint().end_lsn for eng in self.engines.values())

    def consistent_snapshot(self):
        """Cross-table consistent read (the transaction-metadata analogue):
        every table AS OF the SAME LSN — the consistency watermark — so a
        consumer joining across tables never sees table A past a change
        stream position table B hasn't applied. Tables ahead of the
        watermark serve their RETAINED checkpoint at that horizon (epoch
        time travel; 'since the last vacuum', same contract as any AS-OF
        read). Returns {table: ray.data.Dataset}.

        Raises if a table's horizon at the watermark was vacuumed away or
        the table was replayed OUTSIDE this job with different epoch
        slicing (no committed checkpoint lands on the shared bound) —
        refusing beats silently serving a torn cross-table view."""
        from arches_rascoll_etl_ray.state.checkpoint import load_checkpoint_at

        wm = self.consistency_watermark()
        out = {}
        for name, eng in self.engines.items():
            ck = eng.checkpoint()
            epoch = ck.epoch
            while ck.end_lsn > wm and epoch > 0:
                epoch -= 1
                ck = load_checkpoint_at(eng.cfg.lake_dir, epoch)  # FileNotFoundError = vacuumed
            if ck.end_lsn != wm:
                raise ValueError(
                    f"table {name!r} has no committed horizon at lsn {wm} "
                    "(replayed outside the job with different epoch slicing, "
                    "or the checkpoint was vacuumed) — cannot serve a "
                    "consistent cross-table view"
                )
            out[name] = eng.snapshot_dataset(epoch=epoch)
        return out

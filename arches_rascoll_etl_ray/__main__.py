"""CLI — the `ray job submit` entry point.

    python -m arches_rascoll_etl_ray generate --out DIR --files N --events E
    python -m arches_rascoll_etl_ray replay   --lake DIR --changelog DIR [--epoch-events N]
    python -m arches_rascoll_etl_ray status   --lake DIR --changelog DIR
    python -m arches_rascoll_etl_ray export   --lake DIR --out DIR
    python -m arches_rascoll_etl_ray vacuum   --lake DIR
    python -m arches_rascoll_etl_ray bootstrap --lake DIR --snapshot T.parquet --as-of-lsn N

On a real cluster: `ray job submit -- python -m arches_rascoll_etl_ray
replay --lake /mnt/lake --changelog /mnt/wal` (the driver owns the Ray
session; `ray.init` here is guarded so it attaches to the job's cluster).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="arches_rascoll_etl_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="deterministic synthetic changelog (FIXTURES.md F2)")
    g.add_argument("--out", required=True)
    g.add_argument("--files", type=int, default=10000)
    g.add_argument("--events", type=int, default=100000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--shards", type=int, default=64)

    for name in ("replay", "status", "export", "vacuum", "bootstrap"):
        s = sub.add_parser(name)
        s.add_argument("--lake", required=True)
        s.add_argument("--partitions", type=int, default=64)
        if name in ("replay", "status"):
            s.add_argument("--changelog", required=True)
        if name == "replay":
            s.add_argument("--epoch-events", type=int, default=None)
            s.add_argument("--delta-root", default=None)
        if name == "export":
            s.add_argument("--out", required=True)
            s.add_argument("--format", default="parquet", choices=["parquet", "csv", "jsonl"])
        if name == "bootstrap":
            s.add_argument("--snapshot", required=True, help="parquet path of the initial-load table")
            s.add_argument("--as-of-lsn", type=int, required=True, help="binlog position the snapshot was captured at")

    args = p.parse_args(argv)

    if args.cmd == "generate":
        from arches_rascoll_etl_ray.datagen.changelog_gen import generate_changelog, write_changelog_shards

        df = generate_changelog(args.files, args.events, seed=args.seed)
        paths = write_changelog_shards(df, args.out, num_shards=args.shards)
        print(json.dumps({"shards": len(paths), "events": len(df), "dir": args.out}))
        return 0

    from arches_rascoll_etl_ray.config import EngineConfig
    from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine

    _ensure_ray(args.num_cpus)
    cfg = EngineConfig(
        lake_dir=args.lake,
        num_partitions=args.partitions,
        delta_root=getattr(args, "delta_root", None),
    )
    eng = CDCEngine(cfg)

    if args.cmd == "replay":
        ckpt = eng.replay(args.changelog, events_per_epoch=args.epoch_events)
        print(json.dumps({"epoch": ckpt.epoch, "end_lsn": ckpt.end_lsn, "sha": eng.snapshot_sha256()}))
    elif args.cmd == "status":
        print(json.dumps(eng.lag(args.changelog)))
    elif args.cmd == "export":
        n = eng.export_snapshot(args.out, fmt=args.format)
        print(json.dumps({"rows": n, "out": args.out}))
    elif args.cmd == "vacuum":
        print(json.dumps({"removed": eng.vacuum()}))
    elif args.cmd == "bootstrap":
        ckpt = eng.bootstrap(args.snapshot, as_of_lsn=args.as_of_lsn)
        print(json.dumps({"epoch": ckpt.epoch, "end_lsn": ckpt.end_lsn,
                          "rows": sum(i["rows"] for i in ckpt.partitions.values())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

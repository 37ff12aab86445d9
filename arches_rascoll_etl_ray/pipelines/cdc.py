"""The CDC engine driver: epoch loop, replay, snapshot, verification.

Epoch lifecycle (SURVEY.md §3 "new-engine lifecycle"):

    read_parquet(changelog shards, LSN-pruned)          # source
      └─ map_batches(normalize)                         # stateless Arrow tasks:
           evolution projection, content_sha lineage, partition/salt
           assignment, within-batch LWW combiner
      └─ [salt_partitions>1] groupby(_part,_salt).map_groups(partial LWW)
      └─ groupby(_part).map_groups(merge)               # one task per touched
           partition: watermark guard, final LWW, upsert vs prev snapshot,
           atomic parquet write + manifest (exactly-once commit record)
      └─ tiny stats table (≤ num_partitions rows) → driver commits the epoch
         checkpoint atomically.

The only all-to-all exchange is the groupby on `_part` (plus the optional
salted pre-reduce); the combiner bounds its volume to ≤1 row per touched key
per input batch. No stage materializes the full dataset: the per-partition
snapshots live on disk, the epoch delta streams through the object store.

This module never calls ray.init()/shutdown() (driver contract).
"""

from __future__ import annotations

import hashlib
import logging
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.sources.changelog import max_available_lsn, read_shard_dataset, shards_for_range
from arches_rascoll_etl_ray.stages.merge import delta_dir as delta_dir_for
from arches_rascoll_etl_ray.stages.merge import lake_columns
from arches_rascoll_etl_ray.stages.normalize import make_normalize_fn, make_salted_reduce_fn
from arches_rascoll_etl_ray.state.checkpoint import (
    Checkpoint,
    load_latest_checkpoint,
    save_checkpoint,
)
from arches_rascoll_etl_ray.state.manifest import PartitionManifest

logger = logging.getLogger(__name__)


def _writer_identity() -> str:
    """host:pid:nonce — the lease owner token. host+pid lets a SAME-host
    successor detect a dead holder and steal immediately (the flock
    analogue); the nonce disambiguates pid reuse within one boot."""
    import socket
    import uuid

    return f"{socket.gethostname()}:{os.getpid()}:{uuid.uuid4().hex[:8]}"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


class _WriterLock:
    """Single-writer guard per lake (epochs are serial by design), layered:

    1. flock on `_writer.lock` — kernel-released on process death, so a
       crashed same-host writer never wedges the lake. Local-host only.
    2. a LEASE file `_writer.lease` (owner token + expiry, written by atomic
       tmp→rename) — the shared-filesystem multi-driver story: a second
       driver on ANOTHER host is rejected while the lease is live, an
       expired lease is stolen, and a same-host lease whose pid is dead is
       stolen immediately (crash-resume never waits out the TTL). Long
       replays renew per epoch group (`renew()`), so the default TTL only
       gates takeover after a cross-host crash. Steals are fenced by a
       link(2)-based CAS: every stealer derives one claim path from a
       digest of the exact lease bytes it observed, link() creates it
       exactly once (POSIX create-if-absent, atomic on shared
       filesystems), and the winner re-verifies the lease is unchanged
       before renaming its claim into place — so a simultaneous
       cross-host steal has exactly one winner, and a stealer acting on
       stale observations aborts instead of clobbering the fresh lease.
       Honest limits: NFS clock skew still eats into the TTL margin, and
       renew() remains owner-only rename (a renew racing its own expiry
       can still lose to a steal) — crash-stop fencing, not Byzantine."""

    TTL = float(os.environ.get("ARER_WRITER_LEASE_TTL", "900"))

    def __init__(self, lake_dir: str):
        self.path = os.path.join(lake_dir, "_writer.lock")
        self.lease_path = os.path.join(lake_dir, "_writer.lease")
        self.owner = _writer_identity()

    STALE_CLAIM_SEC = 60.0  # a claim this old belongs to a crashed stealer

    def _read_lease(self) -> dict | None:
        import json

        try:
            with open(self.lease_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _read_lease_bytes(self) -> bytes | None:
        try:
            with open(self.lease_path, "rb") as f:
                return f.read()
        except OSError:
            return None

    def _my_lease_bytes(self) -> bytes:
        import json
        import time

        now = time.time()
        return json.dumps(
            {"owner": self.owner, "acquired_at": now, "expires_at": now + self.TTL}
        ).encode()

    def _link_create(self, target: str) -> bool:
        """POSIX create-if-absent CAS: hard-link a unique tmp onto `target`.
        Exactly one concurrent caller wins; returns False to losers."""
        import uuid

        tmp = f"{self.lease_path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(self._my_lease_bytes())
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            # NFS lost-reply guard: a retransmitted link() RPC whose first
            # reply was lost reports EEXIST even though OUR link succeeded —
            # the tmp's link count says which happened
            try:
                return os.stat(tmp).st_nlink == 2
            except OSError:
                return False
        finally:
            os.remove(tmp)

    def _steal_cas(self, observed: bytes) -> None:
        """Fenced steal of an expired/dead lease: one claim path per
        observed-lease digest, created by link() (exactly one winner),
        verified against the CURRENT lease bytes before the rename — a
        stealer holding a stale observation aborts instead of clobbering
        the fresh winner's lease."""
        import hashlib
        import time
        import uuid

        digest = hashlib.sha256(observed).hexdigest()[:16]
        claim = f"{self.lease_path}.steal-{digest}"
        # a crashed winner leaks its claim; reap it via atomic RENAME to a
        # unique name — exactly one reaper gets the inode, and the check is
        # redone AFTER the rename so a fresh rival claim that raced into the
        # same path is put back, never deleted (a bare stat+remove would be
        # a TOCTOU that deletes the rival's fresh claim and lets two
        # stealers win)
        try:
            if time.time() - os.stat(claim).st_mtime > self.STALE_CLAIM_SEC:
                reap = f"{claim}.reap.{os.getpid()}.{uuid.uuid4().hex[:8]}"
                os.rename(claim, reap)
                if time.time() - os.stat(reap).st_mtime > self.STALE_CLAIM_SEC:
                    os.remove(reap)  # genuinely stale — reaped
                else:
                    os.rename(reap, claim)  # raced a fresh claim: restore it
        except OSError:
            pass
        if not self._link_create(claim):
            raise RuntimeError(
                f"lost the steal race for {self.lease_path} (claim {digest} is taken)"
            )
        try:
            current = self._read_lease_bytes()
            if current is None:
                # the holder released cleanly between our read and our
                # claim: the lake is FREE — do not rename over a racing
                # first-writer's fresh lease; retire the claim and go
                # through create-if-absent like everyone else
                os.remove(claim)
                if self._link_create(self.lease_path):
                    return
                raise RuntimeError(
                    f"lease {self.lease_path} released during steal; lost the re-acquire race"
                )
            if current != observed:
                # the lease changed between our read and our claim: another
                # stealer (with an earlier observation) already won
                raise RuntimeError(
                    f"lease {self.lease_path} changed during steal; not clobbering"
                )
        except BaseException:
            try:
                os.remove(claim)
            except OSError:
                pass
            raise
        try:
            os.replace(claim, self.lease_path)  # consume the claim atomically
        except FileNotFoundError:
            raise RuntimeError(
                f"lost the steal race for {self.lease_path} (claim was reaped)"
            ) from None

    def _write_lease(self) -> None:
        import time

        from arches_rascoll_etl_ray.state.manifest import atomic_write_json

        now = time.time()
        atomic_write_json(
            self.lease_path,
            {"owner": self.owner, "acquired_at": now, "expires_at": now + self.TTL},
        )

    def _acquire_lease(self) -> None:
        import json
        import socket
        import time

        raw = self._read_lease_bytes()
        if raw is None:
            # no lease on disk: create-if-absent CAS (link, not rename —
            # two simultaneous first writers get exactly one winner)
            if self._link_create(self.lease_path):
                return
            raw = self._read_lease_bytes()
            if raw is None:  # the racing winner already released; once more
                if self._link_create(self.lease_path):
                    return
                raw = self._read_lease_bytes() or b""
        try:
            cur = json.loads(raw)
        except ValueError:
            cur = None  # corrupt lease: stealable via CAS on its raw bytes
        if cur is not None and cur.get("owner") == self.owner:
            self._write_lease()  # re-entrant refresh of our own lease
            return
        if cur is not None:
            expires = float(cur.get("expires_at", 0))
            if time.time() < expires:
                host, _, rest = str(cur.get("owner", "")).partition(":")
                pid_s = rest.partition(":")[0]
                same_host_dead = (
                    host == socket.gethostname()
                    and pid_s.isdigit()
                    and not _pid_alive(int(pid_s))
                )
                if not same_host_dead:
                    raise RuntimeError(
                        f"lake {os.path.dirname(self.lease_path)} is leased by "
                        f"{cur.get('owner')} until {expires:.0f}; one writer per lake"
                    )
        # expired, dead same-host holder, or corrupt: fenced steal
        self._steal_cas(raw)

    def renew(self) -> None:
        """Extend the held lease (called at epoch-group boundaries during
        long replays so the TTL never lapses mid-run)."""
        self._write_lease()

    def __enter__(self):
        import fcntl

        # "a" so a failed acquire never truncates the holder's pid record
        self._f = open(self.path, "a+")
        try:
            fcntl.flock(self._f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            self._f.close()
            raise RuntimeError(
                f"another writer holds {self.path}; one writer per lake at a time"
            ) from None
        try:
            self._acquire_lease()
        except BaseException:
            fcntl.flock(self._f, fcntl.LOCK_UN)
            self._f.close()
            raise
        self._f.seek(0)
        self._f.truncate()
        self._f.write(f"{os.getpid()}\n")
        self._f.flush()
        return self

    def __exit__(self, *exc):
        import fcntl

        # release the lease only if still ours (a cross-host steal after an
        # expiry must not have its fresh lease deleted by the old holder)
        cur = self._read_lease()
        if cur is not None and cur.get("owner") == self.owner:
            try:
                os.remove(self.lease_path)
            except OSError:
                pass
        fcntl.flock(self._f, fcntl.LOCK_UN)
        self._f.close()
        return False


class CDCEngine:
    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self._validate_lake_config()

    # ---------------------------------------------------------------- state

    def _lake_config_path(self) -> str:
        import os

        return os.path.join(self.cfg.lake_dir, "_lake_config.json")

    def _validate_lake_config(self) -> None:
        """num_partitions is part of the lake's physical identity — keys hash
        to partitions by it. Reopening with a different value would silently
        scatter keys across partitions (duplicate rows), so it is pinned at
        lake creation and validated on every open."""
        import json
        import os

        p = self._lake_config_path()
        if os.path.exists(p):
            with open(p) as f:
                stored = json.load(f)
            if stored["num_partitions"] != self.cfg.num_partitions:
                raise ValueError(
                    f"lake at {self.cfg.lake_dir} was created with "
                    f"num_partitions={stored['num_partitions']}; got "
                    f"{self.cfg.num_partitions}. Repartitioning requires a "
                    "full rewrite (not supported in-place)."
                )
        else:
            os.makedirs(self.cfg.lake_dir, exist_ok=True)
            from arches_rascoll_etl_ray.state.manifest import atomic_write_json

            atomic_write_json(p, {"num_partitions": self.cfg.num_partitions})

    def checkpoint(self, epoch: int | None = None) -> Checkpoint:
        """Latest committed checkpoint, or — with `epoch` — the exact
        committed checkpoint for that epoch (time travel; raises
        FileNotFoundError for never-committed or vacuumed epochs)."""
        if epoch is None:
            return load_latest_checkpoint(self.cfg.lake_dir)
        from arches_rascoll_etl_ray.state.checkpoint import load_checkpoint_at

        return load_checkpoint_at(self.cfg.lake_dir, epoch)

    # ---------------------------------------------------------------- epoch

    def bootstrap(self, snapshot, as_of_lsn: int) -> Checkpoint:
        """Initial load (the classic snapshot + CDC handoff): seed an EMPTY
        lake from an existing snapshot table captured at binlog position
        `as_of_lsn`, then tail the changelog normally — the bootstrap
        checkpoint commits `end_lsn = as_of_lsn`, so apply_epoch/replay/tail
        resume at (as_of_lsn, …] without re-reading history that predates
        the snapshot.

        `snapshot` is a parquet path (file/dir/list), a pyarrow Table, or a
        ray.data.Dataset with the lake's RAW base columns (repo, path,
        commit, lang, content) — one row per live key. A `lsn` column, if
        present (another lake's export), is PRESERVED — per-row commit
        positions make the handoff sha-equal to a full replay — and must
        not exceed as_of_lsn; absent, rows load at lsn=as_of_lsn.
        `content_sha`/`op` are always re-derived. Distributed one pass:
        read → the normal spill shuffle (every row becomes an op-'U' event)
        → one merge task per partition, committing through the same
        manifest/checkpoint protocol as any epoch — a crashed bootstrap
        re-runs idempotently WITH THE SAME as_of_lsn (content-addressed
        pieces overwrite, committed manifests no-op); re-bootstrapping with
        a different position needs a fresh lake dir. events_applied metrics
        count 1 (one distinct lsn by construction); `rows` carries the
        loaded cardinality.

        Reference analogue: the reference's one-shot full-table migration
        (arches_rascoll/ref_collection.py:201-248) IS this bootstrap; the
        continuous recast adds the handoff position."""
        import time as _time

        import numpy as np

        from arches_rascoll_etl_ray.stages.merge import delta_dir, make_normalize_spill_fn

        if as_of_lsn < 1:
            raise ValueError(f"as_of_lsn must be >= 1, got {as_of_lsn}")
        with _WriterLock(self.cfg.lake_dir) as wlock:
            ckpt = self.checkpoint()
            if ckpt.epoch != 0:
                raise ValueError(
                    f"bootstrap requires an empty lake (epoch 0); this lake is at "
                    f"epoch {ckpt.epoch} — replay into it or use a fresh lake_dir"
                )
            t0 = _time.perf_counter()
            epoch = 1
            if isinstance(snapshot, (str, list)):
                src = snapshot
                if isinstance(src, str) and os.path.isdir(src):
                    # an export_snapshot dir carries .done markers next to
                    # the data files — read only the parquet
                    src = sorted(
                        os.path.join(src, f)
                        for f in os.listdir(src)
                        if f.endswith(".parquet")
                    )
                    if not src:
                        raise ValueError(
                            f"no *.parquet files in snapshot dir {snapshot!r} — "
                            "bootstrap loads parquet only (a csv/jsonl export "
                            "must be converted first)"
                        )
                ds = ray.data.read_parquet(src)
            elif isinstance(snapshot, pa.Table):
                ds = ray.data.from_arrow(snapshot)
            else:
                ds = snapshot
            lsn_val = int(as_of_lsn)

            def to_events(t: pa.Table) -> pa.Table:
                drop = [c for c in ("content_sha", "op") if c in t.column_names]
                if drop:
                    t = t.drop_columns(drop)
                if "lsn" in t.column_names:
                    # another lake's export: per-row commit positions are
                    # real — preserving them makes the handoff land on the
                    # EXACT state (sha-equal) a full replay produces
                    if t.num_rows and pc.max(t["lsn"]).as_py() > lsn_val:
                        raise ValueError(
                            "snapshot contains lsn > as_of_lsn "
                            f"({pc.max(t['lsn']).as_py()} > {lsn_val}): the snapshot "
                            "was captured AFTER the claimed binlog position"
                        )
                else:
                    t = t.append_column(
                        "lsn", pa.array(np.full(t.num_rows, lsn_val, dtype=np.int64))
                    )
                return t.append_column("op", pa.array(["U"] * t.num_rows, pa.string()))

            spill = make_normalize_spill_fn(self.cfg, epoch, 0, as_of_lsn)
            stats = (
                ds.map_batches(to_events, batch_format="pyarrow")
                .map_batches(spill, batch_format="pyarrow", batch_size=None)
                .take_all()
            )
            touched = sorted({r["partition"] for r in stats})
            if not touched:
                from arches_rascoll_etl_ray.stages.merge import touched_parts_from_delta

                touched = touched_parts_from_delta(self.cfg, epoch)
            # a 100-TB initial load's spill alone can exceed the lease TTL —
            # renew before the merge fan-out (same rule as replay's groups)
            wlock.renew()
            manifests = self._merge_epoch(epoch, 0, as_of_lsn, touched, ckpt)
            rows = sum(m.rows for m in manifests)
            duration = _time.perf_counter() - t0
            new_ckpt = ckpt.advanced(
                epoch,
                as_of_lsn,
                manifests,
                evolution_version=(self.cfg.evolution.version if self.cfg.evolution else 1),
                metrics={
                    "epoch": epoch,
                    "bootstrap": True,
                    "as_of_lsn": as_of_lsn,
                    "rows_loaded": rows,
                    "duration_sec": round(duration, 3),
                    "partitions_touched": len(manifests),
                },
            )
            save_checkpoint(self.cfg.lake_dir, new_ckpt)
            self._cleanup_delta(epoch)
            logger.info(
                "bootstrap committed: %d rows as of lsn %d, %d partitions",
                rows, as_of_lsn, len(manifests),
            )
            return new_ckpt

    def apply_epoch(
        self,
        changelog_dir: str,
        max_events: int | None = None,
        end_lsn: int | None = None,
    ) -> Checkpoint:
        """Consume the next LSN slice of the change log and commit one epoch.

        Deterministic epoch boundaries: (ckpt.end_lsn, end_lsn] where end_lsn
        defaults to everything available (or start+max_events). Re-running a
        crashed epoch is safe — per-partition manifests make reapply a no-op.
        """
        # the checkpoint and epoch bounds are decision inputs — they must be
        # read INSIDE the lock, or a concurrent writer's commit between read
        # and lock would silently skip events (manifest idempotency would
        # no-op the re-run of its epoch number over a wider LSN range)
        with _WriterLock(self.cfg.lake_dir):
            return self._apply_next_epoch(changelog_dir, max_events=max_events, end_lsn=end_lsn)

    def _apply_next_epoch(
        self,
        changelog_dir: str,
        max_events: int | None = None,
        end_lsn: int | None = None,
    ) -> Checkpoint:
        """Lock-held body of apply_epoch: reads the checkpoint and computes
        the epoch bounds under the writer lock (read-inside-lock invariant)."""
        import time as _time

        ckpt = self.checkpoint()
        start_lsn = ckpt.end_lsn
        avail = max_available_lsn(changelog_dir)
        if end_lsn is None:
            end_lsn = avail if max_events is None else min(avail, start_lsn + max_events)
        if end_lsn <= start_lsn:
            return ckpt
        epoch = ckpt.epoch + 1
        t_epoch = _time.perf_counter()
        return self._apply_epoch_locked(
            changelog_dir, ckpt, epoch, start_lsn, end_lsn, t_epoch
        )

    def _apply_epoch_locked(
        self, changelog_dir: str, ckpt: Checkpoint, epoch: int, start_lsn: int, end_lsn: int, t_epoch: float
    ) -> Checkpoint:
        import time as _time

        if self.cfg.shuffle == "spill":
            touched = self._spill_epoch(changelog_dir, epoch, start_lsn, end_lsn)
            manifests = self._merge_epoch(epoch, start_lsn, end_lsn, touched, ckpt)
        else:
            ds = self._build_epoch_ds(changelog_dir, start_lsn, end_lsn)
            if ds is None:
                duration = _time.perf_counter() - t_epoch
                new_ckpt = ckpt.advanced(
                    epoch, end_lsn, [],
                    evolution_version=(self.cfg.evolution.version if self.cfg.evolution else 1),
                    metrics={"epoch": epoch, "events_applied": 0, "duration_sec": duration},
                )
                save_checkpoint(self.cfg.lake_dir, new_ckpt)
                return new_ckpt
            normalize = make_normalize_fn(self.cfg)
            lo, hi = start_lsn, end_lsn

            def slice_and_normalize(batch: pa.Table) -> pa.Table:
                lsn = batch["lsn"]
                mask = pc.and_(
                    pc.greater(lsn, pa.scalar(lo, pa.int64())),
                    pc.less_equal(lsn, pa.scalar(hi, pa.int64())),
                )
                return normalize(batch.filter(mask))  # empty-safe
            ds = ds.map_batches(
                slice_and_normalize, batch_format="pyarrow", batch_size=self.cfg.batch_size
            )
            manifests = self._run_sort_plan(ds, epoch, start_lsn, end_lsn, ckpt)
        duration = _time.perf_counter() - t_epoch
        events_applied = sum(m.events_applied for m in manifests)
        new_ckpt = ckpt.advanced(
            epoch,
            end_lsn,
            manifests,
            evolution_version=(self.cfg.evolution.version if self.cfg.evolution else 1),
            metrics={
                "epoch": epoch,
                "start_lsn": start_lsn,
                "end_lsn": end_lsn,
                "events_applied": events_applied,
                "duration_sec": round(duration, 3),
                "events_per_sec": round(events_applied / duration, 1) if duration > 0 else 0.0,
                "partitions_touched": len(manifests),
            },
        )
        save_checkpoint(self.cfg.lake_dir, new_ckpt)
        self._cleanup_delta(epoch)
        logger.info(
            "epoch %d committed: lsn (%d, %d], %d partitions touched",
            epoch, start_lsn, end_lsn, len(manifests),
        )
        return new_ckpt

    def _run_sort_plan(self, ds, epoch: int, start_lsn: int, end_lsn: int, ckpt: Checkpoint):
        """groupby('_part') through Ray's sort shuffle (optionally salted
        two-stage for hot keys)."""
        from arches_rascoll_etl_ray.stages.merge import make_merge_fn, manifest_from_stats_row

        if self.cfg.salt_partitions > 1:
            ds = ds.groupby(["_part", "_salt"]).map_groups(
                make_salted_reduce_fn(), batch_format="pyarrow"
            )
        merge = make_merge_fn(self.cfg, epoch, start_lsn, end_lsn, ckpt.partitions)
        stats = ds.groupby("_part").map_groups(merge, batch_format="pyarrow").take_all()
        return [manifest_from_stats_row(r, start_lsn, end_lsn) for r in stats]

    def _build_epoch_ds(self, changelog_dir: str, start_lsn: int, end_lsn: int):
        files = shards_for_range(changelog_dir, start_lsn, end_lsn)
        if not files:
            # a WAL gap (log compaction clusters survivors at high LSNs;
            # redaction/retention can empty whole ranges) makes an epoch
            # with zero events — a valid empty epoch, not an error
            return None
        # Block size: ≤64 MiB (a data property — at 100 TB this dominates and
        # block count is huge regardless of cluster size), but when an
        # epoch's bytes are SMALLER than 64 MiB × cores the fixed target
        # would cap parallelism below the cluster (measured: a 350 MB epoch
        # became 6 read tasks — identical wall time at 8 and 32 CPUs). So
        # the target also shrinks to fill ~2 waves per core, floored at
        # 4 MiB so tiny epochs don't shatter into confetti.
        if files and files[0].endswith(".parquet"):
            total_bytes = sum(os.path.getsize(f) for f in files)
            env = os.environ.get("ARER_BLOCK_BYTES")
            if env:
                target = int(env)
            else:
                cores = max(1, int(ray.cluster_resources().get("CPU", 8)))
                target = max(4 * 1024 * 1024, min(64 * 1024 * 1024, total_bytes // (2 * cores)))
            needed = max(1, -(-total_bytes // target))
            # cap at one task per file when the file count already provides
            # the parallelism: requesting MORE blocks than files makes Ray
            # append a SplitBlocks op, which un-fuses the read from the
            # downstream map and round-trips every byte through the object
            # store (measured 3.4× slower than the fused read)
            cores = max(1, int(ray.cluster_resources().get("CPU", 8)))
            if len(files) >= min(needed, 2 * cores):
                needed = min(needed, len(files))
            return ray.data.read_parquet(files, override_num_blocks=needed)
        return read_shard_dataset(files)

    def _spill_epoch(self, changelog_dir: str, epoch: int, start_lsn: int, end_lsn: int) -> list[int]:
        """Map side of the spill plan for one epoch. Depends only on the
        deterministic LSN slice — NOT on any prior epoch's merge state — so
        it can run concurrently with the previous epoch's merge (pipelined
        replay). Returns the touched partition ids."""
        from arches_rascoll_etl_ray.stages.merge import delta_dir, make_normalize_spill_fn

        ds = self._build_epoch_ds(changelog_dir, start_lsn, end_lsn)
        if ds is None:
            spill_stats = []  # WAL gap: valid empty epoch
        else:
            spill = make_normalize_spill_fn(self.cfg, epoch, start_lsn, end_lsn)
            # batch_size=None → one spill call per block: fewest, largest pieces
            spill_stats = ds.map_batches(spill, batch_format="pyarrow", batch_size=None).take_all()
        touched = sorted({r["partition"] for r in spill_stats})
        if not touched:
            # pieces may exist from a crashed prior attempt of this epoch
            from arches_rascoll_etl_ray.stages.merge import touched_parts_from_delta

            touched = touched_parts_from_delta(self.cfg, epoch)
        return touched

    def _merge_epoch(
        self, epoch: int, start_lsn: int, end_lsn: int, touched: list[int], ckpt: Checkpoint
    ) -> list[PartitionManifest]:
        import ray as _ray

        from arches_rascoll_etl_ray.stages.merge import merge_partition_from_pieces

        # retry_exceptions: transient app-level failures (fs hiccups, OOM
        # kills surfacing as exceptions) retry safely — the per-(partition,
        # epoch) manifest makes any re-run a no-op
        merge_task = _ray.remote(num_cpus=1, max_retries=3, retry_exceptions=True)(
            merge_partition_from_pieces
        )
        refs = [
            merge_task.remote(self.cfg, epoch, start_lsn, end_lsn, ckpt.partitions.get(p), p)
            for p in touched
        ]
        return _ray.get(refs)

    def _cleanup_delta(self, epoch: int) -> None:
        """Post-commit piece removal — safe to run concurrently with the
        next epoch (pieces are per-epoch dirs), so don't stall the driver."""
        import shutil
        import threading

        d = delta_dir_for(self.cfg, epoch)
        threading.Thread(target=shutil.rmtree, args=(d,), kwargs={"ignore_errors": True}, daemon=True).start()

    def replay(
        self,
        changelog_dir: str,
        events_per_epoch: int | None = None,
        pipelined: bool | str = "auto",
        on_commit=None,
    ) -> Checkpoint:
        """Tail the log to exhaustion in deterministic epochs.

        With the spill plan and multiple epochs, the MAP side is BATCHED:
        up to `spill_lookahead` consecutive epochs spill in ONE Dataset
        execution (the spill fn routes rows to per-(epoch, partition) piece
        dirs, never combining across an epoch boundary — each epoch's pieces
        stay byte-identical to a per-epoch spill). This amortizes the
        streaming executor's fixed startup across epochs and keeps the read
        at full parallelism; merges then commit strictly in epoch order. A
        crash mid-group leaves future epochs' pieces on disk — harmless:
        the resume's deterministic re-spill overwrites identical bytes and
        the manifest LSN-range check guards reslicing."""
        import time as _time

        # lock FIRST, then read the checkpoint and compute bounds — a writer
        # committing between an unlocked read and the flock would cause
        # epoch-number reuse over stale bounds (read-inside-lock invariant,
        # same rule as apply_epoch)
        with _WriterLock(self.cfg.lake_dir) as wlock:
            ckpt = self.checkpoint()
            avail = max_available_lsn(changelog_dir)
            bounds: list[tuple[int, int]] = []
            s = ckpt.end_lsn
            while s < avail:
                e = avail if events_per_epoch is None else min(avail, s + events_per_epoch)
                bounds.append((s, e))
                s = e
            if not bounds:
                return ckpt
            if pipelined == "auto":
                pipelined = len(bounds) >= 2
            if not pipelined or self.cfg.shuffle != "spill":
                while ckpt.end_lsn < avail:
                    ckpt = self._apply_next_epoch(changelog_dir, max_events=events_per_epoch)
                    if on_commit is not None:
                        on_commit(self, ckpt)
                    # renew right after the hook: a slow consumer must not
                    # let the lease TTL lapse mid-replay
                    wlock.renew()
                    avail = max_available_lsn(changelog_dir)
                return ckpt
            return self._replay_batched_spill(
                changelog_dir, ckpt, bounds, wlock=wlock, on_commit=on_commit
            )

    # how many epochs one spill execution covers: bounds delta-storage
    # footprint to `lookahead` epochs of pieces while amortizing executor
    # startup. Override with ARER_SPILL_LOOKAHEAD.
    _SPILL_LOOKAHEAD = 8

    def _replay_batched_spill(
        self,
        changelog_dir: str,
        ckpt: Checkpoint,
        bounds: list[tuple[int, int]],
        wlock=None,
        on_commit=None,
    ) -> Checkpoint:
        """Group-spill + in-order merges; the writer lock is already held."""
        import time as _time

        from arches_rascoll_etl_ray.stages.merge import (
            delta_dir,
            make_multi_epoch_spill_fn,
            touched_parts_from_delta,
        )

        lookahead = int(os.environ.get("ARER_SPILL_LOOKAHEAD", str(self._SPILL_LOOKAHEAD)))
        i = 0
        while i < len(bounds):
            if wlock is not None:
                wlock.renew()  # the lease TTL never lapses mid-replay
            group = bounds[i : i + lookahead]
            i += len(group)
            epoch_bounds = [
                (ckpt.epoch + 1 + j, s, e) for j, (s, e) in enumerate(group)
            ]
            t_group = _time.perf_counter()
            ds = self._build_epoch_ds(changelog_dir, group[0][0], group[-1][1])
            if ds is None:
                stats = []  # WAL gap: every epoch in the group is empty
            else:
                spill = make_multi_epoch_spill_fn(self.cfg, epoch_bounds)
                stats = ds.map_batches(spill, batch_format="pyarrow", batch_size=None).take_all()
            spill_sec = _time.perf_counter() - t_group
            touched_by_epoch: dict[int, set[int]] = {ep: set() for ep, _, _ in epoch_bounds}
            for r in stats:
                touched_by_epoch[r["epoch"]].add(r["partition"])
            for epoch, _, _ in epoch_bounds:
                if not touched_by_epoch[epoch]:
                    # pieces may exist from a crashed prior attempt
                    touched_by_epoch[epoch] = set(
                        touched_parts_from_delta(self.cfg, epoch)
                    )

            # one chain task per partition applies that partition's touched
            # epochs in order — partitions never wait on each other at epoch
            # boundaries (no global barrier between epochs)
            manifests_by_epoch = self._merge_epoch_chains(
                epoch_bounds, touched_by_epoch, ckpt
            )
            t_merge = _time.perf_counter()
            for epoch, start_lsn, end_lsn in epoch_bounds:
                manifests = manifests_by_epoch[epoch]
                events_applied = sum(m.events_applied for m in manifests)
                ckpt = ckpt.advanced(
                    epoch,
                    end_lsn,
                    manifests,
                    evolution_version=(self.cfg.evolution.version if self.cfg.evolution else 1),
                    metrics={
                        "epoch": epoch,
                        "start_lsn": start_lsn,
                        "end_lsn": end_lsn,
                        "events_applied": events_applied,
                        "spill_group_sec": round(spill_sec, 3),
                        "merge_group_sec": round(t_merge - t_group - spill_sec, 3),
                        "spill_group_epochs": len(epoch_bounds),
                        "partitions_touched": len(manifests),
                    },
                )
                save_checkpoint(self.cfg.lake_dir, ckpt)
                self._cleanup_delta(epoch)
                if on_commit is not None:
                    on_commit(self, ckpt)
                    if wlock is not None:
                        # a slow consumer hook (e.g. a full index rebuild
                        # after vacuum) must not outlive the lease TTL
                        wlock.renew()
        return ckpt

    def _merge_epoch_chains(
        self,
        epoch_bounds: list[tuple[int, int, int]],
        touched_by_epoch: dict[int, set[int]],
        ckpt: Checkpoint,
    ) -> dict[int, list[PartitionManifest]]:
        import ray as _ray

        from arches_rascoll_etl_ray.stages.merge import merge_partition_epoch_chain

        chain_task = _ray.remote(num_cpus=1, max_retries=3, retry_exceptions=True)(
            merge_partition_epoch_chain
        )
        parts = sorted(set().union(*touched_by_epoch.values())) if touched_by_epoch else []
        refs = []
        chain_epochs: list[list[tuple[int, int, int]]] = []
        for p in parts:
            eb = [b for b in epoch_bounds if p in touched_by_epoch[b[0]]]
            chain_epochs.append(eb)
            refs.append(chain_task.remote(self.cfg, eb, ckpt.partitions.get(p), p))
        out: dict[int, list[PartitionManifest]] = {ep: [] for ep, _, _ in epoch_bounds}
        for eb, manifests in zip(chain_epochs, _ray.get(refs)):
            for (epoch, _, _), m in zip(eb, manifests):
                out[epoch].append(m)
        return out

    def tail(
        self,
        changelog_dir: str,
        poll_interval_s: float = 1.0,
        idle_polls: int = 3,
        events_per_epoch: int | None = None,
        on_commit=None,
    ) -> Checkpoint:
        """Continuous binlog tail: apply new epochs as shards appear; stop
        after `idle_polls` consecutive polls with no new LSNs (the
        micro-batch CDC loop — each poll that finds data commits ≥1 epoch).

        `on_commit(engine, checkpoint)`, if given, runs after EVERY
        committed epoch (inside replay's catch-up loop, not once per poll)
        — the hook where downstream consumers stay live during the tail
        (SecondaryIndex.sync, incremental.sync_view, replication). Per
        epoch matters: a producer writing faster than one poll drains
        keeps replay catching up internally, and a per-poll hook would be
        starved exactly when the tail is busiest. The hook runs with the
        writer lock held, so it must not write to THIS lake (reads,
        changefeeds, and writes to its own state are fine). A hook
        exception stops the tail (the epoch is already committed; every
        consumer in this repo re-syncs idempotently from its own
        watermark). The lease is renewed immediately after each hook
        return, so a single hook invocation must complete within the
        lease TTL (default 900 s) to keep cross-host mutual exclusion."""
        import time as _time

        idle = 0
        ckpt = self.checkpoint()
        while idle < idle_polls:
            avail = max_available_lsn(changelog_dir)
            if avail > ckpt.end_lsn:
                idle = 0
                ckpt = self.replay(
                    changelog_dir, events_per_epoch=events_per_epoch, on_commit=on_commit
                )
            else:
                idle += 1
                _time.sleep(poll_interval_s)
        return ckpt

    # ------------------------------------------------------------- snapshot

    def snapshot_files(self, epoch: int | None = None) -> list[str]:
        import os

        ckpt = self.checkpoint(epoch)
        return [
            os.path.join(self.cfg.lake_dir, info["data_file"])
            for _, info in sorted(ckpt.partitions.items())
            if info["data_file"] and info["rows"] > 0
        ]

    def _has_runs(self, ckpt: Checkpoint | None = None) -> bool:
        ckpt = ckpt if ckpt is not None else self.checkpoint()
        return any(i.get("runs") for i in ckpt.partitions.values())

    def snapshot_dataset(
        self, epoch: int | None = None, columns: list[str] | None = None
    ) -> ray.data.Dataset:
        """The lake table as a streaming Dataset — latest by default, or AS
        OF a committed `epoch` (time travel over retained checkpoints; the
        horizon is 'since the last vacuum'). Fast path (no LSM runs): a
        plain partition-pruned read_parquet. With pending runs: one fold
        task per partition (from_items → map_batches(batch_size=1)), each
        reading its base+runs and LWW-folding them. Historical snapshots
        are projected through the CURRENT evolution spec, like every other
        read.

        `columns` prunes the read ("prune at the read"): on the
        no-evolution fast path it reaches read_parquet's footer-level
        projection, so unrequested columns (the content payload, usually)
        never leave storage; under an evolution spec or pending LSM runs
        the projection/fold needs the raw rows, so pruning applies right
        after — unrequested bytes still never cross a second operator."""
        from arches_rascoll_etl_ray.stages.merge import empty_lake_table
        from arches_rascoll_etl_ray.stages.normalize import apply_evolution

        if columns is not None:
            bad = [c for c in columns if c not in lake_columns(self.cfg)]
            if bad:
                raise ValueError(f"unknown snapshot columns {bad!r}")

        ckpt = self.checkpoint(epoch)
        if not self._has_runs(ckpt):
            files = self.snapshot_files(epoch)
            if not files:
                ds = ray.data.from_arrow(empty_lake_table(self.cfg))
                return ds.select_columns(columns) if columns else ds
            if self.cfg.evolution is not None:
                # partitions untouched since a spec change still carry the
                # old schema on disk — project every block forward (raw
                # columns feed renames/computed cols, so prune AFTER)
                spec = self.cfg.evolution
                cols = columns or lake_columns(self.cfg)
                return ray.data.read_parquet(files).map_batches(
                    lambda t: apply_evolution(t, spec).select(cols), batch_format="pyarrow"
                )
            return ray.data.read_parquet(files, columns=columns)

        from arches_rascoll_etl_ray.stages.merge import fold_partition_tables, read_partition_state

        cfg = self.cfg
        items = [
            {"part": part, "info_json": __import__("json").dumps(info)}
            for part, info in sorted(ckpt.partitions.items())
            if info.get("data_file") or info.get("runs")
        ]

        def fold_one(batch) -> pa.Table:
            import json as _json

            info = _json.loads(batch["info_json"][0])
            t = fold_partition_tables(cfg, read_partition_state(cfg, info))
            return t.select(columns) if columns else t

        return ray.data.from_items(items).map_batches(
            fold_one, batch_size=1, batch_format="pandas"
        )

    def snapshot_table(self, sort: bool = True, epoch: int | None = None) -> pa.Table:
        """Materialized snapshot (tests / small results only); `epoch` reads
        AS OF that committed epoch (see snapshot_dataset)."""
        import pyarrow.parquet as pq

        from arches_rascoll_etl_ray.stages.merge import empty_lake_table
        from arches_rascoll_etl_ray.stages.normalize import apply_evolution

        cols = lake_columns(self.cfg)
        ckpt = self.checkpoint(epoch)
        if self._has_runs(ckpt):
            from arches_rascoll_etl_ray.stages.merge import fold_partition_tables, read_partition_state

            parts = [
                fold_partition_tables(self.cfg, read_partition_state(self.cfg, info))
                for _, info in sorted(ckpt.partitions.items())
                if info.get("data_file") or info.get("runs")
            ]
            parts = [t for t in parts if t.num_rows > 0]
            tbl = (
                pa.concat_tables(parts, promote_options="permissive")
                if parts
                else empty_lake_table(self.cfg)
            )
        else:
            files = self.snapshot_files(epoch)
            if not files:
                return empty_lake_table(self.cfg)
            tbl = pa.concat_tables(
                [apply_evolution(pq.read_table(f), self.cfg.evolution).select(cols) for f in files],
                promote_options="permissive",
            )
        if sort:
            tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("repo", "ascending"), ("path", "ascending")]))
        return tbl

    def snapshot_sha256(self, epoch: int | None = None) -> str:
        """Replay-stable digest of the whole lake (optionally AS OF a
        committed `epoch`). Fast path: per-partition manifest shas (no data
        read). Partitions with uncompacted LSM runs have no manifest sha
        yet — those are folded and digested on the fly (equal digests ⇒
        equal tables either way)."""
        from arches_rascoll_etl_ray.functions.hashing import table_content_sha256
        from arches_rascoll_etl_ray.stages.merge import (
            evolved_content_col,
            fold_partition_tables,
            read_partition_state,
        )

        from arches_rascoll_etl_ray.stages.merge import spec_version

        ckpt = self.checkpoint(epoch)
        current_v = spec_version(self.cfg)
        h = hashlib.sha256()
        for part in sorted(ckpt.partitions):
            info = ckpt.partitions[part]
            if (
                info.get("runs")
                or not info.get("content_sha")
                or info.get("evolution_version", 1) != current_v
            ):
                folded = fold_partition_tables(self.cfg, read_partition_state(self.cfg, info))
                if folded.num_rows == 0:
                    continue
                sha_cols = [c for c in folded.column_names if c != evolved_content_col(self.cfg)]
                h.update(f"{part}:{table_content_sha256(folded, sha_cols)}\n".encode())
            elif info["rows"] > 0:
                h.update(f"{part}:{info['content_sha']}\n".encode())
        return h.hexdigest()

    def quarantine_dataset(self) -> ray.data.Dataset:
        """The dead-letter table: malformed events routed aside by
        `EngineConfig.quarantine_invalid` (raw event schema, never folded).
        Empty (schema-correct) when nothing was quarantined."""
        import glob as _glob

        from arches_rascoll_etl_ray.config import EVENT_SCHEMA

        files = sorted(_glob.glob(os.path.join(self.cfg.lake_dir, "_quarantine", "*.parquet")))
        if not files:
            return ray.data.from_arrow(
                pa.table({f.name: pa.array([], f.type) for f in EVENT_SCHEMA})
            )
        return ray.data.read_parquet(files)

    def lookup(self, repo: str, path: str, epoch: int | None = None) -> pa.Table:
        """Point read of one key's live row (optionally AS OF an epoch):
        the key hashes to exactly one partition — the same `key_hash64 % P`
        the write path uses — so a lookup folds ONE partition's state and
        never touches the other P-1, O(table/P) instead of O(table).
        Returns an empty (schema-correct) table when the key is absent or
        tombstoned. Reference analogue: the reference's per-key dict
        access after its fold (arches_rascoll/ref_collection.py:142),
        recast as a partition-pruned lake read."""
        import numpy as np

        from arches_rascoll_etl_ray.functions.hashing import key_hash64
        from arches_rascoll_etl_ray.stages.merge import (
            empty_lake_table,
            fold_partition_tables,
        )

        kh = key_hash64(pa.table({"repo": pa.array([repo]), "path": pa.array([path])}))
        part = int(kh[0] % np.uint64(self.cfg.num_partitions))
        info = self.checkpoint(epoch).partitions.get(part)
        if not info:
            return empty_lake_table(self.cfg)
        # predicate pushdown: partition files are key-sorted, so the key's
        # rows sit in one row group — the filtered read prunes the rest via
        # parquet statistics. LWW-folding only this key's rows is exact
        # (the fold is per-key).
        import pyarrow.parquet as _pq

        filters = [("repo", "=", repo), ("path", "=", path)]
        tables = []
        names = ([info["data_file"]] if info.get("data_file") else []) + list(
            info.get("runs") or []
        )
        for name in names:
            tables.append(
                _pq.read_table(os.path.join(self.cfg.lake_dir, name), filters=filters)
            )
        folded = fold_partition_tables(self.cfg, tables)
        return folded.filter(
            pc.and_(pc.equal(folded["repo"], repo), pc.equal(folded["path"], path))
        )

    def changefeed(self, from_epoch: int, to_epoch: int | None = None) -> ray.data.Dataset:
        """Delta stream (changefeed) between two committed epochs: one row
        per key whose live state changed, op ∈ {'I','U','D'}, with before-
        (`old_*`) and after- (`new_*`) images of every lake value column
        (schema: stages.merge.changefeed_schema).

        Partition-aligned — NO shuffle: each Ray task reads only its own
        partition's state at both horizons and diffs by key, and a partition
        whose committed manifest is byte-identical at both epochs is skipped
        without any I/O, so a quiet epoch's feed costs only the partitions it
        touched. `from_epoch=0` is the empty lake (the feed is the full
        snapshot as inserts). Both horizons are projected through the
        CURRENT evolution spec, like every other read.

        Reference analogue: the reference's one-shot ETL has no delta
        output; this is the CDC-native extension (downstream sync /
        incremental-view feed) the north star's continuous recast implies.
        """
        import json as _json

        from arches_rascoll_etl_ray.stages.merge import changefeed_schema

        ck0 = self.checkpoint(from_epoch)
        ck1 = self.checkpoint(to_epoch)
        cfg = self.cfg
        items = []
        for p in sorted(set(ck0.partitions) | set(ck1.partitions)):
            i0, i1 = ck0.partitions.get(p), ck1.partitions.get(p)
            if i0 == i1:
                continue  # untouched partition: identical manifest, zero I/O
            items.append({"part": p, "old": _json.dumps(i0), "new": _json.dumps(i1)})
        schema = changefeed_schema(cfg)
        if not items:
            return ray.data.from_arrow(
                pa.table({f.name: pa.array([], f.type) for f in schema})
            )

        def diff_one(batch) -> pa.Table:
            from arches_rascoll_etl_ray.stages.merge import (
                diff_partition_states,
                empty_lake_table,
                fold_partition_tables,
                read_partition_state,
            )

            def fold(txt: str) -> pa.Table:
                info = _json.loads(txt)
                if not info:
                    return empty_lake_table(cfg)
                return fold_partition_tables(cfg, read_partition_state(cfg, info))

            return diff_partition_states(cfg, fold(batch["old"][0]), fold(batch["new"][0]))

        return ray.data.from_items(items).map_batches(
            diff_one, batch_size=1, batch_format="pandas"
        )

    def compact(self) -> int:
        """Explicit full compaction (LSM): fold every partition that has
        pending runs into a fresh base via one Ray task per partition, and
        commit the result as a new epoch (same end_lsn, zero events).
        Returns the number of partitions compacted."""
        import ray as _ray

        from arches_rascoll_etl_ray.stages.merge import compact_partition, spec_version

        with _WriterLock(self.cfg.lake_dir) as wlock:
            ckpt = self.checkpoint()
            current_v = spec_version(self.cfg)
            todo = [
                (part, info)
                for part, info in sorted(ckpt.partitions.items())
                if info.get("runs")
                # stale-evolution partitions rewrite to the current spec so
                # snapshot digests stop re-folding them on every call
                or (info.get("data_file") and info.get("evolution_version", 1) != current_v)
            ]
            if not todo:
                return 0
            epoch = ckpt.epoch + 1
            task = _ray.remote(num_cpus=1, max_retries=3, retry_exceptions=True)(compact_partition)
            refs = [task.remote(self.cfg, epoch, ckpt.end_lsn, info, part) for part, info in todo]
            # bounded waves + lease renewal, like expire — a whole-lake
            # compaction can run past the lease TTL
            manifests = []
            while refs:
                done, refs = _ray.wait(refs, num_returns=min(64, len(refs)))
                manifests.extend(_ray.get(done))
                wlock.renew()
            new_ckpt = ckpt.advanced(epoch, ckpt.end_lsn, manifests)
            save_checkpoint(self.cfg.lake_dir, new_ckpt)
        return len(manifests)

    def expire(self, min_lsn: int) -> int:
        """Retention (TTL by commit position): drop every live row whose
        lsn < min_lsn — rows not written since the horizon — and commit the
        rewrite as a new epoch (zero events; end_lsn unchanged). One Ray
        task per partition; partitions whose parquet footer statistics
        prove min(lsn) >= min_lsn are skipped without reading data.
        Returns the number of rows dropped. Expired rows also disappear
        from the changefeed as op-'D' deltas across the expire epoch, so
        downstream views/replicas/indexes converge through their normal
        sync. Reference analogue: the reference's whole-staging-table
        truncate-and-reload (arches_rascoll/ref_collection.py:201-248) —
        recast as an incremental horizon."""
        import ray as _ray

        from arches_rascoll_etl_ray.stages.merge import expire_partition

        with _WriterLock(self.cfg.lake_dir) as wlock:
            ckpt = self.checkpoint()
            todo = [
                (part, info)
                for part, info in sorted(ckpt.partitions.items())
                if info.get("data_file") or info.get("runs")
            ]
            if not todo:
                return 0
            epoch = ckpt.epoch + 1
            task = _ray.remote(num_cpus=1, max_retries=3, retry_exceptions=True)(expire_partition)
            refs = [
                task.remote(self.cfg, epoch, ckpt.end_lsn, info, part, min_lsn)
                for part, info in todo
            ]
            # harvest in bounded waves, renewing the lease between them — a
            # whole-lake retention rewrite can run far past the lease TTL
            results = []
            while refs:
                done, refs = _ray.wait(refs, num_returns=min(64, len(refs)))
                results.extend(r for r in _ray.get(done) if r is not None)
                wlock.renew()
            if not results:
                return 0
            manifests = [m for m, _ in results]
            dropped = sum(d for _, d in results)
            new_ckpt = ckpt.advanced(
                epoch, ckpt.end_lsn, manifests,
                metrics={"epoch": epoch, "expire_min_lsn": min_lsn,
                         "rows_dropped": dropped,
                         "partitions_rewritten": len(manifests)},
            )
            save_checkpoint(self.cfg.lake_dir, new_ckpt)
        return dropped

    def forget(self, keys: list[tuple[str, str]]) -> int:
        """GDPR-style key erasure (right to be forgotten): remove each
        (repo, path) key's live row from the lake AND persist the erasure
        in ``_forgotten_keys.json`` with cutoff = the current end_lsn, so
        every future replay / repair-rebuild / bootstrap drops that key's
        events at ingest — erased data cannot resurrect from the changelog.
        An event NEWER than the cutoff re-admits the key (erasure applies
        to history up to the erasure point, so from-scratch replay and the
        incremental lake still reconverge to the same sha).

        Commit shape: the ban list is persisted FIRST (a crash between the
        save and the rewrite is healed by re-running forget — the rewrite
        is idempotent and the list append deduplicates), then one Ray task
        per affected partition rewrites it expire-style (runs folded,
        manifest rows/content_sha recomputed, so fsck stays green and
        repair verifies the post-erasure state). The rewrite applies the
        FULL persisted list, so it also heals any earlier crashed erasure
        whose keys route to the same partitions. Downstream views/replicas
        see the removal as op-'D' changefeed deltas across the forget
        epoch, exactly like expire.

        Documented limits: snapshots/branches taken and time-travel pins
        recorded BEFORE the erasure still reference the old data files —
        `vacuum()` them per your retention policy (forget + vacuum leaves
        no erased-key bytes in any retained data file, pinned in
        tests/test_forget.py); the WAL's own bytes are scrubbed with
        `sources.changelog.redact_changelog(clog_dir, entries)` — after
        redaction a replay needs no ban list at all. Returns the number of
        live rows erased."""
        import numpy as _np
        import ray as _ray

        from arches_rascoll_etl_ray.functions.hashing import key_hash64
        from arches_rascoll_etl_ray.stages.merge import forget_partition
        from arches_rascoll_etl_ray.stages.normalize import load_forget_list, save_forget_list

        if not keys:
            return 0
        with _WriterLock(self.cfg.lake_dir) as wlock:
            ckpt = self.checkpoint()
            cutoff = ckpt.end_lsn
            entries = load_forget_list(self.cfg.lake_dir)
            have = {(e["repo"], e["path"]) for e in entries}
            entries += [
                {"repo": r, "path": p, "lsn": cutoff}
                for r, p in dict.fromkeys(keys)
                if (r, p) not in have
            ]
            save_forget_list(self.cfg.lake_dir, entries)  # the ban commits first

            kt = pa.table(
                {
                    "repo": pa.array([r for r, _ in keys], pa.string()),
                    "path": pa.array([p for _, p in keys], pa.string()),
                }
            )
            kh = key_hash64(kt)
            parts = sorted(set((kh % _np.uint64(self.cfg.num_partitions)).tolist()))
            todo = [
                (p, ckpt.partitions[p])
                for p in parts
                if p in ckpt.partitions
                and (ckpt.partitions[p].get("data_file") or ckpt.partitions[p].get("runs"))
            ]
            if not todo:
                return 0
            epoch = ckpt.epoch + 1
            task = _ray.remote(num_cpus=1, max_retries=3, retry_exceptions=True)(forget_partition)
            refs = [
                task.remote(self.cfg, epoch, ckpt.end_lsn, info, part, entries)
                for part, info in todo
            ]
            results = []
            while refs:
                done, refs = _ray.wait(refs, num_returns=min(64, len(refs)))
                results.extend(_ray.get(done))
                wlock.renew()
            manifests = [m for m, _ in results]
            erased = sum(d for _, d in results)
            new_ckpt = ckpt.advanced(
                epoch, ckpt.end_lsn, manifests,
                metrics={"epoch": epoch, "forget_keys": len(keys),
                         "rows_erased": erased,
                         "partitions_rewritten": len(manifests)},
            )
            save_checkpoint(self.cfg.lake_dir, new_ckpt)
        return erased

    # --------------------------------------------------------------- admin

    def metrics_history(self) -> list[dict]:
        """Per-epoch metrics from every retained checkpoint, ascending by
        epoch (the throughput/lineage time series; horizon = since the last
        vacuum, which trims non-latest checkpoints). Each entry is
        {"epoch": N, **that epoch's commit-time metrics} — the metric KEYS
        depend on what committed the epoch: replay/apply_epoch epochs carry
        events_applied/duration_sec/events_per_sec/partitions_touched,
        expire epochs carry expire_min_lsn/rows_dropped, compact epochs
        carry no metrics — so consumers should .get() keys, not index."""
        import json as _json

        from arches_rascoll_etl_ray.state.checkpoint import list_checkpoints

        out = []
        for epoch, path in list_checkpoints(self.cfg.lake_dir):
            try:
                with open(path) as f:
                    ck = _json.load(f)
            except (OSError, _json.JSONDecodeError):
                continue  # torn write: same tolerance as load_latest_checkpoint
            out.append({"epoch": epoch, **(ck.get("metrics") or {})})
        return out

    def lag(self, changelog_dir: str) -> dict:
        """Throughput/lag metrics surface (north-star lineage requirement)."""
        ckpt = self.checkpoint()
        avail = max_available_lsn(changelog_dir)
        return {
            "epoch": ckpt.epoch,
            "applied_end_lsn": ckpt.end_lsn,
            "available_lsn": avail,
            "lag_events": max(0, avail - ckpt.end_lsn),
            "partitions": len(ckpt.partitions),
            "rows": sum(i["rows"] for i in ckpt.partitions.values()),
        }

    def repartition_to(self, new_lake_dir: str, num_partitions: int) -> "CDCEngine":
        """Online partition-count migration: rebuild this lake's live state
        into a NEW lake with `num_partitions` partitions and hand back an
        engine positioned to keep tailing the same changelog where this one
        left off. The growth path when the cluster scales out and the
        original partition count (pinned by `_lake_config.json` — reopening
        with a different count raises by design) no longer provides enough
        merge parallelism.

        Composition, not new machinery: `snapshot_dataset()` streams the
        live rows WITH their per-row commit lsns, and `bootstrap(...,
        as_of_lsn=end_lsn)` routes them through the normal spill shuffle +
        per-partition merge into the new layout — one distributed pass,
        crash-idempotent via the same manifest/checkpoint protocol, after
        which `snapshot_table()` (the globally key-sorted live table) is
        unchanged row-for-row and replay resumes at end_lsn+1. NB
        `snapshot_sha256()` digests per-PARTITION shas, so it is comparable
        only between lakes of the same partition count — continued replay
        on the migrated lake lands on the identical sha a from-scratch
        replay at the new count produces (pinned in tests).
        The new lake starts at epoch 1 with a fresh history horizon
        (time-travel to pre-migration epochs stays with the old lake, the
        vacuum rule). The old lake is left untouched — cut over by pointing
        writers at the new dir, keep the old as the rollback.

        Changefeed-derived consumers (SecondaryIndex, IncrementalJoinView,
        IncrementalNearDup, replicas) watermark against the SOURCE lake's
        epoch history, which does not carry over — re-create them against
        the migrated lake (their first sync is the usual full build)."""
        import dataclasses

        ckpt = self.checkpoint()
        if ckpt.end_lsn < 1:
            raise ValueError("repartition_to: source lake is empty (nothing to migrate)")
        if num_partitions == self.cfg.num_partitions:
            raise ValueError(
                f"repartition_to: target partition count equals the current "
                f"({num_partitions}) — nothing to do"
            )
        new_cfg = dataclasses.replace(
            self.cfg, lake_dir=new_lake_dir, num_partitions=num_partitions
        )
        dst = CDCEngine(new_cfg)
        dst.bootstrap(self.snapshot_dataset(), as_of_lsn=ckpt.end_lsn)
        return dst

    def branch(self, new_lake_dir: str, epoch: int | None = None) -> "CDCEngine":
        """Lake BRANCHING (the Iceberg/Delta 'clone at version'): fork the
        committed state at `epoch` (default: latest) into an independent
        lake that can then tail a different continuation — A/B reprocessing,
        backfills against a frozen base, what-if schema/config experiments —
        while the source lake keeps its own timeline. Copy-on-write at the
        logical level: the fork is one distributed snapshot→bootstrap pass
        (per-row commit lsns preserved, so the branch is positioned at
        exactly the fork's binlog position and a continued tail reconverges
        sha-identically with a straight-line replay — pinned in tests); no
        shared mutable files, so neither lake's writes can corrupt the
        other, at the storage cost of materializing the live rows once.

        Same composition as repartition_to but at a historical horizon and
        keeping the partition count (so snapshot_sha256 stays comparable
        across the fork). The branch starts at epoch 1 with a fresh history
        horizon; changefeed consumers re-anchor against the branch."""
        import dataclasses

        ckpt = self.checkpoint(epoch)
        if ckpt.end_lsn < 1:
            raise ValueError("branch: source lake is empty at that horizon (nothing to fork)")
        dst = CDCEngine(dataclasses.replace(self.cfg, lake_dir=new_lake_dir))
        dst.bootstrap(self.snapshot_dataset(epoch=ckpt.epoch), as_of_lsn=ckpt.end_lsn)
        return dst

    def lineage(self) -> pa.Table:
        """Per-partition lineage read from the commit records themselves
        (north-star requirement: "every partition emits lineage (offset
        ranges, applied-LSN watermark)"). One row per partition with data:

          partition       int64  partition id
          applied_lsn     int64  partition-local watermark: max LSN folded
                                 into the latest committed snapshot
          events_applied  int64  winner rows folded (sum over retained epoch
                                 manifests; distinct-LSN counted at merge).
                                 NB: the map-side LWW combiner collapses
                                 superseded same-key events before the
                                 shuffle, so this is the engine's WORK
                                 metric (batch-boundary dependent), not the
                                 raw stream event count — the oracled
                                 cdc_lineage query exposes only the
                                 crash-exact columns
          live_rows       int64  rows in the latest committed snapshot
          epochs_active   int64  epochs that routed ≥1 event here
          first_epoch     int64  earliest / latest retained epoch with
          last_epoch      int64  events for this partition

        Sourced ONLY from manifest JSONs — no data files are opened, so the
        scan cost is O(partitions × epochs) tiny reads. Fan-out: one Ray
        task per partition directory (the export_snapshot shape) so
        wall-time scales with cores, not partition count. Horizon: since
        the last vacuum — vacuum trims superseded manifests, exactly like
        metrics_history; uncommitted-future manifests from a crashed
        attempt (epoch > checkpoint) are excluded."""
        import ray as _ray

        ckpt = self.checkpoint()
        parts = sorted(ckpt.partitions)
        scan = _ray.remote(_scan_partition_lineage)
        rows = _ray.get(
            [scan.remote(self.cfg.lake_dir, p, ckpt.epoch) for p in parts]
        )
        rows = [r for r in rows if r is not None]
        cols = [
            "partition", "applied_lsn", "events_applied",
            "live_rows", "epochs_active", "first_epoch", "last_epoch",
        ]
        return pa.table(
            {c: pa.array([r[c] for r in rows], pa.int64()) for c in cols}
        )

    def fsck(self, epoch: int | None = None) -> pa.Table:
        """Distributed lake integrity audit ("fsck"): one Ray task per
        partition re-derives the invariants the commit protocol promises —
        the operational check after a crash, a suspicious restore, or a
        storage migration, sized for 100-TB lakes (per-partition fan-out;
        the driver folds one row per partition, never data).

        One row per partition with 1/0 flags (`ok` = all of them):

          files_ok      every manifest-referenced file (base + LSM runs)
                        exists and parses as parquet
          routing_ok    every folded row's key_hash64 % P == partition — a
                        misrouted row is invisible to lookup() forever
          watermark_ok  max folded lsn ≤ the committed applied_lsn
          rows_ok       folded row count == manifest rows (exact mode only;
                        LSM upper-bound estimates are skipped)
          sha_ok        recomputed content digest == the manifest
                        content_sha (checked when one is recorded for the
                        current evolution version with no pending runs)

        Read-only and lock-free by design: it audits the checkpoint's
        committed state, so it can run WHILE a writer appends epochs (it
        simply audits the horizon it loaded)."""
        import json as _json

        import ray as _ray

        from arches_rascoll_etl_ray.stages.merge import spec_version

        ckpt = self.checkpoint(epoch)
        current_v = spec_version(self.cfg)
        parts = sorted(ckpt.partitions)
        task = _ray.remote(num_cpus=1, max_retries=3, retry_exceptions=True)(_fsck_partition)
        rows = _ray.get(
            [
                task.remote(self.cfg, p, _json.dumps(ckpt.partitions[p]), current_v)
                for p in parts
            ]
        )
        flags = ["files_ok", "routing_ok", "watermark_ok", "rows_ok", "sha_ok"]
        cols = {
            "partition": pa.array([r["partition"] for r in rows], pa.int64()),
            "rows": pa.array([r["rows"] for r in rows], pa.int64()),
        }
        for f in flags:
            cols[f] = pa.array([r[f] for r in rows], pa.int64())
        cols["ok"] = pa.array(
            [int(all(r[f] for f in flags)) for r in rows], pa.int64()
        )
        return pa.table(cols)

    def repair_partition(self, changelog_dir: str, part: int) -> bool:
        """Self-healing for a corrupted partition (the fsck→repair pair):
        rebuild ONE partition's data file from the changelog history and
        swap it in only if the rebuild reproduces the manifest's recorded
        content_sha — a wrong rebuild (history trimmed by expire(), a
        bootstrap-seeded lake whose pre-snapshot history never existed)
        raises instead of silently installing a different state.

        Mechanism is pure composition: filter the changelog to the events
        this partition's keys route to (the same key_hash64 % P as every
        write), replay them into a throwaway lake with the identical
        config, and verify the rebuilt partition's logical content digest
        against the damaged lake's commit record. The event slice never
        lands on the driver: each read task writes its filtered batch
        straight back out as an LSN-range-named changelog shard (same
        shared-FS dependency as the spill plan), and the driver sees only
        per-task row counts — repair of one partition of a 10^10-key lake
        moves that partition's history through workers, not through one
        process's heap. Bulk corruption is what full replay is for.

        Requires a verifiable target: a recorded content_sha at the
        current evolution version with no pending LSM runs (`compact()`
        first). Returns True on a verified swap. Holds the writer lease
        for the WHOLE repair (the module's read-inside-lock invariant): a
        concurrent epoch committing against the corrupted base mid-repair
        would otherwise fold garbage forward while the swap lands on a
        superseded file."""
        import dataclasses
        import shutil as _shutil
        import tempfile as _tempfile

        import numpy as _np

        from arches_rascoll_etl_ray.functions.hashing import key_hash64
        from arches_rascoll_etl_ray.stages.merge import spec_version

        with _WriterLock(self.cfg.lake_dir) as wlock:
            ckpt = self.checkpoint()
            info = ckpt.partitions.get(part)
            if info and info.get("runs"):
                # before the data_file guard: an LSM partition may hold ONLY runs
                raise ValueError(
                    f"partition {part} has pending LSM runs — compact() before repair "
                    "(runs have no recorded content_sha to verify against)"
                )
            if not info or not info.get("data_file"):
                raise ValueError(f"partition {part} has no committed data file to repair")
            if not info.get("content_sha") or info.get("evolution_version", 1) != spec_version(self.cfg):
                raise ValueError(
                    f"partition {part} has no verifiable content_sha at the current "
                    "evolution version — rewrite it (compact) before repair"
                )

            end_lsn = ckpt.end_lsn
            files = shards_for_range(changelog_dir, 0, end_lsn)
            ds = read_shard_dataset(files)
            num_parts = self.cfg.num_partitions

            tmp = _tempfile.mkdtemp(prefix="arer_repair_")
            try:
                clog = os.path.join(tmp, "clog")
                os.makedirs(clog, exist_ok=True)

                def filt_and_spill(t: pa.Table) -> pa.Table:
                    # filter to this partition's routed slice, then write it
                    # straight out as a changelog shard from INSIDE the task:
                    # the rebuild's input never concatenates on the driver
                    import uuid as _uuid

                    import pyarrow.parquet as pq

                    kh = key_hash64(t)
                    keep = (kh % _np.uint64(num_parts)) == _np.uint64(part)
                    t = t.filter(pa.array(keep))
                    t = t.filter(pc.less_equal(t["lsn"], pa.scalar(end_lsn, pa.int64())))
                    if t.num_rows:
                        if "content" in t.schema.names:
                            idx = t.schema.get_field_index("content")
                            t = t.set_column(
                                idx, "content", t["content"].cast(pa.large_string())
                            )
                        lo = pc.min(t["lsn"]).as_py()
                        hi = pc.max(t["lsn"]).as_py()
                        # digits-only unique suffix (shard-name grammar) —
                        # shard layout cannot affect the rebuild: the LWW
                        # fold orders by lsn, and the sha gate verifies
                        suffix = _uuid.uuid4().int % 10**12
                        p = os.path.join(
                            clog, f"changelog-{lo:012d}-{hi:012d}-{suffix:012d}.parquet"
                        )
                        # tmp+rename: a task killed mid-write must not leave a
                        # truncated shard the rebuild read would crash on (the
                        # ".tmp" name fails the shard regex, so a leaked tmp is
                        # invisible); a RETRIED task writes a second shard under
                        # a fresh suffix — duplicate delivery, which the LWW
                        # fold is already pinned to absorb sha-identically
                        pq.write_table(t, p + ".tmp", row_group_size=64 * 1024, compression="lz4")
                        os.replace(p + ".tmp", p)
                    return pa.table({"n": pa.array([t.num_rows], pa.int64())})

                n_events = ds.map_batches(filt_and_spill, batch_format="pyarrow").sum("n")
                if not n_events:
                    raise ValueError(
                        f"changelog contains no events for partition {part} up to lsn "
                        f"{end_lsn} — history insufficient (expired or bootstrap-seeded?)"
                    )
                rebuild = CDCEngine(
                    dataclasses.replace(self.cfg, lake_dir=os.path.join(tmp, "lake"))
                )
                # erasures travel with the rebuild: without the ban list the
                # replay would resurrect forgotten keys and the sha gate
                # would (correctly) refuse the repair
                from arches_rascoll_etl_ray.stages.normalize import forget_list_path

                fl = forget_list_path(self.cfg.lake_dir)
                if os.path.exists(fl):
                    os.makedirs(rebuild.cfg.lake_dir, exist_ok=True)
                    _shutil.copyfile(fl, forget_list_path(rebuild.cfg.lake_dir))
                rebuild.replay(clog, events_per_epoch=end_lsn)
                if self.cfg.merge_mode == "lsm":
                    # the rebuild replay left an uncompacted run (no recorded
                    # sha); fold it so rinfo is verifiable — without this the
                    # LSM mode could never self-heal
                    rebuild.compact()
                rinfo = rebuild.checkpoint().partitions.get(part)
                wlock.renew()  # the rebuild may have outlived the lease TTL
                if (
                    rinfo is None
                    or rinfo.get("content_sha") != info["content_sha"]
                    or rinfo.get("rows") != info["rows"]
                ):
                    raise ValueError(
                        f"rebuild of partition {part} does not reproduce the committed "
                        f"state (sha {rinfo and rinfo.get('content_sha')!r} vs recorded "
                        f"{info['content_sha']!r}) — history insufficient: expire() "
                        "trimmed it or the lake was bootstrap-seeded; restore from a "
                        "snapshot/branch instead"
                    )
                src = os.path.join(rebuild.cfg.lake_dir, rinfo["data_file"])
                dst = os.path.join(self.cfg.lake_dir, info["data_file"])
                staged = dst + ".repair"
                _shutil.copyfile(src, staged)
                os.replace(staged, dst)  # atomic swap-in
            finally:
                _shutil.rmtree(tmp, ignore_errors=True)
        return True

    def export_snapshot(self, out_dir: str, fmt: str = "parquet") -> int:
        """Materialize the live snapshot as a directory of per-partition
        files (resumable: finished partitions are skipped on rerun — the
        'one output per key range + manifest' sink layout). Returns the
        ACTUAL number of exported rows (recorded in the .done markers).

        fmt: 'parquet' (zero-rewrite copy when no transform is needed),
        'csv' or 'jsonl' (text sinks — nested columns JSON-stringified, the
        reference's S2 serializer, arches_rascoll/ref_collection.py:30-50).
        Partitions with pending LSM runs or a stale evolution version are
        folded/projected before export.

        Fan-out: ONE Ray task per pending partition (the `_merge_epoch`
        shape) — the driver only scans markers and sums the returned row
        counts, so export wall-time scales with cores/nodes instead of
        O(partitions)×single-thread. Each task writes tmp→rename with its
        own .done marker, so a crashed export resumes exactly."""
        import ray as _ray

        from arches_rascoll_etl_ray.stages.merge import spec_version

        if fmt not in ("parquet", "csv", "jsonl"):
            raise ValueError(f"unknown export format {fmt!r}")
        ckpt = self.checkpoint()
        current_v = spec_version(self.cfg)
        cols = lake_columns(self.cfg)
        os.makedirs(out_dir, exist_ok=True)
        total = 0
        pending: list = []
        for part, info in sorted(ckpt.partitions.items()):
            if not (info["data_file"] or info.get("runs")):
                continue
            dst = os.path.join(out_dir, f"part-{part:05d}.{fmt}")
            marker = dst + ".done"
            if os.path.exists(marker):
                with open(marker) as f:
                    parts_ = f.read().split()
                # marker: "<epoch> <sha|-> <rows>" — skip ONLY when it
                # records this partition's CURRENT committed epoch; a marker
                # from an earlier export into the same dir would otherwise
                # keep stale files (and count their stale rows) after new
                # epochs commit
                if (
                    len(parts_) >= 3
                    and parts_[0].isdigit()
                    and parts_[-1].isdigit()
                    and int(parts_[0]) == info["epoch"]
                ):
                    total += int(parts_[-1])
                    continue
                # stale or older-format marker: re-export
                os.remove(marker)
            pending.append((info, dst))
        if pending:
            task = _ray.remote(num_cpus=1, max_retries=3, retry_exceptions=True)(
                _export_partition_file
            )
            refs = [
                task.remote(self.cfg, info, dst, fmt, cols, current_v)
                for info, dst in pending
            ]
            total += sum(_ray.get(refs))
        return total

    def export_changefeed(self, out_dir: str, fmt: str = "parquet") -> int:
        """Transactional outbox: export every epoch committed since the
        last call as a per-partition delta-file window
        (``deltas-<from>-<to>/part-*.{parquet,jsonl}`` — the changefeed
        schema: op + old_*/new_* images), exactly-once for a consumer that
        reads committed windows in name order.

        Exactly-once without a transaction log: the diff of two committed
        epochs is DETERMINISTIC, each partition task writes tmp→rename with
        a `.done` marker (a crashed export rerun redoes only the missing
        partitions, rewriting identical bytes), the window's `_COMMITTED`
        marker lands only after every partition's file, and the consumer
        cursor (`_cursor.json`) advances last. A crash anywhere re-runs to
        the same bytes; a consumer never sees a half-window because it
        reads only `_COMMITTED` windows.

        Fan-out mirrors changefeed(): one Ray task per TOUCHED partition
        (byte-identical manifests are skipped without I/O), so a quiet
        window costs only the partitions it touched. Returns delta rows
        exported in this call.

        Operational notes: the cursor references the FROM epoch's
        checkpoint, so export before vacuum() (vacuum drops non-latest
        checkpoints — a vacuumed-away cursor epoch raises
        FileNotFoundError rather than exporting a wrong window). A window
        directory abandoned by a crash (no `_COMMITTED`) is invisible to
        consumers; if later epochs commit first, the re-run opens a wider
        window and the orphan stays inert — only an identical (from, to)
        re-run can ever commit it, with identical bytes."""
        import json as _json

        import ray as _ray

        if fmt not in ("parquet", "jsonl"):
            raise ValueError(f"unknown changefeed export format {fmt!r}")
        os.makedirs(out_dir, exist_ok=True)
        cursor_path = os.path.join(out_dir, "_cursor.json")
        from_epoch = 0
        if os.path.exists(cursor_path):
            with open(cursor_path) as f:
                from_epoch = _json.load(f)["epoch"]
        ckpt = self.checkpoint()
        to_epoch = ckpt.epoch
        if to_epoch <= from_epoch:
            return 0
        ck0 = self.checkpoint(from_epoch) if from_epoch else None
        wdir = os.path.join(out_dir, f"deltas-{from_epoch:06d}-{to_epoch:06d}")
        os.makedirs(wdir, exist_ok=True)

        task = _ray.remote(num_cpus=1, max_retries=3, retry_exceptions=True)(
            _export_delta_partition
        )
        refs, total = [], 0
        parts0 = ck0.partitions if ck0 else {}
        for p in sorted(set(parts0) | set(ckpt.partitions)):
            i0, i1 = parts0.get(p), ckpt.partitions.get(p)
            if i0 == i1:
                continue  # untouched: identical manifest, zero I/O
            dst = os.path.join(wdir, f"part-{p:05d}.{fmt}")
            if os.path.exists(dst + ".done"):
                with open(dst + ".done") as f:
                    total += int(f.read().split()[-1])
                continue
            refs.append(
                task.remote(self.cfg, _json.dumps(i0), _json.dumps(i1), dst, fmt)
            )
        total += sum(_ray.get(refs))
        with open(os.path.join(wdir, "_COMMITTED"), "w") as f:
            f.write(f"{from_epoch} {to_epoch} {total}\n")
        tmp = cursor_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"epoch": to_epoch}, f)
        os.replace(tmp, cursor_path)
        return total

    def vacuum(self) -> int:
        """Delete superseded per-partition data/run files AND their
        manifests. Manifests are removed together with unreferenced data:
        an orphan manifest whose data file is gone would make a future
        epoch's merge skip as 'already committed' and reference deleted
        files — a bricked lake (found by review; regression-tested)."""
        import os
        import re

        with _WriterLock(self.cfg.lake_dir):
            return self._vacuum_locked(os, re)

    def _vacuum_locked(self, os, re) -> int:
        ckpt = self.checkpoint()
        # Drop non-latest checkpoint JSONs too: they reference the data files
        # being deleted below, so keeping them would let checkpoint(epoch=old)
        # succeed and snapshot_*(epoch=old) fail later with a raw
        # missing-parquet error (or snapshot_sha256's fast path silently
        # digest vanished data). Removing them makes the documented
        # time-travel horizon — 'since the last vacuum' — real:
        # load_checkpoint_at(old) now raises FileNotFoundError immediately.
        from arches_rascoll_etl_ray.state.checkpoint import list_checkpoints

        removed = 0
        for epoch, path in list_checkpoints(self.cfg.lake_dir):
            if epoch != ckpt.epoch:
                os.remove(path)
                removed += 1
        live = {info["data_file"] for info in ckpt.partitions.values() if info["data_file"]}
        committed_epoch = {p: info["epoch"] for p, info in ckpt.partitions.items()}
        for info in ckpt.partitions.values():
            live.update(info.get("runs") or [])
        data_re = re.compile(r"^(data|run)_epoch(\d{9})\.parquet$")
        mani_re = re.compile(r"^manifest_epoch(\d{9})\.json$")
        for name in os.listdir(self.cfg.lake_dir):
            if not name.startswith("part="):
                continue
            part = int(name.split("=")[1])
            pdir = os.path.join(self.cfg.lake_dir, name)
            for f in os.listdir(pdir):
                m = data_re.match(f)
                if m and os.path.join(name, f) not in live:
                    os.remove(os.path.join(pdir, f))
                    removed += 1
                    continue
                mm = mani_re.match(f)
                if mm and int(mm.group(1)) != committed_epoch.get(part):
                    # stale (superseded) or uncommitted-future manifest
                    os.remove(os.path.join(pdir, f))
                    removed += 1
        return removed


def _fsck_partition(cfg, part: int, info_json: str, current_v: int) -> dict:
    """One partition's integrity audit (see CDCEngine.fsck). Module-level so
    Ray ships the function, not the engine."""
    import json as _json
    import os as _os

    import numpy as _np

    from arches_rascoll_etl_ray.functions.hashing import key_hash64, table_content_sha256
    from arches_rascoll_etl_ray.stages.merge import (
        evolved_content_col,
        fold_partition_tables,
        read_partition_state,
    )

    info = _json.loads(info_json)
    out = {
        "partition": part, "rows": 0,
        "files_ok": 1, "routing_ok": 1, "watermark_ok": 1, "rows_ok": 1, "sha_ok": 1,
    }
    files = ([info["data_file"]] if info.get("data_file") else []) + list(
        info.get("runs") or []
    )
    if not files:
        return out
    if any(not _os.path.exists(_os.path.join(cfg.lake_dir, f)) for f in files):
        out.update(files_ok=0, routing_ok=0, watermark_ok=0, rows_ok=0, sha_ok=0)
        return out
    try:
        folded = fold_partition_tables(cfg, read_partition_state(cfg, info))
    except Exception:
        out.update(files_ok=0, routing_ok=0, watermark_ok=0, rows_ok=0, sha_ok=0)
        return out
    out["rows"] = folded.num_rows
    if folded.num_rows:
        kh = key_hash64(folded)
        out["routing_ok"] = int(
            bool(_np.all(kh % _np.uint64(cfg.num_partitions) == _np.uint64(part)))
        )
        out["watermark_ok"] = int(pc.max(folded["lsn"]).as_py() <= info["applied_lsn"])
    if not info.get("runs") and info.get("rows_exact", True):
        out["rows_ok"] = int(folded.num_rows == info["rows"])
    if (
        info.get("content_sha")
        and not info.get("runs")
        and info.get("evolution_version", 1) == current_v
    ):
        sha_cols = [c for c in folded.column_names if c != evolved_content_col(cfg)]
        out["sha_ok"] = int(
            table_content_sha256(folded, sha_cols) == info["content_sha"]
        )
    return out


def _scan_partition_lineage(lake_dir: str, part: int, max_epoch: int) -> dict | None:
    """Worker side of CDCEngine.lineage(): fold ONE partition's retained
    manifest JSONs (epoch ≤ max_epoch — the committed horizon) into its
    lineage row. Pure metadata: never opens a data/run file."""
    import json as _json
    import re as _re

    from arches_rascoll_etl_ray.state.manifest import partition_dir as _pdir

    mani_re = _re.compile(r"^manifest_epoch(\d{9})\.json$")
    pdir = _pdir(lake_dir, part)
    try:
        names = os.listdir(pdir)
    except FileNotFoundError:
        return None
    manis = []
    for name in names:
        m = mani_re.match(name)
        if not m or int(m.group(1)) > max_epoch:
            continue
        try:
            with open(os.path.join(pdir, name)) as f:
                manis.append(_json.load(f))
        except (OSError, _json.JSONDecodeError):
            continue  # torn write: same tolerance as load_latest_checkpoint
    if not manis:
        return None
    latest = max(manis, key=lambda d: d["epoch"])
    active = [d for d in manis if d.get("events_applied", 0) > 0]
    return {
        "partition": part,
        "applied_lsn": latest["applied_lsn"],
        "events_applied": sum(d.get("events_applied", 0) for d in manis),
        "live_rows": latest["rows"],
        "epochs_active": len(active),
        "first_epoch": min(d["epoch"] for d in active) if active else 0,
        "last_epoch": max(d["epoch"] for d in active) if active else 0,
    }


def _export_delta_partition(cfg, old_json: str, new_json: str, dst: str, fmt: str) -> int:
    """Worker side of export_changefeed: diff ONE partition's committed
    state at the window's two horizons (deterministic) and write `dst`
    atomically with its `.done` marker. Module-level so Ray ships the
    function, not the engine."""
    import json as _json

    import pyarrow.parquet as _pq

    from arches_rascoll_etl_ray.stages.merge import (
        diff_partition_states,
        empty_lake_table,
        fold_partition_tables,
        read_partition_state,
    )

    def fold(txt: str) -> pa.Table:
        info = _json.loads(txt)
        if not info:
            return empty_lake_table(cfg)
        return fold_partition_tables(cfg, read_partition_state(cfg, info))

    deltas = diff_partition_states(cfg, fold(old_json), fold(new_json))
    tmp = dst + ".tmp"
    if fmt == "parquet":
        _pq.write_table(deltas, tmp)
    else:
        deltas.to_pandas().to_json(tmp, orient="records", lines=True, force_ascii=False)
    os.replace(tmp, dst)
    with open(dst + ".done", "w") as f:
        f.write(f"{deltas.num_rows}\n")
    return deltas.num_rows


def _export_partition_file(cfg, info: dict, dst: str, fmt: str, cols, current_v: int) -> int:
    """Worker side of export_snapshot: fold/read ONE partition's committed
    state and write `dst` atomically (tmp→rename) with its `.done` marker
    ("<epoch> <sha|-> <rows>"). Idempotent per (partition, epoch), so task
    retries and crashed-export reruns are no-ops once the marker lands."""
    import shutil

    import pyarrow.parquet as _pq

    from arches_rascoll_etl_ray.stages.merge import fold_partition_tables, read_partition_state
    from arches_rascoll_etl_ray.stages.normalize import apply_evolution

    marker = dst + ".done"
    tmp = dst + ".tmp"
    needs_transform = bool(info.get("runs")) or (info.get("evolution_version", 1) != current_v)
    if needs_transform:
        tbl = fold_partition_tables(cfg, read_partition_state(cfg, info))
    else:
        tbl = _pq.read_table(os.path.join(cfg.lake_dir, info["data_file"]))
    if tbl.num_rows == 0:
        with open(marker, "w") as f:
            f.write(f"{info['epoch']} - 0\n")
        return 0
    if fmt == "parquet":
        if needs_transform:
            _pq.write_table(tbl, tmp)
        else:
            shutil.copyfile(os.path.join(cfg.lake_dir, info["data_file"]), tmp)
    else:
        from arches_rascoll_etl_ray.functions.json_io import stringify_nested_columns

        tbl2 = apply_evolution(tbl, cfg.evolution).select(cols) if not needs_transform else tbl
        nested = [
            f.name for f in tbl2.schema
            if pa.types.is_struct(f.type) or pa.types.is_list(f.type) or pa.types.is_map(f.type)
        ]
        df = stringify_nested_columns(tbl2, nested).to_pandas()
        if fmt == "csv":
            df.to_csv(tmp, index=False)
        else:
            df.to_json(tmp, orient="records", lines=True, force_ascii=False)
    os.replace(tmp, dst)
    with open(marker, "w") as f:
        f.write(f"{info['epoch']} {info.get('content_sha') or '-'} {tbl.num_rows}\n")
    return tbl.num_rows

"""Incrementally-maintained MinHash-LSH near-duplicate index, synced from a
CDC lake's changefeed — the continuous-ingest recast of the batch
`training.py` dedup pipeline (CDC × training-data composition).

Batch near-dup (training.py:133-260) rescans the whole corpus. At a
continuously-ingesting 100-TB lake that is the wrong shape: each sync
window only touches the docs that changed. This index keeps

    buckets/part=<i>/buckets.parquet   (band, bh, key)  — LSH bucket
        memberships of LIVE docs, partitioned by hash(band, bh) % P
    edges/part=<j>/edges.parquet       (a, b)           — verified
        near-dup pairs (a < b lexicographically), partitioned by hash(a)
    _neardup_meta.json                 params + watermark + intent

and maintains both purely from changefeed deltas:

    I                 → add buckets for the new text; candidates = live
                        bucket-mates; verify exact Jaccard; add edges
    D                 → remove the doc's buckets (computed from the OLD
                        image the changefeed carries — no corpus read)
                        and every edge touching it
    U (text changed)  → remove old buckets/edges, then the I path
    U (text same)     → nothing (lsn-only churn costs zero writes)

Correctness shape: for any pair of finally-live docs, the LATER of their
last content changes re-verifies the pair against the other side's
CURRENT text (read from the base lake AS OF the sync horizon), and every
earlier edge touching a changed doc is dropped — so the final edge set
equals the batch exact-Jaccard pair set over the final live corpus
whenever LSH recall is 1 at the chosen threshold (same corpus argument as
training.q_dedup_clusters; pinned incremental≡batch in pytest).

Scale notes: bucket rewrites touch only the (band, bh) partitions named
by the window's deltas; candidate generation is bounded by the new docs'
bucket-mates; the docs themselves never shuffle (only (band, bh, key)
triples and the window's own new texts move). The output is a PAIR
materialization — inherently O(qualifying pairs); for clustering-only
use at dup-heavy scale, cap bucket fan-out with hub edges as the batch
pipeline does (training.py:_MAX_ALLPAIRS_RUN) and propagate labels
instead of materializing pairs.

Crash recovery pins the WINDOW like pipelines/index.SecondaryIndex: the
`pending_to` intent is persisted before any partition write, and
re-applying a window is idempotent (set add/remove on buckets and edges;
candidate verification is deterministic).

Reference analogue: the reference dedups only via one-shot NOT-IN guards
(arches_rascoll/ref_collection.py:305-314); this continuous index is the
engine-native extension the CDC north star implies.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from arches_rascoll_etl_ray.functions import sketches
from arches_rascoll_etl_ray.functions import text as textfns
from arches_rascoll_etl_ray.functions.hashing import (
    KEY_SEP,  # the canonical composite-key separator (re-exported for callers)
    combine_key,
    key_hash64,
    stable_hash64,
)
from arches_rascoll_etl_ray.state.manifest import atomic_write_json


def _sort_rows(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Byte-exact multi-key sort: successive STABLE single-key sorts from
    minor to major key. pandas' multi-column sort_values factorizes object
    strings through the NUL-truncating StringHashTable (verified on pandas
    2.2.2: ['r\\x00y','r\\x00x'] stays in input order under a multi-key
    sort), while a single-key object sort argsorts with full Python string
    comparison."""
    out = df
    for c in reversed(cols):
        out = out.sort_values(c, kind="mergesort", ignore_index=True)
    return out


def _dedup_rows(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Byte-exact multi-column row dedup (defense in depth). pandas'
    vectorized hash paths (`pd.unique`, array-path `factorize`, multi-column
    `duplicated`/`drop_duplicates`, string-key `groupby`/`merge`, multi-key
    `sort_values`) hash/compare object strings as C strings and TRUNCATE at
    the first NUL byte — when KEY_SEP was "\\x00" that silently collapsed
    composites to their repo prefix and made bucket stores and edge sets
    run-to-run nondeterministic on shared-repo corpora (KEY_SEP is now
    "\\x1f", see functions/hashing.py). Sort + adjacent full-Python-compare
    sidesteps the hash paths entirely — including the sort: MULTI-key
    sort_values factorizes string keys through the same truncating
    hashtable, so _sort_rows composes stable SINGLE-key sorts (argsort
    with full PyObject comparison), which are byte-exact for any
    content."""
    if not len(df):
        return df
    s = _sort_rows(df, cols)
    # per-column adjacent compare on the ORIGINAL dtype: pandas' .shift()
    # would float-promote int64 (the bh hash column), and values beyond
    # 2^53 that collide in float64 would be falsely dropped as duplicates
    keep = np.zeros(len(s), dtype=bool)
    keep[0] = True
    for c in cols:
        v = s[c].to_numpy()
        keep[1:] |= v[1:] != v[:-1]
    return s[keep]


def _band_rows(texts: pd.Series, keys: np.ndarray, num_perm: int, num_bands: int, ngram: int, seed: int) -> pd.DataFrame:
    """(band, bh, key) triples for a batch of texts. Docs with zero word
    n-grams emit nothing (they can never share a qualifying pair: a pair
    with one empty gram set has intersection 0)."""
    texts = texts.reset_index(drop=True)
    flat, offsets = textfns.word_ngrams_hashes(texts, n=ngram)
    sig = sketches.minhash_signatures(flat, offsets, num_perm=num_perm, seed=seed)
    bands = sketches.lsh_band_hashes(sig, num_bands=num_bands)
    # zero-WORD docs (word_ngrams_hashes still assigns them one sentinel
    # gram slot) must not enter buckets: their SQL gram set is empty, so
    # no pair involving them can ever qualify
    nonempty = (texts.str.split().str.len().fillna(0) > 0).to_numpy()
    n = len(texts)
    df = pd.DataFrame(
        {
            "key": np.repeat(keys, num_bands),
            "band": np.tile(np.arange(num_bands, dtype=np.int32), n),
            "bh": bands.reshape(-1).view(np.int64),
        }
    )
    return df[np.repeat(nonempty, num_bands)]


class IncrementalNearDup:
    """Changefeed-maintained near-dup pair index for one CDC lake."""

    def __init__(
        self,
        index_dir: str,
        num_partitions: int = 8,
        num_perm: int = 128,
        num_bands: int = 32,
        ngram: int = 3,
        threshold: float = 0.5,
        seed: int = 1,
        max_bucket_mates: int | None = None,
    ):
        """`max_bucket_mates`: per-(band, bh) bucket cap on the live mates
        each added doc generates candidates against (first N by sorted
        key — deterministic). None (default) keeps EXACT pair semantics
        (the oracle contract: every qualifying pair whose bucket LSH
        recalls). Dup-heavy corpora (small vocab / bulk re-ingest) make
        hot buckets quadratic — set a cap there and treat the index as a
        CLUSTERING input (connectivity preserved through the capped hub
        mates, pair set intentionally incomplete), the same trade the
        batch pipeline's hub-edge cap makes (training.py run>32 cap)."""
        self.index_dir = index_dir
        self.num_partitions = num_partitions
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.ngram = ngram
        self.threshold = threshold
        self.seed = seed
        self.max_bucket_mates = max_bucket_mates
        os.makedirs(index_dir, exist_ok=True)
        meta = self._load_meta()
        if meta is not None:
            # key_sep is part of the PERSISTED layout: stored bucket/edge
            # keys embed it, so an index written under a different
            # separator (e.g. pre-fix "\x00") must be rejected, not
            # silently mismatched against new-separator removals/touches
            pins = dict(
                num_partitions=num_partitions, num_perm=num_perm,
                num_bands=num_bands, ngram=ngram, threshold=threshold, seed=seed,
                max_bucket_mates=max_bucket_mates, key_sep=KEY_SEP,
            )
            for k, v in pins.items():
                if meta.get(k) != v:
                    raise ValueError(
                        f"near-dup index at {index_dir} was built with {k}={meta.get(k)!r}"
                        f" — cannot reopen with {k}={v!r} (signature/layout pin)"
                    )
            self.applied_epoch = meta["applied_epoch"]
            self.pending_to = meta.get("pending_to")
        else:
            self.applied_epoch = 0
            self.pending_to = None

    # ------------------------------------------------------------- state

    def _meta_path(self) -> str:
        return os.path.join(self.index_dir, "_neardup_meta.json")

    def _load_meta(self) -> dict | None:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def _save_meta(self) -> None:
        atomic_write_json(
            self._meta_path(),
            {
                "num_partitions": self.num_partitions,
                "num_perm": self.num_perm,
                "num_bands": self.num_bands,
                "ngram": self.ngram,
                "threshold": self.threshold,
                "seed": self.seed,
                "max_bucket_mates": self.max_bucket_mates,
                "key_sep": KEY_SEP,
                "applied_epoch": self.applied_epoch,
                "pending_to": self.pending_to,
            },
        )

    def _bucket_file(self, part: int) -> str:
        return os.path.join(self.index_dir, "buckets", f"part={part:03d}", "buckets.parquet")

    def _edge_file(self, part: int) -> str:
        return os.path.join(self.index_dir, "edges", f"part={part:03d}", "edges.parquet")

    # -------------------------------------------------------------- sync

    def sync(self, engine) -> int:
        """Fold the lake's changefeed since this index's watermark; returns
        the number of verified edges added this sync. A crashed sync left a
        `pending_to` intent — that exact window re-applies FIRST
        (idempotent), then a fresh window advances to the lake head."""
        from arches_rascoll_etl_ray.pipelines.cdc import _WriterLock

        with _WriterLock(self.index_dir):
            added = 0
            if self.pending_to is not None and self.pending_to > self.applied_epoch:
                added += self._apply_window(engine, self.pending_to)
            cur = engine.checkpoint().epoch
            if cur != self.applied_epoch:
                added += self._apply_window(engine, cur)
            return added

    def _apply_window(self, engine, to_epoch: int) -> int:
        from arches_rascoll_etl_ray.stages.merge import evolved_content_col

        self.pending_to = to_epoch
        self._save_meta()
        col = evolved_content_col(engine.cfg)
        new_c, old_c = "new_" + col, "old_" + col
        num_perm, num_bands, ngram, seed = self.num_perm, self.num_bands, self.ngram, self.seed

        # DISTRIBUTED delta sketching: each feed batch classifies its own
        # rows and emits (band, bh, key, add) triples plus one band=-1
        # sentinel row per sketched add carrying its text — so the window's
        # changed texts live in the object store (never the driver), and
        # _verify can pull add-member texts from `trs` with a distributed
        # filter instead of re-folding base partitions. The driver holds
        # texts only for candidate MEMBERS (bounded by the candidate set).
        def batch_triples(t: pa.Table) -> pa.Table:
            op = t["op"]
            key = combine_key(t)  # canonical repo+KEY_SEP+path composite
            newv = pc.cast(t[new_c], pa.large_string())
            oldv = pc.cast(t[old_c], pa.large_string())
            moved = pc.fill_null(pc.not_equal(oldv, newv), True)
            add_m = pc.fill_null(
                pc.or_(pc.equal(op, "I"), pc.and_(pc.equal(op, "U"), moved)), False
            )
            rem_m = pc.fill_null(
                pc.or_(pc.equal(op, "D"), pc.and_(pc.equal(op, "U"), moved)), False
            )
            adds = pa.table({"key": key, "text": newv}).filter(add_m)
            rems = pa.table({"key": key, "text": oldv}).filter(rem_m)
            parts = []
            if adds.num_rows:
                add_texts = adds["text"].to_pandas().fillna("")
                tri_add = _band_rows(
                    add_texts,
                    np.asarray(adds["key"].to_pylist(), dtype=object),
                    num_perm, num_bands, ngram, seed,
                ).assign(add=True, text=None)
                parts.append(tri_add)
                # band=-1 text sentinels, only for adds that emitted triples
                # (zero-gram docs can never be candidate members)
                sketched = set(tri_add["key"])  # NUL-safe (not pd.unique)
                if sketched:
                    src = pd.DataFrame(
                        {"key": np.asarray(adds["key"].to_pylist(), dtype=object),
                         "text": add_texts.to_numpy(dtype=object)}
                    )
                    sent = src[src["key"].isin(sketched)]
                    parts.append(
                        sent.assign(band=np.int32(-1), bh=np.int64(0), add=True)
                    )
            if rems.num_rows:
                parts.append(
                    _band_rows(
                        rems["text"].to_pandas().fillna(""),
                        np.asarray(rems["key"].to_pylist(), dtype=object),
                        num_perm, num_bands, ngram, seed,
                    ).assign(add=False, text=None)
                )
            if not parts:
                out = pd.DataFrame({"key": [], "band": [], "bh": [], "add": [], "text": []})
            else:
                out = pd.concat(parts, ignore_index=True)
            # Arrow out: empty object-dtype pandas frames trip Ray's block
            # size estimator (np.vectorize on empty inputs) — same guard as
            # merge_one below
            return pa.table(
                {
                    "key": pa.array(out["key"].to_numpy(dtype=object), pa.string()),
                    "band": pa.array(out["band"].to_numpy(), pa.int32()),
                    "bh": pa.array(out["bh"].to_numpy(), pa.int64()),
                    "add": pa.array(out["add"].to_numpy(), pa.bool_()),
                    "text": pa.array(out["text"].to_numpy(dtype=object), pa.large_string()),
                }
            )

        feed = engine.changefeed(self.applied_epoch, to_epoch)
        trs = feed.map_batches(batch_triples, batch_format="pyarrow").materialize()
        if trs.count() == 0:
            self.applied_epoch = to_epoch
            self.pending_to = None
            self._save_meta()
            return 0
        cands = self._update_buckets(trs)
        # touched keys for edge removal: any key with triples this window.
        # Skipping the others is correct for two distinct reasons: a
        # zero-gram doc has no buckets, hence never acquired edges; and an
        # lsn-only-churn doc (feed row, text unchanged, no triples) keeps
        # its existing edges VALID — broadening `touched` to all feed keys
        # would silently drop those edges with nothing re-verifying them.
        touched = set(  # NUL-safe driver-side dedup (pc.unique per batch is
            trs.map_batches(  # Arrow and NUL-exact; pd.unique is NOT)
                lambda t: pa.table({"key": pc.unique(t["key"])}),
                batch_format="pyarrow",
            ).to_pandas()["key"]
        )
        verified = self._verify(engine, to_epoch, cands, trs)
        self._update_edges(touched, verified)
        self.applied_epoch = to_epoch
        self.pending_to = None
        self._save_meta()
        return len(verified)

    def _update_buckets(self, trs) -> pd.DataFrame:
        """Distributed bucket-store update: the triples Dataset shuffles by
        bucket partition; each touched partition rewrites once and emits
        candidate pairs (new key × live bucket-mates). Returns the window's
        deduped candidate (a, b) key pairs, a < b — the only driver-side
        product (bounded by the changed docs' bucket-mates)."""
        P = self.num_partitions

        def add_part(t: pa.Table) -> pa.Table:
            # Arrow in/out: drop the band=-1 text sentinels and the text
            # column BEFORE any pandas conversion — a bulk window's
            # sentinel texts (the whole changed corpus) must never be
            # deserialized into Python strings just to be discarded. ONLY
            # (band, bh, key, add, part) triples enter the bucket shuffle.
            t = t.filter(pc.greater_equal(t["band"], 0)).select(["key", "band", "bh", "add"])
            if t.num_rows:
                # pc.cast int64→string emits the same decimal text as the
                # former pandas astype(str) (verified incl. INT64_MIN), so
                # the bucket→partition mapping is unchanged
                h = stable_hash64(pc.cast(t["bh"], pa.string())) ^ np.asarray(
                    t["band"].to_numpy(zero_copy_only=False), dtype=np.uint64
                )
                part = (h % np.uint64(P)).astype(np.int32)
            else:
                part = np.array([], dtype=np.int32)
            return t.append_column("part", pa.array(part, pa.int32()))

        bucket_file = self._bucket_file
        cap = self.max_bucket_mates

        def merge_one(g: pd.DataFrame) -> pd.DataFrame:
            part = int(g["part"].iloc[0])
            pfile = bucket_file(part)
            existing = (
                pq.read_table(pfile).to_pandas()
                if os.path.exists(pfile)
                else pd.DataFrame({"band": pd.Series([], dtype=np.int32),
                                   "bh": pd.Series([], dtype=np.int64),
                                   "key": pd.Series([], dtype=object)})
            )
            g_rem = g[~g["add"]]
            if len(g_rem):
                rk = set(zip(g_rem["band"], g_rem["bh"], g_rem["key"]))
                keep = [
                    (b, h_, k) not in rk
                    for b, h_, k in zip(existing["band"], existing["bh"], existing["key"])
                ]
                existing = existing[np.array(keep, dtype=bool)] if len(existing) else existing
            g_add = g[g["add"]]
            aa, bb = [], []
            if len(g_add):
                # candidates: each added (band, bh, key) vs live mates in
                # the SAME bucket — stored rows after removal, plus other
                # adds of this window (one direction via key inequality)
                live = _dedup_rows(
                    pd.concat(
                        [existing[["band", "bh", "key"]], g_add[["band", "bh", "key"]]],
                        ignore_index=True,
                    ),
                    ["band", "bh", "key"],
                )
                if cap is not None:
                    # hot-bucket fan-out cap: _dedup_rows returns rows
                    # sorted by (band, bh, key), so head(cap) per bucket is
                    # the deterministic first-N-by-key hub-mate set
                    live = live.groupby(["band", "bh"], sort=False).head(cap)
                merged_c = g_add.merge(live, on=["band", "bh"], suffixes=("", "_m"))
                merged_c = merged_c[merged_c["key"] != merged_c["key_m"]]
                if len(merged_c):
                    lo = np.minimum(merged_c["key"].to_numpy(dtype=object), merged_c["key_m"].to_numpy(dtype=object))
                    hi = np.maximum(merged_c["key"].to_numpy(dtype=object), merged_c["key_m"].to_numpy(dtype=object))
                    cp = _dedup_rows(pd.DataFrame({"a": lo, "b": hi}), ["a", "b"])
                    aa.append(cp)
                store = _dedup_rows(
                    pd.concat(
                        [existing, g_add[["band", "bh", "key"]]], ignore_index=True
                    ),
                    ["band", "bh", "key"],
                )
            else:
                store = existing
            store = _sort_rows(store, ["band", "bh", "key"])  # byte-exact multi-key sort
            if len(store):
                os.makedirs(os.path.dirname(pfile), exist_ok=True)
                tmp = pfile + f".tmp-{os.getpid()}"
                pq.write_table(pa.Table.from_pandas(store, preserve_index=False), tmp, compression="lz4")
                os.replace(tmp, pfile)
            else:
                try:
                    os.remove(pfile)
                except FileNotFoundError:
                    pass
            out = pd.concat(aa, ignore_index=True) if aa else pd.DataFrame({"a": [], "b": []})
            # Arrow out: object-dtype string columns confuse Ray's block
            # size estimator (np.vectorize on empty inputs)
            return pa.table(
                {
                    "a": pa.array(out["a"].to_numpy(dtype=object), pa.string()),
                    "b": pa.array(out["b"].to_numpy(dtype=object), pa.string()),
                }
            )

        cands = (
            trs.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(merge_one, batch_format="pandas")
            .to_pandas()
        )
        return _dedup_rows(cands, ["a", "b"]) if len(cands) else cands

    def _verify(self, engine, to_epoch: int, cands: pd.DataFrame, trs) -> pd.DataFrame:
        """Exact word-ngram Jaccard over candidate pairs. Members ADDED
        this window get their text from the triples dataset's band=-1
        sentinels (a distributed filter over `trs` — zero lake reads, so a
        bulk initial load verifies without re-folding any partition);
        stored bucket-mates fall back to selective per-partition lake
        folds AS OF the sync horizon. Both are bounded by the candidate
        set, never a corpus scan."""
        empty = pd.DataFrame({"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)})
        if len(cands) == 0:
            return empty
        # sorted(set(...)): pd.unique NUL-truncates composite keys (see
        # _dedup_rows) and its first-occurrence order is batch-dependent
        members = sorted(set(cands["a"]).union(cands["b"]))
        mset_ref = ray.put(pa.array(members, pa.string()))

        def pick_sentinels(t: pa.Table) -> pa.Table:
            sel = t.filter(
                pc.and_(
                    pc.equal(t["band"], -1),
                    pc.is_in(t["key"], value_set=ray.get(mset_ref)),
                )
            )
            return sel.select(["key", "text"])

        got = trs.map_batches(pick_sentinels, batch_format="pyarrow").to_pandas()
        lookup = dict(zip(got["key"], got["text"]))
        missing = [k for k in members if k not in lookup]
        if missing:
            lookup.update(self._fetch_texts(engine, to_epoch, missing))
        thr, ngram = self.threshold, self.ngram

        def jaccard_keep(df: pd.DataFrame, lk: dict) -> pa.Table:
            ta = df["a"].map(lk)
            tb = df["b"].map(lk)
            ok = ta.notna() & tb.notna()  # a partner vanished within the window
            df, ta, tb = df[ok], ta[ok], tb[ok]
            keep = np.zeros(len(df), dtype=bool)
            if len(df):
                fa, oa = textfns.word_ngrams_hashes(ta.reset_index(drop=True), n=ngram)
                fb, ob = textfns.word_ngrams_hashes(tb.reset_index(drop=True), n=ngram)
                for i in range(len(df)):
                    sa = np.unique(fa[oa[i] : oa[i + 1]])
                    sb = np.unique(fb[ob[i] : ob[i + 1]])
                    k = np.intersect1d(sa, sb, assume_unique=True).size
                    uni = sa.size + sb.size - k
                    keep[i] = uni > 0 and k >= thr * uni
            kept = df[keep]
            # Arrow out: empty object-dtype frames trip Ray's size estimator
            return pa.table(
                {
                    "a": pa.array(kept["a"].to_numpy(dtype=object), pa.string()),
                    "b": pa.array(kept["b"].to_numpy(dtype=object), pa.string()),
                }
            )

        # a dup-heavy window (bulk re-ingest into hot buckets) can emit far
        # more candidates than the steady-state handful: above the gate,
        # ship the text lookup once and verify distributed; below it, the
        # Dataset overhead costs more than the driver loop saves
        gate = int(os.environ.get("ARER_NEARDUP_VERIFY_DRIVER_LIMIT", "4096"))
        if len(cands) <= gate:
            out = jaccard_keep(cands, lookup).to_pandas()
            return out if len(out) else empty
        lookup_ref = ray.put(lookup)
        out = (
            ray.data.from_pandas(cands.reset_index(drop=True))
            .map_batches(
                lambda df: jaccard_keep(df, ray.get(lookup_ref)),
                batch_format="pandas",
                batch_size=1024,
            )
            .to_pandas()
        )
        return out if len(out) else empty

    def _fetch_texts(self, engine, to_epoch: int, keys: list) -> dict:
        """key → text for arbitrary live keys at the `to_epoch` horizon:
        folds ONLY the base partitions the keys hash to (one Ray task
        each)."""
        from arches_rascoll_etl_ray.stages.merge import (
            evolved_content_col,
            fold_partition_tables,
            read_partition_state,
        )

        cfg = engine.cfg
        col = evolved_content_col(cfg)
        ckpt = engine.checkpoint(to_epoch)
        parts = pd.DataFrame({"key": keys})
        rp = parts["key"].str.split(KEY_SEP, n=1, expand=True)
        kt = pa.table({"repo": rp[0].to_numpy(dtype=object), "path": rp[1].to_numpy(dtype=object)})
        ph = key_hash64(kt) % np.uint64(cfg.num_partitions)
        key_set = pa.array(keys, pa.string())
        key_ref = ray.put(key_set)

        @ray.remote(num_cpus=1)
        def fold_filter(part: int):
            info = ckpt.partitions.get(int(part))
            if not info:
                return {}
            folded = fold_partition_tables(cfg, read_partition_state(cfg, info))
            sel = folded.filter(pc.is_in(combine_key(folded), value_set=ray.get(key_ref)))
            k = combine_key(sel).to_pylist()
            return dict(zip(k, pc.cast(sel[col], pa.large_string()).to_pylist()))

        out: dict = {}
        for d in ray.get([fold_filter.remote(int(p)) for p in np.unique(ph)]):
            out.update(d)
        return out

    def _update_edges(self, touched, verified: pd.DataFrame) -> None:
        """Edge-store maintenance: every partition drops edges touching a
        changed/deleted key (the touched set broadcasts — bounded by window
        churn), then the partitions named by new verified pairs add them."""
        tset_ref = ray.put(set(map(str, touched)))
        if len(verified):
            vh = stable_hash64(pa.array(verified["a"].astype(str)))
            verified = verified.assign(part=(vh % np.uint64(self.num_partitions)).astype(np.int32))
        edge_file = self._edge_file
        P = self.num_partitions

        def rewrite(part: int, new_rows: pd.DataFrame) -> None:
            pfile = edge_file(part)
            existing = (
                pq.read_table(pfile).to_pandas()
                if os.path.exists(pfile)
                else pd.DataFrame({"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)})
            )
            tset = ray.get(tset_ref)
            removed = False
            if len(existing) and tset:
                keep = ~(existing["a"].isin(tset) | existing["b"].isin(tset))
                removed = not bool(keep.all())
                existing = existing[keep]
            if not removed and len(new_rows) == 0:
                # untouched partition: the removal check requires the read,
                # but NOT a byte-identical re-sort/recompress/rewrite —
                # per-window write I/O stays bounded by window churn
                return
            merged = pd.concat([existing, new_rows[["a", "b"]]], ignore_index=True)
            merged = _dedup_rows(merged, ["a", "b"])  # _dedup_rows output is already (a, b)-sorted
            if len(merged):
                os.makedirs(os.path.dirname(pfile), exist_ok=True)
                tmp = pfile + f".tmp-{os.getpid()}"
                pq.write_table(pa.Table.from_pandas(merged, preserve_index=False), tmp, compression="lz4")
                os.replace(tmp, pfile)
            else:
                try:
                    os.remove(pfile)
                except FileNotFoundError:
                    pass

        rw = ray.remote(num_cpus=1)(rewrite)
        empty = pd.DataFrame({"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)})
        tasks = []
        for part in range(P):
            rows = verified[verified["part"] == part] if len(verified) else empty
            # removal must visit EVERY partition (an edge lives at hash(a),
            # but its b endpoint may be the touched key)
            if len(rows) == 0 and not os.path.exists(edge_file(part)):
                continue
            tasks.append(rw.remote(part, rows))
        if tasks:
            ray.get(tasks)

    # ------------------------------------------------------------ reads

    def edges_table(self) -> pa.Table:
        """All verified pairs, (a, b) composite keys sorted — driver-sized
        (the near-dup pair set, not the corpus)."""
        parts = []
        for part in range(self.num_partitions):
            f = self._edge_file(part)
            if os.path.exists(f):
                parts.append(pq.read_table(f))
        if not parts:
            return pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
        out = pa.concat_tables(parts, promote_options="permissive")
        return out.take(pc.sort_indices(out, sort_keys=[("a", "ascending"), ("b", "ascending")]))

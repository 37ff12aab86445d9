"""Deterministic synthetic change-log (binlog/WAL) generation.

Produces the F1/F2 fixtures from FIXTURES.md: a source-code-repo file table
``(repo, path, commit, lang, content)`` and a change stream
``(lsn, op, repo, path, commit, lang, content)`` whose per-key max-LSN fold
(drop deleted) reconstructs the file table. Everything is a pure function of
``seed`` — no wall clock, no uuid4 (replay must be sha256-stable; contrast
the reference's random minting at arches_rascoll/ref_collection.py:138,167).

Repo popularity and update frequency are Zipf-skewed so hot-key handling
(salted sub-partitioning) is actually exercised.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from arches_rascoll_etl_ray.functions.hashing import hex16, stable_hash64

EXTS = ["py", "rs", "go", "js", "md", "c", "ts", "java"]
LANG_OF_EXT = {
    "py": "python",
    "rs": "rust",
    "go": "go",
    "js": "javascript",
    "md": "markdown",
    "c": "c",
    "ts": "typescript",
    "java": "java",
}

_FILLER_WORDS = (
    "def fn return import struct impl match let const var class self "
    "for while if else elif try except raise async await yield lambda "
    "map filter reduce table batch arrow block shard merge upsert lsn"
).split()


def _make_fillers(rng: np.random.Generator, n_variants: int, target_bytes: int) -> np.ndarray:
    fillers = []
    for _ in range(n_variants):
        words = rng.choice(_FILLER_WORDS, size=max(4, target_bytes // 6))
        fillers.append(" ".join(words.tolist()))
    return np.array(fillers, dtype=object)


def generate_files(num_files: int, seed: int = 42, num_repos: int | None = None) -> pd.DataFrame:
    """The static file universe: file_id -> (repo, path, lang). Zipf-skewed
    repo sizes (repo 0 is hot)."""
    rng = np.random.default_rng(seed)
    if num_repos is None:
        num_repos = max(4, num_files // 50)
    z = rng.zipf(1.5, size=num_files)
    repo_idx = np.minimum(z - 1, num_repos - 1)
    fid = np.arange(num_files)
    ext_idx = fid % len(EXTS)
    repos = pd.Series(repo_idx).map(lambda r: f"org{r % 7}/repo{r}").to_numpy(dtype=object)
    exts = np.array(EXTS, dtype=object)[ext_idx]
    paths = (
        "src/d" + pd.Series(fid % 37).astype(str) + "/f" + pd.Series(fid).astype(str) + "." + pd.Series(exts)
    ).to_numpy(dtype=object)
    langs = pd.Series(exts).map(LANG_OF_EXT).to_numpy(dtype=object)
    return pd.DataFrame({"file_id": fid, "repo": repos, "path": paths, "lang": langs})


def generate_changelog(
    num_files: int,
    num_events: int,
    seed: int = 42,
    content_bytes: int = 200,
) -> pd.DataFrame:
    """Deterministic event stream. First `num_files` events insert every file
    once; the remainder are Zipf-skewed updates/deletes/re-inserts. The op of
    a file's k-th occurrence is a fixed function of k, so the whole stream is
    reproducible from (num_files, num_events, seed)."""
    assert num_events >= num_files, "need at least one insert per file"
    rng = np.random.default_rng(seed)
    files = generate_files(num_files, seed=seed)

    tail_n = num_events - num_files
    # Zipf-skewed file choice for the update tail: file 0 is the hottest key.
    tail_files = (rng.zipf(1.3, size=tail_n) - 1) % num_files if tail_n else np.empty(0, dtype=np.int64)
    file_of_event = np.concatenate([np.arange(num_files), tail_files]).astype(np.int64)

    # occurrence index per file (vectorized cumcount)
    occ = pd.Series(file_of_event).groupby(file_of_event).cumcount().to_numpy()

    # op pattern: first touch inserts; every 9th occurrence deletes; the
    # occurrence right after a delete re-inserts; otherwise update.
    op = np.full(num_events, "U", dtype=object)
    op[occ == 0] = "I"
    op[(occ % 9 == 8)] = "D"
    op[(occ % 9 == 0) & (occ > 0)] = "I"

    df = files.iloc[file_of_event].reset_index(drop=True)
    df["lsn"] = np.arange(1, num_events + 1, dtype=np.int64)
    df["op"] = op
    df["ver"] = occ.astype(np.int64)

    # commit: 40-hex-char deterministic pseudo-sha1 from (repo, path, ver)
    key = (df["repo"].astype(str) + "\x00" + df["path"].astype(str) + "@" + df["ver"].astype(str)).to_numpy(dtype=object)
    h1 = stable_hash64(key)
    h2 = stable_hash64(pd.Series(key).radd("c:").to_numpy(dtype=object))
    df["commit"] = (hex16(h1) + hex16(h2) + "00000000").to_numpy(dtype=object)

    # content: deterministic header + one of N seeded filler bodies
    fillers = _make_fillers(rng, 16, content_bytes)
    body = fillers[(h1 % np.uint64(len(fillers))).astype(np.int64)]
    header = ("// " + df["repo"] + "/" + df["path"] + " @v" + df["ver"].astype(str) + "\n").to_numpy(dtype=object)
    df["content"] = header + body

    # deletes carry no payload (FIXTURES.md F2)
    is_del = df["op"].to_numpy() == "D"
    for col in ("commit", "lang", "content"):
        vals = df[col].to_numpy(dtype=object)
        vals[is_del] = None
        df[col] = vals

    return df[["lsn", "op", "repo", "path", "commit", "lang", "content"]]


def write_changelog_shards(
    df: pd.DataFrame, out_dir: str, num_shards: int = 16, fmt: str = "parquet"
) -> list[str]:
    """Write the stream as LSN-range-named shards so an epoch read can prune
    at the file level (``changelog-<startlsn>-<endlsn>.{parquet,csv}``)."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(df)
    bounds = np.linspace(0, n, num_shards + 1, dtype=np.int64)
    paths = []
    table = pa.Table.from_pandas(df, preserve_index=False)
    table = table.set_column(
        table.schema.get_field_index("content"),
        "content",
        table["content"].cast(pa.large_string()),
    )
    for i in range(num_shards):
        lo, hi = bounds[i], bounds[i + 1]
        if hi <= lo:
            continue
        shard = table.slice(lo, hi - lo)
        # name by min/max so pruning stays correct for out-of-order streams;
        # the shard index keeps names unique when two shards share an LSN
        # range (duplicate/shuffled delivery) — pruning only reads (lo,hi).
        start_lsn = pa.compute.min(shard["lsn"]).as_py()
        end_lsn = pa.compute.max(shard["lsn"]).as_py()
        p = os.path.join(out_dir, f"changelog-{start_lsn:012d}-{end_lsn:012d}-{i:05d}.{fmt}")
        if fmt == "csv":
            shard.to_pandas().to_csv(p, index=False)
        else:
            # lz4: measured 1.6× faster to decode than snappy AND smaller
            # for this payload — the WAL is read (replayed) far more often
            # than written
            pq.write_table(shard, p, row_group_size=64 * 1024, compression="lz4")
        paths.append(p)
    return paths


def changelog_dir_for(cache_root: str, num_files: int, num_events: int, seed: int, content_bytes: int = 200) -> str:
    """Content-addressed cache dir for a generated stream (generation is
    driver-side and one-time; replays read the parquet)."""
    # "l4" busts caches written with the earlier snappy codec
    name = f"changelog_f{num_files}_e{num_events}_s{seed}_b{content_bytes}_l4"
    return os.path.join(cache_root, name)


def ensure_changelog(
    cache_root: str,
    num_files: int,
    num_events: int,
    seed: int = 42,
    content_bytes: int = 200,
    num_shards: int = 16,
) -> str:
    out_dir = changelog_dir_for(cache_root, num_files, num_events, seed, content_bytes)
    done = os.path.join(out_dir, "_GENERATED")
    if not os.path.exists(done):
        df = generate_changelog(num_files, num_events, seed=seed, content_bytes=content_bytes)
        write_changelog_shards(df, out_dir, num_shards=num_shards)
        with open(done, "w") as f:
            f.write(f"{num_files} {num_events} {seed} {content_bytes}\n")
    return out_dir


def changelog_from_events_table(sf_dir: str) -> pd.DataFrame:
    """Recast the driver's `events` table as a change stream keyed by
    user_id: every event is an upsert of that user's latest state; LSN is the
    (ts, event_id) order. Lets the DuckDB oracle check the real engine's
    LWW fold (SURVEY.md §2.3 P1)."""
    df = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    df = df.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
    out = pd.DataFrame(
        {
            "lsn": np.arange(1, len(df) + 1, dtype=np.int64),
            "op": np.where(df["event_type"].to_numpy() == "delete", "D", "U").astype(object),
            "repo": ("user" + df["user_id"].astype(str)).to_numpy(dtype=object),
            "path": np.full(len(df), "state", dtype=object),
            "commit": df["event_id"].astype(str).to_numpy(dtype=object),
            "lang": df["event_type"].to_numpy(dtype=object),
            "content": df["value"].map(lambda v: f"{v:.6f}").to_numpy(dtype=object),
        }
    )
    return out


def patch_changelog_from_events_table(sf_dir: str) -> pd.DataFrame:
    """The events-table change stream with PARTIAL images: every third
    non-delete event (event_id % 3 == 0) becomes a 'P' patch that sets ONLY
    the content column (the value), leaving commit/lang to the last full
    image — the deterministic rule the cdc_events_patch DuckDB oracle
    mirrors."""
    out = changelog_from_events_table(sf_dir)
    eid = out["commit"].astype(np.int64).to_numpy()
    is_patch = (eid % 3 == 0) & (out["op"].to_numpy() != "D")
    out.loc[is_patch, "op"] = "P"
    out.loc[is_patch, "commit"] = None
    out.loc[is_patch, "lang"] = None
    return out


def near_dup_changelog_from_documents(sf_dir: str) -> pd.DataFrame:
    """Recast the driver's `documents` table as a two-phase change stream
    for the incremental near-dup index (pipelines/dedup_index.py):

      v1: every doc inserted in doc_id order (op U, content = text)
      v2 (deterministic churn, in doc_id order):
        - doc_id % 7 == 3 AND (doc_id - 1) exists  → update: content
          becomes doc_id-1's ORIGINAL text (manufactures exact near-dup
          pairs that only exist AFTER the update — the incremental path
          must discover them at the update window, not at insert)
        - doc_id % 11 == 5 AND doc_id % 7 != 3     → delete (its edges
          must vanish from the index)

    The DuckDB oracle (cdc_queries.cdc_dedup_incremental) reproduces the
    same final corpus with a CASE + anti-filter over `documents`."""
    df = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    text_by_id = dict(zip(ids, df["text"]))
    n = len(df)

    def rows(op, idv, content, lsn0):
        return pd.DataFrame(
            {
                "lsn": np.arange(lsn0, lsn0 + len(idv), dtype=np.int64),
                "op": np.full(len(idv), op, dtype=object),
                "repo": np.array([f"doc{i}" for i in idv], dtype=object),
                "path": np.full(len(idv), "t", dtype=object),
                "commit": np.full(len(idv), "2" if op != "U" or lsn0 > n else "1", dtype=object),
                "lang": np.full(len(idv), "v2" if lsn0 > n else "v1", dtype=object),
                "content": np.asarray(content, dtype=object),
            }
        )

    v1 = rows("U", ids, df["text"].to_numpy(dtype=object), 1)
    upd_mask = (ids % 7 == 3) & np.isin(ids - 1, ids)
    del_mask = (ids % 11 == 5) & (ids % 7 != 3)
    upd_ids = ids[upd_mask]
    v2u = rows("U", upd_ids, [text_by_id[i - 1] for i in upd_ids], n + 1)
    del_ids = ids[del_mask]
    v2d = rows("D", del_ids, [text_by_id[i] for i in del_ids], n + 1 + len(upd_ids))
    return pd.concat([v1, v2u, v2d], ignore_index=True)

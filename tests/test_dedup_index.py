"""Incremental near-dup index conformance (pipelines/dedup_index.py).

Contracts:
- INCREMENTAL == BATCH: per-epoch-synced edges equal both a single
  end-of-history sync and a brute-force exact-Jaccard pair scan of the
  final live corpus.
- CHURN: an update drops the doc's stale edges and discovers the pairs
  its new text creates; a delete removes every edge touching the doc.
- CRASH WINDOW: a sync that died after persisting its intent re-applies
  the SAME window first and converges to identical stores.
- LAYOUT PIN: reopening with different signature params is rejected.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arches_rascoll_etl_ray.config import EngineConfig
from arches_rascoll_etl_ray.datagen.changelog_gen import write_changelog_shards
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine
from arches_rascoll_etl_ray.pipelines.dedup_index import KEY_SEP, IncrementalNearDup


def _mk_changelog(tmp_path, rows, name="clog"):
    df = pd.DataFrame(
        {
            "lsn": np.arange(1, len(rows) + 1, dtype=np.int64),
            "op": [r[0] for r in rows],
            "repo": [r[1] for r in rows],
            "path": ["t"] * len(rows),
            "commit": ["c"] * len(rows),
            "lang": ["x"] * len(rows),
            "content": [r[2] for r in rows],
        }
    )
    d = str(tmp_path / name)
    write_changelog_shards(df, d, num_shards=2)
    return d


def _edges(idx):
    t = idx.edges_table().to_pandas()
    return sorted(
        (a.split(KEY_SEP)[0], b.split(KEY_SEP)[0]) for a, b in zip(t["a"], t["b"])
    )


def _brute_pairs(live: dict) -> list:
    """Exact word-3-gram Jaccard >= 0.5 pairs over {key: text}."""
    import itertools

    def grams(t):
        w = t.split()
        if not w:
            return set()
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    g = {k: grams(v) for k, v in live.items()}
    out = []
    for a, b in itertools.combinations(sorted(g), 2):
        inter = len(g[a] & g[b])
        uni = len(g[a] | g[b])
        if uni > 0 and 2 * inter >= uni:
            out.append((a, b))
    return sorted(out)


TEXTS = {
    "dup1": "the quick brown fox jumps over the lazy dog near the river bank",
    "dup2": "the quick brown fox jumps over the lazy dog near the river bank",
    "dup3": "the quick brown fox jumps over the lazy dog near the river edge",
    "solo": "completely different content about distributed stream processing engines",
    "solo2": "yet another unrelated document on arrow columnar memory formats",
}


def test_incremental_equals_batch_and_brute(tmp_path):
    rows = [("U", k, v) for k, v in TEXTS.items()]
    # churn: solo gets UPDATED to a dup of dup1 (pair appears late), dup3
    # gets DELETED (its edges must vanish)
    rows += [("U", "solo", TEXTS["dup1"]), ("D", "dup3", TEXTS["dup3"])]
    clog = _mk_changelog(tmp_path, rows)
    lake = str(tmp_path / "lake")
    eng = CDCEngine(EngineConfig(lake_dir=lake, num_partitions=4))
    inc = IncrementalNearDup(str(tmp_path / "inc"), num_partitions=4)
    while True:
        before = eng.checkpoint().epoch
        if eng.apply_epoch(clog, max_events=3).epoch == before:
            break
        inc.sync(eng)
    live = {k: v for k, v in TEXTS.items() if k != "dup3"}
    live["solo"] = TEXTS["dup1"]
    want = _brute_pairs(live)
    assert _edges(inc) == want
    assert ("dup1", "solo") in _edges(inc)  # discovered at the update window
    assert not any("dup3" in e for pair in _edges(inc) for e in pair)
    # single end-of-history sync lands on the same edge set
    one = IncrementalNearDup(str(tmp_path / "one"), num_partitions=4)
    one.sync(eng)
    assert _edges(one) == want


def test_crash_window_replay_idempotent(tmp_path):
    rows = [("U", k, v) for k, v in TEXTS.items()]
    clog = _mk_changelog(tmp_path, rows)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.apply_epoch(clog, max_events=100)
    idx = IncrementalNearDup(str(tmp_path / "idx"), num_partitions=4)
    idx.sync(eng)
    edges_clean = _edges(idx)
    buckets_clean = {
        p: pq.read_table(idx._bucket_file(p)).to_pandas().to_csv(index=False)
        for p in range(4)
        if os.path.exists(idx._bucket_file(p))
    }
    # crash simulation: watermark rolled back with the intent persisted —
    # the next sync must re-apply the SAME window over the existing stores
    idx.applied_epoch = 0
    idx.pending_to = eng.checkpoint().epoch
    idx._save_meta()
    reopened = IncrementalNearDup(str(tmp_path / "idx"), num_partitions=4)
    reopened.sync(eng)
    assert _edges(reopened) == edges_clean
    buckets_after = {
        p: pq.read_table(idx._bucket_file(p)).to_pandas().to_csv(index=False)
        for p in range(4)
        if os.path.exists(idx._bucket_file(p))
    }
    assert buckets_after == buckets_clean


def test_param_pin_rejected(tmp_path):
    d = str(tmp_path / "idx")
    IncrementalNearDup(d, num_partitions=4)._save_meta()
    with pytest.raises(ValueError, match="signature/layout pin"):
        IncrementalNearDup(d, num_partitions=8)
    with pytest.raises(ValueError, match="signature/layout pin"):
        IncrementalNearDup(d, num_partitions=4, num_bands=16)


def test_lsn_only_churn_writes_nothing(tmp_path):
    """A redelivered identical upsert (content unchanged, lsn bumped) must
    not rewrite buckets or edges."""
    rows = [("U", "dup1", TEXTS["dup1"]), ("U", "dup2", TEXTS["dup2"])]
    clog1 = _mk_changelog(tmp_path, rows, "c1")
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.apply_epoch(clog1, max_events=100)
    idx = IncrementalNearDup(str(tmp_path / "idx"), num_partitions=4)
    idx.sync(eng)
    mtimes = {
        p: os.stat(idx._bucket_file(p)).st_mtime_ns
        for p in range(4)
        if os.path.exists(idx._bucket_file(p))
    }
    # same content again, higher lsn
    df = pd.DataFrame(
        {
            "lsn": [3, 4],
            "op": ["U", "U"],
            "repo": ["dup1", "dup2"],
            "path": ["t", "t"],
            "commit": ["c", "c"],
            "lang": ["x", "x"],
            "content": [TEXTS["dup1"], TEXTS["dup2"]],
        }
    )
    d2 = str(tmp_path / "c2")
    write_changelog_shards(df, d2, num_shards=1)
    import shutil

    for f in os.listdir(d2):
        shutil.copy(os.path.join(d2, f), os.path.join(str(tmp_path / "c1"), f))
    eng.apply_epoch(str(tmp_path / "c1"), max_events=100)
    added = idx.sync(eng)
    assert added == 0
    after = {
        p: os.stat(idx._bucket_file(p)).st_mtime_ns
        for p in range(4)
        if os.path.exists(idx._bucket_file(p))
    }
    assert after == mtimes  # untouched partitions were not rewritten
    assert _edges(idx) == [("dup1", "dup2")]
    # edge partitions are also write-skipped when nothing changed
    emt = {
        p: os.stat(idx._edge_file(p)).st_mtime_ns
        for p in range(4)
        if os.path.exists(idx._edge_file(p))
    }
    idx.sync(eng)  # fully quiet sync
    emt2 = {
        p: os.stat(idx._edge_file(p)).st_mtime_ns
        for p in range(4)
        if os.path.exists(idx._edge_file(p))
    }
    assert emt2 == emt


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# small text pool engineered so some pairs qualify (J>=0.5) and some don't
_POOL = [
    "alpha beta gamma delta epsilon zeta eta theta",
    "alpha beta gamma delta epsilon zeta eta iota",      # near-dup of [0]
    "one two three four five six seven eight nine ten",
    "one two three four five six seven eight nine zen",  # near-dup of [2]
    "completely different words about stream engines",
    "",                                                   # empty doc
]


@st.composite
def _nd_streams(draw):
    n = draw(st.integers(min_value=2, max_value=24))
    keys = ["k0", "k1", "k2", "k3"]
    ev = []
    for lsn in range(1, n + 1):
        key = keys[draw(st.integers(min_value=0, max_value=3))]
        op = draw(st.sampled_from(["U", "U", "U", "D"]))  # updates dominate
        text = _POOL[draw(st.integers(min_value=0, max_value=len(_POOL) - 1))]
        ev.append((lsn, op, key, text))
    split = draw(st.integers(min_value=1, max_value=n))
    return ev, split


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_nd_streams())
def test_neardup_property_incremental_equals_batch(tmp_path_factory, case):
    """For ANY I/U/D stream and epoch split: per-epoch-synced edges equal a
    one-shot end-of-history sync AND a brute-force exact-Jaccard scan of
    the final live corpus."""
    events, split = case
    tmp = tmp_path_factory.mktemp("nd_prop")
    rows = [(op, key, text) for _, op, key, text in events]
    clog = _mk_changelog(tmp, rows)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp / "lake"), num_partitions=3))
    inc = IncrementalNearDup(str(tmp / "inc"), num_partitions=3)
    while True:
        before = eng.checkpoint().epoch
        if eng.apply_epoch(clog, max_events=split).epoch == before:
            break
        inc.sync(eng)
    one = IncrementalNearDup(str(tmp / "one"), num_partitions=3)
    one.sync(eng)
    live = {
        r: c
        for r, c in zip(
            eng.snapshot_table()["repo"].to_pylist(),
            eng.snapshot_table()["content"].to_pylist(),
        )
    }
    want = _brute_pairs({k: v or "" for k, v in live.items()})
    assert _edges(inc) == want
    assert _edges(one) == want


def test_neardup_distributed_verify_path(tmp_path, monkeypatch):
    """ARER_NEARDUP_VERIFY_DRIVER_LIMIT=0 forces the map_batches verify
    route (the bulk re-ingest path); the edge set must be identical to
    the driver-loop route."""
    monkeypatch.setenv("ARER_NEARDUP_VERIFY_DRIVER_LIMIT", "0")
    rows = [("U", k, v) for k, v in TEXTS.items()]
    clog = _mk_changelog(tmp_path, rows)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.apply_epoch(clog, max_events=100)
    idx = IncrementalNearDup(str(tmp_path / "idx"), num_partitions=4)
    idx.sync(eng)
    live = dict(TEXTS)
    assert _edges(idx) == _brute_pairs(live)


def test_bulk_insert_verify_reads_no_lake_partitions(tmp_path, monkeypatch):
    """A pure-insert window's candidate members are all adds, whose verify
    texts ride the band=-1 sentinels in the triples dataset — the lake
    fold fallback (_fetch_texts) must not run at all (the zero-lake-reads
    bulk-load contract), and the edges must still be exact."""
    rows = [("I", k, v) for k, v in TEXTS.items()]
    clog = _mk_changelog(tmp_path, rows)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    eng.apply_epoch(clog, max_events=100)
    idx = IncrementalNearDup(str(tmp_path / "idx"), num_partitions=4)

    def boom(*a, **k):
        raise AssertionError("_fetch_texts must not be called on a pure-insert window")

    monkeypatch.setattr(IncrementalNearDup, "_fetch_texts", boom)
    idx.sync(eng)
    assert _edges(idx) == _brute_pairs(dict(TEXTS))


def test_shared_repo_prefix_exact(tmp_path):
    """Regression: every doc lives in the SAME repo, so every composite key
    shares its prefix up to KEY_SEP. When KEY_SEP was NUL, pandas'
    C-string hash/sort paths collapsed all keys to that prefix — members,
    touched sets, bucket dedup and candidate dedup silently merged
    distinct docs and the edge set went order-dependent. With the \\x1f
    separator (and the byte-exact _dedup_rows), per-epoch incremental sync
    must equal the brute-force exact-Jaccard pair set."""
    docs = {f"d{i:02d}": t for i, t in enumerate(
        [TEXTS["dup1"], TEXTS["dup2"], TEXTS["dup3"], TEXTS["solo"], TEXTS["solo2"]] * 3
    )}
    df = pd.DataFrame(
        {
            "lsn": np.arange(1, len(docs) + 1, dtype=np.int64),
            "op": ["I"] * len(docs),
            "repo": ["corp"] * len(docs),           # shared prefix for EVERY key
            "path": list(docs.keys()),
            "commit": ["c"] * len(docs),
            "lang": ["x"] * len(docs),
            "content": list(docs.values()),
        }
    )
    d = str(tmp_path / "clog")
    write_changelog_shards(df, d, num_shards=2)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    idx = IncrementalNearDup(str(tmp_path / "idx"), num_partitions=4)
    while True:
        before = eng.checkpoint().epoch
        if eng.apply_epoch(clog_dir := d, max_events=4).epoch == before:
            break
        idx.sync(eng)
    t = idx.edges_table().to_pandas()
    got = sorted(
        (a.split(KEY_SEP, 1)[1], b.split(KEY_SEP, 1)[1]) for a, b in zip(t["a"], t["b"])
    )
    assert got == _brute_pairs(docs)
    assert len(got) > 0  # the corpus genuinely has near-dup pairs


def test_key_sep_layout_pin_rejected(tmp_path):
    """An index written under a different composite-key separator (e.g. the
    pre-fix NUL) must be rejected on reopen, not silently mismatched."""
    import json

    d = str(tmp_path / "idx")
    IncrementalNearDup(d, num_partitions=4)._save_meta()
    meta_path = os.path.join(d, "_neardup_meta.json")
    m = json.load(open(meta_path))
    m["key_sep"] = "\x00"
    json.dump(m, open(meta_path, "w"))
    with pytest.raises(ValueError, match="signature/layout pin"):
        IncrementalNearDup(d, num_partitions=4)
    # a meta with NO key_sep field (pre-pin layout) is likewise rejected
    del m["key_sep"]
    json.dump(m, open(meta_path, "w"))
    with pytest.raises(ValueError, match="signature/layout pin"):
        IncrementalNearDup(d, num_partitions=4)


def test_key_sep_in_repo_rejected_at_ingest(tmp_path):
    """repo/path containing the reserved separator byte must fail loudly at
    the spill's key hash, not silently mis-parse downstream composites."""
    rows = [("I", "bad\x1frepo", "hello world text")]
    clog = _mk_changelog(tmp_path, rows)
    eng = CDCEngine(EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2))
    with pytest.raises(Exception, match="reserved separator"):
        eng.apply_epoch(clog, max_events=5)

"""Deterministic, vectorized hashing primitives.

Everything here must be stable across processes and machines — replay must
reconverge to a sha256-identical final table (BASELINE.json north_rule), which
is why the reference's random `uuid4()` minting
(arches_rascoll/ref_collection.py:138,167) is replaced by content-derived
hashes throughout.
"""

from __future__ import annotations

import hashlib
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Namespace for deterministic uuid5 minting (replaces reference uuid4).
ENGINE_UUID_NS = uuid.uuid5(uuid.NAMESPACE_URL, "arches-rascoll-etl-ray")

# ASCII unit separator. NOT NUL: pandas' vectorized string hashtables and
# multi-key sorts (pd.unique, array-path factorize, multi-column
# drop_duplicates/duplicated, string-key groupby/merge, multi-column
# sort_values) hash/compare object strings as C strings and silently
# TRUNCATE at the first NUL byte — "repo\x00path" composites collapsed to
# their repo prefix, corrupting any downstream pandas op (proven: the
# near-dup index's bucket stores went order-dependent on shared-repo
# corpora). \x1f never truncates; the residual ambiguity (a repo name
# that itself contains \x1f) is documented and pathological, where the
# NUL hazard was silent and systemic. Arrow kernels and Python-object
# paths (set/isin/sort of a single key column/Index engines) are exact
# for BOTH separators.
KEY_SEP = "\x1f"


def combine_key(table_or_cols, left: str = "repo", right: str = "path") -> pa.Array:
    """Exact composite key `repo + KEY_SEP + path` as a single Arrow string
    column.

    Used for exact anti-join / is_in membership (no hash-collision risk) —
    the engine's analogue of the reference's NOT IN idempotence guards
    (arches_rascoll/ref_collection.py:305-314).
    """
    return pc.binary_join_element_wise(
        pc.cast(table_or_cols[left], pa.string()),
        pc.cast(table_or_cols[right], pa.string()),
        KEY_SEP,
    )


_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)


def _poly_hash_into(h: np.ndarray, arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Rolling FNV-1a-style fold of a string column's bytes into `h`, read
    straight from the Arrow offsets+data buffers — no Python objects. One
    vectorized pass per byte position (max key length passes total)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return h
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lens = offs[1:] - offs[:-1]
    starts = offs[:-1]
    for j in range(int(lens.max()) if n else 0):
        m = lens > j
        h[m] = (h[m] * _FNV_PRIME) ^ data[starts[m] + j].astype(np.uint64)
    return h


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: FNV's low bits mix poorly for power-of-two
    partition counts; this restores full avalanche."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def key_hash64(table_or_cols, left: str = "repo", right: str = "path") -> np.ndarray:
    """64-bit hash of the composite (repo, path) key WITHOUT materializing
    the concatenated key string or any Python object — the spill/normalize
    hot path (every event is hashed every epoch). Equivalent collision
    semantics to hashing `repo + sep + path`: the separator step makes
    ("ab","c") ≠ ("a","bc").

    NB: this function is part of the lake's PHYSICAL identity (keys hash to
    partitions by it) — changing it invalidates existing lake layouts, like
    changing num_partitions."""
    r = table_or_cols[left]
    p = table_or_cols[right]
    # ingest-time invariant: key parts must not contain KEY_SEP, or every
    # downstream composite (combine_key splits, index postings, near-dup
    # keys) silently mis-parses. Every event passes through here in the
    # spill hot path, so this single C-level substring scan guards the
    # whole engine; the old "\x00 cannot appear" claim was never enforced.
    for _name, _arr in ((left, r), (right, p)):
        if isinstance(_arr, (pa.Array, pa.ChunkedArray)):
            bad = pc.any(pc.fill_null(pc.match_substring(_arr, KEY_SEP), False))
            if bad.is_valid and bad.as_py():
                raise ValueError(
                    f"key column {_name!r} contains the reserved separator "
                    f"byte 0x{ord(KEY_SEP):02x} (KEY_SEP) — such keys cannot "
                    "be represented in composite form"
                )
    n = len(r)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    _poly_hash_into(h, r)
    h = h * _FNV_PRIME  # separator boundary fold (independent of KEY_SEP's byte value)
    _poly_hash_into(h, p)
    return _mix64(h)


def _mulmod64_sql(z: str, c: int) -> str:
    """SQL expr for (z * c) mod 2^64 — `z` a UBIGINT column/expr, `c` a
    uint64 constant — via 32-bit limb split (a full HUGEINT product of two
    ~2^64 values overflows INT128). Same construction as the training
    samplers' splitmix twin (pipelines/training.py)."""
    m64 = 1 << 64
    ch, cl = c >> 32, c & 0xFFFFFFFF
    return (
        f"CAST(((((CAST(({z}) >> 32 AS HUGEINT) * {cl} + "
        f"CAST(({z}) & 4294967295 AS HUGEINT) * {ch}) % 4294967296) * 4294967296) + "
        f"CAST(({z}) & 4294967295 AS HUGEINT) * {cl}) % {m64} AS UBIGINT)"
    )


def key_hash64_sql(inner_sql: str, repo_expr: str, path_const: str, carry_cols: list[str]) -> str:
    """Generated DuckDB twin of `key_hash64` — bit-exact (pinned in
    tests/test_hashing.py), so an oracle can reproduce the engine's
    key→partition routing in pure SQL (the cdc_lineage oracle).

    Returns a SELECT over `inner_sql` whose `kh` column is
    key_hash64(repo_expr, path_const) as UBIGINT; `carry_cols` ride along.
    Built as a CHAIN of subselects — one hash step per level — because
    inlining (each mul-mod repeats its operand 4×, the mixer repeats twice
    per round) blows the expression up ~4^10 and DuckDB's planner never
    returns. The variable-length repo fold is a list_reduce over the
    string's bytes; the constant path + the separator boundary (≡ folding a
    0x00 byte, see the `h * _FNV_PRIME` line in key_hash64) unroll to fixed
    steps. ASCII-only: ord(substr(...)) reads codepoints, which equal bytes
    exactly for the engine's synthesized keys."""
    offset = int(_FNV_OFFSET)
    prime = int(_FNV_PRIME)
    cc = ", ".join(carry_cols)
    bytes_l = (
        f"list_transform(range(1, length({repo_expr})+1),"
        f" i -> CAST(ord(substr({repo_expr}, i, 1)) AS UBIGINT))"
    )
    lam = f"xor({_mulmod64_sql('h', prime)}, b)"
    q = (
        f"SELECT {cc}, list_reduce(list_prepend(CAST({offset} AS UBIGINT), {bytes_l}),"
        f" (h, b) -> {lam}) AS kh FROM ({inner_sql})"
    )
    steps = [_mulmod64_sql("kh", prime)]  # separator boundary fold
    for byte in path_const.encode():
        steps.append(f"xor({_mulmod64_sql('kh', prime)}, CAST({byte} AS UBIGINT))")
    # _mix64 finalizer (splitmix64 finalizer, no gamma add)
    steps.append("xor(kh, kh >> 30)")
    steps.append(_mulmod64_sql("kh", 0xBF58476D1CE4E5B9))
    steps.append("xor(kh, kh >> 27)")
    steps.append(_mulmod64_sql("kh", 0x94D049BB133111EB))
    steps.append("xor(kh, kh >> 31)")
    for s in steps:
        q = f"SELECT {cc}, {s} AS kh FROM ({q})"
    return q


def stable_hash64(arr) -> np.ndarray:
    """Vectorized, process-stable 64-bit hash of a string array.

    pandas' hash_array (SipHash-1-3 with a fixed key) is deterministic across
    interpreter runs and machines, unlike Python's salted `hash()`.
    """
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_pandas()
    values = np.asarray(arr, dtype=object)
    return pd.util.hash_array(values, categorize=False)


def partition_ids(key_hash: np.ndarray, num_partitions: int) -> np.ndarray:
    return (key_hash % np.uint64(num_partitions)).astype(np.int32)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (Steele/Lea/Flaherty JDK mixer — public domain)
    over int64/uint64 keys: three xorshift-multiply rounds in wrapping
    uint64 arithmetic. Engine-portable: the training samplers' DuckDB twins
    recompute the identical value via generated HUGEINT mul-mod SQL
    (pipelines/training.py _splitmix64_sql), so sample membership hashes
    exactly while staying fully vectorized (no per-row Python digest)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def sha256_hex(text: str | bytes) -> str:
    if isinstance(text, str):
        text = text.encode("utf-8")
    return hashlib.sha256(text).hexdigest()


def sha256_hex_column(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row sha256 hex of a string column (null-preserving).

    Hashes straight from the Arrow offsets + data buffers: each row is a
    memoryview slice handed to hashlib — no per-value Arrow scalar boxing,
    no .as_py(), no .encode() copy. This sits in the merge hot path (called
    on every epoch's winners), so the per-row constant matters; the buffer
    path measures ~1.5× the scalar loop it replaced (~1.1 µs/row at 225 B —
    the residue is the sha256 call itself, the true floor without a C
    extension)."""
    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    out: list[str | None] = []
    sha = hashlib.sha256
    for chunk in chunks:
        n = len(chunk)
        if n == 0:
            continue
        if pa.types.is_string(chunk.type) or pa.types.is_binary(chunk.type):
            odtype = np.int32
        elif pa.types.is_large_string(chunk.type) or pa.types.is_large_binary(chunk.type):
            odtype = np.int64
        else:
            chunk = pc.cast(chunk, pa.large_string())
            odtype = np.int64
        bufs = chunk.buffers()
        if bufs[2] is None:  # no data buffer → every row is null
            out.extend([None] * n)
            continue
        offs = np.frombuffer(bufs[1], dtype=odtype)[chunk.offset : chunk.offset + n + 1]
        mv = memoryview(bufs[2])
        if chunk.null_count == 0:
            out.extend(sha(mv[offs[i] : offs[i + 1]]).hexdigest() for i in range(n))
        else:
            valid = pc.is_valid(chunk).to_numpy(zero_copy_only=False)
            out.extend(
                sha(mv[offs[i] : offs[i + 1]]).hexdigest() if valid[i] else None
                for i in range(n)
            )
    return pa.array(out, type=pa.string())


def deterministic_uuid(*parts: str) -> str:
    """uuid5 over a composite key — deterministic id minting (the replay-safe
    replacement for the reference's uuid4 at ref_collection.py:138-141)."""
    return str(uuid.uuid5(ENGINE_UUID_NS, KEY_SEP.join(parts)))


def hex16(values: np.ndarray) -> pd.Series:
    """Format a uint64 array as 16-char lowercase hex strings."""
    return pd.Series(values).map("{:016x}".format)


def table_content_sha256(table: pa.Table, columns: list[str]) -> str:
    """Deterministic, row-order-sensitive digest of selected columns.
    Vectorized: per-row SipHash via pandas (fixed key, machine-stable) then
    sha256 over the ordered hash buffer — a stability fingerprint for
    replay-equality checks, not a cryptographic commitment to the bytes.
    Callers sort by key first so the digest is replay-stable (the
    determinism role of the reference's ORDER BY resourceinstanceid,
    arches_rascoll/ref_collection.py:415)."""
    h = hashlib.sha256()
    df = table.select(columns).to_pandas()
    row_hashes = pd.util.hash_pandas_object(df, index=False).to_numpy()
    h.update(",".join(columns).encode("utf-8"))
    h.update(row_hashes.tobytes())
    return h.hexdigest()

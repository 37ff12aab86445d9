import numpy as np
import pyarrow as pa

from arches_rascoll_etl_ray.functions.hashing import (
    combine_key,
    deterministic_uuid,
    hex16,
    sha256_hex,
    sha256_hex_column,
    stable_hash64,
    table_content_sha256,
)


def test_stable_hash64_deterministic():
    a = stable_hash64(np.array(["x", "y", "x"], dtype=object))
    b = stable_hash64(pa.array(["x", "y", "x"]))
    assert a.dtype == np.uint64
    assert list(a) == list(b)
    assert a[0] == a[2] and a[0] != a[1]


def test_stable_hash64_empty():
    assert len(stable_hash64(np.array([], dtype=object))) == 0


def test_combine_key_exact():
    t = pa.table({"repo": ["a", "a/b"], "path": ["b/c", "c"]})
    keys = combine_key(t).to_pylist()
    # separator keeps (a, b/c) and (a/b, c) distinct
    assert keys[0] != keys[1]


def test_sha256_column_null_preserving():
    arr = pa.chunked_array([pa.array(["abc", None])])
    out = sha256_hex_column(arr).to_pylist()
    assert out[0] == sha256_hex("abc")
    assert out[1] is None


def test_deterministic_uuid_stable():
    assert deterministic_uuid("r", "p") == deterministic_uuid("r", "p")
    assert deterministic_uuid("r", "p") != deterministic_uuid("r", "q")


def test_hex16():
    out = hex16(np.array([0, 255], dtype=np.uint64))
    assert list(out) == ["0000000000000000", "00000000000000ff"]


def test_table_content_sha_sensitivity():
    t1 = pa.table({"a": ["x", "y"], "b": [1, 2]})
    t2 = pa.table({"a": ["x", "y"], "b": [1, 3]})
    t3 = pa.table({"a": ["y", "x"], "b": [2, 1]})
    s = lambda t: table_content_sha256(t, ["a", "b"])
    assert s(t1) != s(t2)
    assert s(t1) != s(t3)  # row-order sensitive by design (callers key-sort)
    assert s(t1) == s(pa.table({"a": ["x", "y"], "b": [1, 2]}))


def test_key_hash64_sql_twin_bit_exact():
    """The generated DuckDB pipeline (key_hash64_sql) must reproduce
    key_hash64 bit-for-bit — the cdc_lineage oracle's routing depends on
    every one of the 64 bits."""
    import duckdb

    from arches_rascoll_etl_ray.functions.hashing import key_hash64, key_hash64_sql

    rng = np.random.default_rng(7)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789_-./"), dtype=object)
    repos = ["".join(rng.choice(alpha, size=rng.integers(1, 24))) for _ in range(500)]
    repos += ["user0", "user999999", "a", "z" * 63]
    for path_const in ("state", "t", "src/lib/mod.rs"):
        t = pa.table({"repo": repos, "path": [path_const] * len(repos)})
        want = key_hash64(t)
        con = duckdb.connect()
        con.register("k", pa.table({"repo": repos}))
        q = key_hash64_sql("SELECT repo FROM k", "repo", path_const, ["repo"])
        got = (
            con.sql(f"SELECT kh FROM ({q})").arrow()["kh"].to_numpy().astype(np.uint64)
        )
        assert np.array_equal(want, got), path_const

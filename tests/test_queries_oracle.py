"""Driver-style oracle gate: run every `queries()` entry and its
`oracle_sql()` twin on sf0.001, compare row count + schema names + values
(column-name-sorted, row-order-insensitive) — a local stand-in for the
driver's sf0.01 CORRECTNESS check."""

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod
from tests.conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name):
    ray_fn = ALL_QUERIES[name]
    mine = _canon(_to_pandas(ray_fn(SF_SMOKE)))
    con = _duck(SF_SMOKE)
    try:
        oracle = _canon(con.execute(ORACLES[name]).df())
    finally:
        con.close()
    assert list(mine.columns) == list(oracle.columns), (
        f"{name}: column mismatch {list(mine.columns)} vs {list(oracle.columns)}"
    )
    assert len(mine) == len(oracle), f"{name}: row count {len(mine)} vs {len(oracle)}"
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=True)


def test_all_queries_runnable_and_nonempty():
    """Entries without oracles (non-SQL-expressible) must still run and
    return rows with a stable schema."""
    for name, fn in ALL_QUERIES.items():
        if name in ORACLES:
            continue
        df = _to_pandas(fn(SF_SMOKE))
        assert len(df) >= 0 and len(df.columns) > 0, name


def test_entry_smoke():
    res = _to_pandas(entry_mod.entry())
    assert len(res) > 0
